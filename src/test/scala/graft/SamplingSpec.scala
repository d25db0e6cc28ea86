package graft

import org.apache.spark.sql.functions._
import graft.pipeline.Sampling

class SamplingSpec extends SparkSpec {

  lazy val rows = {
    import spark.implicits._
    (0L until 400L).map(i => (i, s"src${i % 4}", 10L + (i % 7)))
      .toDF("doc_id", "source", "n_tok")
  }

  test("sampleHash is deterministic, key-exact, and rate-accurate") {
    val a = Sampling.sampleHash(rows, "doc_id", 0.25, "s").select("doc_id")
      .collect().map(_.getLong(0)).toSet
    val b = Sampling.sampleHash(rows.repartition(7), "doc_id", 0.25, "s")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(a === b, "same decision regardless of partitioning")
    // binomial(400, .25): expect ~100, allow wide slack
    assert(a.size > 60 && a.size < 140, s"got ${a.size}")
    // nested rates: a 0.1 sample with the same salt is a subset of the 0.25
    val c = Sampling.sampleHash(rows, "doc_id", 0.1, "s").select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(c.subsetOf(a), "thresholds nest: rate 0.1 ⊂ rate 0.25")
    assert(Sampling.sampleHash(rows, "doc_id", 1.0, "s").count() === 400L)
  }

  test("mixSources applies per-source rates and drops unlisted sources") {
    val mixed = Sampling.mixSources(rows, "source",
      Map("src0" -> 1.0, "src1" -> 0.3), "doc_id", "s")
    val bySrc = mixed.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(bySrc.getOrElse("src0", 0L) === 100L, "rate 1.0 keeps all (mod 2^-32)")
    assert(bySrc.getOrElse("src1", 0L) > 10L && bySrc("src1") < 55L)
    assert(!bySrc.contains("src2") && !bySrc.contains("src3"), "unlisted drop")
  }

  test("stratifiedSample caps every stratum at k, deterministically") {
    val s1 = Sampling.stratifiedSample(rows, "source", "doc_id", 7, "s")
    val counts = s1.groupBy("source").count().collect().map(_.getLong(1))
    assert(counts.length === 4 && counts.forall(_ === 7L))
    val again = Sampling.stratifiedSample(rows.repartition(13), "source", "doc_id", 7, "s")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(again === s1.select("doc_id").collect().map(_.getLong(0)).toSet)
  }

  test("epochMix replicates whole epochs and hash-samples the fraction") {
    val m = Sampling.epochMix(rows, "source",
      Map("src0" -> 2.5, "src1" -> 1.0, "src2" -> 0.25), "doc_id", "e")
    val bySrcEpoch = m.groupBy("source", "epoch").count().collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    // src0: epochs 0,1 complete (100 each); epoch 2 ~ half
    assert(bySrcEpoch(("src0", 0L)) === 100L)
    assert(bySrcEpoch(("src0", 1L)) === 100L)
    val frac0 = bySrcEpoch(("src0", 2L))
    assert(frac0 > 30L && frac0 < 70L, s"~50 of 100 expected, got $frac0")
    // src1: exactly one complete epoch, no fractional copy
    assert(bySrcEpoch(("src1", 0L)) === 100L)
    assert(!bySrcEpoch.contains(("src1", 1L)))
    // src2: pure Bernoulli at 0.25
    val frac2 = bySrcEpoch(("src2", 0L))
    assert(frac2 > 10L && frac2 < 45L, s"~25 of 100 expected, got $frac2")
    // src3 unlisted -> dropped entirely
    assert(m.filter(col("source") === "src3").count() === 0L)
    // deterministic on any partitioning
    val again = Sampling.epochMix(rows.repartition(13), "source",
      Map("src0" -> 2.5, "src1" -> 1.0, "src2" -> 0.25), "doc_id", "e")
      .select("doc_id", "epoch").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val first = m.select("doc_id", "epoch").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(again === first)
    // the fractional-epoch subset nests with sampleHash's decision
    val keptFrac = m.filter(col("source") === "src0" && col("epoch") === 2L)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val hashKept = Sampling.sampleHash(
      rows.filter(col("source") === "src0"), "doc_id", 0.5, "e")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(keptFrac === hashKept, "fraction == sampleHash at the same salt")
  }

  test("shardShuffle: uniform permutation, partitioning-invariant, salt-independent epochs") {
    val a = Sampling.shardShuffle(rows, "doc_id", 8, "epoch0")
      .select("doc_id", "shard", "shard_pos").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    val b = Sampling.shardShuffle(rows.repartition(13), "doc_id", 8, "epoch0")
      .select("doc_id", "shard", "shard_pos").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    assert(a.sortBy(_._1).toSeq === b.sortBy(_._1).toSeq,
      "coordinates identical on any partitioning")
    // every row placed exactly once; positions within a shard are 1..n
    assert(a.length === 400)
    a.groupBy(_._2).foreach { case (_, rs) =>
      assert(rs.map(_._3).sorted.toSeq === (1L to rs.length).toSeq)
    }
    // shards roughly balanced (400 over 8 ≈ 50 each)
    assert(a.groupBy(_._2).values.map(_.size).forall(s => s > 20 && s < 80))
    // a different salt gives a different epoch order
    val c = Sampling.shardShuffle(rows, "doc_id", 8, "epoch1")
      .select("doc_id", "shard", "shard_pos").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    assert(a.sortBy(_._1).toSeq !== c.sortBy(_._1).toSeq)
  }

  test("hashSplit: exhaustive, disjoint, fraction-accurate, growth-stable") {
    val fr = Seq("train" -> 0.8, "valid" -> 0.1, "test" -> 0.1)
    val s = Sampling.hashSplit(rows, "doc_id", fr, "sp")
      .select("doc_id", "split").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(s.size === 400, "every row labeled exactly once")
    val sizes = s.values.groupBy(identity).view.mapValues(_.size).toMap
    assert(sizes("train") > 280 && sizes("train") < 360, s"got $sizes")
    assert(sizes.getOrElse("valid", 0) > 10 && sizes.getOrElse("test", 0) > 10)
    // growth stability: labeling a subset gives identical labels
    val sub = Sampling.hashSplit(rows.filter(col("doc_id") < 100), "doc_id", fr, "sp")
      .select("doc_id", "split").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(sub.forall { case (k, v) => s(k) === v })
    // bad fractions rejected
    intercept[IllegalArgumentException] {
      Sampling.hashSplit(rows, "doc_id", Seq("a" -> 0.5, "b" -> 0.2), "sp")
    }
  }

  test("Snapshot.diff classifies added/removed/changed/unchanged") {
    import spark.implicits._
    val v1 = Seq((0L, "same"), (1L, "old text"), (2L, "gone")).toDF("doc_id", "text")
    val v2 = Seq((0L, "same"), (1L, "new text"), (3L, "fresh")).toDF("doc_id", "text")
    val d = graft.pipeline.Snapshot.diff(v1, v2)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(d === Map(0L -> "unchanged", 1L -> "changed",
      2L -> "removed", 3L -> "added"))
    val s = graft.pipeline.Snapshot.diffSummary(v1, v2)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(s === Map("unchanged" -> 1L, "changed" -> 1L,
      "removed" -> 1L, "added" -> 1L))
  }

  test("Snapshot.drift: zero on identical, ln2 on disjoint, null for absent sources") {
    import spark.implicits._
    val v1 = Seq((0L, "alpha beta alpha", "s1"), (1L, "gamma delta", "s2"),
      (2L, "only here", "s3")).toDF("doc_id", "text", "source")
    val same = Seq((0L, "alpha beta alpha", "s1"), (1L, "gamma delta", "s2"))
      .toDF("doc_id", "text", "source")
    val disjoint = Seq((0L, "zeta eta zeta", "s1"), (1L, "gamma delta", "s2"))
      .toDF("doc_id", "text", "source")
    val d1 = graft.pipeline.Snapshot.drift(v1, same)
      .collect().map(r => r.getString(0) ->
        Option(r.get(1)).map(_.asInstanceOf[Double])).toMap
    assert(d1("s1") === Some(0.0) && d1("s2") === Some(0.0))
    assert(d1("s3") === None, "source absent from v2 has no drift value")
    val d2 = graft.pipeline.Snapshot.drift(v1, disjoint)
      .collect().map(r => r.getString(0) ->
        Option(r.get(1)).map(_.asInstanceOf[Double])).toMap
    assert(math.abs(d2("s1").get - math.log(2.0)) < 1e-6,
      s"disjoint vocabularies must reach ln 2, got ${d2("s1")}")
    assert(d2("s2") === Some(0.0))
  }

  test("packSequences matches a sequential reference packing") {
    val packedDf = Sampling.packSequences(rows, "n_tok", budget = 100L)
    val packed = packedDf
      .select("doc_id", "cum_before", "bin")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    // sequential oracle
    var cum = 0L
    val expect = (0L until 400L).map { i =>
      val t = 10L + (i % 7)
      val out = (i, cum, cum / 100L)
      cum += t
      out
    }
    assert(packed.toSeq === expect)
    Sampling.unpersistPacked(packedDf)
  }

  test("unpersistPacked releases only the pack's own persist") {
    val bystander = rows.select(col("doc_id")).persist()
    bystander.count() // materialize
    val packedDf = Sampling.packSequences(rows, "n_tok", budget = 100L)
    packedDf.count()
    val pinnedBefore = spark.sparkContext.getPersistentRDDs.size
    Sampling.unpersistPacked(packedDf)
    // an unrelated persisted table survives the pack+unpersist cycle...
    assert(bystander.storageLevel.useMemory,
      "bystander persist must survive unpersistPacked")
    // ...while the pack's own pinned layout is released
    val deadline = System.nanoTime() + 10_000_000_000L
    while (spark.sparkContext.getPersistentRDDs.size >= pinnedBefore
        && System.nanoTime() < deadline) Thread.sleep(50)
    assert(spark.sparkContext.getPersistentRDDs.size < pinnedBefore,
      "pack's pinned persist must be released")
    bystander.unpersist()
  }

  test("ngramRepetition computes top n-gram shares with hand-checked values") {
    import spark.implicits._
    val d = Seq(
      (0L, "a b a b a b"),        // bigrams: "a b"×3, "b a"×2 → top2 = 3/5
      (1L, "x y z"),              // all distinct → top2 = 1/2, top3 = 1/1
      (2L, "w"),                  // < 2 tokens → 0 and 0
      (3L, "")).toDF("doc_id", "text")
    val r = graft.pipeline.TextAnalysis.ngramRepetition(d)
      .select("doc_id", "top_2gram_share", "top_3gram_share")
      .collect().map(x => x.getLong(0) -> (x.getDouble(1), x.getDouble(2))).toMap
    assert(r(0L)._1 === 3.0 / 5.0)
    assert(math.abs(r(0L)._2 - 2.0 / 4.0) < 1e-12) // "a b a"×2 of 4 trigrams
    assert(r(1L) === ((0.5, 1.0)))
    assert(r(2L) === ((0.0, 0.0)))
    assert(r(3L) === ((0.0, 0.0)))
  }

  test("decontaminate counts shared distinct n-grams against a benchmark") {
    import spark.implicits._
    val bench = Seq((100L, "alpha beta gamma delta")).toDF("doc_id", "text")
    val corpus = Seq(
      (0L, "alpha beta gamma epsilon"),      // shares "alpha beta gamma" (n=3)
      (1L, "alpha beta gamma delta extra"),  // shares 2 trigrams
      (2L, "nothing in common here at all"),
      (3L, "alpha beta gamma alpha beta gamma")) // same shared gram twice → 1 distinct
      .toDF("doc_id", "text")
    val r = graft.pipeline.Dedup.decontaminate(corpus, bench, n = 3)
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(r === Map(0L -> 1L, 1L -> 2L, 3L -> 1L))
  }

  test("piiScrub counts and redacts emails and URLs") {
    import spark.implicits._
    val d = Seq(
      (0L, "mail me at a.b+c@test.org or see https://ex.com/p?q=1 thanks"),
      (1L, "no pii here"),
      (2L, "u@x.io v@y.co https://a.b http://c.d/e")).toDF("doc_id", "text")
    val r = graft.pipeline.TextAnalysis.piiScrub(d)
      .select("doc_id", "n_emails", "n_urls", "scrubbed")
      .collect().map(x => x.getLong(0) -> ((x.getLong(1), x.getLong(2), x.getString(3)))).toMap
    assert(r(0L)._1 === 1L && r(0L)._2 === 1L)
    assert(r(0L)._3 === "mail me at <EMAIL> or see <URL> thanks")
    assert(r(1L) === ((0L, 0L, "no pii here")))
    assert(r(2L)._1 === 2L && r(2L)._2 === 2L)
    assert(r(2L)._3 === "<EMAIL> <EMAIL> <URL> <URL>")
  }

  test("packSequences is partition-count independent") {
    val d3 = Sampling.packSequences(rows, "n_tok", 100L, numPartitions = 3)
    val p3 = d3.select("doc_id", "bin").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    Sampling.unpersistPacked(d3)
    val d17 = Sampling.packSequences(rows, "n_tok", 100L, numPartitions = 17)
    val p17 = d17.select("doc_id", "bin").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    Sampling.unpersistPacked(d17)
    assert(p3 === p17)
  }

  test("packBestFit: whole docs per bin, budget respected, padding beats naive") {
    import spark.implicits._
    // lengths with awkward shapes so naive sequential packing wastes space
    val docs = (0L until 300L).map(i => (i, 30L + (i * 37 % 61)))
      .toDF("doc_id", "n_tok")
    val budget = 128L
    val out = Sampling.packBestFit(docs, "n_tok", budget, numGroups = 4).collect()
    assert(out.length === 300)
    val byBin = out.groupBy(r => (r.getLong(r.fieldIndex("group")),
      r.getLong(r.fieldIndex("bin"))))
    byBin.foreach { case ((g, b), members) =>
      val fill = members.map(_.getLong(members.head.fieldIndex("n_tok"))).sum
      // every member reports the bin's FINAL fill, and it fits
      members.foreach { m =>
        assert(m.getLong(m.fieldIndex("bin_fill")) === fill, s"group $g bin $b")
        assert(!m.getBoolean(m.fieldIndex("oversize")))
      }
      assert(fill <= budget, s"group $g bin $b overfilled: $fill")
    }
    // padding no worse than naive sequential whole-doc first-fit in id order
    val naiveBins = {
      var fill = 0L; var bins = 1L
      docs.collect().sortBy(_.getLong(0)).foreach { r =>
        val sz = r.getLong(1)
        if (fill + sz > budget) { bins += 1; fill = sz } else fill += sz
      }
      bins
    }
    val bfdBins = byBin.size.toLong
    info(s"bins: best-fit-decreasing $bfdBins vs naive sequential $naiveBins")
    assert(bfdBins <= naiveBins)
  }

  test("packBestFit: oversize docs get flagged solo bins; partition-count invariant") {
    import spark.implicits._
    val docs = Seq((0L, 50L), (1L, 300L), (2L, 60L), (3L, 40L)).toDF("doc_id", "n_tok")
    val out = Sampling.packBestFit(docs, "n_tok", 128L, numGroups = 2).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(out(1L).getBoolean(out(1L).fieldIndex("oversize")))
    // the oversize doc shares its (group, bin) with nobody
    val k1 = (out(1L).getLong(out(1L).fieldIndex("group")),
      out(1L).getLong(out(1L).fieldIndex("bin")))
    assert(out.values.count(r =>
      (r.getLong(r.fieldIndex("group")), r.getLong(r.fieldIndex("bin"))) == k1) === 1)

    val big = (0L until 500L).map(i => (i, 20L + i % 90)).toDF("doc_id", "n_tok")
    def assignments(src: org.apache.spark.sql.DataFrame) =
      Sampling.packBestFit(src, "n_tok", 256L, numGroups = 8).collect()
        .map(r => (r.getLong(r.fieldIndex("doc_id")),
          r.getLong(r.fieldIndex("group")), r.getLong(r.fieldIndex("bin")))).toSet
    assert(assignments(big.repartition(1)) === assignments(big.repartition(13)))
  }

  test("temperatureRates: alpha=1 is natural (flat targetFrac), alpha=0.5 upsamples the tail") {
    import spark.implicits._
    val d = ((0 until 80).map(i => (i.toLong, "big")) ++
      (80 until 95).map(i => (i.toLong, "mid")) ++
      (95 until 100).map(i => (i.toLong, "small")))
      .toDF("doc_id", "source")
    val natural = Sampling.temperatureRates(d, "source", targetFrac = 0.5,
      alpha = 1.0).map { case (s, _, r) => s -> r }.toMap
    natural.values.foreach(r => assert(math.abs(r - 0.5) < 1e-12))
    val sqrtT = Sampling.temperatureRates(d, "source", targetFrac = 0.5,
      alpha = 0.5).map { case (s, n, r) => s -> ((n, r)) }.toMap
    // flattening: the small source's rate hits the min(1, ·) cap (its
    // uncapped rate is ~1.49 — can't upsample a Bernoulli filter), mid
    // beats big, and the kept mass loses exactly the capped excess
    assert(sqrtT("small")._2 === 1.0)
    assert(sqrtT("mid")._2 > sqrtT("big")._2)
    val expKept = sqrtT.values.map { case (n, r) => n * r }.sum
    assert(expKept < 50.0 && expKept > 45.0, s"expected kept mass $expKept")
    sqrtT.values.foreach { case (_, r) => assert(r > 0.0 && r <= 1.0) }
  }

  test("tokenBudget: window-exact, boundary doc kept, partition-count invariant") {
    import spark.implicits._
    val docs = (0L until 120L).map { i =>
      (i, s"src${i % 3}", 10L + i % 7) // uneven token counts
    }.toDF("doc_id", "source", "n_tokens")
    val budgets = Map("src0" -> 150L, "src1" -> 90L) // src2 dropped
    def run(df: org.apache.spark.sql.DataFrame) = {
      val out = Sampling.tokenBudget(df, "source", "n_tokens", budgets,
        numPartitions = 5)
      val res = out.select("doc_id", "source", "n_tokens", "cum_before")
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
        .sortBy(_._1).toSeq
      Sampling.unpersistPacked(out) // release the pinned pack persist
      res
    }
    val got = run(docs)
    // reference: per-source salted-hash order running sum (the window
    // formulation the oracle uses)
    val h = docs.select(col("doc_id"), col("source"), col("n_tokens"),
        substring(md5(concat(lit("budget"), col("doc_id").cast("string"))), 1, 8).as("h"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getString(3)))
    val expected = h.filter(r => budgets.contains(r._2)).groupBy(_._2).toSeq.flatMap {
      case (src, rows) =>
        var cum = 0L
        rows.sortBy(r => (r._4, r._1)).flatMap { r =>
          val before = cum; cum += r._3
          if (before < budgets(src)) Some((r._1, src, r._3, before)) else None
        }
    }.sortBy(_._1)
    assert(got === expected)
    // budget is a floor: each kept source reaches >= its budget
    budgets.foreach { case (src, b) =>
      val kept = got.filter(_._2 == src).map(_._3).sum
      assert(kept >= b, s"$src kept only $kept of $b")
    }
    // dropped source absent entirely
    assert(!got.exists(_._2 == "src2"))
    // partition-count invariance
    assert(run(docs.repartition(13)) === got)
    assert(run(docs.coalesce(1)) === got)
  }

  test("importanceSample: target docs outrank raw docs, hand-checked scores") {
    import spark.implicits._
    val docs = Seq(
      (0L, "alpha beta gamma", "t"), (1L, "alpha beta delta", "t"),
      (10L, "alpha beta zeta", "r"), (11L, "omega psi chi", "r"),
      (12L, "omega psi phi", "r"),
      (13L, "  ", "r") // blank: excluded, never scored
    ).toDF("doc_id", "text", "lang")
    val out = Sampling.importanceSample(docs, col("lang") === "t", topK = 10)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(out.size === 5 && !out.contains(13L))
    // target docs score highest of all
    assert(Seq(10L, 11L, 12L).forall(r => out(0L) > out(r) && out(1L) > out(r)))
    // hand-computed doc 10 (k=0.1, vt=4, vr=9):
    //   (alpha,beta): ln(2.1/2.4) − ln(3.1/3.9); (beta,zeta):
    //   ln(0.1/2.4) − ln(1.1/3.9); mean rounded = −0.908172.
    // NOTE the add-k property this pins: a target-UNSEEN CONTEXT backs
    // off to the uniform floor k/(k·vt) = 1/vt, so docs 11/12 (whole
    // bigrams unseen) outrank doc 10, whose seen-context unseen bigram
    // (beta,zeta) is penalized harder.
    assert(out(10L) === -0.908172)
    assert(out(11L) === -0.740207 && out(12L) === -0.740207)
    // topK truncates on (score DESC, doc_id): {0, 1}, then the 11/12
    // tie resolves to 11
    val top3 = Sampling.importanceSample(docs, col("lang") === "t", topK = 3)
      .collect().map(_.getLong(0)).toSet
    assert(top3 === Set(0L, 1L, 11L))
    // partition-count invariance (exact integer counts + rounded score)
    val again = Sampling
      .importanceSample(docs.repartition(7), col("lang") === "t", topK = 10)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(again === out)
  }
}
