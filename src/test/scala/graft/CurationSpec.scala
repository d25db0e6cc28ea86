package graft

import org.apache.spark.sql.functions._
import graft.pipeline._

/** The Curation facade: one-call pipeline == the manually-chained
  * operators, stage by stage, on a fixture exercising every gate. */
class CurationSpec extends SparkSpec {

  private lazy val fixture = {
    import spark.implicits._
    Seq(
      (0L, "the quick brown fox jumps over the lazy dog near the river bank today", "web"),
      (1L, "the quick brown fox jumps over the lazy dog near the river bank today", "web"),  // exact dup of 0
      (2L, "the quick brown fox jumps over the lazy dog near the river bank soon", "web"),   // near dup of 0
      (3L, "completely different text about spark structured streaming state stores", "books"),
      (4L, "!!! ??? !!!", "web"),                                                            // garbage
      (5L, "please contact me at alice@example.com about the meeting schedule tomorrow", "books"),
      (6L, "please contact me at bob@example.com about the meeting schedule tomorrow", "books"), // same after PII redact
      (7L, "der die das und ist nicht ein zu mit von heute morgen", "web"))                  // german
    .toDF("doc_id", "text", "source")
  }

  test("full pipeline: gates, scrubs, dedup stages and packing compose") {
    val cfg = Curation.Config(minQuality = 0.3, piiRedact = true,
      nearDupThreshold = 0.7, packBudget = 32L)
    val out = Curation.curate(fixture, cfg).collect()
      .map(r => r.getLong(r.fieldIndex("doc_id")) -> r).toMap

    // garbage gone; exact dup keeps 0, drops 1; near dup 2 gone;
    // PII twins collapse to the canonical 5 after redaction
    assert(out.keySet === Set(0L, 3L, 5L, 7L))
    // PII was redacted before dedup (that's WHY 6 collapsed into 5)
    assert(out(5L).getString(out(5L).fieldIndex("text")).contains("<EMAIL>"))
    // packing assigned bins over survivors in id order
    val bins = out.values.map(r => r.getLong(r.fieldIndex("doc_id")) ->
      r.getLong(r.fieldIndex("bin"))).toMap
    assert(bins.values.forall(_ >= 0))
    assert(bins(0L) <= bins(7L)) // cumulative bins are monotone in id order
  }

  test("whole-doc packing mode: bins respect the budget, no doc splits") {
    val cfg = Curation.Config(minQuality = 0.0, piiRedact = false,
      nearDupThreshold = 1.0, packBudget = 16L, packWholeDocs = true)
    val out = Curation.curate(fixture, cfg).collect()
    assert(out.nonEmpty)
    out.groupBy(r => (r.getLong(r.fieldIndex("group")), r.getLong(r.fieldIndex("bin"))))
      .foreach { case (_, members) =>
        val fill = members.head.getLong(members.head.fieldIndex("bin_fill"))
        val sum = members.map(m => m.getInt(m.fieldIndex("ws_tokens")).toLong).sum
        assert(fill === sum)
        assert(fill <= 16L || members.exists(_.getBoolean(
          members.head.fieldIndex("oversize"))))
      }
  }

  test("entropy gate: facade band == standalone charEntropy decisions") {
    import spark.implicits._
    // a repeat-spam doc (low entropy) planted alongside the fixture
    val planted = fixture.unionByName(
      Seq((8L, "spam spam spam spam spam spam spam spam spam spam", "web"))
        .toDF("doc_id", "text", "source"))
    val cfg = Curation.Config(minQuality = 0.0, piiRedact = false,
      entropyMin = 2.0, entropyMax = 5.0, nearDupThreshold = 1.1)
    val kept = Curation.curate(planted, cfg).collect()
      .map(_.getLong(0)).toSet
    // the standalone report's decisions, replayed manually (minus doc 1,
    // which the always-on exact-dedup stage collapses into canonical 0)
    val expected = TextAnalysis.charEntropy(planted).collect()
      .filter(r => r.getDouble(3) >= 2.0 && r.getDouble(3) <= 5.0)
      .map(_.getLong(0)).toSet - 1L
    assert(kept === expected)
    assert(!kept.contains(8L) && !kept.contains(4L)) // spam + garbage low-entropy
    assert(kept.contains(0L))
  }

  test("c4 clean stage: facade rewrite == standalone c4CleanGate") {
    import spark.implicits._
    // one page whose second line fails the terminal-punctuation rule and
    // one page killed by the brace rule
    val planted = Seq(
      (0L, "A good first sentence stands here today fine.\nno punct tail line\nAnother complete sentence survives the gate now.", "web"),
      (1L, "This page has code { inside } so it dies.\nEven with a fine second sentence right here.", "web"),
      (2L, "Only one surviving line lives on this page now.\nshort", "web"))
      .toDF("doc_id", "text", "source")
    val cfg = Curation.Config(c4MinWordsPerLine = 3, c4MinKeptLines = 2,
      minQuality = 0.0, piiRedact = false, nearDupThreshold = 1.1)
    val out = Curation.curate(planted, cfg).collect()
      .map(r => r.getLong(r.fieldIndex("doc_id")) ->
        r.getString(r.fieldIndex("text"))).toMap
    // page 1 dies (brace), page 2 dies (one kept line < 2); page 0
    // survives with the unpunctuated middle line excised
    assert(out.keySet === Set(0L))
    val standalone = TextAnalysis.c4CleanGate(planted, minWordsPerLine = 3,
      minKeptLines = 2).collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(0L) === standalone(0L))
    assert(!out(0L).contains("no punct tail line"))
  }

  test("language gate keeps only the requested languages") {
    val cfg = Curation.Config(minQuality = 0.0, languages = Set("de"),
      piiRedact = false, nearDupThreshold = 1.0)
    val out = Curation.curate(fixture, cfg).collect()
      .map(_.getAs[Long]("doc_id")).toSet
    assert(out === Set(7L))
  }

  test("LM gate drops the rare-bigram doc the threshold isolates") {
    // no other gates: isolate the LM stage. The gated corpus is the
    // fixture itself; pick the threshold between the max template ppl
    // and the rare-bigram outlier so the gate's cut is unambiguous.
    val base = Curation.Config(minQuality = 0.0, piiRedact = false,
      nearDupThreshold = 1.0)
    val ppl = TextAnalysis.lmPerplexity(fixture).collect()
      .map(r => r.getLong(0) -> r.getDouble(2)).toMap
    val worst = ppl.maxBy(_._2)
    val threshold = ppl.values.toSeq.sorted.takeRight(2).sum / 2 // between top-2
    val out = Curation.curate(fixture,
        base.copy(lmPerplexityMax = threshold)).collect()
      .map(_.getAs[Long]("doc_id")).toSet
    val manual = Curation.curate(fixture, base).collect()
      .map(_.getAs[Long]("doc_id")).toSet
    assert(out === manual - worst._1)
  }

  test("facade == manual chain (composition check)") {
    val cfg = Curation.Config(minQuality = 0.3, piiRedact = true,
      nearDupThreshold = 0.7)
    val facade = Curation.curate(fixture, cfg).collect()
      .map(_.getAs[Long]("doc_id")).toSet

    // the same stages chained by hand
    var d = TextAnalysis.qualityScore(fixture).filter(col("quality") >= 0.3)
    d = d.withColumn("text", TextAnalysis.piiScrubCol(col("text")))
    val canon = Dedup.exact(d).select(col("canonical_id"))
    d = d.join(canon, d("doc_id") === canon("canonical_id"), "left_semi")
    val pairs = Dedup.minhashLsh(d, threshold = 0.7)
    val drop = Dedup.duplicateClusters(pairs)
      .filter(col("id") =!= col("cluster_id")).select(col("id"))
    d = d.join(drop, d("doc_id") === drop("id"), "left_anti")
    val manual = d.collect().map(_.getAs[Long]("doc_id")).toSet

    assert(facade === manual)
  }

  test("writeCurated: partitioned layout with bounded files round-trips") {
    val out = java.nio.file.Files.createTempDirectory("curated").toString
    val curated = Curation.curate(fixture,
      Curation.Config(minQuality = 0.0, piiRedact = false, nearDupThreshold = 1.0))
    Curation.writeCurated(curated, out, partitionBy = Seq("source"),
      maxRecordsPerFile = 2L)
    val dirs = new java.io.File(out).listFiles()
      .filter(_.isDirectory).map(_.getName).toSet
    assert(dirs.exists(_.startsWith("source=web")))
    assert(dirs.exists(_.startsWith("source=books")))
    val back = spark.read.parquet(out)
    assert(back.count() === curated.count())
    // maxRecordsPerFile bounds every data file
    val files = new java.io.File(out).listFiles().filter(_.isDirectory)
      .flatMap(_.listFiles()).filter(_.getName.endsWith(".parquet"))
    files.foreach { f =>
      assert(spark.read.parquet(f.getPath).count() <= 2L, f.getName)
    }
  }

  test("source mixing: allowlist semantics on the curated survivors") {
    val cfg = Curation.Config(minQuality = 0.0, piiRedact = false,
      nearDupThreshold = 1.0, mixRates = Map("books" -> 1.0))
    val out = Curation.curate(fixture, cfg).collect()
      .map(_.getAs[Long]("doc_id")).toSet
    // only books survive (web absent from the allowlist); rate 1.0
    // keeps every books doc that survived dedup
    assert(out.nonEmpty)
    assert(out.subsetOf(Set(3L, 5L, 6L)))
  }

  test("token budgets: facade stage == standalone tokenBudget on the survivors") {
    val base = Curation.Config(minQuality = 0.0, piiRedact = false,
      nearDupThreshold = 1.0)
    val survivors = Curation.curate(fixture, base)
    val budgets = Map("web" -> 15L, "books" -> 9L)
    val manualDf = Sampling.tokenBudget(
      survivors.withColumn("_tb_tokens",
        size(split(trim(lower(col("text"))), "\\s+")).cast("long")),
      "source", "_tb_tokens", budgets, "doc_id", "curation")
    val manual = manualDf.collect().map(_.getAs[Long]("doc_id")).toSet
    Sampling.unpersistPacked(manualDf)
    val facadeDf = Curation.curate(fixture, base.copy(tokenBudgets = budgets))
    val facade = facadeDf.collect().map(_.getAs[Long]("doc_id")).toSet
    Sampling.unpersistPacked(facadeDf) // the tokenBudgets stage's pinned persist
    assert(facade === manual)
    assert(facade.nonEmpty)
    // the budget is a floor: kept token mass per source reaches it
    val toks = survivors.withColumn("_t",
        size(split(trim(lower(col("text"))), "\\s+")).cast("long"))
      .collect().map(r => (r.getAs[Long]("doc_id"),
        r.getAs[String]("source"), r.getAs[Long]("_t")))
    budgets.foreach { case (src, b) =>
      val kept = toks.filter(t => facade.contains(t._1) && t._2 == src).map(_._3).sum
      val avail = toks.filter(_._2 == src).map(_._3).sum
      assert(kept >= math.min(b, avail), s"$src kept $kept of floor $b")
    }
  }
}
