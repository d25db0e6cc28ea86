package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.pipeline._

/** Plan-shape regression guards: the scale properties PLANS.md claims
  * (narrow samplers, broadcast-side decontamination, two-phase top-k,
  * no empty-partition windows) asserted against the EXECUTED plan, so a
  * refactor that silently reintroduces a shuffle / single-task window /
  * all-pairs join fails CI rather than surfacing as a 100 TB incident. */
class PlanAssertSpec extends SparkSpec {

  private def executedPlan(df: DataFrame): String = {
    df.collect()
    df.queryExecution.executedPlan.toString
  }

  private lazy val docsDF = {
    import spark.implicits._
    (0 until 40).map { i =>
      (i.toLong, s"alpha beta gamma delta tok$i epsilon zeta", s"src${i % 3}")
    }.toDF("doc_id", "text", "source")
  }

  test("sampleHash / mixSources are pure narrow filters — zero exchanges") {
    val p1 = executedPlan(Sampling.sampleHash(docsDF, "doc_id", 0.5, "s"))
    assert(!p1.contains("Exchange"), s"sampleHash plan has a shuffle:\n$p1")
    val p2 = executedPlan(Sampling.mixSources(docsDF, "source",
      Map("src0" -> 1.0, "src1" -> 0.5), "doc_id", "s"))
    assert(!p2.contains("Exchange"), s"mixSources plan has a shuffle:\n$p2")
  }

  test("hashSplit is a pure narrow projection — zero exchanges") {
    val p = executedPlan(Sampling.hashSplit(docsDF, "doc_id",
      Seq("train" -> 0.8, "valid" -> 0.1, "test" -> 0.1), "s"))
    assert(!p.contains("Exchange"), s"hashSplit plan has a shuffle:\n$p")
  }

  test("winnowing runs with zero exchanges — all selection work is per-row") {
    val p = executedPlan(TextAnalysis.winnowing(docsDF))
    assert(!p.contains("Exchange"), s"winnowing picked up a shuffle:\n$p")
    assert(!p.contains("ScalaUDF"), s"winnowing has a UDF:\n$p")
  }

  test("shardShuffle plans per-shard windows, never a single-partition global sort") {
    val p = executedPlan(Sampling.shardShuffle(docsDF, "doc_id", 8))
    assert(!p.contains("SinglePartition"),
      s"shardShuffle degenerated to a global window:\n$p")
  }

  test("corpus diff exchanges hashes on the key — payload column never shuffles") {
    val p = executedPlan(Snapshot.diff(docsDF,
      docsDF.withColumn("text", concat(col("text"), lit(" x")))))
    // the exchange happens over the pre-hashed projection: the text
    // column must not appear in any exchange's output schema
    val exchanges = p.linesIterator.filter(_.contains("Exchange")).toSeq
    assert(exchanges.nonEmpty)
    assert(!exchanges.exists(_.contains("text#")),
      s"diff shuffles the payload column:\n$p")
  }

  test("markovTransitions: one user window pass + broadcast totals, no corpus-sized join") {
    import spark.implicits._
    val ev = (0 until 60).map(i =>
      (i.toLong, 1700000000000000000L + i * 1000000000L, (i % 5).toLong, s"t${i % 3}"))
      .toDF("event_id", "ts", "user_id", "event_type")
    val p = executedPlan(Temporal.markovTransitions(ev))
    assert(p.contains("BroadcastExchange") || p.contains("BroadcastHashJoin"),
      s"markov totals join must broadcast:\n$p")
  }

  test("stratifiedSample compiles to the two-phase WindowGroupLimit") {
    val p = executedPlan(Sampling.stratifiedSample(docsDF, "source", "doc_id", 3, "s"))
    assert(p.contains("WindowGroupLimit"),
      s"stratified sample lost the pre-shuffle per-partition top-k:\n$p")
  }

  test("topUsers and bm25 keep the two-phase WindowGroupLimit top-k") {
    import spark.implicits._
    val events = (0 until 50).map(i =>
      (i.toLong, (i % 7).toLong, i.toLong * 1000000L, s"t${i % 2}", 1.0))
      .toDF("event_id", "user_id", "ts", "event_type", "value")
    val p1 = executedPlan(graft.pipeline.Temporal.topUsers(events, k = 3))
    assert(p1.contains("WindowGroupLimit"),
      s"topUsers lost the pre-shuffle per-partition top-k:\n$p1")
    val queries = Seq((1L, "alpha beta")).toDF("query_id", "query_text")
    val p2 = executedPlan(TextAnalysis.bm25Search(docsDF, queries, topK = 3))
    assert(p2.contains("WindowGroupLimit"),
      s"bm25 lost the pre-shuffle per-partition top-k:\n$p2")
    assert(p2.contains("BroadcastHashJoin"),
      s"bm25 joins the corpus without broadcasting the query side:\n$p2")
  }

  test("decontaminate broadcasts the benchmark n-gram pool") {
    val p = executedPlan(Dedup.decontaminate(
      docsDF.filter(col("doc_id") >= 10), docsDF.filter(col("doc_id") < 10), n = 3))
    assert(p.contains("BroadcastHashJoin"),
      s"decontaminate joins the corpus without broadcasting the pool:\n$p")
  }

  test("no empty-partition window (global single-task sort) in the pipeline plans") {
    val plans = Seq(
      executedPlan(Dedup.exact(docsDF)),
      executedPlan(TextAnalysis.corpusStats(
        TextAnalysis.tokenCounts(docsDF), exact = false)),
      executedPlan(TextAnalysis.ngramRepetition(docsDF)))
    plans.foreach { p =>
      // an empty window spec renders as "Window [...]" with no
      // "partitionBy"-derived hashpartitioning on a real key; the robust
      // signal is a SinglePartition exchange feeding a Window/Sort
      assert(!p.contains("Exchange SinglePartition"),
        s"plan funnels through one task:\n$p")
    }
  }

  test("hyperplane signature is a codegen'd native expression (no ScalaUDF in the plan)") {
    import spark.implicits._
    val emb = (0 until 32)
      .map(i => (i.toLong, Array.tabulate(8)(j => (i * 8 + j).toFloat / 97f)))
      .toDF("vec_id", "embedding")
    val sig = Ann.hyperplaneSignatures(emb, "vec_id", "embedding",
      planes = 4, seed = 42, tables = 2)
    val p = executedPlan(sig)
    assert(!p.contains("ScalaUDF") && !p.contains("BatchEvalPython"),
      s"hyperplane signature fell back to a UDF:\n$p")
    // `*(n)` is the compact WholeStageCodegen stage marker: the Generate
    // evaluating hyperplane_signature must sit inside a codegen stage
    assert(p.linesIterator.exists(l =>
      l.contains("hyperplane_signature") && l.trim.stripPrefix("+- ").startsWith("*(")),
      s"signature projection left whole-stage codegen:\n$p")
    // codegen and interpreted eval agree bit for bit (the oracle depends
    // on the accumulation order)
    val planesArr = Array.tabulate(2, 4)((t, pl) =>
      Array.tabulate(8)(i => Ann.planeComponent(42 + t, pl, i)))
    val got = sig.collect().map(r => (r.getLong(0), r.getInt(2), r.getLong(3)))
    got.foreach { case (id, t, bucket) =>
      val v = Array.tabulate(8)(j => (id * 8 + j).toFloat / 97f)
      var expect = 0L
      for (pl <- 0 until 4) {
        var s = 0.0
        for (i <- 0 until 8) s += planesArr(t)(pl)(i) * v(i)
        if (s > 0) expect |= (1L << pl)
      }
      assert(bucket === expect, s"bucket mismatch for vec $id table $t")
    }
  }

  test("saltedJoin: output == plain join, hot key spread over salts, no fact-side shuffle") {
    import spark.implicits._
    // 1000-row hot key + a long tail, parquet-backed to defeat
    // ConvertToLocalRelation
    val tmp = java.nio.file.Files.createTempDirectory("graft_salt").toString
    ((0 until 1000).map(i => (i.toLong, "hot")) ++
      (1000 until 1050).map(i => (i.toLong, s"cold${i % 7}")))
      .toDF("event_id", "event_type").write.mode("overwrite").parquet(tmp)
    val fact = spark.read.parquet(tmp)
    // literal dim: keeps the plan assertion about the FACT side — a
    // distinct()-built dim adds its own (legitimate) build-side shuffle
    val dim = (Seq("hot") ++ (0 until 7).map(i => s"cold$i"))
      .toDF("event_type")
      .withColumn("type_tag", substring(md5(col("event_type")), 1, 8))
    val salted = graft.pipeline.Joins.saltedJoin(fact, dim, "event_type",
      col("event_id"), salts = 8)
    val plain = fact.join(dim, Seq("event_type"))
      .select(col("event_id"), col("event_type"), col("type_tag"))
    assert(salted.select("event_id", "event_type", "type_tag")
      .collect().map(_.toSeq).sorted(Ordering.by((s: Seq[Any]) => s.head.asInstanceOf[Long]))
      .toSeq === plain.collect().map(_.toSeq)
      .sorted(Ordering.by((s: Seq[Any]) => s.head.asInstanceOf[Long])).toSeq)
    // the hot key really spreads across pseudo-keys
    val hotSalts = fact.filter(col("event_type") === "hot")
      .withColumn("_salt",
        (conv(substring(md5(col("event_id").cast("string")), 1, 8), 16, 10)
          .cast("long") % 8).cast("int"))
      .select(countDistinct(col("_salt"))).head().getLong(0)
    assert(hotSalts >= 6, s"hot key only hit $hotSalts of 8 salts")
    // plan: broadcast probe, the fact side never shuffles
    val p = executedPlan(salted)
    assert(p.contains("BroadcastHashJoin"), s"salted join lost the broadcast:\n$p")
    assert(!p.contains("Exchange hashpartitioning"),
      s"salted join shuffled the fact side:\n$p")
  }

  test("ORC scan keeps the columnar contract: pushdown + pruning reach the scan") {
    val dir = graft.sources.OrcIO.stageDocuments(spark, "/root/testdata/sf0.001")
    val q = graft.sources.OrcIO.readDocuments(spark, dir)
      .filter(col("doc_id") === 42L).select("doc_id", "lang")
    val p = executedPlan(q)
    assert(p.contains("PushedFilters") && p.contains("EqualTo(doc_id,42)"),
      s"ORC scan lost predicate pushdown:\n$p")
    assert(p.contains("ReadSchema: struct<doc_id:bigint,lang:string>"),
      s"ORC scan reads more than the projected columns:\n$p")
    // and the round-trip is lossless vs the parquet original
    val orig = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .selectExpr("doc_id", "md5(text) m", "lang", "source", "n_chars")
      .collect().map(_.toSeq).toSet
    val back = graft.sources.OrcIO.readDocuments(spark, dir)
      .selectExpr("doc_id", "md5(text) m", "lang", "source", "n_chars")
      .collect().map(_.toSeq).toSet
    assert(back === orig, "ORC round-trip must be lossless")
  }

  test("semanticDedup cell assignment is the native codegen argmax (no ScalaUDF)") {
    import spark.implicits._
    // parquet-backed input: a toy LocalRelation would be folded by
    // ConvertToLocalRelation and hide the assignment projection entirely
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    val out = graft.pipeline.Dedup.semanticDedup(emb, numCells = 4,
      threshold = 0.99, iters = 0, sampleSize = 100)
    val p = executedPlan(out)
    assert(!p.contains("ScalaUDF") && !p.contains("BatchEvalPython"),
      s"semanticDedup cell assignment fell back to a UDF:\n$p")
    assert(p.contains("graft_cosine_argmax"),
      s"native argmax missing from the assignment projection:\n$p")
    // codegen and the driver trainer's own assignment loop agree exactly
    // (the dedup_semantic oracle depends on cells not drifting)
    val cents = Ann.trainCentroidsSpherical(emb, "embedding", 4,
      iters = 0, sampleSize = 100)
    import org.apache.spark.sql.GraftColumnBridge
    val assigned = emb.select(col("vec_id"), GraftColumnBridge.column(
        graft.functions.CosineArgmax(
          GraftColumnBridge.expression(col("embedding")), cents)).as("cell"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val raw = emb.collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    raw.foreach { case (id, v) =>
      assert(assigned(id) === Ann.nearestCentroidCosine(v, cents),
        s"cell drift for vec $id")
    }
  }

  test("ANN brute force keeps the two-phase top-k (no global sort of all scores)") {
    import spark.implicits._
    val emb = (0 until 30).map { i =>
      (i.toLong, Array.tabulate(8)(d => math.sin(i * 31 + d).toFloat))
    }.toDF("vec_id", "embedding")
    val p = executedPlan(Ann.bruteForceTopK(emb, emb.filter(col("vec_id") < 3), 5))
    assert(p.contains("WindowGroupLimit"),
      s"brute-force top-k lost the per-partition pre-limit:\n$p")
    assert(!p.contains("Exchange SinglePartition") || !p.contains("GlobalLimit"),
      s"top-k funnels all scores through one task:\n$p")
    // the rerank scorer is the native codegen expression, not the 3-HOF
    // fold it replaced (three boxed lambda walks per pair)
    assert(p.contains("graft_cosine"),
      s"brute-force rerank lost the native cosine expression:\n$p")
    assert(!p.toLowerCase.contains("scalaudf"),
      s"UDF appeared in the ANN rerank plan:\n$p")
  }

  test("chunkDocuments is a pure narrow map — zero exchanges, no UDF") {
    val p = executedPlan(TextAnalysis.chunkDocuments(docsDF,
      chunkTokens = 4, strideTokens = 3, minTokens = 2))
    assert(!p.contains("Exchange"), s"chunking plan has a shuffle:\n$p")
    assert(!p.toLowerCase.contains("scalaudf"), s"UDF in chunking plan:\n$p")
  }

  test("kmeans assignment broadcasts the centroid side, never shuffles the corpus against it") {
    import spark.implicits._
    val emb = (0 until 60).map(i =>
      (i.toLong, Array.tabulate(4)(j => (i * 4 + j).toFloat / 100f)))
      .toDF("vec_id", "embedding")
    val p = executedPlan(Ann.kmeansReport(emb, k = 2, iters = 1))
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"),
      s"kmeans assignment pass lost the broadcast centroid side:\n$p")
    assert(!p.toLowerCase.contains("cartesianproduct"),
      s"kmeans assignment planned a shuffled cartesian product:\n$p")
    assert(!p.toLowerCase.contains("scalaudf"), s"UDF in kmeans plan:\n$p")
  }

  test("topOutliers plans the map-side TakeOrderedAndProject, not a global sort") {
    import spark.implicits._
    val emb = (0 until 60).map(i =>
      (i.toLong, Array.tabulate(4)(j => (i * 4 + j).toFloat / 100f)))
      .toDF("vec_id", "embedding")
    val p = executedPlan(Pca.topOutliers(emb, k = 5, iters = 1))
    assert(p.contains("TakeOrderedAndProject"),
      s"outlier top-k lost TakeOrderedAndProject:\n$p")
  }

  test("cumulative is ONE exchange (the user_id shuffle) and nothing else") {
    import spark.implicits._
    val events = (0 until 50).map(i =>
      (i.toLong, (i % 7).toLong, i.toLong * 1000000L, s"t${i % 2}", 1.0))
      .toDF("event_id", "user_id", "ts", "event_type", "value")
    val p = executedPlan(Temporal.cumulative(events))
    val exchanges = "Exchange".r.findAllIn(p).length
    assert(exchanges <= 2, // hashpartition + the local coalesce Spark may add
      s"cumulative picked up extra shuffles ($exchanges):\n$p")
    assert(p.contains("RunningWindowFunction") || p.contains("Window"),
      s"cumulative lost the running window:\n$p")
  }

  test("routed knn graph plans a cell-keyed equi-join — no cartesian, no corpus BNLJ") {
    import spark.implicits._
    val emb = (0 until 60).map { i =>
      val raw = Array.tabulate(8)(j => math.sin(i * 8 + j + 1).toFloat)
      val n = math.sqrt(raw.map(x => x.toDouble * x).sum).toFloat
      (i.toLong, raw.map(_ / n))
    }.toDF("vec_id", "embedding")
    val p = executedPlan(Ann.knnGraphRouted(emb, k = 2, numCentroids = 4,
      nprobe = 2, m = 4, pqCentroids = 4, sampleSize = 100))
    assert(!p.toLowerCase.contains("cartesianproduct"),
      s"routed knn graph planned an all-pairs join:\n$p")
    assert(!p.contains("BroadcastNestedLoopJoin"),
      s"routed knn graph planned a nested-loop join:\n$p")
    assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin") ||
      p.contains("BroadcastHashJoin"),
      s"routed knn graph lost the cell-keyed equi-join:\n$p")
    // cell assignment / probe routing / PQ encode are native codegen
    // expressions — a boxed-Seq UDF here made the build throughput FALL
    // between 16x and 64x replication (ScaleCheck, round 10)
    assert(!p.contains("ScalaUDF") && !p.contains("BatchEvalPython"),
      s"routed knn graph routing fell back to a UDF:\n$p")
  }

  test("tokenBudget plans the keyed two-phase prefix sum — no Window operator") {
    import spark.implicits._
    val d = (0 until 80).map(i => (i.toLong, s"s${i % 3}", 5L + i % 4))
      .toDF("doc_id", "source", "n_tokens")
    val p = executedPlan(Sampling.tokenBudget(d, "source", "n_tokens",
      Map("s0" -> 50L, "s1" -> 40L), numPartitions = 4))
    assert(!p.contains("Window"),
      s"tokenBudget fell back to a per-source window (one task per source):\n$p")
    assert(p.contains("RangePartitioning") || p.contains("rangepartitioning"),
      s"tokenBudget lost the range partitioning both passes pin to:\n$p")
  }

  test("logisticGd's gradient pass is one map-side-combined aggregation") {
    import spark.implicits._
    val d = (0 until 60).map(i => (if (i % 2 == 0) 1.0 else 0.0,
      (i % 7).toDouble, (i % 11).toDouble)).toDF("y", "x1", "x2")
    val out = Regression.logisticGd(d, "y", Seq("x1", "x2"), iters = 1, lr = 1e-4)
    assert(out.count() === 3) // intercept + 2 features for the 1 iteration
    // weights move off zero deterministically
    val w = out.collect().map(r => r.getString(1) -> r.getDouble(2)).toMap
    assert(w.values.exists(_ != 0.0), s"no gradient signal: $w")
    val again = Regression.logisticGd(d.repartition(7), "y", Seq("x1", "x2"),
      iters = 1, lr = 1e-4).collect().map(r => r.getString(1) -> r.getDouble(2)).toMap
    assert(again === w, "logisticGd not partitioning-invariant")
  }

  test("containment candidate join is a shuffled equi-join on the shingle key, no BNLJ") {
    val p = executedPlan(Dedup.containment(docsDF, shingleSize = 3,
      threshold = 0.1, maxDocFreq = 50))
    assert(!p.contains("BroadcastNestedLoopJoin") &&
      !p.toLowerCase.contains("cartesianproduct"),
      s"containment planned an all-pairs join:\n$p")
    assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin") ||
      p.contains("BroadcastHashJoin"),
      s"containment lost the keyed equi-join:\n$p")
  }

  test("duplicatedSpans candidate join is keyed on the gram hash, no all-pairs") {
    val p = executedPlan(Dedup.duplicatedSpans(docsDF, k = 3,
      minSpanTokens = 3, maxDocFreq = 50))
    assert(!p.contains("BroadcastNestedLoopJoin") &&
      !p.toLowerCase.contains("cartesianproduct"),
      s"duplicatedSpans planned an all-pairs join:\n$p")
    assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin") ||
      p.contains("BroadcastHashJoin"),
      s"duplicatedSpans lost the keyed equi-join:\n$p")
  }

  test("keySkew takes its global top-k as TakeOrderedAndProject, no single-task sort") {
    val p = executedPlan(Diagnostics.keySkew(docsDF, "source", topK = 5))
    assert(p.contains("TakeOrderedAndProject"),
      s"keySkew lost the map-side partial top-k:\n$p")
  }

  test("auc windows over the distinct-score table, never the corpus") {
    // the only Window operator must sit ABOVE the (metric, score)
    // aggregate — i.e. its input is the grouped table, not raw rows
    val d = docsDF.select(
      when(col("source") === "src0", 1L).otherwise(0L).as("y"),
      col("doc_id").as("s1"))
    val p = executedPlan(Regression.auc(d, "y", Seq("s1")))
    val lines = p.linesIterator.toVector
    val wIdx = lines.indexWhere(_.contains("Window"))
    assert(wIdx >= 0, s"auc lost its prefix-sum window:\n$p")
    // children print below their parent: the window's input must contain
    // the (metric, score) HashAggregate rollup
    assert(lines.drop(wIdx + 1).exists(_.contains("HashAggregate")),
      s"auc window runs over raw rows, not the distinct-score rollup:\n$p")
  }

  private lazy val embDF = {
    import spark.implicits._
    (0 until 40).map(i => (i.toLong,
      Array(math.cos(i * 0.3).toFloat, math.sin(i * 0.3).toFloat, 0.5f),
      (i % 4).toLong)).toDF("vec_id", "embedding", "label")
  }

  test("canonicalUrlCol + urlExact: one hash-groupBy, no UDF, no window, no join") {
    import spark.implicits._
    val urls = (0 until 30).map(i =>
      (i.toLong, s"HTTPS://WWW.Site$i.COM:443/p/$i/?utm_source=x&a=1"))
      .toDF("doc_id", "url")
    val p = executedPlan(Dedup.urlExact(urls))
    assert(!p.contains("ScalaUDF") && !p.contains("BatchEvalPython"),
      s"canonical URL fold fell out of codegen into a UDF:\n$p")
    assert(!p.contains("Window") && !p.contains("Join"),
      s"urlExact should be a single keyed aggregate:\n$p")
    assert(p.contains("HashAggregate"), s"urlExact lost map-side combine:\n$p")
  }

  test("incrementalUrl: key-equi joins only — no cartesian, no window") {
    import spark.implicits._
    val idx = (0 until 20).map(i =>
      (s"https://site$i.com/p", i.toLong)).toDF("canonical_url", "canonical_id")
    val batch = (0 until 15).map(i =>
      (100L + i, s"https://www.site$i.com/p/")).toDF("doc_id", "url")
    val p = executedPlan(Dedup.incrementalUrl(idx, batch))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoop"),
      s"incrementalUrl planned an all-pairs join:\n$p")
    assert(!p.contains("Window"), s"incrementalUrl uses a window:\n$p")
  }

  test("UnicodeNormalize stays inside codegen — no UDF in the NFC dedup plan") {
    val p = executedPlan(Dedup.exact(docsDF, unicodeForm = Some("NFC")))
    assert(!p.contains("ScalaUDF") && !p.contains("BatchEvalPython"),
      s"unicode normalization fell out of codegen:\n$p")
    assert(p.contains("HashAggregate"), s"exact dedup lost map-side combine:\n$p")
  }

  test("softDedup: hash-agg + key join + narrow filter — no window, no cartesian") {
    val p = executedPlan(Sampling.softDedup(docsDF, salt = "s"))
    assert(!p.contains("Window") && !p.contains("CartesianProduct"),
      s"softDedup picked a window/cartesian plan:\n$p")
    assert(p.contains("HashAggregate"), s"softDedup lost map-side combine:\n$p")
  }

  test("readability is one narrow codegen projection — zero exchanges, no UDF") {
    val p = executedPlan(TextAnalysis.readability(docsDF))
    assert(!p.contains("Exchange"), s"readability plan shuffles:\n$p")
    assert(!p.contains("ScalaUDF") && !p.contains("BatchEvalPython"),
      s"readability fell out of codegen:\n$p")
  }

  test("rfm: single keyed aggregate, fixed-rule scores — no window, no ntile") {
    import spark.implicits._
    val ev = (0 until 60).map(i => (i.toLong % 7, "purchase",
      1000000000000000L + i.toLong * 86400000000000L, 10.0 + i))
      .toDF("user_id", "event_type", "ts", "value")
    val p = executedPlan(Temporal.rfm(ev, col("event_type") === "purchase"))
    assert(!p.contains("Window"), s"rfm plan uses a window:\n$p")
    assert(p.contains("HashAggregate"), s"rfm lost map-side combine:\n$p")
  }

  test("knnClassify broadcasts the train seed set — the corpus never shuffles against it") {
    val p = executedPlan(Ann.knnClassify(
      embDF.filter(col("vec_id") < 10), embDF.filter(col("vec_id") >= 10), k = 3))
    assert(p.contains("BroadcastExchange"),
      s"knn train side is not broadcast:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("SortMergeJoin"),
      s"knn scoring shuffles or goes cartesian:\n$p")
  }

  test("knnClassify(broadcastTrain=false) broadcasts the bounded query side " +
      "and the corpus-sized train table only scans") {
    // the ml_knn entry direction: held-out queries are the small side
    val p = executedPlan(Ann.knnClassify(
      embDF.filter(col("vec_id") >= 10), embDF.filter(col("vec_id") < 10),
      k = 3, broadcastTrain = false))
    assert(p.contains("BroadcastExchange"),
      s"knn query side is not broadcast:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("SortMergeJoin"),
      s"knn scoring shuffles or goes cartesian:\n$p")
    // both directions produce identical votes
    val a = Ann.knnClassify(embDF.filter(col("vec_id") >= 10),
      embDF.filter(col("vec_id") < 10), k = 3, broadcastTrain = false)
      .orderBy(col("query_id")).collect().toSeq
    val b = Ann.knnClassify(embDF.filter(col("vec_id") >= 10),
      embDF.filter(col("vec_id") < 10), k = 3, broadcastTrain = true)
      .orderBy(col("query_id")).collect().toSeq
    assert(a == b, s"broadcast direction changed the votes:\n$a\nvs\n$b")
  }

  test("phashPairs candidate join is band-keyed — no cartesian, no BNLJ") {
    import spark.implicits._
    val media = (0 until 30).map { i =>
      val raster = Array.tabulate(8 * 8 * 3)(j => ((i * 131 + j * 17) % 256))
      val out = new java.io.ByteArrayOutputStream()
      out.write("P6\n8 8\n255\n".getBytes); raster.foreach(out.write)
      (i.toLong, out.toByteArray)
    }.toDF("media_id", "payload")
    val p = executedPlan(Multimodal.phashPairs(
      Multimodal.imagePhash(media), maxHamming = 4))
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      s"phash pair generation is all-pairs:\n$p")
  }

  test("hits iterations never window — scores normalize via a broadcast 1-row aggregate") {
    import spark.implicits._
    val edges = (0 until 30).map(i =>
      (s"d${i % 5}", s"t${i % 7}", 1.0)).toDF("src", "dst", "weight")
    val p = executedPlan(Graph.hits(edges, iters = 2))
    assert(!p.contains("Window"), s"hits picked up a window:\n$p")
  }

  test("collocations and importanceSample take their top-k as TakeOrderedAndProject") {
    val p1 = executedPlan(TextAnalysis.collocations(docsDF, minCount = 1,
      topK = 5))
    assert(p1.contains("TakeOrderedAndProject"),
      s"collocations lost the two-phase top-k:\n$p1")
    assert(!p1.contains("Window"), s"collocations picked up a window:\n$p1")
    import spark.implicits._
    val d = docsDF.withColumn("lang",
      when(col("doc_id") % 2 === 0, "en").otherwise("de"))
    val p2 = executedPlan(Sampling.importanceSample(d, col("lang") === "en",
      topK = 5))
    assert(p2.contains("TakeOrderedAndProject"),
      s"importanceSample lost the two-phase top-k:\n$p2")
    assert(!p2.contains("Window"), s"importanceSample picked up a window:\n$p2")
    spark.catalog.clearCache() // release importanceSample's bigram persist
  }

  test("charEntropy is a pure narrow projection — zero exchanges, no UDF") {
    val p = executedPlan(TextAnalysis.charEntropy(docsDF))
    assert(!p.contains("Exchange"), s"charEntropy picked up a shuffle:\n$p")
    assert(!p.contains("ScalaUDF"), s"charEntropy has a UDF:\n$p")
  }

  test("fuzzyEditPairs: band-keyed equi-joins only — no cartesian, no BNLJ") {
    val p = executedPlan(Dedup.fuzzyEditPairs(docsDF, maxDist = 8))
    assert(!p.contains("CartesianProduct"), s"fuzzyEditPairs cartesian:\n$p")
    assert(!p.contains("BroadcastNestedLoopJoin"),
      s"fuzzyEditPairs all-pairs join:\n$p")
    // the prefix rides through the band join: no post-candidate corpus
    // lookup joins (3 joins total: cap semi-join + the pair self-join)
    val joins = "Join".r.findAllIn(p).size
    assert(joins <= 6, s"fuzzyEditPairs re-joins the corpus after blocking:\n$p")
    spark.catalog.clearCache() // release the banded persist
  }

  test("sourceOverlap: corpus work is keyed — cross products only over the group frame") {
    val p = executedPlan(Dedup.sourceOverlap(docsDF))
    // the group-pair frame (sources × sources) is legitimately unkeyed;
    // the corpus-sized work must stay keyed: no cartesian (the pair
    // frame uses BNLJ over two 1-row-per-source aggregates), and the
    // per-source sketch window must not degenerate to a single task
    assert(!p.contains("CartesianProduct"), s"sourceOverlap cartesian:\n$p")
    // the one corpus shuffle carries digests, not raw text
    val exchanges = p.linesIterator.filter(_.contains("Exchange")).toSeq
    assert(!exchanges.exists(_.contains("text#")),
      s"sourceOverlap shuffles raw text:\n$p")
    spark.catalog.clearCache() // release the hash-table persist
  }

  test("filteredTopK pushes the metadata predicate to the parquet scan") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_annf").toString
    (0 until 20).map(i => (i.toLong, Array(i.toFloat, 1.0f), i % 3))
      .toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(dir)
    val emb = spark.read.parquet(dir)
    val df = Ann.filteredTopK(emb, emb.filter(col("vec_id") < 2), k = 3,
      col("label") === 1)
    val p = executedPlan(df)
    assert(p.contains("PushedFilters") && p.contains("EqualTo(label,1)"),
      s"filteredTopK's predicate did not reach the scan:\n$p")
  }

  test("zipfSlope keeps the per-source top-N as WindowGroupLimit") {
    val p = executedPlan(TextAnalysis.zipfSlope(docsDF, topN = 5))
    assert(p.contains("WindowGroupLimit"),
      s"zipfSlope lost the partial top-N:\n$p")
  }

  test("sq8 encode is narrow; search has no UDF and broadcasts the query side") {
    val codes = Ann.sq8Encode(embDF)
    val pEnc = executedPlan(codes)
    assert(!pEnc.contains("ScalaUDF"), s"sq8Encode has a UDF:\n$pEnc")
    val pTop = executedPlan(Ann.sq8TopK(codes,
      codes.filter(col("id") < 2), k = 3))
    assert(!pTop.contains("ScalaUDF"), s"sq8TopK has a UDF:\n$pTop")
    assert(pTop.contains("WindowGroupLimit"),
      s"sq8TopK lost the two-phase top-k:\n$pTop")
    assert(pTop.contains("Broadcast"),
      s"sq8TopK does not broadcast the query side:\n$pTop")
  }

  test("adamicAdar wedges are keyed equi-joins — no cartesian, no BNLJ") {
    import spark.implicits._
    val edges = (0 until 30).map(i => (i.toLong, ((i + 1) % 30).toLong))
      .toDF("src", "dst")
    val p = executedPlan(Graph.adamicAdar(edges))
    assert(!p.contains("CartesianProduct"),
      s"adamicAdar plans a cartesian:\n$p")
    assert(!p.contains("BroadcastNestedLoop"),
      s"adamicAdar plans a BNLJ:\n$p")
  }

  test("jaccardSimilarity wedges are keyed equi-joins — no cartesian, no BNLJ") {
    import spark.implicits._
    val edges = (0 until 30).map(i => (i.toLong, ((i + 1) % 30).toLong))
      .toDF("src", "dst")
    val p = executedPlan(Graph.jaccardSimilarity(edges))
    assert(!p.contains("CartesianProduct"),
      s"jaccardSimilarity plans a cartesian:\n$p")
    assert(!p.contains("BroadcastNestedLoop"),
      s"jaccardSimilarity plans a BNLJ:\n$p")
  }

  private lazy val emb4DF = {
    import spark.implicits._
    (0 until 40).map(i => (i.toLong,
      Array(math.cos(i * 0.3).toFloat, math.sin(i * 0.3).toFloat,
        math.cos(i * 0.7).toFloat, math.sin(i * 0.7).toFloat)))
      .toDF("vec_id", "embedding")
  }

  test("encodeIntoIndex is a pure narrow projection — zero exchanges, no UDF") {
    val idx = Ann.buildIvfPq(emb4DF, numCentroids = 4, m = 2,
      pqCentroids = 4, iters = 0, pqIters = 0, sampleSize = 100)
    val p = executedPlan(Ann.encodeIntoIndex(idx, emb4DF))
    assert(!p.contains("Exchange"),
      s"incremental encode picked up a shuffle:\n$p")
    assert(!p.contains("ScalaUDF"), s"incremental encode has a UDF:\n$p")
  }

  test("ivfPqRerank: both rank stages keep the partial top-k, raw join is keyed") {
    val p = executedPlan(Ann.ivfPqRerank(emb4DF,
      emb4DF.filter(col("vec_id") < 2), k = 3, overfetch = 9,
      numCentroids = 4, nprobe = 2, m = 2, pqCentroids = 4,
      iters = 0, pqIters = 0, sampleSize = 100))
    assert(p.contains("WindowGroupLimit"),
      s"rerank lost the partial top-k:\n$p")
    assert(!p.contains("CartesianProduct"),
      s"rerank raw-vector stage plans a cartesian:\n$p")
    assert(!p.contains("ScalaUDF"), s"rerank has a UDF:\n$p")
  }

  test("Kneser-Ney LM scoring joins stay keyed — no cartesian") {
    val p = executedPlan(
      TextAnalysis.lmPerplexityKneserNey(docsDF, trainRate = 0.5))
    assert(!p.contains("CartesianProduct"),
      s"KN scoring plans a cartesian:\n$p")
  }

  test("shardManifest: per-doc half is narrow, rollup never a single-task window") {
    val pd = executedPlan(
      Sampling.shardManifestPerDoc(docsDF, "doc_id", "text", 8, "s"))
    assert(!pd.contains("Exchange"),
      s"manifest per-doc half picked up a shuffle:\n$pd")
    val pm = executedPlan(
      Sampling.shardManifest(docsDF, "doc_id", "text", 8, "s"))
    assert(!pm.contains("SinglePartition") && !pm.contains("Window"),
      s"manifest rollup degenerated to a window/global sort:\n$pm")
  }

  test("hardNegatives keeps the two-phase top-k under the ceiling filter") {
    val p = executedPlan(Ann.hardNegatives(embDF,
      embDF.filter(col("vec_id") < 2), k = 3, maxCosine = 0.99))
    assert(p.contains("WindowGroupLimit"),
      s"hardNegatives lost the partial top-k:\n$p")
    assert(!p.contains("ScalaUDF"), s"hardNegatives has a UDF:\n$p")
  }

  test("noveltyScore broadcasts the benchmark pool — the gram join is never sort-merge") {
    val p = executedPlan(Dedup.noveltyScore(
      docsDF.filter(col("doc_id") >= 3), docsDF.filter(col("doc_id") < 3), n = 3))
    // the pool side may shuffle for its own distinct (pool-sized); the
    // corpus gram stream must meet it through a broadcast join — a
    // sort-merge join on g would mean the exploded corpus stream was
    // written as a shuffle map stage (the decontaminate rationale)
    assert(p.contains("BroadcastHashJoin"),
      s"noveltyScore lost the broadcast pool join:\n$p")
    assert(!p.contains("SortMergeJoin"),
      s"noveltyScore sort-merges the gram stream:\n$p")
  }
}
