package graft

import org.apache.spark.sql.functions._
import graft.operators._
import graft.sources.Corpus

/** Run-reproducibility of the float32 kernel fit (round 11).
  *
  * The reference guarantees "identical model for fixed seed" only at
  * num_processors=1 (artm_tests/repeatable_result_test.cc:27 pins it);
  * with threads, its spinlocked float adds race. This engine goes
  * further: every float32 reduction feeding the model folds in a
  * deterministic key order (VectorOps.orderedVectorSum — E-step
  * partition ordinals for n_wt, token order for normalizers, source
  * ordinals for merges), so the SAME fit is bit-identical run-to-run at
  * ANY executor count. Found the hard way: under local-cluster[2,4],
  * task-completion racing flipped 22/31 phi rows between two identical
  * fits before the ordered folds landed.
  *
  * This spec refits twice and diffs bit-exactly. It runs under the
  * suite's default local[4] AND under SPARK_GRAFT_TEST_MASTER=
  * local-cluster[...] (the multi-JVM certification pass), where the
  * racing is real.
  */
class DeterminismSpec extends SparkSpec {

  test("refit of the same regularized config is bit-identical (any scheduling)") {
    val docsTable = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val corpus = Corpus.fromDocumentsTable(docsTable).cache()
    val dict = DictionaryOps.gather(corpus).cache()
    val pwt0 = PhiOps.initializeModel(dict, numTopics = 8, seed = 3)
    val cfg = Fit.Config(numTopics = 8, numCollectionPasses = 3,
      estep = EStepConfig(numDocumentPasses = 2),
      phiRegularizers = Seq(
        (graft.regularizers.SmoothSparsePhi(), -0.05f),
        (graft.regularizers.DecorrelatorPhi(), 10f)))
    val a = Fit.fitOffline(corpus, pwt0, cfg)
    val b = Fit.fitOffline(corpus, pwt0, cfg)
    def key(df: org.apache.spark.sql.DataFrame) =
      df.select(col("class_id"), col("token"), col("weights"))
    val diff = key(a.pwt).unionByName(key(b.pwt))
      .groupBy(col("class_id"), col("token"), col("weights"))
      .count().filter(col("count") =!= 2).count()
    assert(diff === 0L, s"refit changed $diff phi rows — a float reduction is racing")
    // the tracker reproduces too (double score sums over the same model)
    assert(a.scores.map(_.perplexity) === b.scores.map(_.perplexity))
  }

  test("refit is bit-identical at a second shuffle-partition setting") {
    // the ordered folds key by data (partition ordinals / tokens), so the
    // reduce-side partition COUNT must not matter; run the same
    // refit-twice certification at a deliberately odd setting
    val key = "spark.sql.shuffle.partitions"
    val prev = spark.conf.get(key)
    spark.conf.set(key, "5")
    try {
      val docsTable = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      val corpus = graft.sources.Corpus.fromDocumentsTable(docsTable).cache()
      val dict = DictionaryOps.gather(corpus).cache()
      val pwt0 = PhiOps.initializeModel(dict, numTopics = 8, seed = 3)
      val cfg = Fit.Config(numTopics = 8, numCollectionPasses = 2,
        estep = EStepConfig(numDocumentPasses = 2),
        phiRegularizers = Seq((graft.regularizers.SmoothSparsePhi(), -0.05f)))
      val a = Fit.fitOffline(corpus, pwt0, cfg)
      val b = Fit.fitOffline(corpus, pwt0, cfg)
      def key2(df: org.apache.spark.sql.DataFrame) =
        df.select(col("class_id"), col("token"), col("weights"))
      val diff = key2(a.pwt).unionByName(key2(b.pwt))
        .groupBy(col("class_id"), col("token"), col("weights"))
        .count().filter(col("count") =!= 2).count()
      assert(diff === 0L, s"refit at 5 shuffle partitions changed $diff phi rows")
      assert(a.scores.map(_.perplexity) === b.scores.map(_.perplexity))
    } finally spark.conf.set(key, prev)
  }

  test("refit is bit-identical when the tree fold engages (>128 E-step partitions)") {
    // 160 corpus partitions -> 320 fold keys > FoldWidth=256: the n_wt
    // fold runs TWO tree levels in a real fit (not just the synthetic
    // orderedTreeFold probe) — certify refit bit-equality there too
    val docsTable = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val corpus = graft.sources.Corpus.fromDocumentsTable(docsTable)
      .repartition(160).cache()
    val dict = DictionaryOps.gather(corpus).cache()
    val pwt0 = PhiOps.initializeModel(dict, numTopics = 8, seed = 3)
    val cfg = Fit.Config(numTopics = 8, numCollectionPasses = 2,
      estep = EStepConfig(numDocumentPasses = 1))
    val a = Fit.fitOffline(corpus, pwt0, cfg)
    val b = Fit.fitOffline(corpus, pwt0, cfg)
    def key(df: org.apache.spark.sql.DataFrame) =
      df.select(col("class_id"), col("token"), col("weights"))
    val diff = key(a.pwt).unionByName(key(b.pwt))
      .groupBy(col("class_id"), col("token"), col("weights"))
      .count().filter(col("count") =!= 2).count()
    assert(diff === 0L, s"tree-fold refit changed $diff phi rows")
    corpus.unpersist(); dict.unpersist()
  }

  test("join-phi refit with orderedJoinPhi is bit-identical (the huge-vocab path)") {
    // round 12: the join-based (distributed-Phi) path kept the raced
    // streaming sum through round 11 because a single-level ordered fold
    // would buffer df(token) rows per group; the doc-keyed TREE fold +
    // hash-ranged normalizer close that — certify refit bit-equality
    // with the joint path forced (maxBroadcastRows = 0)
    val docsTable = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val corpus = graft.sources.Corpus.fromDocumentsTable(docsTable).cache()
    val dict = DictionaryOps.gather(corpus).cache()
    val pwt0 = PhiOps.initializeModel(dict, numTopics = 8, seed = 3)
    val cfg = Fit.Config(numTopics = 8, numCollectionPasses = 2,
      estep = EStepConfig(numDocumentPasses = 2),
      phiRegularizers = Seq((graft.regularizers.SmoothSparsePhi(), -0.05f)),
      maxBroadcastRows = 0L, orderedJoinPhi = true)
    val a = Fit.fitOffline(corpus, pwt0, cfg)
    val b = Fit.fitOffline(corpus, pwt0, cfg)
    def key(df: org.apache.spark.sql.DataFrame) =
      df.select(col("class_id"), col("token"), col("weights"))
    val diff = key(a.pwt).unionByName(key(b.pwt))
      .groupBy(col("class_id"), col("token"), col("weights"))
      .count().filter(col("count") =!= 2).count()
    assert(diff === 0L, s"ordered join-phi refit changed $diff phi rows")
    assert(a.scores.map(_.perplexity) === b.scores.map(_.perplexity))
  }

  test("orderedTreeFold: partitioning-independent bits, buffer <= FoldWidth per group") {
    import spark.implicits._
    val T = 4
    val span = 1000L // > FoldWidth -> two levels
    val rows = (0L until span).map { k =>
      ("c", "tok", k, Array.tabulate(T)(t => ((k * 31 + t) % 97).toFloat / 7f))
    }
    val df = rows.toDF("class_id", "token", "fk", "vec")
    def run(parts: Int): Array[Float] = {
      graft.functions.VectorOps.maxOrderedBuffer.set(0)
      EStep.orderedTreeFold(df.repartition(parts), span)
        .collect().head.getSeq[Float](2).toArray
    }
    graft.functions.VectorOps.bufferProbeEnabled = true
    try {
      val a = run(3)
      assert(graft.functions.VectorOps.maxOrderedBuffer.get() <= EStep.FoldWidth,
        "a tree-fold level buffered more than FoldWidth partials")
      val b = run(17)
      assert(java.util.Arrays.equals(a, b),
        "tree fold bits changed with input partitioning")
      // expected: the same tree computed locally — ranges of FoldWidth
      // folded in key order, then range sums folded in range order
      val expected = (0L until span).grouped(EStep.FoldWidth).map { range =>
        val vs = range.map(k =>
          Array.tabulate(T)(t => ((k * 31 + t) % 97).toFloat / 7f))
        vs.reduce { (x, y) =>
          val o = x.clone(); var i = 0
          while (i < T) { o(i) += y(i); i += 1 }; o
        }
      }.reduce { (x, y) =>
        val o = x.clone(); var i = 0
        while (i < T) { o(i) += y(i); i += 1 }; o
      }
      assert(java.util.Arrays.equals(a, expected),
        "tree fold disagrees with the locally-computed key-ordered tree")
    } finally graft.functions.VectorOps.bufferProbeEnabled = false
  }

  test("topicKernel/coherence scores are bit-identical across shuffle topologies (§28 audit)") {
    // round-13 audit representative for the "instant score" family:
    // purity/contrast (topicKernel), the topicKernelFull averages row,
    // and topicCoherence's pair sum were plain double reductions — the
    // only remaining order-dependent-and-surfaced class after the
    // r11 (model float folds) and r12 (tracker double sums) catches.
    // With DECIMAL sums the values must be bit-equal at ANY reduce
    // topology; changing spark.sql.shuffle.partitions forces a
    // different merge order, so pre-fix this comparison flips last ulps
    // (and under local-cluster masters the race is real scheduling).
    val docsTable = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val corpus = Corpus.fromDocumentsTable(docsTable).cache()
    val dict = DictionaryOps.gather(corpus).cache()
    val pwt0 = PhiOps.initializeModel(dict, numTopics = 8, seed = 3)
    val cfg = Fit.Config(numTopics = 8, numCollectionPasses = 2,
      estep = EStepConfig(numDocumentPasses = 1))
    val f = Fit.fitOffline(corpus, pwt0, cfg)
    val pwt = f.pwt.cache(); val nwt = f.nwt.cache()
    pwt.count(); nwt.count()
    val cooc = Cooc.gather(corpus, windowWidth = 5).cache()
    cooc.count()
    val key = "spark.sql.shuffle.partitions"
    val prev = spark.conf.get(key)
    def scoresAt(parts: String): (Seq[String], Seq[String]) = {
      spark.conf.set(key, parts)
      val kern = graft.scores.Scores.topicKernelFull(pwt, nwt, cooc = Some(cooc))
        .collect().map(r => Seq(r.getInt(0),
          java.lang.Double.doubleToLongBits(r.getDouble(1)),
          java.lang.Double.doubleToLongBits(r.getDouble(2)),
          java.lang.Double.doubleToLongBits(r.getDouble(3)),
          if (r.isNullAt(4)) "null"
          else java.lang.Double.doubleToLongBits(r.getDouble(4))).mkString(","))
        .sorted.toSeq
      val coh = graft.scores.Scores.topTokensCoherence(pwt, cooc, k = 10)
        .collect().map(r => r.getInt(0) + "," +
          java.lang.Double.doubleToLongBits(r.getDouble(1))).sorted.toSeq
      (kern, coh)
    }
    try {
      val (k5, c5) = scoresAt("5")
      val (k31, c31) = scoresAt("31")
      assert(k5 === k31, "topicKernelFull bits changed with reduce topology")
      assert(c5 === c31, "topTokensCoherence bits changed with reduce topology")
    } finally spark.conf.set(key, prev)
    pwt.unpersist(); nwt.unpersist(); cooc.unpersist()
    corpus.unpersist(); dict.unpersist()
  }

  test("ordered fold rejects duplicate fold keys loudly") {
    import spark.implicits._
    val df = Seq(("c", "t", 0L, Array(1f)), ("c", "t", 0L, Array(2f)))
      .toDF("class_id", "token", "fk", "vec")
    val e = intercept[org.apache.spark.SparkException] {
      EStep.orderedTreeFold(df, 2L).collect()
    }
    assert(e.getMessage != null)
  }
}
