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
}
