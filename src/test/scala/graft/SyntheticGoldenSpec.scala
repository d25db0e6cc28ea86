package graft

import graft.operators._
import graft.sources.SyntheticCollection

/** Golden end-to-end fit: the reference's deterministic synthetic
  * collection must reproduce the published perplexity trajectory
  * (reference python/tests/wrapper/test_01_synthetic_collection.py:24-41,
  * BASELINE.md row "Synthetic perplexity trajectory"). */
class SyntheticGoldenSpec extends SparkSpec {

  val golden = Seq(54.616, 38.472, 28.655, 24.362, 22.355,
    21.137, 20.808, 20.791, 20.746, 20.581)

  test("synthetic collection reproduces the reference perplexity trajectory") {
    val docs = SyntheticCollection.dataset(spark, numPartitions = 1).cache()
    val dict = DictionaryOps.gather(docs)
    val pwt0 = PhiOps.initializeModel(dict, numTopics = 10, seed = -1)

    val cfg = Fit.Config(
      numTopics = 10,
      numCollectionPasses = 10,
      estep = EStepConfig(numDocumentPasses = 10))
    val res = Fit.fitOffline(docs, pwt0, cfg)

    val got = res.scores.map(_.perplexity)
    golden.zip(got).zipWithIndex.foreach { case ((exp, act), i) =>
      info(f"pass $i: expected $exp%.3f got $act%.3f")
      // reference's own per-pass eps is 0.001 (test_01_synthetic_collection
      // .py); goldens are published to 3 decimals, so allow the 0.0005
      // quantization plus float32 headroom
      assert(math.abs(exp - act) < 0.002, s"pass $i: expected $exp got $act")
    }

    // top-token weight ≈ 0.1 (tol 0.05) — test_01_synthetic_collection.py:43-44
    import org.apache.spark.sql.functions._
    val topW = res.pwt
      .select(explode(col("weights")).as("w")).agg(max("w")).head().getFloat(0)
    assert(math.abs(topW - 0.1) < 0.05)
  }
}
