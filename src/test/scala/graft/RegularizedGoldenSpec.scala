package graft

import org.apache.spark.sql.functions._
import graft.operators._
import graft.sources.SyntheticCollection

/** Regularized golden trajectory — the synthetic-collection counterpart of
  * the reference's kos regularized test (python/tests/artm/
  * test_artm_model.py:30-175: SmoothSparsePhi + DecorrelatorPhi lowering
  * perplexity/raising sparsity along a frozen trajectory).
  *
  * Why these goldens are engine-frozen, not reference-emitted (checked
  * again round 3): (a) kos needs a network fetch
  * (test_data/download_datasets.sh) and the sandbox has zero egress;
  * (b) building the reference binary to run it on the committed synthetic
  * collection is also impossible in-sandbox — no cmake on PATH and no
  * Boost anywhere (`find_package(Boost REQUIRED)` in the root
  * CMakeLists; 3rdparty vendors only gflags/glog/gtest/protobuf).
  * What pins the regularized path to the reference instead:
  *  - the UNregularized synthetic trajectory 54.616→20.581 matches the
  *    reference-published numbers at ±0.002 (SyntheticGoldenSpec, pass 0
  *    here is that same 54.616);
  *  - the regularizer arithmetic is verified exactly against
  *    hand-computed reference formulas (second test below);
  *  - the full regularized fit is pinned to the DuckDB-verified
  *    relational mirror at ~5e-8 (RelationalParitySpec regularized case
  *    + the artm_fit_regularized / artm_fit_regularized_kernel oracle
  *    rows).
  * The frozen trajectory's remaining job is regression-pinning: any
  * τ-scaling or sign regression in regularize→normalize breaks it at
  * the 4th decimal. */
class RegularizedGoldenSpec extends SparkSpec {

  val goldenPerplexity = Seq(54.6161, 38.1686, 28.4631, 24.3160,
    22.4173, 21.1942, 20.7980, 20.7323)
  val goldenSparsity = 0.586667
  val plainSparsity = 0.520000

  test("regularized fit reproduces the frozen trajectory and raises sparsity") {
    val docs = SyntheticCollection.dataset(spark, numPartitions = 1).cache()
    val dict = DictionaryOps.gather(docs).cache()
    val pwt0 = PhiOps.initializeModel(dict, numTopics = 10, seed = -1)
    val res = Fit.fitOffline(docs, pwt0, Fit.Config(
      numTopics = 10, numCollectionPasses = 8,
      estep = EStepConfig(numDocumentPasses = 10),
      phiRegularizers = Seq(
        (graft.regularizers.SmoothSparsePhi(), -0.1f),
        (graft.regularizers.DecorrelatorPhi(), 100f)),
      dictionary = Some(dict)))

    res.scores.map(_.perplexity).zip(goldenPerplexity).zipWithIndex.foreach {
      case ((got, exp), i) =>
        info(f"pass $i: expected $exp%.4f got $got%.4f")
        assert(math.abs(got - exp) < 0.01, s"pass $i: expected $exp got $got")
    }
    val sparsity = graft.scores.Scores.sparsityPhi(res.pwt).head().getDouble(2)
    info(f"sparsity: $sparsity%.6f (plain fit: $plainSparsity%.6f)")
    assert(math.abs(sparsity - goldenSparsity) < 0.001)
    assert(sparsity > plainSparsity + 0.05, "regularizers failed to raise sparsity")
  }

  test("one regularize+normalize step matches hand-computed values exactly") {
    import spark.implicits._
    // 2 tokens × 2 topics; nwt and pwt chosen by hand
    val nwt = Seq(("c", "a", Array(4.0f, 1.0f)), ("c", "b", Array(2.0f, 3.0f)))
      .toDF("class_id", "token", "weights")
    val pwt = Seq(("c", "a", Array(0.6f, 0.2f)), ("c", "b", Array(0.4f, 0.8f)))
      .toDF("class_id", "token", "weights")
    val tauS = -0.5f
    val tauD = 2.0f
    val ctx = RegContext(spark, 2, Seq("t0", "t1"))
    val rwt = PhiOps.mergeModels(Seq(
      (graft.regularizers.SmoothSparsePhi()(pwt, nwt, ctx), tauS),
      (graft.regularizers.DecorrelatorPhi()(pwt, nwt, ctx), tauD)))
    val result = PhiOps.normalizeModel(nwt, Some(rwt))
      .collect().map(r => (r.getString(1), r.getSeq[Float](2))).toMap

    // hand computation (reference formulas):
    //   r = τs·1 + τd·(−p·(Σ_s p_ws − p));  p' = max(n+r, 0)/Σ_w max(n+r, 0)
    def r(p: Float, rowSum: Float): Float = tauS * 1.0f + tauD * (-p * (rowSum - p))
    val adjA = Array(4.0f + r(0.6f, 0.8f), 1.0f + r(0.2f, 0.8f))
    val adjB = Array(2.0f + r(0.4f, 1.2f), 3.0f + r(0.8f, 1.2f))
    val col0 = adjA(0) + adjB(0)
    val col1 = adjA(1) + adjB(1)
    val expected = Map(
      "a" -> Seq(adjA(0) / col0, adjA(1) / col1),
      "b" -> Seq(adjB(0) / col0, adjB(1) / col1))
    expected.foreach { case (tok, exp) =>
      exp.zip(result(tok)).zipWithIndex.foreach { case ((e, g), t) =>
        info(f"$tok/$t: expected $e%.6f got $g%.6f")
        assert(math.abs(e - g) < 1e-6, s"$tok topic $t: expected $e got $g")
      }
    }
  }
}
