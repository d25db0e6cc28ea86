package graft

import org.apache.spark.sql.functions._
import graft.operators._
import graft.regularizers._
import graft.scores.Scores
import graft.sources.SyntheticCollection

class RegularizerSpec extends SparkSpec {

  lazy val docs = SyntheticCollection.dataset(spark, numPartitions = 2).cache()
  lazy val dict = DictionaryOps.gather(docs).cache()

  def fit(regs: Seq[(PhiRegularizer, Float)] = Nil,
      agents: Seq[ThetaAgent] = Nil, passes: Int = 3): FitResult = {
    val pwt0 = PhiOps.initializeModel(dict, numTopics = 10, seed = -1)
    Fit.fitOffline(docs, pwt0, Fit.Config(
      numTopics = 10, numCollectionPasses = passes,
      estep = EStepConfig(numDocumentPasses = 5, thetaAgents = agents),
      phiRegularizers = regs, dictionary = Some(dict)))
  }

  test("SmoothSparsePhi with negative tau sparsifies phi") {
    val plain = fit()
    val sparse = fit(Seq((SmoothSparsePhi(), -2.0f)))
    val spPlain = Scores.sparsityPhi(plain.pwt).select("value").head().getDouble(0)
    val spReg = Scores.sparsityPhi(sparse.pwt).select("value").head().getDouble(0)
    info(s"sparsity plain=$spPlain regularized=$spReg")
    assert(spReg > spPlain)
    assert(!sparse.scores.last.perplexity.isNaN)
  }

  test("DecorrelatorPhi computes -p*(sum-p) row-locally") {
    import spark.implicits._
    val phi = Seq(
      graft.core.PhiRow("@default_class", "a", Array(0.5f, 0.3f, 0.2f))).toDF()
    val ctx = RegContext(spark, 3, Seq("t0", "t1", "t2"))
    val r = DecorrelatorPhi()(phi, phi, ctx).head()
    val w = r.getSeq[Float](2)
    assert(math.abs(w(0) - (-0.5f * 0.5f)) < 1e-6) // -0.5*(1.0-0.5)
    assert(math.abs(w(1) - (-0.3f * 0.7f)) < 1e-6)
    assert(math.abs(w(2) - (-0.2f * 0.8f)) < 1e-6)
  }

  test("SmoothSparseTheta with negative tau sparsifies theta") {
    val reg = fit(agents = Seq(SmoothSparseTheta(tau = -1.0f, numTopics = 10)))
    info(s"sparsity_theta=${reg.scores.last.sparsityTheta}")
    assert(reg.scores.last.sparsityTheta > 0.0)
  }

  test("TopTokens returns k per topic, weight-descending, and kernel scores are sane") {
    val res = fit()
    val top = Scores.topTokens(res.pwt, 4).cache()
    assert(top.groupBy("topic").count().agg(max("count")).head().getLong(0) <= 4)
    val weights = top.filter(col("topic") === 0).orderBy(col("rank")).select("weight")
      .collect().map(_.getFloat(0))
    assert(weights.sameElements(weights.sortBy(-_)))

    val kernel = Scores.topicKernel(res.pwt, res.nwt, threshold = 0.3)
    val contrast = kernel.agg(avg("contrast")).head().getDouble(0)
    assert(contrast > 0.3 && contrast <= 1.0)

    val mass = Scores.topicMassPhi(res.nwt)
    val ratios = mass.agg(sum("ratio")).head().getDouble(0)
    assert(math.abs(ratios - 1.0) < 1e-6)
  }

  test("SpecifiedSparsePhi keeps top-k mass and zeroes the rest") {
    val res = fit()
    val ctx = RegContext(spark, 10, (0 until 10).map(i => s"topic_$i"))
    val r = SpecifiedSparsePhi(maxElements = 3, probabilityThreshold = 1.0)(res.pwt, res.nwt, ctx)
    // increments must be -n_wt outside the kept cells and 0 inside
    val joined = r.withColumnRenamed("weights", "r")
      .join(res.nwt, Seq("class_id", "token"))
    val bad = joined.filter(expr(
      "exists(zip_with(r, weights, (x, n) -> abs(x) > 1e-6 AND abs(x + n) > 1e-4), b -> b)"))
    assert(bad.count() === 0)
    // per topic at most 3 kept (zero increments among nonzero nwt cells)
    val keptPerTopic = joined.select(posexplode(col("r")).as(Seq("topic", "x")),
        col("token"))
      .filter(col("x") === 0.0f)
      .groupBy("topic").count()
    assert(keptPerTopic.agg(max("count")).head().getLong(0) <= 3)
  }

  test("RelativeRegularization rescales per class/topic without NaN") {
    val res = fit(Seq((RelativeRegularization(DecorrelatorPhi(), gamma = 0.5f), 1000.0f)))
    assert(!res.scores.last.perplexity.isNaN)
    assert(res.scores.last.perplexity > 0)
  }
}
