package graft

import org.apache.spark.sql.functions._
import graft.core.ModelRegistry
import graft.operators._
import graft.regularizers._

/** Exact-value checks for the previously untested regularizers/scores:
  * each fixture is small enough to hand-compute the reference formula. */
class UntestedFringeValuesSpec extends SparkSpec {

  private def phiOf(rows: (String, String, Array[Float])*) = {
    import spark.implicits._
    rows.toSeq.toDF("class_id", "token", "weights")
  }
  private def ctx(t: Int) = RegContext(spark, t, (0 until t).map(i => s"t$i"))
  private def weightsOf(df: org.apache.spark.sql.DataFrame): Map[String, Seq[Float]] =
    df.collect().map(r => r.getString(1) -> r.getSeq[Float](2)).toMap

  test("ImproveCoherencePhi: r_w = Σ_v cooc(w,v)·n_vt") {
    import spark.implicits._
    val cooc = Seq(("c", "a", "b", 2.0f, 1.0f)).toDF(
      "class_id", "token_a", "token_b", "cooc_tf", "cooc_df")
    val nwt = phiOf(("c", "a", Array(5f, 5f)), ("c", "b", Array(1f, 2f)))
    val r = ImproveCoherencePhi()(nwt, nwt, ctx(2).copy(cooc = Some(cooc)))
    val w = weightsOf(r)
    assert(w("a") == Seq(2f, 4f), s"got ${w("a")}")
    assert(!w.contains("b")) // no cooc row with token_a = b
  }

  test("BitermsPhi: r_w = cooc·norm_t(n_t·p_w·p_u)") {
    import spark.implicits._
    val cooc = Seq(("c", "a", "b", 3.0f, 1.0f)).toDF(
      "class_id", "token_a", "token_b", "cooc_tf", "cooc_df")
    val pwt = phiOf(("c", "a", Array(0.5f, 0.5f)), ("c", "b", Array(0.8f, 0.2f)))
    val nwt = phiOf(("c", "a", Array(2f, 2f)), ("c", "b", Array(2f, 6f)))
    val r = BitermsPhi()(pwt, nwt, ctx(2).copy(cooc = Some(cooc)))
    val w = weightsOf(r)
    // n_t = (4, 8); ptuw = (4·.5·.8, 8·.5·.2) = (1.6, .8); contrib = (2/3, 1/3)
    assert(math.abs(w("a")(0) - 2f) < 1e-5 && math.abs(w("a")(1) - 1f) < 1e-5,
      s"got ${w("a")}")
  }

  test("SmoothTimeInTopicsPhi: lag/lead sign smoothing over token order") {
    val pwt = phiOf(("@default_class", "a", Array(0.1f)),
      ("@default_class", "b", Array(0.3f)), ("@default_class", "c", Array(0.2f)))
    val r = SmoothTimeInTopicsPhi()(pwt, pwt, ctx(1))
    val w = weightsOf(r)
    assert(math.abs(w("a")(0) - 0.1f) < 1e-6)   // 0.1·(0 + sign(0.3−0.1))
    assert(math.abs(w("b")(0) + 0.6f) < 1e-6)   // 0.3·(−1 + −1)
    assert(math.abs(w("c")(0) - 0.2f) < 1e-6)   // 0.2·(sign(0.3−0.2) + 0)
  }

  test("NetPlsaPhi: edge-weighted Laplacian pull with n_t² scaling") {
    import spark.implicits._
    val edges = Seq(("a", "b", 2.0f)).toDF("vertex_a", "vertex_b", "weight")
    val pwt = phiOf(("c", "a", Array(0.5f, 0.1f)), ("c", "b", Array(0.3f, 0.7f)))
    val nwt = phiOf(("c", "a", Array(1f, 3f)), ("c", "b", Array(1f, 1f)))
    val r = NetPlsaPhi(classId = "c", edges = edges)(pwt, nwt, ctx(2))
    val w = weightsOf(r)
    // D = 1; contrib_a = 2·(p_b − p_a) = (−0.4, 1.2); n_t = (2, 4) → n_t² = (4, 16)
    assert(math.abs(w("a")(0) + 1.6f) < 1e-5 && math.abs(w("a")(1) - 19.2f) < 1e-4,
      s"got ${w("a")}")
  }

  test("TransformFn log/polynomial column and scalar forms agree") {
    assert(TransformFn.Logarithm(math.exp(1.0).toFloat) - 1.0f < 1e-6)
    assert(TransformFn.Logarithm(0.0f) == 0.0f)
    val poly = TransformFn.Polynomial(2.0f, 2.0f)
    assert(math.abs(poly(3.0f) - 18.0f) < 1e-5)
    import spark.implicits._
    val df = Seq(2.0f).toDF("x")
      .select(TransformFn.Logarithm.expr(col("x")).as("l"), poly.expr(col("x")).as("p"))
    val row = df.head()
    assert(math.abs(row.getFloat(0) - math.log(2.0).toFloat) < 1e-6)
    assert(math.abs(row.getFloat(1) - 8.0f) < 1e-5)
  }

  test("ThetaSnippet returns the first n docs' thetas") {
    import spark.implicits._
    val theta = (0L until 20L).map(i => (i, s"doc$i", Array(i.toFloat, 1f)))
      .toDF("doc_id", "title", "weights")
    val snip = graft.scores.Scores.thetaSnippet(theta, 5).collect()
    assert(snip.map(_.getLong(0)).toSeq == Seq(0L, 1L, 2L, 3L, 4L))
  }

  test("BackgroundTokensRatio flags flat-distribution tokens") {
    // token 'bg' spreads over both topics like the corpus average; token
    // 'fg' concentrates — with a small delta only fg exceeds KL
    val pwt = phiOf(
      ("@default_class", "bg", Array(0.5f, 0.5f)),
      ("@default_class", "fg", Array(0.9f, 0.1f)))
    val nwt = phiOf(
      ("@default_class", "bg", Array(5f, 5f)),
      ("@default_class", "fg", Array(9f, 1f)))
    val agg = graft.scores.Scores.backgroundTokensRatio(pwt, nwt, delta = 0.05)
      .head()
    assert(agg.getLong(1) == 2L)
    assert(agg.getDouble(2) >= 0.0 && agg.getDouble(2) <= 1.0)
    val toks = graft.scores.Scores.backgroundTokensRatio(pwt, nwt, delta = 0.05,
      returnTokens = true).collect().map(_.getString(0)).toSet
    assert((agg.getLong(0) == toks.size.toLong))
  }

  test("reshapeTopics keeps matched columns by name, zero-fills new ones") {
    val pwt = phiOf(("c", "a", Array(1f, 2f, 3f)))
    val reshaped = PhiOps.reshapeTopics(pwt, Seq("t0", "t1", "t2"), Seq("t2", "tX", "t0"))
    assert(weightsOf(reshaped)("a") == Seq(3f, 0f, 1f))
  }

  test("sparse init: low-tf tokens draw zero-heavy rows, high-tf stay dense") {
    import spark.implicits._
    val docsTable = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val corpus = graft.sources.Corpus.fromDocumentsTable(docsTable).cache()
    val dict = DictionaryOps.gather(corpus).cache()
    val pwt = PhiOps.initializeModel(dict, numTopics = 16, seed = 4,
      denseInitRate = 0.2f, guaranteedZerosRate = 0.9f).cache()
    // columns are still stochastic
    val colSums = pwt.agg(graft.functions.VectorOps.vectorSum(col("weights")))
      .head().getSeq[Float](0)
    colSums.foreach(s => assert(math.abs(s - 1.0f) < 1e-3))
    // the sparse (low-tf) rows have zeros; dense rows have none
    val zeroStats = pwt.join(dict, Seq("class_id", "token"))
      .select(col("tf"), size(filter(col("weights"), w => w === 0.0f)).as("zeros"))
      .collect()
    val hiTf = zeroStats.sortBy(-_.getFloat(0)).take(3)
    val loTf = zeroStats.sortBy(_.getFloat(0)).take(3)
    assert(hiTf.forall(_.getInt(1) == 0), "top-tf rows should be dense")
    assert(loTf.exists(_.getInt(1) > 4), "low-tf rows should be zero-heavy")
    // deterministic: same call → identical matrix
    val again = PhiOps.initializeModel(dict, 16, 4, Nil, 0.2f, 0.9f)
    val diff = pwt.select(col("class_id"), col("token"), col("weights"))
      .unionByName(again.select(col("class_id"), col("token"), col("weights")))
      .groupBy(col("class_id"), col("token"), col("weights"))
      .count().filter(col("count") =!= 2).count()
    assert(diff == 0)
  }

  test("in-memory n_wd ingest builds the expected docs") {
    val nwd = Array(
      Array(2f, 0f), // token "x": doc0 weight 2
      Array(0f, 3f)) // token "y": doc1 weight 3
    val docs = graft.sources.Corpus.fromNwdMatrix(spark, nwd, Array("x", "y"))
      .collect().sortBy(_.doc_id)
    assert(docs.length == 2)
    assert(docs(0).tokens.map(t => (t.token, t.weight)).toSeq == Seq(("x", 2f)))
    assert(docs(1).tokens.map(t => (t.token, t.weight)).toSeq == Seq(("y", 3f)))
  }

  test("ModelRegistry: put/overwrite/dispose") {
    val reg = new ModelRegistry
    val a = phiOf(("c", "a", Array(1f)))
    val b = phiOf(("c", "b", Array(2f)))
    reg.put("m", a)
    assert(reg("m").collect().head.getString(1) == "a")
    reg.put("m", b) // OverwriteTopicModel
    assert(reg("m").collect().head.getString(1) == "b")
    assert(reg.names == Seq("m"))
    reg.dispose("m")
    assert(reg.get("m").isEmpty)
    intercept[NoSuchElementException](reg("m"))
  }
}
