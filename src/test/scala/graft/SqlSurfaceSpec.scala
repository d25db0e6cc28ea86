package graft

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import graft.pipeline.{Ann, Dedup, Sampling, TextAnalysis}

/** The SQL surface (GraftFunctions / GraftExtensions): every registered
  * graft_* function must agree BIT-EXACTLY with its DataFrame-API twin —
  * they share one Column-builder definition, and these tests pin that
  * the registration plumbing (expression conversion, constant-argument
  * folding) preserves it. */
class SqlSurfaceSpec extends SparkSpec {

  private lazy val docsDF: DataFrame = {
    GraftFunctions.install(spark)
    val d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    d.createOrReplaceTempView("sqlspec_docs")
    d
  }
  private lazy val embDF: DataFrame = {
    GraftFunctions.install(spark)
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    e.createOrReplaceTempView("sqlspec_emb")
    e
  }

  private def assertSameRows(a: DataFrame, b: DataFrame): Unit = {
    val ra = a.collect()
    val rb = b.collect()
    assert(ra.length === rb.length)
    ra.zip(rb).foreach { case (x, y) => assert(x === y) }
  }

  test("text functions: SQL == DataFrame API, bit-exact") {
    docsDF // registers + view
    val sql = spark.sql("""
      SELECT doc_id,
        graft_norm_text(text) AS norm,
        graft_ws_tokens(text) AS ws_tokens,
        graft_bpeish_tokens(text) AS bpeish_tokens,
        graft_quality(text) AS quality,
        graft_lang_id(text) AS lang_pred,
        graft_fingerprint(text) AS fingerprint,
        graft_rolling_fp(text) AS rolling_fp,
        graft_n_urls(text) AS n_urls,
        graft_n_emails(text) AS n_emails,
        graft_pii_scrub(text) AS scrubbed
      FROM sqlspec_docs ORDER BY doc_id""")
    val api = docsDF.select(col("doc_id"),
      TextAnalysis.normTextCol(col("text")).as("norm"),
      TextAnalysis.wsTokensCol(col("text")).as("ws_tokens"),
      TextAnalysis.bpeishTokensCol(col("text")).as("bpeish_tokens"),
      TextAnalysis.qualityCol(col("text")).as("quality"),
      TextAnalysis.langPredCol(col("text")).as("lang_pred"),
      TextAnalysis.fingerprintCol(col("text")).as("fingerprint"),
      TextAnalysis.rollingFpCol(col("text")).as("rolling_fp"),
      TextAnalysis.nUrlsCol(col("text")).as("n_urls"),
      TextAnalysis.nEmailsCol(col("text")).as("n_emails"),
      TextAnalysis.piiScrubCol(col("text")).as("scrubbed"))
      .orderBy(col("doc_id"))
    assertSameRows(sql, api)
  }

  test("scalar quality/lang builders match the DataFrame operators") {
    val viaOp = TextAnalysis.qualityScore(docsDF)
      .select(col("doc_id"), col("quality")).orderBy("doc_id")
    val viaCol = docsDF.select(col("doc_id"),
      TextAnalysis.qualityCol(col("text")).as("quality")).orderBy("doc_id")
    assertSameRows(viaOp, viaCol)
    val langOp = TextAnalysis.languageId(docsDF)
      .select(col("doc_id"), col("lang_pred")).orderBy("doc_id")
    val langCol = docsDF.select(col("doc_id"),
      TextAnalysis.langPredCol(col("text")).as("lang_pred")).orderBy("doc_id")
    assertSameRows(langOp, langCol)
  }

  test("graft_cosine: native expression == HOF fold, bit-exact; null on length mismatch") {
    embDF
    // the HOF composition the native expression replaced — same fold
    // order, so equality must be exact, not approximate
    def hofCosine(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) = {
      val dot = aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
        lit(0.0), (acc, v) => acc + v)
      val na = aggregate(transform(a, x => x.cast("double") * x.cast("double")),
        lit(0.0), (acc, v) => acc + v)
      val nb = aggregate(transform(b, x => x.cast("double") * x.cast("double")),
        lit(0.0), (acc, v) => acc + v)
      dot / (sqrt(na) * sqrt(nb))
    }
    val pairs = embDF.limit(40).select(col("vec_id").as("id_a"), col("embedding").as("va"))
      .crossJoin(embDF.limit(40).select(col("vec_id").as("id_b"), col("embedding").as("vb")))
      .filter(col("id_a") < col("id_b"))
    val both = pairs.select(
      Ann.cosine(col("va"), col("vb")).as("native"),
      hofCosine(col("va"), col("vb")).as("hof")).collect()
    assert(both.nonEmpty)
    both.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ===
        java.lang.Double.doubleToLongBits(r.getDouble(1)))
    }
    // SQL surface reaches the same expression
    val viaSql = spark.sql(
      """SELECT graft_cosine(a.embedding, b.embedding) AS c
        |FROM sqlspec_emb a JOIN sqlspec_emb b ON a.vec_id = 0 AND b.vec_id = 1""".stripMargin)
      .collect()(0).getDouble(0)
    val viaApi = embDF.filter(col("vec_id") === 0)
      .crossJoin(embDF.filter(col("vec_id") === 1).select(col("embedding").as("e2")))
      .select(Ann.cosine(col("embedding"), col("e2"))).collect()(0).getDouble(0)
    assert(viaSql === viaApi)
    // length mismatch -> null (the zip_with null-pad contract)
    val mismatch = embDF.limit(1).select(
      Ann.cosine(col("embedding"), slice(col("embedding"), 1, 3))).collect()(0)
    assert(mismatch.isNullAt(0))
  }

  test("graft_hyperplane_sig: SQL == Ann.hyperplaneSignatures buckets") {
    embDF
    val dim = embDF.select(col("embedding")).limit(1)
      .collect()(0).getSeq[Float](0).length
    val viaSql = spark.sql(
      s"""SELECT vec_id, graft_hyperplane_sig(embedding, $dim, 6, 42, 2) AS sig
         |FROM sqlspec_emb ORDER BY vec_id""".stripMargin)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val viaApi = Ann.hyperplaneSignatures(embDF, "vec_id", "embedding",
      planes = 6, seed = 42, tables = 2)
      .groupBy("id").agg(collect_list(struct(col("table"), col("bucket"))).as("tb"))
      .collect().map { r =>
        val sig = r.getSeq[Row](1).map(x => x.getInt(0) -> x.getLong(1)).sortBy(_._1).map(_._2)
        r.getLong(0) -> sig
      }.toMap
    assert(viaSql.keySet === viaApi.keySet)
    viaSql.foreach { case (id, sig) => assert(sig === viaApi(id), s"vec $id") }
  }

  test("graft_sample_keep: SQL decision == Sampling.sampleHash membership") {
    docsDF
    val kept = spark.sql(
      """SELECT doc_id FROM sqlspec_docs
        |WHERE graft_sample_keep(doc_id, 's1', 0.3) ORDER BY doc_id""".stripMargin)
      .collect().map(_.getLong(0)).toSet
    val apiKept = Sampling.sampleHash(docsDF, "doc_id", 0.3, salt = "s1")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept === apiKept)
    assert(kept.nonEmpty && kept.size < docsDF.count())
    // rate 1.0 keeps everything
    val all = spark.sql(
      "SELECT count(*) FROM sqlspec_docs WHERE graft_sample_keep(doc_id, 's1', 1.0)")
      .collect()(0).getLong(0)
    assert(all === docsDF.count())
  }

  test("graft_simhash: SQL == Dedup.simhash; banding identity holds") {
    docsDF
    val viaSql = spark.sql(
      """SELECT doc_id, graft_simhash(text) AS sig FROM sqlspec_docs
        |ORDER BY doc_id""".stripMargin)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val viaApi = Dedup.simhash(docsDF)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(viaSql === viaApi)
    assert(viaSql.values.exists(_ != 0L))
    // the documented SQL banding recipe reproduces simhashPairs' buckets
    val bands = spark.sql(
      """SELECT doc_id,
        |  shiftrightunsigned(graft_simhash(text), 16) & 65535 AS b1
        |FROM sqlspec_docs ORDER BY doc_id""".stripMargin)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    viaSql.foreach { case (id, sig) =>
      assert(bands(id) === ((sig >>> 16) & 0xffffL))
    }
  }

  test("graft_shingles / graft_minhash: SQL == Dedup builders") {
    docsDF
    val viaSql = spark.sql(
      """SELECT doc_id, graft_minhash(graft_shingles(text, 3), 8) AS mh
        |FROM sqlspec_docs WHERE length(trim(text)) > 0 ORDER BY doc_id""".stripMargin)
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    val viaApi = docsDF.filter(length(trim(col("text"))) > 0)
      .select(col("doc_id"),
        Dedup.minhashSignature(Dedup.shingles(col("text"), 3), 8).as("mh"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(viaSql === viaApi)
  }

  test("graft_jaccard / graft_stopword_ratio / graft_top_ngram_share: SQL == operators") {
    docsDF
    // jaccard over shingle sets == Dedup.ngramJaccard on the same pair
    val viaSql = spark.sql(
      """SELECT graft_jaccard(graft_shingles(a.text, 3), graft_shingles(b.text, 3)) AS j
        |FROM sqlspec_docs a JOIN sqlspec_docs b ON a.doc_id = 0 AND b.doc_id = 1""".stripMargin)
      .collect()(0).getDouble(0)
    import spark.implicits._
    val viaOp = Dedup.ngramJaccard(docsDF, Seq((0L, 1L)).toDF("id_a", "id_b"))
      .collect()(0).getDouble(2)
    assert(viaSql === viaOp)
    // stopword ratio and top-ngram share match their Column builders
    val sw = TextAnalysis.defaultStopwords.values.flatten.toSeq
    val both = spark.sql(
      """SELECT doc_id, graft_stopword_ratio(text) AS r, graft_top_ngram_share(text, 2) AS s
        |FROM sqlspec_docs ORDER BY doc_id""".stripMargin).collect()
    val api = docsDF.select(col("doc_id"),
      TextAnalysis.stopwordRatioCol(col("text"), sw).as("r"),
      TextAnalysis.topNgramShareCol(col("text"), 2).as("s"))
      .orderBy("doc_id").collect()
    both.zip(api).foreach { case (x, y) => assert(x === y) }
    // positional word grams match the shared builder (and shingles ==
    // distinct of grams, the documented relationship)
    val g = spark.sql(
      """SELECT doc_id, graft_word_grams(text, 3) AS g3,
        |       graft_shingles(text, 3) AS sh
        |FROM sqlspec_docs ORDER BY doc_id""".stripMargin).collect()
    val gApi = docsDF.select(col("doc_id"),
      TextAnalysis.positionalGramsCol(
        TextAnalysis.tokensCol(col("text")), 3).as("g3"))
      .orderBy("doc_id").collect()
    g.zip(gApi).foreach { case (x, y) =>
      assert(x.getSeq[String](1) === y.getSeq[String](1))
      assert(x.getSeq[String](2) === x.getSeq[String](1).distinct)
    }
  }

  test("constant-argument validation rejects non-constant knobs") {
    docsDF
    val err = intercept[Exception] {
      spark.sql("SELECT graft_shingles(text, doc_id) FROM sqlspec_docs").collect()
    }
    assert(err.getMessage.contains("constant") ||
      err.getMessage.toLowerCase.contains("graft_shingles"))
  }

  test("GraftExtensions injects the same registry (config-driven path)") {
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new GraftExtensions().apply(ext)
    val reg = org.apache.spark.sql.catalyst.analysis.FunctionRegistry.builtin.clone()
    org.apache.spark.sql.GraftColumnBridge.registerFunctions(ext, reg)
    GraftFunctions.functions.foreach { case (ident, _, _) =>
      assert(reg.functionExists(ident), ident.funcName)
    }
    // and the injected builder actually builds (an unresolved tree the
    // analyzer would then resolve — dataType is not yet callable)
    import org.apache.spark.sql.catalyst.expressions.Literal
    val built = reg.lookupFunction(
      org.apache.spark.sql.catalyst.FunctionIdentifier("graft_ws_tokens"),
      Seq(Literal("a b c")))
    assert(built != null)
  }

  // the config-driven spark.sql.extensions path lives in
  // GraftExtensionsConfigSpec (own forked JVM — it must create the
  // SparkContext for the static conf to engage)

  test("SQL-surface plan stays codegen'd: no ScalaUDF anywhere") {
    docsDF
    val plan = spark.sql(
      """SELECT graft_quality(text), graft_rolling_fp(text), graft_lang_id(text)
        |FROM sqlspec_docs""".stripMargin)
      .queryExecution.executedPlan.toString
    assert(!plan.toLowerCase.contains("scalaudf"))
  }
}
