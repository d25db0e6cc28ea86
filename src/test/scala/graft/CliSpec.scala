package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._

/** End-to-end CLI runs (reference srcmain.cc workflows) against a small
  * VW corpus: offline fit with regularizers + writers, model round-trip
  * into a transform-only run, online mode, topic-selection mode, and the
  * cooc/PPMI writers. Drives Cli.run on the shared test session (the
  * option surface, not main()'s session bootstrap). */
class CliSpec extends SparkSpec {

  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  private lazy val vwFile: String = {
    val f = Files.createTempFile("cli-corpus", ".vw")
    val rnd = new scala.util.Random(7)
    val themes = Seq(
      Seq("market", "trade", "price", "stock", "bank"),
      Seq("game", "team", "score", "match", "coach"),
      Seq("cell", "gene", "protein", "lab", "assay"))
    val lines = (0 until 120).map { i =>
      val t = themes(i % 3)
      val toks = (0 until 12).map(_ => t(rnd.nextInt(t.size)))
      s"doc$i ${toks.mkString(" ")}"
    }
    Files.writeString(f, lines.mkString("\n"))
    f.toString
  }

  private def opts(pairs: (String, String)*): Cli.Opts =
    Cli.Opts(pairs.groupBy(_._1).view.mapValues(_.map(_._2).toList).toMap)

  test("offline fit: regularizers, scores, model + readable + predictions writers") {
    val modelDir = tmp("cli-model")
    val readable = tmp("cli-readable")
    val preds = tmp("cli-preds")
    val scoresOut = tmp("cli-scores")
    Cli.run(spark, opts(
      "read-vw-corpus" -> vwFile,
      "topics" -> "6",
      "rand-seed" -> "42",
      "num-collection-passes" -> "4",
      "num-document-passes" -> "1",
      "regularizer" -> "0.01 SparsePhi",
      "regularizer" -> "50 Decorrelation",
      "score" -> "Perplexity",
      "save-model" -> modelDir,
      "write-model-readable" -> readable,
      "write-predictions" -> preds,
      "write-scores" -> scoresOut))

    val phiCsv = spark.read.option("header", "true").csv(readable)
    assert(phiCsv.columns.contains("topic_0") && phiCsv.count() > 0)
    val thetaCsv = spark.read.option("header", "true").csv(preds)
    assert(thetaCsv.count() === 120)
    val sc = spark.read.option("header", "true").csv(scoresOut)
    val perp = sc.select(col("perplexity").cast("double")).collect().map(_.getDouble(0))
    assert(perp.length === 4 && perp.last < perp.head) // EM converges

    // transform-only rerun: load the saved model, no fitting
    val preds2 = tmp("cli-preds2")
    Cli.run(spark, opts(
      "read-vw-corpus" -> vwFile,
      "load-model" -> modelDir,
      "num-document-passes" -> "1",
      "write-predictions" -> preds2))
    val t2 = spark.read.option("header", "true").csv(preds2)
    assert(t2.count() === 120)
  }

  test("online fit with update-every batches") {
    val scoresOut = tmp("cli-scores-online")
    Cli.run(spark, opts(
      "read-vw-corpus" -> vwFile,
      "topics" -> "4",
      "num-collection-passes" -> "1",
      "num-document-passes" -> "1",
      "update-every" -> "1",
      "batch-size" -> "40", // 120 docs -> 3 online chunks
      "tau0" -> "16", "kappa" -> "0.7",
      "write-scores" -> scoresOut))
    val sc = spark.read.option("header", "true").csv(scoresOut)
    assert(sc.count() === 3) // one tracker row per merged chunk
  }

  test("topic selection fit recomputes topic_value between passes") {
    val scoresOut = tmp("cli-scores-sel")
    Cli.run(spark, opts(
      "read-vw-corpus" -> vwFile,
      "topics" -> "6",
      "num-collection-passes" -> "3",
      "num-document-passes" -> "1",
      "regularizer" -> "0.2 TopicSelection",
      "write-scores" -> scoresOut))
    val sc = spark.read.option("header", "true").csv(scoresOut)
    val perp = sc.select(col("perplexity").cast("double")).collect().map(_.getDouble(0))
    assert(perp.length === 3 && perp.last < perp.head)
  }

  test("cooc + ppmi writers and coherence regularizer wiring") {
    val coocOut = tmp("cli-cooc")
    val ppmiOut = tmp("cli-ppmi")
    Cli.run(spark, opts(
      "read-vw-corpus" -> vwFile,
      "topics" -> "4",
      "num-collection-passes" -> "2",
      "num-document-passes" -> "1",
      "cooc-window" -> "3",
      "cooc-min-tf" -> "2",
      "regularizer" -> "0.001 ImproveCoherence",
      "write-cooc-tf" -> coocOut,
      "write-ppmi-tf" -> ppmiOut))
    val cooc = spark.read.option("header", "true").csv(coocOut)
    assert(cooc.columns.toSeq === Seq("token_a", "token_b", "cooc_tf"))
    assert(cooc.count() > 0)
    assert(spark.read.option("header", "true").csv(ppmiOut).count() > 0)
  }

  test("multimodal class weights + class predictions writer") {
    // second modality via |lang namespace lines
    val f = Files.createTempFile("cli-mm", ".vw")
    val lines = (0 until 60).map { i =>
      val lang = if (i % 2 == 0) "en" else "fr"
      val toks = if (i % 2 == 0) "hello world hello" else "bonjour monde bonjour"
      s"doc$i $toks |lang $lang"
    }
    Files.writeString(f, lines.mkString("\n"))
    val out = tmp("cli-clspred")
    Cli.run(spark, opts(
      "read-vw-corpus" -> f.toString,
      "topics" -> "2",
      "rand-seed" -> "1",
      "num-collection-passes" -> "3",
      "num-document-passes" -> "1",
      "use-modality" -> "@default_class:1,lang:1",
      "predict-class" -> "lang",
      "write-class-predictions" -> out))
    val preds = spark.read.option("header", "true").csv(out)
    assert(preds.count() === 60)
    // the two language labels both appear (model separates the themes)
    assert(preds.select("predicted").distinct().count() === 2)
  }

  test("vw corpus round-trip and readable dictionary writers") {
    val vwOut = tmp("cli-vwout")
    val dictOut = tmp("cli-dictout")
    Cli.run(spark, opts(
      "read-vw-corpus" -> vwFile,
      "topics" -> "4",
      "num-collection-passes" -> "1",
      "num-document-passes" -> "1",
      "write-vw-corpus" -> vwOut,
      "write-dictionary-readable" -> dictOut))
    // re-parse the exported corpus: same bag of (doc, token, weight)
    val orig = graft.sources.VwReader.read(spark, vwFile)
    val redo = graft.sources.VwReader.read(spark, s"$vwOut/*.txt")
    def bag(d: org.apache.spark.sql.Dataset[graft.core.Doc]) =
      d.collect().map(x => x.title ->
        x.tokens.map(t => (t.class_id, t.token, t.weight)).sorted.toSeq).toMap
    assert(bag(redo) === bag(orig))
    val dict = spark.read.option("header", "true").csv(dictOut)
    assert(dict.columns.toSeq === Seq("class_id", "token", "value", "tf", "df"))
    assert(dict.count() === 15) // 3 themes x 5 tokens
  }

  test("dictionary save + use round-trip between runs") {
    val dictDir = tmp("cli-dict")
    Cli.run(spark, opts(
      "read-vw-corpus" -> vwFile,
      "topics" -> "4",
      "dictionary-min-df" -> "2",
      "save-dictionary" -> dictDir))
    // second run: import the saved dictionary instead of gathering
    val scoresOut = tmp("cli-scores-dict")
    Cli.run(spark, opts(
      "read-vw-corpus" -> vwFile,
      "topics" -> "4",
      "use-dictionary" -> dictDir,
      "num-collection-passes" -> "2",
      "num-document-passes" -> "1",
      "write-scores" -> scoresOut))
    val sc = spark.read.option("header", "true").csv(scoresOut)
    assert(sc.count() === 2)
  }

  test("vw writer round-trips weights and modalities") {
    import graft.core.{Doc, TokenEntry, Txn}
    val spark2 = spark
    import spark2.implicits._
    val docs = spark.createDataset(Seq(
      Doc(0L, "d0", Array(
        TokenEntry("@default_class", "alpha", 2.5f),
        TokenEntry("@default_class", "beta", 1.0f),
        TokenEntry("author", "smith", 3.0f)), Array.empty[Txn]),
      Doc(1L, "d1", Array(
        TokenEntry("author", "jones", 1.0f)), Array.empty[Txn])))
    val out = tmp("vw-rt")
    graft.sources.VwReader.write(docs, out)
    val redo = graft.sources.VwReader.read(spark, s"$out/*.txt")
    val bag = redo.collect().map(d => d.title ->
      d.tokens.map(t => (t.class_id, t.token, t.weight)).sorted.toSeq).toMap
    assert(bag("d0") === Seq(
      ("@default_class", "alpha", 2.5f), ("@default_class", "beta", 1.0f),
      ("author", "smith", 3.0f)))
    assert(bag("d1") === Seq(("author", "jones", 1.0f)))
  }

  test("CLI reproduces the reference synthetic golden trajectory end to end") {
    // the reference's synthetic collection written as a VW corpus: the
    // full CLI chain (parse -> gather -> init -> 10x10 EM -> scores) must
    // land on the published perplexity goldens
    // (test_01_synthetic_collection.py:30-41), same band as
    // SyntheticGoldenSpec
    val golden = Seq(54.616, 38.472, 28.655, 24.362, 22.355,
      21.137, 20.808, 20.791, 20.746, 20.581)
    val f = Files.createTempFile("cli-synth", ".vw")
    val lines = graft.sources.SyntheticCollection.docs().map { d =>
      d.title + " " + d.tokens.map(t =>
        s"${t.token}:${t.weight.toInt}").mkString(" ")
    }
    Files.writeString(f, lines.mkString("\n"))
    val scoresOut = tmp("cli-scores-synth")
    Cli.run(spark, opts(
      "read-vw-corpus" -> f.toString,
      "topics" -> "10",
      "num-collection-passes" -> "10",
      "num-document-passes" -> "10",
      "write-scores" -> scoresOut))
    val got = spark.read.option("header", "true").csv(scoresOut)
      .orderBy(col("pass").cast("int"))
      .select(col("perplexity").cast("double")).collect().map(_.getDouble(0))
    golden.zip(got).zipWithIndex.foreach { case ((exp, act), i) =>
      assert(math.abs(exp - act) < 0.002, s"pass $i: expected $exp got $act")
    }
  }

  test("standalone SQL mode: graft_* functions over parquet views, CSV out") {
    val out = tmp("cli-sql-out")
    Cli.run(spark, opts(
      "sql" -> ("SELECT doc_id, graft_ws_tokens(text) AS ws_tokens, " +
        "graft_quality(text) AS q FROM documents " +
        "WHERE graft_sample_keep(doc_id, 'cli', 0.5) ORDER BY doc_id"),
      "sql-tables" -> "/root/testdata/sf0.001",
      "write-sql-result" -> out))
    val got = spark.read.option("header", "true").csv(out)
    assert(got.columns.toSeq === Seq("doc_id", "ws_tokens", "q"))
    val n = got.count()
    assert(n > 0 && n < 500) // the keep filter bites
    // spot check against the DataFrame API
    val api = graft.pipeline.Sampling.sampleHash(
      spark.read.parquet("/root/testdata/sf0.001/documents.parquet"),
      "doc_id", 0.5, salt = "cli").count()
    assert(n === api)
  }

  test("regularizer string parsing mirrors the reference syntax") {
    val s1 = Cli.parseRegularizer("0.5 SmoothPhi @c1,c2", 8)
    assert(s1.asInstanceOf[Cli.PhiSpec].tau === 0.5f)
    assert(s1.asInstanceOf[Cli.PhiSpec].reg.asInstanceOf[
      graft.regularizers.SmoothSparsePhi].classIds === Seq("c1", "c2"))
    val s2 = Cli.parseRegularizer("0.3 SparseTheta", 8)
    assert(s2.asInstanceOf[Cli.ThetaSpec].tau === -0.3f)
    intercept[IllegalArgumentException](Cli.parseRegularizer("0.1 NoSuch", 8))
  }
}
