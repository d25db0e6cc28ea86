package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.core.{Doc, TokenEntry, Txn}
import graft.operators._
import graft.sources._

/** Behavioral coverage for the ingestion/scoring fringe: UCI + MM readers
  * (FIXTURES.md §3-4), cooc file reader (§5), batch writer + registry +
  * parse dispatcher, transformPredict + ClassPrecision, TopicKernel full
  * report. Fixture contents are written inline (same formats as the
  * reference's test_data, independent content). */
class FringeSpec extends SparkSpec {

  private def tmpFile(name: String, content: String): String = {
    val f = Files.createTempFile(name, ".txt")
    Files.writeString(f, content)
    f.toFile.deleteOnExit()
    f.toString
  }

  test("UCI docword + vocab reader builds docs with class ids") {
    val docword = tmpFile("docword",
      """3
        |4
        |5
        |1 1 2
        |1 3 1
        |2 2 5
        |3 4 1
        |3 1 1
        |""".stripMargin)
    val vocab = tmpFile("vocab",
      """alpha
        |beta @label
        |gamma
        |delta
        |""".stripMargin)
    val docs = UciReader.read(spark, docword, vocab).collect().sortBy(_.doc_id)
    assert(docs.length == 3)
    val d1 = docs(0)
    assert(d1.tokens.map(t => (t.class_id, t.token, t.weight)).toSeq ==
      Seq(("@default_class", "alpha", 2.0f), ("@default_class", "gamma", 1.0f)))
    val d2 = docs(1)
    assert(d2.tokens.head.class_id == "@label" && d2.tokens.head.token == "beta"
      && d2.tokens.head.weight == 5.0f)
    // out-of-range word ids are dropped
    assert(docs(2).tokens.map(_.token).toSeq == Seq("alpha", "delta"))
  }

  test("duplicate vocab entries are an error") {
    val vocab = tmpFile("vocabdup", "alpha\nbeta\nalpha\n")
    intercept[IllegalArgumentException] {
      UciReader.readVocab(spark, vocab)
    }
  }

  test("MatrixMarket reader parses banner + id-token-weight vocab") {
    val mm = tmpFile("mm",
      """%%MatrixMarket matrix coordinate real general
        |2 2 3
        |1 1 1
        |1 2 2
        |2 2 3
        |""".stripMargin)
    val vocab = tmpFile("mmvocab", "1 apple 0.0\n2 pear 0.0\n")
    val docs = UciReader.readMatrixMarket(spark, mm, vocab).collect().sortBy(_.doc_id)
    assert(docs.length == 2)
    assert(docs(0).tokens.map(t => (t.token, t.weight)).toSeq ==
      Seq(("apple", 1.0f), ("pear", 2.0f)))
    assert(docs(1).tokens.map(_.token).toSeq == Seq("pear"))
  }

  test("cooc file reader parses triples, colon form, modalities, symmetry") {
    assert(CoocReader.parseLine("1 2 0.5", symmetric = false) ==
      Seq(("@default_class", "1", "@default_class", "2", 0.5f)))
    assert(CoocReader.parseLine("a b:0.5 c:0.25", symmetric = false) ==
      Seq(("@default_class", "a", "@default_class", "b", 0.5f),
        ("@default_class", "a", "@default_class", "c", 0.25f)))
    assert(CoocReader.parseLine("|author smith jones 1.5", symmetric = false) ==
      Seq(("author", "smith", "author", "jones", 1.5f)))
    // mid-line modality marker applies ONLY to the next second token; the
    // class then RESETS to the first token's class (reference
    // dictionary_operations.cc:441 — second_token_class_id is
    // re-initialized at every pair)
    assert(CoocReader.parseLine("w |m x 0.5 y 0.25", symmetric = false) ==
      Seq(("@default_class", "w", "m", "x", 0.5f),
        ("@default_class", "w", "@default_class", "y", 0.25f)))
    assert(CoocReader.parseLine("x y 2.0", symmetric = true).toSet ==
      Set(("@default_class", "x", "@default_class", "y", 2.0f),
        ("@default_class", "y", "@default_class", "x", 2.0f)))
    val path = tmpFile("cooc", "1 2 0.5\n2 3 0.4\n1 3 0.8\n")
    val df = CoocReader.read(spark, path)
    assert(df.count() == 3)
    // single-class adapter feeds the coherence consumers (drops the rare
    // cross-class pairs, renames to class_id)
    val single = CoocReader.toSingleClass(df)
    assert(single.columns.toSeq ==
      Seq("class_id", "token_a", "token_b", "cooc_value"))
    assert(single.count() == 3)
    // attach path: restrict to a surviving dictionary
    val dict = DictionaryOps.create(spark, Seq(
      graft.core.DictEntry("@default_class", "1", 0.5f, 1f, 1f),
      graft.core.DictEntry("@default_class", "2", 0.5f, 1f, 1f)))
    val attached = DictionaryOps.filterCooc(
      df.withColumnRenamed("cooc_value", "cooc_tf"), dict)
    assert(attached.count() == 1) // only the (1,2) pair survives
  }

  test("batch writer round-trips and the registry imports/disposes") {
    import spark.implicits._
    val docs = spark.createDataset(Seq(
      Doc(1L, "d1", Array(TokenEntry("@default_class", "a", 1f)), Array.empty[Txn]),
      Doc(2L, "d2", Array(TokenEntry("@default_class", "b", 2f)),
        Array(Txn("@default_transaction", 0, 1)))))
    val dir = Files.createTempDirectory("graft-batches").toString
    BatchIO.write(docs, dir)
    val back = BatchIO.read(spark, dir).collect().sortBy(_.doc_id)
    assert(back.length == 2)
    assert(back(0).tokens.head.token == "a")
    assert(back(1).txns.head.tt_name == "@default_transaction")

    val reg = new BatchIO.BatchRegistry
    reg.importBatch("b1", docs)
    assert(reg.names == Seq("b1"))
    assert(reg("b1").count() == 2)
    reg.dispose("b1")
    assert(reg.get("b1").isEmpty)
  }

  test("VW transaction file: multi-token ||/||name lines parse and fit end-to-end") {
    // same line shapes as the reference's vw_transaction_data.txt
    // (collection_parser.cc:483-806): multi-token transactions closed by
    // `||`, typename switches via `||name`, per-token modality via
    // `|class`, weighted tokens — authored fixture, not the reference file
    val path = tmpFile("vwtxn",
      """d1 alpha beta:2 ||play |user ann:3 |action jump:3 || |user ann |action run ||
        |d2 |author ann ||play alpha:5 |action run:5 || beta |action jump || ||@default_transaction beta
        |""".stripMargin)
    val docs = VwReader.read(spark, path).collect().sortBy(_.doc_id)
    assert(docs.length == 2)

    val d1 = docs(0)
    // leading bare tokens become single-token @default_transaction txns;
    // the two `|| … ||` groups are 2-token "play" transactions
    assert(d1.tokens.map(t => (t.class_id, t.token, t.weight)).toSeq == Seq(
      ("@default_class", "alpha", 1.0f), ("@default_class", "beta", 2.0f),
      ("user", "ann", 3.0f), ("action", "jump", 3.0f),
      ("user", "ann", 1.0f), ("action", "run", 1.0f)))
    assert(d1.txns.map(t => (t.tt_name, t.start, t.length)).toSeq == Seq(
      ("@default_transaction", 0, 1), ("@default_transaction", 1, 1),
      ("play", 2, 2), ("play", 4, 2)))

    val d2 = docs(1)
    assert(d2.txns.map(t => (t.tt_name, t.start, t.length)).toSeq == Seq(
      ("@default_transaction", 0, 1), ("play", 1, 2), ("play", 3, 2),
      ("@default_transaction", 5, 1)))
    assert(d2.tokens(0).class_id == "author") // class applies before ||play
    assert(d2.tokens(4).class_id == "action") // mid-transaction modality

    // end-to-end: transaction fit over the parsed docs with typename
    // weights (the kernel's transaction E-step path)
    import spark.implicits._
    val ds = spark.createDataset(docs)
    val dict = DictionaryOps.gather(ds)
    val pwt0 = PhiOps.initializeModel(dict, numTopics = 4, seed = 7)
    val fit = Fit.fitOffline(ds, pwt0, Fit.Config(
      numTopics = 4, numCollectionPasses = 2,
      estep = EStepConfig(numDocumentPasses = 1,
        transactionWeights = Map("@default_transaction" -> 1.0f, "play" -> 0.5f))))
    val phi = fit.pwt.collect()
    assert(phi.nonEmpty)
    // per-(class, topic) columns sum to 1 over tokens (stochastic phi)
    val sums = PhiOps.explodePhi(fit.pwt, sparseEps = -1.0)
      .groupBy("class_id", "topic").agg(sum("weight").as("s")).collect()
    sums.foreach(r => assert(math.abs(r.getDouble(2) - 1.0) < 1e-4 || r.getDouble(2) == 0.0))
    assert(fit.scores.head.itemsProcessed == 2)
    fit.unpersist()
  }

  test("multimodal tokens: null/blank lang rows get no @lang token on either side") {
    import spark.implicits._
    val docsDf = Seq(
      (0L, "alpha beta", "EN"),
      (1L, "gamma", null.asInstanceOf[String]),
      (2L, "delta", "  "),
      (3L, "", "fr")).toDF("doc_id", "text", "lang")
    // mirror side: one @lang row per valid lang, lowercased
    val mm = graft.operators.RelationalEm.tokensMm(docsDf)
    val langRows = mm.filter(col("class_id") === "@lang")
      .select("doc_id", "token").as[(Long, String)].collect().toSet
    assert(langRows == Set((0L, "en"), (3L, "fr")))
    // kernel side: same docs get the same lang TokenEntry
    val corpusLang = Corpus.fromDocumentsTableMultimodal(docsDf).collect()
      .flatMap(d => d.tokens.filter(_.class_id == "@lang").map(t => (d.doc_id, t.token)))
      .toSet
    assert(corpusLang == langRows)
    // doc 3 has no text tokens but still carries its lang token
    assert(mm.filter(col("doc_id") === 3L).count() == 1)
  }

  test("parse dispatcher selects formats") {
    val vw = tmpFile("vw", "doc1 hello world:2\n")
    assert(BatchIO.parse(spark, "vowpal_wabbit", vw).count() == 1)
    intercept[IllegalArgumentException] {
      BatchIO.parse(spark, "bow_uci", vw) // missing vocab
    }
    intercept[IllegalArgumentException] {
      BatchIO.parse(spark, "nope", vw)
    }
  }

  test("transformPredict + ClassPrecision on a labeled fixture") {
    import spark.implicits._
    // hand-built model: wA→topic0, wB→topic1; labels lA=(1,0), lB=(0,1)
    val pwt = Seq(
      ("@default_class", "wA", Array(1.0f, 0.0f)),
      ("@default_class", "wB", Array(0.0f, 1.0f)),
      ("@label", "lA", Array(1.0f, 0.0f)),
      ("@label", "lB", Array(0.0f, 1.0f))).toDF("class_id", "token", "weights")
    val docs = spark.createDataset(Seq(
      Doc(1L, "d1", Array(TokenEntry("@default_class", "wA", 3f)), Array.empty[Txn]),
      Doc(2L, "d2", Array(TokenEntry("@default_class", "wB", 2f)), Array.empty[Txn])))
    val preds = Fit.transformPredict(docs, pwt, numTopics = 2, predictClassId = "@label",
      estep = EStepConfig(numDocumentPasses = 5))
    val best = preds.collect().groupBy(_.getLong(0)).map { case (id, rows) =>
      id -> rows.maxBy(_.getDouble(3)).getString(2)
    }
    assert(best(1L) == "lA" && best(2L) == "lB")
    val truth = Seq((1L, "lA"), (2L, "lB")).toDF("doc_id", "label_token")
    val precision = graft.scores.Scores.classPrecision(preds, truth).head()
    assert(precision.getLong(0) == 2L && precision.getLong(1) == 2L)
    assert(precision.getDouble(2) == 1.0)
  }

  test("TopicKernel full report: coherence column + averages row") {
    import spark.implicits._
    val pwt = Seq(
      ("@default_class", "a", Array(0.8f, 0.0f)),
      ("@default_class", "b", Array(0.2f, 0.1f)),
      ("@default_class", "c", Array(0.0f, 0.9f))).toDF("class_id", "token", "weights")
    val nwt = Seq(
      ("@default_class", "a", Array(8.0f, 0.0f)),
      ("@default_class", "b", Array(2.0f, 1.0f)),
      ("@default_class", "c", Array(0.0f, 9.0f))).toDF("class_id", "token", "weights")
    val cooc = Seq(
      ("@default_class", "a", "b", 4.0), ("@default_class", "b", "a", 4.0))
      .toDF("class_id", "token_a", "token_b", "cooc_tf")
    val rep = graft.scores.Scores.topicKernelFull(pwt, nwt, threshold = 0.1,
      cooc = Some(cooc)).collect()
    val byTopic = rep.map(r => r.getInt(0) -> r).toMap
    assert(byTopic.contains(-1), "averages row missing")
    assert(byTopic.keySet == Set(-1, 0, 1))
    // topic 0 kernel = {a, b} → coherence = 2·4/(2·1)/2 = pairwise avg of 4
    val c0 = byTopic(0).getDouble(4)
    assert(c0 > 0.0, s"expected positive coherence, got $c0")
    val avgRow = byTopic(-1)
    assert(!avgRow.isNullAt(1) && !avgRow.isNullAt(3))
  }

  test("per-row top-ngram share == the groupBy formulation it replaced") {
    import org.apache.spark.sql.functions._
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    // the original two-shuffle formulation, inlined as the reference
    def viaGroupBy(n: Int) = {
      val toks = graft.pipeline.TextAnalysis.tokensCol(col("text"))
      val base = docs.withColumn("_toks",
        when(length(trim(col("text"))) === 0, array().cast("array<string>"))
          .otherwise(toks))
      val grams = transform(sequence(lit(0), size(col("_toks")) - n),
        i => concat_ws(" ", (0 until n).map(j => element_at(col("_toks"), i + j + 1)): _*))
      base.select(col("doc_id"), explode(
        when(size(col("_toks")) >= n, grams)
          .otherwise(array().cast("array<string>"))).as("g"))
        .groupBy(col("doc_id"), col("g")).agg(count(lit(1)).as("c"))
        .groupBy(col("doc_id"))
        .agg((max(col("c")).cast("double") / sum(col("c"))).as("share"))
    }
    Seq(2, 3).foreach { n =>
      val old = viaGroupBy(n).collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      val neu = docs.select(col("doc_id"),
        graft.pipeline.TextAnalysis.topNgramShareCol(col("text"), n).as("share"))
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      // docs absent from `old` had no n-grams -> 0.0 in the per-row form
      neu.foreach { case (id, s) =>
        assert(math.abs(s - old.getOrElse(id, 0.0)) < 1e-12, s"n=$n doc $id")
      }
    }
    // and the rewrite is a pure narrow plan: zero exchanges
    val plan = graft.pipeline.TextAnalysis.ngramRepetition(docs)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"repetition picked up a shuffle:\n$plan")
  }

  test("JSONL round-trip: hostile text (quotes, newlines, unicode, nulls) survives") {
    import spark.implicits._
    val docs = Seq(
      (0L, "plain text", "en", "src0", 10L),
      (1L, "line\nbreak \"quoted\" back\\slash", "en", "src0", 29L),
      (2L, "unicode: café 中文 😀 tab\there", "fr", "src1", 20L),
      (3L, null.asInstanceOf[String], null.asInstanceOf[String], "src1", 0L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val dir = java.nio.file.Files.createTempDirectory("jsonl_rt").toString
    graft.sources.JsonlIO.writeDocuments(docs, dir)
    val back = graft.sources.JsonlIO.readDocuments(spark, dir)
    assert(back.schema === graft.sources.JsonlIO.documentsSchema)
    val a = docs.collect().map(r => (r.getLong(0), Option(r.getString(1)),
      Option(r.getString(2)), r.getString(3), r.getLong(4))).toSet
    val b = back.collect().map(r => (r.getLong(0), Option(r.getString(1)),
      Option(r.getString(2)), r.getString(3), r.getLong(4))).toSet
    assert(a === b)
  }

  test("CSV round-trip: hostile text (commas, quotes, unicode, nulls) survives") {
    import spark.implicits._
    // NOTE no embedded newlines: RFC-4180 multiline fields need
    // multiLine=true which makes files unsplittable — the schema-pinned
    // reader deliberately stays splittable and the writer's quoting
    // covers commas/quotes/escapes (driver corpora are newline-free;
    // newline-bearing corpora belong in JSONL/parquet)
    val docs = Seq(
      (0L, "plain text", "en", "src0", 10L),
      (1L, "comma, \"quoted\" back\\slash, more", "en", "src0", 32L),
      (2L, "unicode: café 中文 😀 tab\there", "fr", "src1", 20L),
      (3L, null.asInstanceOf[String], null.asInstanceOf[String], "src1", 0L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val dir = java.nio.file.Files.createTempDirectory("csv_rt").toString
    graft.sources.CsvIO.writeDocuments(docs, dir)
    val back = graft.sources.CsvIO.readDocuments(spark, dir)
    assert(back.schema === graft.sources.CsvIO.documentsSchema)
    val a = docs.collect().map(r => (r.getLong(0), Option(r.getString(1)),
      Option(r.getString(2)), r.getString(3), r.getLong(4))).toSet
    val b = back.collect().map(r => (r.getLong(0), Option(r.getString(1)),
      Option(r.getString(2)), r.getString(3), r.getLong(4))).toSet
    assert(a === b)
  }

  test("CSV writer rejects newline-bearing text loudly (single-line contract)") {
    import spark.implicits._
    val docs = Seq((0L, "line\nbreak", "en", "src0", 10L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val dir = java.nio.file.Files.createTempDirectory("csv_nl").toString
    val e = intercept[Exception] {
      graft.sources.CsvIO.writeDocuments(docs, dir)
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ msgs(x.getCause))
    assert(msgs(e).exists(_.contains("embedded newline")), s"got: $e")
  }

  test("UCI write -> read round-trips docs, classes and weights exactly") {
    import spark.implicits._
    val docs = Seq(
      Doc(3L, "3", Array(TokenEntry("@default_class", "alpha", 2f),
        TokenEntry("@default_class", "beta", 1f),
        TokenEntry("author", "bob", 1.5f))),
      Doc(7L, "7", Array(TokenEntry("@default_class", "beta", 4f))))
    val base = java.nio.file.Files.createTempDirectory("uci_rt")
    val dw = base.resolve("docword").toString
    val vp = base.resolve("vocab.txt").toString
    UciReader.write(spark.createDataset(docs), dw, vp)
    val back = UciReader.read(spark, dw, vp).collect().sortBy(_.doc_id)
    assert(back.map(_.doc_id).toSeq === Seq(3L, 7L))
    def bag(d: Doc) = d.tokens.map(t => (t.class_id, t.token, t.weight)).toSet
    assert(bag(back(0)) === bag(docs(0)))
    assert(bag(back(1)) === bag(docs(1)))
    // vocab is order-bearing and class-annotated for non-default classes
    val vlines = new String(java.nio.file.Files.readAllBytes(base.resolve("vocab.txt")), "UTF-8")
    assert(vlines.linesIterator.toSeq === Seq("alpha", "beta", "bob author"))
  }

  test("VW write -> read round-trips a bag corpus via titles, not line order") {
    import spark.implicits._
    val docs = Seq(
      Doc(0L, "d0", Array(TokenEntry("@default_class", "x", 3f),
        TokenEntry("@default_class", "y", 1f))),
      Doc(9L, "d9", Array(TokenEntry("@default_class", "y", 2f))))
    val dir = java.nio.file.Files.createTempDirectory("vw_rt").toString
    VwReader.write(spark.createDataset(docs).repartition(3), dir)
    val back = VwReader.read(spark, dir).collect()
      .map(d => d.title -> d.tokens.map(t => (t.token, t.weight)).toSet).toMap
    assert(back("d0") === Set(("x", 3f), ("y", 1f)))
    assert(back("d9") === Set(("y", 2f)))
  }
}
