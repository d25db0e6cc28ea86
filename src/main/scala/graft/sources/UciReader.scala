package graft.sources

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.{Doc, TokenEntry, Txn}
import graft.functions.Rng

/** UCI bag-of-words and MatrixMarket readers — reference
  * src/artm/core/collection_parser.cc:99-372.
  *
  * UCI docword: 3 header lines (D, W, NNZ) then `docID wordID count`
  * triples (wordID 1-based into vocab); vocab: `token [class_id]` per line.
  * MatrixMarket: `%%MatrixMarket` header + the same triples; vocab lines
  * are `id token weight` (weight ignored and recomputed, :355-372).
  *
  * Scale shape: the triples file is scanned distributed; the vocab (always
  * tiny relative to the corpus) is collected and broadcast, exactly the
  * broadcast-dimension join pattern; documents materialize via one
  * groupBy(docID) shuffle. */
object UciReader {

  /** vocab line -> (token, class_id); duplicate (token,class) is an error
    * in the reference (:305-353) — we validate and throw. */
  def readVocab(spark: SparkSession, vocabPath: String, matrixMarket: Boolean = false): Array[(String, String)] = {
    val lines = spark.read.textFile(vocabPath).collect() // vocab is small by format contract
    val entries = lines.iterator.map(_.trim).filter(_.nonEmpty).map { l =>
      val parts = l.split("\\s+")
      if (matrixMarket) (parts(1), Rng.DefaultClass) // `id token weight`
      else if (parts.length > 1) (parts(0), parts(1))
      else (parts(0), Rng.DefaultClass)
    }.toArray
    val dups = entries.groupBy(identity).filter(_._2.length > 1).keys
    require(dups.isEmpty, s"duplicate vocab entries: ${dups.take(5).mkString(", ")}")
    entries
  }

  def read(spark: SparkSession, docwordPath: String, vocabPath: String): Dataset[Doc] =
    readTriples(spark, docwordPath, vocabPath, headerLines = 3, matrixMarket = false)

  def readMatrixMarket(spark: SparkSession, mmPath: String, vocabPath: String): Dataset[Doc] =
    readTriples(spark, mmPath, vocabPath, headerLines = 2, matrixMarket = true)

  /** Write a corpus as UCI bag-of-words — the export twin of [[read]]
    * (reference parses this format at collection_parser.cc:99-372; its
    * CLI regenerates it via batch dumps). Per-doc repeated tokens are
    * aggregated into one triple (the format is a bag). The vocab file is
    * ORDER-BEARING (line number = 1-based word id) and tiny by format
    * contract, so it is driver-held and written as one file; the triples
    * stream through a single-partition text write with the D/W/NNZ
    * header prepended in-partition (one file so [[read]]'s positional
    * header drop sees the header first). */
  def write(docs: Dataset[Doc], docwordDir: String, vocabPath: String): Unit = {
    val spark = docs.sparkSession
    import spark.implicits._
    val entries = docs
      .flatMap(d => d.tokens.iterator.map(t =>
        (d.doc_id, t.class_id, t.token, t.weight.toDouble)))
      .toDF("doc_id", "class_id", "token", "w")
      .groupBy("doc_id", "class_id", "token").agg(sum($"w").as("w"))
      .persist()
    val vocab = entries.select("token", "class_id").distinct()
      .collect().map(r => (r.getString(0), r.getString(1)))
      .sortBy { case (t, c) => (c != Rng.DefaultClass, c, t) }
    val wordId = vocab.zipWithIndex.map { case (tc, i) => tc -> (i + 1) }.toMap
    val bWord = spark.sparkContext.broadcast(wordId)
    val nDocs = entries.select("doc_id").distinct().count()
    val nnz = entries.count()
    val header = Seq(nDocs.toString, vocab.length.toString, nnz.toString)
    entries.as[(Long, String, String, Double)]
      .map { case (id, c, t, w) =>
        val ws = if (w == w.toLong.toDouble) w.toLong.toString else w.toString
        s"$id ${bWord.value((t, c))} $ws"
      }
      .coalesce(1)
      .mapPartitions(it => header.iterator ++ it)
      .write.mode(org.apache.spark.sql.SaveMode.Overwrite).text(docwordDir)
    entries.unpersist()
    val vocabLines = vocab.map { case (t, c) =>
      if (c == Rng.DefaultClass) t else s"$t $c" }
    java.nio.file.Files.write(java.nio.file.Paths.get(vocabPath),
      vocabLines.mkString("\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
  }

  private def readTriples(spark: SparkSession, path: String, vocabPath: String,
      headerLines: Int, matrixMarket: Boolean): Dataset[Doc] = {
    import spark.implicits._
    val vocab = readVocab(spark, vocabPath, matrixMarket)
    val bVocab = spark.sparkContext.broadcast(vocab)

    val raw = spark.read.textFile(path)
    // header = first lines (D W NNZ for UCI; %% banner + dims for MM).
    // Triples are distinguishable syntactically: exactly 3 integer fields —
    // except the MM/UCI dims line, which we drop by position via zipWithIndex.
    val triples = spark.createDataset(
      raw.rdd.zipWithIndex().flatMap { case (line, idx) =>
        if (idx < headerLines) None
        else {
          val t = line.trim
          if (t.isEmpty || t.startsWith("%")) None
          else {
            val p = t.split("\\s+")
            if (p.length < 3) None
            else Some((p(0).toLong, p(1).toInt, p(2).toFloat))
          }
        }
      })
      .toDF("doc_id", "word_id", "count")

    triples
      .groupBy($"doc_id")
      .agg(sort_array(collect_list(struct($"word_id", $"count"))).as("entries"))
      .as[(Long, Seq[(Int, Float)])]
      .map { case (docId, entries) =>
        val v = bVocab.value
        val toks = entries.iterator
          .filter { case (w, _) => w >= 1 && w <= v.length }
          .map { case (w, c) => val (tok, cls) = v(w - 1); TokenEntry(cls, tok, c) }
          .toArray
        Doc(docId, docId.toString, toks, Array.empty[Txn])
      }
  }
}
