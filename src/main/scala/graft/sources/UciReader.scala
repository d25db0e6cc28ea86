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
