package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Wiki-dump-style XML document I/O — the format the largest public
  * reference corpora actually arrive in (Wikipedia/Wikimedia dumps are
  * XML; WikiExtractor-style pipelines emit exactly this one-element-per-
  * document shape). Each document is ONE `<doc …>…</doc>` element on one
  * line, so the file splits on ordinary newlines and every parse step is
  * a codegen'd regexp over its own line — no DOM, no multi-line record
  * assembly, scan-speed at 100 TB:
  *
  *   <doc id="7" lang="en" source="src3" n_chars="42">escaped text</doc>
  *
  * Escaping is the minimal XML set (& < > — attribute values here are
  * machine-generated [a-z0-9]+ tokens, never quoted-char-bearing), and
  * the single-line contract is enforced at the PRODUCER exactly like
  * [[CsvIO.writeDocuments]]: a newline-bearing text fails the write
  * loudly rather than mis-splitting on read. Reads are FAILFAST in
  * spirit: a line that does not match the element shape raises through
  * [[readDocuments]]'s guard instead of silently dropping. */
object XmlIO {

  private def xmlEscape(c: Column): Column =
    regexp_replace(regexp_replace(regexp_replace(c,
      "&", "&amp;"), "<", "&lt;"), ">", "&gt;")

  private def xmlUnescape(c: Column): Column =
    regexp_replace(regexp_replace(regexp_replace(c,
      "&lt;", "<"), "&gt;", ">"), "&amp;", "&")

  def writeDocuments(df: DataFrame, path: String): Unit =
    df.select(concat(
        lit("<doc id=\""), col("doc_id").cast("string"),
        lit("\" lang=\""), col("lang"),
        lit("\" source=\""), col("source"),
        lit("\" n_chars=\""), col("n_chars").cast("string"),
        lit("\">"),
        xmlEscape(
          when(col("text").contains("\n") || col("text").contains("\r"),
            raise_error(concat(lit("XmlIO.writeDocuments: embedded newline "
              + "in text of doc_id "), col("doc_id").cast("string"),
              lit(" — the line-oriented XML reader would mis-split it"))))
            .otherwise(col("text"))),
        lit("</doc>")).as("value"))
      .write.mode(SaveMode.Overwrite).text(path)

  def readDocuments(spark: SparkSession, path: String): DataFrame = {
    val line = col("value")
    val shape = "^<doc id=\"(\\d+)\" lang=\"([^\"]*)\" source=\"([^\"]*)\"" +
      " n_chars=\"(\\d+)\">(.*)</doc>$"
    spark.read.text(path)
      .filter(length(trim(line)) > 0)
      .select(
        when(line.rlike(shape), line).otherwise(raise_error(
          concat(lit("XmlIO.readDocuments: malformed doc element: "),
            substring(line, 1, 80)))).as("value"))
      .select(
        regexp_extract(line, shape, 1).cast("long").as("doc_id"),
        xmlUnescape(regexp_extract(line, shape, 5)).as("text"),
        regexp_extract(line, shape, 2).as("lang"),
        regexp_extract(line, shape, 3).as("source"),
        regexp_extract(line, shape, 4).cast("long").as("n_chars"))
  }

  private val staged =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), String]()

  def stageDocuments(spark: SparkSession, dir: String): String =
    staged.computeIfAbsent((spark, dir), { _ =>
      val out = java.nio.file.Files.createTempDirectory("graft_xml").toString
      writeDocuments(spark.read.parquet(s"$dir/documents.parquet"), out)
      out
    })
}

/** WARC-style document I/O — the shape of the web itself: CommonCrawl
  * (the substrate of essentially every open LLM pretraining corpus)
  * ships multi-line WARC records, headers then a blank line then the
  * payload. The distributed-read trick is the RECORD DELIMITER: Hadoop's
  * line reader accepts an arbitrary byte sequence as `lineSep`, and
  * `"\r\n\r\nWARC/1.0\r\n"` (payload terminator + next record's magic)
  * splits a WARC member SAFELY at any byte offset — the same mechanism
  * that makes plain text splittable makes WARC splittable, no
  * gzip-member gymnastics needed on an uncompressed archive. Each split
  * element is then one self-contained record parsed by codegen'd
  * regexps (multi-line `(?s)` extracts — no UDF, no DOM).
  *
  * Fidelity kept: the WARC/1.0 magic, WARC-Type/WARC-Record-ID headers,
  * Content-Length computed from the payload. Corpus columns that WARC
  * has no slot for ride as X-Graft-* extension headers (the standard
  * WARC extension mechanism). Single-line payloads enforced at the
  * producer (a CR/LF-bearing text would collide with the record
  * delimiter — same loud-producer contract as [[CsvIO]]). */
object WarcIO {

  private val Sep = "\r\n\r\nWARC/1.0\r\n"

  def writeDocuments(df: DataFrame, path: String): Unit = {
    val payload =
      when(col("text").contains("\n") || col("text").contains("\r"),
        raise_error(concat(lit("WarcIO.writeDocuments: embedded newline in "
          + "text of doc_id "), col("doc_id").cast("string"),
          lit(" — CR/LF collides with the WARC record delimiter"))))
        .otherwise(col("text"))
    df.select(concat(
        lit("WARC/1.0\r\n"),
        lit("WARC-Type: response\r\n"),
        lit("WARC-Record-ID: <urn:graft:"), col("doc_id").cast("string"),
        lit(">\r\n"),
        lit("X-Graft-Lang: "), col("lang"), lit("\r\n"),
        lit("X-Graft-Source: "), col("source"), lit("\r\n"),
        lit("X-Graft-N-Chars: "), col("n_chars").cast("string"), lit("\r\n"),
        lit("Content-Length: "),
        length(payload).cast("string"), lit("\r\n"),
        lit("\r\n"), payload).as("value"))
      // records separated by CRLF CRLF — the writer's lineSep IS the
      // WARC record terminator, so the bytes on disk are a real archive
      .write.option("lineSep", "\r\n\r\n").mode(SaveMode.Overwrite).text(path)
  }

  def readDocuments(spark: SparkSession, path: String): DataFrame = {
    // each element = one record, minus the delimiter; the first record
    // of every part file keeps a leading "WARC/1.0\r\n" (no preceding
    // payload terminator to join it to) — strip it, then a trailing
    // terminator survives on the last record — trim it
    val rec = regexp_replace(
      regexp_replace(col("value"), "^WARC/1.0\r\n", ""),
      "(\r\n)+$", "")
    // (?:\r\n|$): an empty-payload record loses its blank line to the
    // trailing-CRLF strip, leaving the last header flush with record end
    def header(name: String): Column =
      regexp_extract(rec, s"(?s)$name: ([^\r\n]*)(?:\r\n|$$)", 1)
    spark.read.option("lineSep", Sep).text(path)
      .filter(length(trim(col("value"))) > 0)
      .select(
        regexp_extract(rec, "(?s)WARC-Record-ID: <urn:graft:(\\d+)>", 1)
          .cast("long").as("doc_id"),
        regexp_extract(rec, "(?s)\r\n\r\n(.*)$", 1).as("text"),
        header("X-Graft-Lang").as("lang"),
        header("X-Graft-Source").as("source"),
        header("X-Graft-N-Chars").cast("long").as("n_chars"),
        header("Content-Length").cast("long").as("content_length"))
      .select(
        when(col("content_length") === length(col("text")), col("doc_id"))
          .otherwise(raise_error(concat(
            lit("WarcIO.readDocuments: Content-Length mismatch on record "),
            col("doc_id").cast("string")))).as("doc_id"),
        col("text"), col("lang"), col("source"), col("n_chars"))
  }

  private val staged =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), String]()

  def stageDocuments(spark: SparkSession, dir: String): String =
    staged.computeIfAbsent((spark, dir), { _ =>
      val out = java.nio.file.Files.createTempDirectory("graft_warc").toString
      writeDocuments(spark.read.parquet(s"$dir/documents.parquet"), out)
      out
    })
}
