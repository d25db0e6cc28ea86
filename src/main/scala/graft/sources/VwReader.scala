package graft.sources

import org.apache.spark.sql.{Dataset, SparkSession}
import graft.core.{Doc, TokenEntry, Txn}
import graft.functions.Rng

import scala.collection.mutable.ArrayBuffer

/** Vowpal-Wabbit corpus reader — reference
  * src/artm/core/collection_parser.cc:483-806.
  *
  * One document per line: `title token[:weight]… [|class token…]… [|| …]`;
  * `|name` switches modality, `||` closes a multi-token transaction,
  * `||name` switches transaction typename (single-token transactions).
  *
  * The reference reads the file with a mutex-guarded thread pool because
  * its batch files must be assembled in memory; lines are independent, so
  * here the parse is a narrow `map` over `spark.read.text` — embarrassingly
  * parallel, no locks, scales to any file count/size Spark can scan. */
object VwReader {

  val DefaultTransaction = "@default_transaction"

  def read(spark: SparkSession, path: String): Dataset[Doc] = {
    import spark.implicits._
    val lines = spark.read.textFile(path)
    // stable doc ids = line order via zipWithIndex (deterministic per file)
    val withId = lines.rdd.zipWithIndex()
    spark.createDataset(withId.map { case (line, idx) => parseLine(line, idx) })
      .filter(_ != null)
  }

  /** Parse one VW line into a Doc; doc_id = line number. Returns null for
    * blank/too-short lines (the reference raises; we skip and let callers
    * validate counts). */
  def parseLine(line: String, docId: Long): Doc = {
    val strs = line.split("[ \t\r]")
    if (strs.length <= 1) return null
    val title = strs(0)

    val toks = new ArrayBuffer[TokenEntry]()
    val txns = new ArrayBuffer[Txn]()
    var currentTt = DefaultTransaction
    var currentClass = Rng.DefaultClass

    // pending tokens of the (possibly multi-token) open transaction
    val pTok = new ArrayBuffer[TokenEntry]()

    def recordTransaction(entries: Seq[TokenEntry], tt: String): Unit = {
      if (entries.nonEmpty) {
        txns += Txn(tt, toks.length, entries.length)
        toks ++= entries
      }
    }
    def dumpPendingAsSingles(): Unit = {
      pTok.foreach(t => recordTransaction(Seq(t), currentTt))
      pTok.clear()
    }

    var i = 1
    while (i < strs.length) {
      val elem = strs(i)
      if (elem.nonEmpty) {
        if (elem.charAt(0) == '|') {
          if (elem.length > 1 && elem.charAt(1) == '|') {
            if (elem.length == 2) {
              // `||` — close the open multi-token transaction
              if (pTok.nonEmpty) recordTransaction(pTok.toSeq, currentTt)
            } else {
              // `||name` — dump pending as single-token txns, switch typename
              dumpPendingAsSingles()
              currentTt = elem.substring(2)
            }
            pTok.clear()
            currentClass = Rng.DefaultClass
          } else {
            currentClass = if (elem.length == 1) Rng.DefaultClass else elem.substring(1)
          }
        } else {
          val ci = elem.indexOf(':')
          if (ci == 0 || ci == elem.length - 1) {
            // reference raises on `:x` / `x:`; skip defensively
          } else if (ci > 0) {
            val w = try elem.substring(ci + 1).toFloat catch { case _: NumberFormatException => Float.NaN }
            if (!w.isNaN) pTok += TokenEntry(currentClass, elem.substring(0, ci), w)
          } else {
            pTok += TokenEntry(currentClass, elem, 1.0f)
          }
        }
      }
      i += 1
    }
    dumpPendingAsSingles()
    Doc(docId, title, toks.toArray, txns.toArray)
  }

  /** Write a corpus back out as VW text (reference CLI --write-vw-corpus,
    * srcmain.cc): `title tok[:w]… |class tok…` with the default class
    * first. Transaction segmentation is not re-emitted (the reference
    * writer flattens batches the same way — tokens only). */
  def write(docs: Dataset[Doc], path: String): Unit = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.map { d =>
      // producer-side representability guard (the CsvIO newline-guard
      // contract): the VW line format cannot carry these — a ':' inside
      // a token would parse back as a weight separator, a leading '|' as
      // a modality switch, whitespace as a token boundary — so fail
      // LOUDLY at the producer instead of surfacing as a downstream
      // parse divergence
      def bad(what: String, v: String) = throw new IllegalArgumentException(
        s"VwReader.write: $what '$v' (doc ${d.doc_id}) is not representable "
          + "in VW line format")
      if (d.title.isEmpty || d.title.exists(_.isWhitespace) ||
        d.title.charAt(0) == '|') bad("title", d.title)
      // a token-less doc writes a bare title line, which parseLine
      // silently SKIPS on read — an unrepresentable doc, not an empty one
      if (d.tokens.isEmpty) bad("token-less document", d.title)
      d.tokens.foreach { t =>
        if (t.token.isEmpty || t.token.contains(':') ||
          t.token.charAt(0) == '|' || t.token.exists(_.isWhitespace))
          bad("token", t.token)
        if (t.class_id.isEmpty || t.class_id.charAt(0) == '|' ||
          t.class_id.exists(_.isWhitespace) || t.class_id.contains(':'))
          bad("class_id", t.class_id)
        // NaN writes 'tok:NaN', which the reader silently discards
        if (t.weight.isNaN) bad(s"weight of token '${t.token}'", "NaN")
      }
      val sb = new StringBuilder(d.title)
      var cur = Rng.DefaultClass
      val groups = d.tokens.groupBy(_.class_id).toSeq
        .sortBy { case (c, _) => (c != Rng.DefaultClass, c) }
      groups.foreach { case (c, ts) =>
        if (c != cur) { sb.append(" |").append(c); cur = c }
        ts.foreach { t =>
          sb.append(' ').append(t.token)
          if (t.weight != 1.0f)
            sb.append(':').append(
              if (t.weight == t.weight.toInt) t.weight.toInt.toString
              else t.weight.toString)
        }
      }
      sb.toString
    }.write.mode(org.apache.spark.sql.SaveMode.Overwrite).text(path)
  }
}
