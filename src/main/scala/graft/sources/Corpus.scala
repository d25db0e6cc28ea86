package graft.sources

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.{Doc, TokenEntry, Txn}
import graft.functions.Rng

/** Corpus assembly helpers: turn raw tables into `Dataset[Doc]`.
  *
  * The reference's unit of storage is a protobuf "Batch" of ~1000 items
  * (messages.proto:65-74) with a batch-local integer vocabulary — an
  * encoding detail of its single-node engine. Here a corpus is just a
  * Dataset[Doc]; a Spark partition plays the role of a batch (unit of
  * parallelism for the E-step kernel), and tokens stay global strings, so
  * no batch-local dictionary bookkeeping is needed.
  */
object Corpus {

  /** Bag-of-words-ify the driver-provided `documents` table
    * (doc_id, text, lang, source, n_chars): whitespace tokens of the
    * lowercased text, one TokenEntry per distinct token with weight =
    * occurrence count. Scales linearly: narrow per-row transform, no
    * shuffle. */
  def fromDocumentsTable(docs: DataFrame): Dataset[Doc] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select($"doc_id".cast("long"), $"text".cast("string"))
      .as[(Long, String)]
      .map { case (id, text) =>
        Doc(id, s"doc$id", tokenize(text), Array.empty[Txn])
      }
  }

  /** Multimodal variant: text tokens under @default_class plus the `lang`
    * column as a one-token modality (reference multimodal batches carry a
    * class_id per token — messages.proto Item.field.class_id). */
  def fromDocumentsTableMultimodal(docs: DataFrame,
      langClass: String = "@lang"): Dataset[Doc] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select($"doc_id".cast("long"), $"text".cast("string"), $"lang".cast("string"))
      .as[(Long, String, String)]
      .map { case (id, text, lang) =>
        val langTok =
          if (lang == null || lang.trim.isEmpty) Array.empty[TokenEntry]
          else Array(TokenEntry(langClass, lang.trim.toLowerCase, 1.0f))
        Doc(id, s"doc$id", tokenize(text) ++ langTok, Array.empty[Txn])
      }
  }

  /** Position-preserving variant (one TokenEntry per occurrence, weight 1)
    * — required by window-based operators (cooc gather, ptdw agents). */
  def fromDocumentsTablePositional(docs: DataFrame): Dataset[Doc] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select($"doc_id".cast("long"), $"text".cast("string"))
      .as[(Long, String)]
      .map { case (id, text) =>
        val toks = (if (text == null) "" else text).toLowerCase.trim
          .split("\\s+").filter(_.nonEmpty)
          .map(t => TokenEntry(Rng.DefaultClass, t, 1.0f))
        Doc(id, s"doc$id", toks, Array.empty[Txn])
      }
  }

  /** Deterministic whitespace bag-of-words with counts, preserving first-
    * occurrence order (the reference keeps batch insertion order). */
  def tokenize(text: String, classId: String = Rng.DefaultClass): Array[TokenEntry] = {
    val counts = new java.util.LinkedHashMap[String, Int]()
    var i = 0
    val n = if (text == null) 0 else text.length
    val sb = new java.lang.StringBuilder()
    while (i <= n) {
      val c = if (i < n) text.charAt(i) else ' '
      if (Character.isWhitespace(c)) {
        if (sb.length > 0) {
          val tok = sb.toString.toLowerCase
          counts.merge(tok, 1, (a, b) => a + b)
          sb.setLength(0)
        }
      } else sb.append(c)
      i += 1
    }
    val out = new Array[TokenEntry](counts.size)
    val it = counts.entrySet().iterator()
    var k = 0
    while (it.hasNext) {
      val e = it.next()
      out(k) = TokenEntry(classId, e.getKey, e.getValue.toFloat)
      k += 1
    }
    out
  }

  /** In-memory n_wd ingest (reference python/artm/batches_utils.py:227-298):
    * term×doc weights + vocab -> Dataset[Doc]. Driver-side; test/small data
    * only by construction, like the reference API. */
  def fromNwdMatrix(spark: SparkSession, nwd: Array[Array[Float]], vocab: Array[String],
      classId: String = Rng.DefaultClass): Dataset[Doc] = {
    import spark.implicits._
    require(nwd.isEmpty || nwd.length == vocab.length, "n_wd rows must equal vocab size")
    val numDocs = if (nwd.isEmpty) 0 else nwd(0).length
    val docs = (0 until numDocs).map { d =>
      val toks = vocab.indices.iterator
        .map(w => TokenEntry(classId, vocab(w), nwd(w)(d)))
        .filter(_.weight > 0f)
        .toArray
      Doc(d.toLong, d.toString, toks, Array.empty[Txn])
    }
    spark.createDataset(docs)
  }
}
