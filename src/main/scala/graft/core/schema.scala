package graft.core

/** Core data model of the engine — the Spark-native re-expression of the
  * reference's protobuf messages (reference: src/artm/messages.proto:26-74,
  * src/artm/core/token.h:1-86).
  *
  * Design notes for scale: documents are plain Dataset rows (one row per
  * document — the reference's "Batch" of ~1000 items maps to a Spark
  * partition, the natural unit of parallelism); Phi/Theta are DataFrames
  * keyed by (class_id, token) / doc_id with a dense `array<float>` of
  * per-topic weights. All numerics are float32 to mirror the reference
  * (messages.proto:6-8), score accumulators are double
  * (messages.proto:289-293).
  */

/** One (modality, keyword) pair — reference core/token.h. */
case class Token(class_id: String, token: String)

/** One token occurrence inside a document, weight = term count (or any
  * nonnegative weight; reference Item.token_weight, messages.proto:26-41). */
case class TokenEntry(class_id: String, token: String, weight: Float)

/** A transaction = a multi-token event inside an item
  * (messages.proto:33-40): [start, start+length) indexes into Doc.tokens. */
case class Txn(tt_name: String, start: Int, length: Int)

/** A document. `txns` empty means every token is its own
  * @default_transaction (the non-transactional common case). */
case class Doc(
    doc_id: Long,
    title: String,
    tokens: Array[TokenEntry],
    txns: Array[Txn]) {
  def totalWeight: Double = {
    var s = 0.0; var i = 0
    while (i < tokens.length) { s += tokens(i).weight; i += 1 }
    s
  }
}

object Doc {
  def apply(docId: Long, title: String, tokens: Array[TokenEntry]): Doc =
    Doc(docId, title, tokens, Array.empty[Txn])
}

/** A document paired with an initial theta (reuse_theta — reference
  * core/cache_manager.cc:208-280, processor_helpers.cc:83-91: the E-step
  * starts from the cached per-item theta instead of uniform). null theta0
  * falls back to the configured default init. */
case class DocWithTheta(doc: Doc, theta0: Array[Float])

/** One row of a Phi-like matrix (p_wt / n_wt / r_wt):
  * reference core/phi_matrix.h:17-47. weights.length == numTopics. */
case class PhiRow(class_id: String, token: String, weights: Array[Float])

/** One column of Theta (per-document topic mixture):
  * reference messages.proto:465-473. */
case class ThetaRow(doc_id: Long, title: String, weights: Array[Float])

/** Dictionary entry — reference core/dictionary.h, messages.proto:555-568.
  * value = class-conditionally normalized tf; tf = Σ token weight over the
  * collection; df = number of distinct documents containing the token. */
case class DictEntry(class_id: String, token: String, value: Float, tf: Float, df: Float)

/** Token–token co-occurrence entry (same class); reference
  * messages.proto:555-568 cooc fields + core/cooccurrence_collector.cc. */
case class CoocEntry(class_id: String, token_a: String, token_b: String,
    cooc_tf: Float, cooc_df: Float)

/** Named-matrix registry, mirroring the reference instance-wide PhiMatrix
  * map (core/instance.cc:75-95). Values are *DataFrames* — lazily planned,
  * typically cached between EM passes. */
final class ModelRegistry {
  private val models = scala.collection.concurrent.TrieMap.empty[String, org.apache.spark.sql.DataFrame]
  def put(name: String, df: org.apache.spark.sql.DataFrame): Unit = models.put(name, df)
  def get(name: String): Option[org.apache.spark.sql.DataFrame] = models.get(name)
  def apply(name: String): org.apache.spark.sql.DataFrame =
    models.getOrElse(name, throw new NoSuchElementException(s"model '$name' not registered"))
  /** DisposeModel — reference core/master_component.cc:253-293. */
  def dispose(name: String): Unit = models.remove(name).foreach { df =>
    try df.unpersist() catch { case _: Throwable => () }
  }
  def names: Seq[String] = models.keys.toSeq.sorted
}
