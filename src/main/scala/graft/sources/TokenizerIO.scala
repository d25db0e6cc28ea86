package graft.sources

import org.apache.spark.sql.{SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import graft.pipeline.Unigram

/** Tokenizer artifact persistence — the train-once / encode-everywhere
  * deployment seam as parquet (the [[AnnIO]]/[[SearchIO]] pattern for
  * tokenizers): BPE merge tables, WordPiece vocabularies and Unigram
  * models are trained ONCE over the corpus, saved, and every encode
  * path — batch re-encodes, streaming ingest gates, downstream
  * pipelines on other clusters — loads the artifact instead of
  * retraining. All three artifacts are vocabulary-sized (KBs–MBs,
  * never corpus-sized), so they write as single-file parquet and
  * reassemble to driver-local structures on load; schema is pinned by
  * the loaders (a drift between train output and encode input fails
  * loudly at load, not silently at encode).
  *
  * Round-trip contract (TokenizerIOSpec): a loaded artifact encodes
  * BIT-IDENTICALLY to the in-memory one — merge order by rank, vocab
  * order by position, unigram ln-probabilities as exact IEEE doubles. */
object TokenizerIO {

  // ---- BPE: the ordered merge table --------------------------------

  /** Save a BPE merge table ([[graft.pipeline.Bpe.train]] rows collected
    * as (merge_rank, lhs, rhs, merged, pair_count)). */
  def saveBpe(spark: SparkSession,
      merges: Seq[(Long, String, String, String, Long)], path: String): Unit = {
    import spark.implicits._
    merges.toDF("merge_rank", "lhs", "rhs", "merged", "pair_count")
      .coalesce(1).write.mode(SaveMode.Overwrite).parquet(path)
  }

  /** Load a BPE merge table, ordered by merge_rank — the exact input
    * shape of [[graft.pipeline.Bpe.encode]]/encodeDocSubwords. */
  def loadBpe(spark: SparkSession,
      path: String): Seq[(Long, String, String, String, Long)] =
    spark.read.parquet(path)
      .select(col("merge_rank").cast("long"), col("lhs"), col("rhs"),
        col("merged"), col("pair_count").cast("long"))
      .orderBy(col("merge_rank")).collect().toSeq
      .map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getString(3), r.getLong(4)))

  // ---- WordPiece: the positional vocabulary -------------------------

  /** Save a WordPiece vocabulary ([[graft.pipeline.WordPiece.vocabulary]]
    * output) — position IS the longest-match tie order, so it rides as
    * an explicit column. */
  def saveWordPiece(spark: SparkSession, vocab: Seq[String],
      path: String): Unit = {
    import spark.implicits._
    vocab.zipWithIndex.map { case (p, i) => (i.toLong, p) }
      .toDF("pos", "piece")
      .coalesce(1).write.mode(SaveMode.Overwrite).parquet(path)
  }

  /** Load a WordPiece vocabulary in saved position order — the exact
    * input shape of [[graft.pipeline.WordPiece.encodeCounts]]/
    * encodeDocPieces. */
  def loadWordPiece(spark: SparkSession, path: String): Seq[String] =
    spark.read.parquet(path)
      .select(col("pos").cast("long"), col("piece"))
      .orderBy(col("pos")).collect().toSeq.map(_.getString(1))

  // ---- Unigram: the ln-probability model ----------------------------

  /** Save a Unigram model ([[graft.pipeline.Unigram.Model]]) — pieces +
    * EXACT IEEE ln-probabilities (parquet doubles are lossless), plus
    * the maxPieceLen segmenter knob as a 1-row meta table. */
  def saveUnigram(spark: SparkSession, model: Unigram.Model,
      path: String): Unit = {
    import spark.implicits._
    model.lnp.toSeq.sortBy(_._1).toDF("piece", "lnp")
      .coalesce(1).write.mode(SaveMode.Overwrite).parquet(s"$path/lnp.parquet")
    Seq(model.maxPieceLen).toDF("max_piece_len")
      .coalesce(1).write.mode(SaveMode.Overwrite).parquet(s"$path/meta.parquet")
  }

  /** Load a Unigram model — the exact broadcastable artifact
    * [[graft.pipeline.Unigram.segment]] consumes. */
  def loadUnigram(spark: SparkSession, path: String): Unigram.Model = {
    val lnp = spark.read.parquet(s"$path/lnp.parquet")
      .select(col("piece"), col("lnp").cast("double"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val maxLen = spark.read.parquet(s"$path/meta.parquet")
      .select(col("max_piece_len").cast("int")).head().getInt(0)
    Unigram.Model(lnp, maxLen)
  }
}
