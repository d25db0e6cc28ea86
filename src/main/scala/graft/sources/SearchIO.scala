package graft.sources

import org.apache.spark.sql.{SaveMode, SparkSession}
import graft.pipeline.TextAnalysis

/** BM25 inverted-index persistence — the [[AnnIO]] pattern for text
  * retrieval: the postings table (the one corpus-sized artifact — one
  * row per (doc, term) with tf and doc length), the term
  * document-frequency table, and the one-row corpus stats, each as
  * parquet. Build once with
  * [[graft.pipeline.TextAnalysis.buildBm25Index]], `save`, then serve
  * query traffic from `load` + `bm25Query` without re-tokenizing the
  * corpus — at 100 TB the indexing pass is the expensive scan and the
  * loaded postings are partition-pruned/pushed-down like any parquet
  * table. */
object SearchIO {

  def save(index: TextAnalysis.Bm25Index, path: String): Unit = {
    index.postings.write.mode(SaveMode.Overwrite)
      .parquet(s"$path/postings.parquet")
    index.termDf.write.mode(SaveMode.Overwrite)
      .parquet(s"$path/term_df.parquet")
    index.stats.coalesce(1).write.mode(SaveMode.Overwrite)
      .parquet(s"$path/stats.parquet")
  }

  def load(spark: SparkSession, path: String,
      idCol: String = "doc_id"): TextAnalysis.Bm25Index =
    TextAnalysis.Bm25Index(
      spark.read.parquet(s"$path/postings.parquet"),
      spark.read.parquet(s"$path/term_df.parquet"),
      spark.read.parquet(s"$path/stats.parquet"),
      idCol)
}
