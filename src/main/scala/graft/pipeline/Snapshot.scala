package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus snapshot diff — the dataset-versioning primitive behind
  * training-data iteration: "what changed between corpus v(n) and
  * v(n+1)?" feeds incremental re-tokenization, delta-dedup, and the
  * audit trail a data card cites. Identity is the row key; content
  * identity is an md5 of the payload column(s).
  */
object Snapshot {

  /** Per-row diff of two snapshots: full outer join on the key, compare
    * content hashes. Returns [id, status] with status ∈
    * {added, removed, changed, unchanged} (added/removed relative to
    * `newDf`).
    *
    * Shape at scale: ONE id-keyed full outer join (both sides
    * hash-partition on the key — no broadcast assumption, snapshots are
    * corpus-sized by definition) over pre-hashed narrow projections, so
    * the shuffle moves (id, 32-byte hash) pairs, never the payloads.
    * Status is a narrow comparison — the whole diff is join-bound. */
  def diff(oldDf: DataFrame, newDf: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val o = oldDf.select(col(idCol).cast("long").as("id"),
      md5(col(textCol)).as("__h_old"))
    val n = newDf.select(col(idCol).cast("long").as("id"),
      md5(col(textCol)).as("__h_new"))
    o.join(n, Seq("id"), "full_outer")
      .select(col("id"),
        when(col("__h_old").isNull, "added")
          .when(col("__h_new").isNull, "removed")
          .when(col("__h_old") === col("__h_new"), "unchanged")
          .otherwise("changed").as("status"))
  }

  /** Rollup of [[diff]]: row counts per status — the one-line release
    * note ("+12 034 docs, 88 changed, 3 100 removed"). */
  def diffSummary(oldDf: DataFrame, newDf: DataFrame,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    diff(oldDf, newDf, idCol, textCol)
      .groupBy(col("status")).agg(count(lit(1)).as("n"))
}
