package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Operational diagnostics for running this engine at scale — the
  * reports an operator team consults BEFORE a 100 TB job, answering
  * "will this key skew?" without running the join.
  *
  * Reference context: the reference engine is single-node and never
  * needs this; on a cluster, one hot key serializes a shuffle stage
  * (the funnel/ funnel-cap and salting notes in PLANS), so the
  * diagnostic that FINDS the hot keys is part of the operator surface,
  * not an afterthought. */
object Diagnostics {

  /** Key-skew report for a prospective join/groupBy key: the `topK`
    * hottest key values with row counts, their share of the table, and
    * the per-key SALT FACTOR a salted repartition would need to bring
    * that key down to the mean key load (1 = no salting needed — the
    * standard skew prescription, computed from data instead of guessed).
    *
    * All inputs to the final divisions are exact integers (counts), so
    * the report is engine- and partitioning-deterministic.
    *
    * Shape at scale: ONE map-side-combined count per key (the same
    * shuffle the real join would pay, minus the payload), a 1-row
    * global aggregate broadcast back, and a global top-k taken as
    * orderBy+limit — TakeOrderedAndProject (map-side partial top-k),
    * NEVER a single-task global sort of the key table; the rank window
    * runs over the already-limited k rows. Returns
    * [rank, key, n_rows, share, salt_factor]. */
  def keySkew(df: DataFrame, keyCol: String, topK: Int = 10): DataFrame = {
    val counts = df.groupBy(col(keyCol).cast("string").as("key"))
      .agg(count(lit(1)).as("n_rows"))
    val totals = counts.agg(sum(col("n_rows")).as("_total"),
      count(lit(1)).as("_n_keys"))
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("n_rows").desc, col("key"))
    counts.crossJoin(broadcast(totals))
      .orderBy(col("n_rows").desc, col("key"))
      .limit(topK)
      .withColumn("rank", row_number().over(w).cast("long"))
      .select(col("rank"), col("key"), col("n_rows"),
        round(col("n_rows").cast("double") / col("_total"), 6).as("share"),
        // ceil(count·n_keys / total) = ceil(count / mean-key-load);
        // double-first so the product can't overflow a long at scale
        ceil(col("n_rows").cast("double") * col("_n_keys") / col("_total"))
          .cast("long").as("salt_factor"))
  }
}
