package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{NumericType, StringType}

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

  /** Column-profile report — the pre-flight data card of a new table:
    * per column, row/null/exact-distinct counts and min/max/mean of the
    * column's NUMERIC VIEW (the value for numeric columns, the
    * code-point length for strings — one uniform double summary per
    * column, no engine-dependent string collation on the oracle path).
    * Returns [column, n_rows, n_null, n_distinct, min_v, max_v, mean_v]
    * ordered by column name.
    *
    * Shape at scale: ONE aggregation pass — every per-column aggregate
    * (including the exact distincts) lives in a single `agg`, which
    * Catalyst plans as one Expand + partial/final hash aggregate; the
    * stack-to-rows happens AFTER aggregation on the 1-row result, so
    * the row-proportional work is a single map-side-combined shuffle
    * regardless of column count. Exact distincts are the oracle
    * contract; at 100 TB swap `countDistinct` for
    * `approx_count_distinct` (same plan minus Expand) when ±2 % is
    * acceptable. Columns of non-numeric, non-string type are skipped. */
  def profile(df: DataFrame, columns: Seq[String] = Nil): DataFrame = {
    val picked = (if (columns.nonEmpty) columns else df.schema.map(_.name))
      .filter(c => df.schema(c).dataType match {
        case StringType | _: NumericType => true
        case _ => false
      }).sorted
    require(picked.nonEmpty, "profile: no string/numeric columns to profile")
    def v(c: String): Column = df.schema(c).dataType match {
      case StringType => length(col(c)).cast("double")
      case _ => col(c).cast("double")
    }
    val aggs = picked.flatMap { c =>
      Seq(count(col(c)).as(s"nn_$c"),
        countDistinct(col(c)).as(s"nd_$c"),
        round(min(v(c)), 6).as(s"mn_$c"),
        round(max(v(c)), 6).as(s"mx_$c"),
        round(avg(v(c)), 6).as(s"av_$c"))
    } :+ count(lit(1)).as("n_all")
    df.agg(aggs.head, aggs.tail: _*)
      .select(explode(array(picked.map(c => struct(
        lit(c).as("column"),
        col("n_all").as("n_rows"),
        (col("n_all") - col(s"nn_$c")).as("n_null"),
        col(s"nd_$c").as("n_distinct"),
        col(s"mn_$c").as("min_v"),
        col(s"mx_$c").as("max_v"),
        col(s"av_$c").as("mean_v"))): _*)).as("p"))
      .select(col("p.*"))
  }

  /** Exact per-group quantiles of a value column — the distribution
    * report behind data cards and drift alerts (min/mean/max hide the
    * shape; p50/p95/p99 are what a release review actually reads).
    * Spark's `percentile` and DuckDB's `quantile_cont` share the same
    * linear-interpolation definition (the funnelTiming precedent), so
    * the report is oracle-exact under round(6).
    *
    * Scale note: exact percentile buffers each group's values in one
    * aggregation buffer — correct for grouped telemetry where groups
    * are bounded (event types, sources, langs); for an UNGROUPED
    * 100 TB column swap in `approx_percentile` (t-digest, mergeable,
    * bounded state) and keep this as the oracle baseline at test SFs.
    * NULL values are ignored by both engines. Returns
    * [<groupCol>, n_values, p<nn>...]. */
  def quantiles(df: DataFrame, valueCol: String, groupCol: String,
      ps: Seq[Double]): DataFrame = {
    require(ps.nonEmpty && ps.forall(p => p >= 0.0 && p <= 1.0),
      "ps must be fractions in [0, 1]")
    val qs = df.groupBy(col(groupCol))
      .agg(count(col(valueCol)).as("n_values"),
        percentile(col(valueCol), typedLit(ps)).as("_qs"))
    qs.select(col(groupCol) +: col("n_values") +:
      ps.zipWithIndex.map { case (p, i) =>
        round(element_at(col("_qs"), i + 1), 6)
          .as(s"p${math.round(p * 100)}")
      }: _*)
  }

  /** Per-dimension embedding profile — the sanity report an embedding
    * pipeline runs before indexing a new model's vectors (a dead
    * dimension, a scale blow-up, or a shifted mean each break ANN
    * recall silently): for every vector position, count, mean, min,
    * max. The mean uses the repo's DECIMAL(18,6)-sum form so it is
    * bit-identical under any aggregation order (the embed_kmeans
    * precedent); min/max over float32 are exact in double.
    *
    * Scale shape: ONE posexplode + one map-side-combined groupBy on
    * the d-sized dimension key — shuffle rows = d × #partitions, never
    * corpus-sized. Returns [dim, n, mean, min_x, max_x] (dim 0-based). */
  def embedDimStats(embeddings: DataFrame,
      vecCol: String = "embedding"): DataFrame = {
    embeddings
      .select(posexplode(col(vecCol)).as(Seq("dim", "__x")))
      .select(col("dim"), col("__x").cast("double").as("x"))
      .groupBy(col("dim"))
      .agg(count(lit(1)).as("n"),
        round(sum(col("x").cast("decimal(18,6)")).cast("double")
          / count(lit(1)), 6).as("mean"),
        min(col("x")).as("min_x"),
        max(col("x")).as("max_x"))
  }
}
