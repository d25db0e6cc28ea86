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

  /** Distribution drift between snapshots: per `groupCol`, the
    * Jensen–Shannon divergence of the token unigram distributions —
    * the release gate that catches "the crawler changed and src2 is
    * suddenly half boilerplate" even when ids/hashes churn too much for
    * [[diff]] to summarize. 0 = identical mixture, ln(2) = disjoint.
    * Returns [groupCol, jsd].
    *
    * Shape at scale: two map-side-combined (group, token) count
    * shuffles, a full-outer merge on the same key, per-group totals
    * broadcast back, and one DECIMAL-summed per-group reduction
    * (order-proof — the JS terms carry libm `ln` last-ulp noise, which
    * the 6-decimal rounding absorbs; the SUM must not add its own
    * order sensitivity on top). */
  def drift(oldDf: DataFrame, newDf: DataFrame,
      groupCol: String = "source", textCol: String = "text"): DataFrame = {
    def counts(df: DataFrame, cName: String) = df
      .select(col(groupCol).as("g"),
        explode(TextAnalysis.tokensCol(col(textCol))).as("tok"))
      .where(col("tok") =!= "")
      .groupBy(col("g"), col("tok"))
      .agg(count(lit(1)).as(cName))
    val a = counts(oldDf, "na")
    val b = counts(newDf, "nb")
    val merged = a.join(b, Seq("g", "tok"), "full_outer")
      .select(col("g"), col("tok"),
        coalesce(col("na"), lit(0L)).as("na"),
        coalesce(col("nb"), lit(0L)).as("nb"))
    val totals = merged.groupBy(col("g"))
      .agg(sum(col("na")).as("ta"), sum(col("nb")).as("tb"))
    // a group absent from one snapshot has no second distribution —
    // jsd is NULL for it ([[diff]] reports the disappearance itself)
    val valid = totals.where(col("ta") > 0 && col("tb") > 0)
    val terms = merged.join(broadcast(valid), Seq("g"))
      .withColumn("p", col("na").cast("double") / col("ta").cast("double"))
      .withColumn("q", col("nb").cast("double") / col("tb").cast("double"))
      .withColumn("m", (col("p") + col("q")) / lit(2.0))
      .withColumn("term",
        when(col("p") > 0, col("p") * log(col("p") / col("m")) / lit(2.0))
          .otherwise(lit(0.0)) +
        when(col("q") > 0, col("q") * log(col("q") / col("m")) / lit(2.0))
          .otherwise(lit(0.0)))
    val jsd = terms.groupBy(col("g"))
      .agg(round(sum(col("term").cast("decimal(38,18)")).cast("double"), 6)
        .as("jsd"))
    totals.select(col("g"))
      .join(jsd, Seq("g"), "left")
      .select(col("g").as(groupCol), col("jsd"))
  }
}
