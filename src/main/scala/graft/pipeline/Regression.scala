package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Closed-form regression analytics over grouped data — model fitting
  * as ONE map-side-combinable aggregation, no iteration, no driver
  * math.
  *
  * [[olsByGroup]] fits y = slope·x + intercept per group from the five
  * exact moments (n, Σx, Σy, Σx², Σxy, plus Σy² for r²): integer
  * inputs are summed as DECIMAL(38,0) — exact and order-insensitive
  * where double sums are last-ulp order-sensitive — then cast to
  * double ONCE, and the closed forms run in a fixed expression tree,
  * so the result is bit-identical across engines and partitionings
  * (the events_ohlc / embed_kmeans determinism pattern applied to
  * model fitting). Degenerate groups (zero x-variance) yield null
  * slope/intercept/r2 instead of ±Inf.
  *
  * Scale shape: one shuffle of six partials per group key; the moment
  * aggregation is map-side combined, so a 100 TB fit moves
  * #groups × 6 numbers. */
object Regression {

  /** Per-group simple OLS of `yCol` on `xCol` (both numeric; summed
    * exactly via DECIMAL(38,0), so intended for integer-valued
    * features like token/char counts). Returns
    * [group, n, slope, intercept, r2] with 9-decimal rounding. */
  def olsByGroup(df: DataFrame, groupCol: String, xCol: String,
      yCol: String): DataFrame = {
    val x = col(xCol).cast("decimal(38,0)")
    val y = col(yCol).cast("decimal(38,0)")
    val m = df.groupBy(col(groupCol))
      .agg(
        count(lit(1)).as("n_l"),
        sum(x).cast("double").as("sx"),
        sum(y).cast("double").as("sy"),
        sum((x * y).cast("decimal(38,0)")).cast("double").as("sxy"),
        sum((x * x).cast("decimal(38,0)")).cast("double").as("sxx"),
        sum((y * y).cast("decimal(38,0)")).cast("double").as("syy"))
      .withColumn("n", col("n_l").cast("double"))
    val num = col("n") * col("sxy") - col("sx") * col("sy")
    val denX = col("n") * col("sxx") - col("sx") * col("sx")
    val denY = col("n") * col("syy") - col("sy") * col("sy")
    val slope = num / denX
    m.select(col(groupCol), col("n_l").as("n"),
      when(denX === 0.0, lit(null)).otherwise(round(slope, 9)).as("slope"),
      when(denX === 0.0, lit(null))
        .otherwise(round((col("sy") - slope * col("sx")) / col("n"), 9))
        .as("intercept"),
      when(denX === 0.0 || denY === 0.0, lit(null))
        .otherwise(round(num * num / (denX * denY), 9)).as("r2"))
  }
}
