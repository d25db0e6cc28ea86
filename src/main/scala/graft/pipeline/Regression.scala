package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
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

  /** Distributed binary logistic regression by full-batch gradient
    * descent — REAL multi-iteration model training under the oracle
    * (the embed_kmeans / embed_pca determinism recipe applied to a
    * classifier): each iteration is ONE map-side-combined aggregation
    * of the per-feature gradient sums; per-row gradient terms
    * (σ(w·x) − y)·x_k are cast to DECIMAL(28,10) — absorbing the
    * engines' last-ulp exp() differences — and summed exactly, and the
    * weight update w_k ← round(w_k − lr·S_k/n, 9) pins every iteration
    * to a replayable 9-decimal grid. The weight vector (k+1 doubles)
    * is the only driver state — the gradient pass streams the corpus,
    * so the same loop runs at 100 TB (one scan per iteration).
    *
    * The contract is the deterministic ITERATION TRAJECTORY from the
    * zero start (convergence at few iterations is a non-goal — the
    * same contract as embed_pca's 5-step trajectory). Returns
    * [iter, weights... ] long-format: one row per iteration with
    * `feature` = "_intercept" or the feature column name. */
  def logisticGd(df: DataFrame, labelCol: String,
      featureCols: Seq[String], iters: Int, lr: Double): DataFrame = {
    require(iters >= 1 && featureCols.nonEmpty)
    val spark = df.sparkSession
    import spark.implicits._
    var w = Array.fill(featureCols.length + 1)(0.0)
    val rows = scala.collection.mutable.ArrayBuffer.empty[(Long, String, Double)]
    for (it <- 1 to iters) {
      // z in the fixed left-fold order w0 + w1·x1 + … (the SQL mirror
      // folds identically), all double ops — IEEE-exact across engines
      val z = featureCols.zipWithIndex.foldLeft(lit(w(0))) {
        case (acc, (f, i)) => acc + lit(w(i + 1)) * col(f).cast("double")
      }
      val sig = lit(1.0) / (lit(1.0) + exp(-z))
      val resid = sig - col(labelCol).cast("double")
      val aggs = (resid +: featureCols.map(f => resid * col(f).cast("double")))
        .zipWithIndex.map { case (t, i) =>
          sum(t.cast("decimal(28,10)")).as(s"s$i") }
      val row = df.agg(count(lit(1)).as("n"), aggs: _*).head()
      val n = row.getLong(0).toDouble
      // degenerate-input guard (the olsByGroup/auc null-guard contract):
      // on an empty frame sum() is null and n = 0 would divide by zero —
      // loud error beats an NPE out of getDecimal
      require(n > 0, "logisticGd requires a non-empty input DataFrame")
      w = w.indices.toArray.map { i =>
        val s = row.getDecimal(i + 1).doubleValue()
        BigDecimal(w(i) - lr * s / n)
          .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
      }
      rows += ((it.toLong, "_intercept", w(0)))
      featureCols.zipWithIndex.foreach { case (f, i) =>
        rows += ((it.toLong, f, w(i + 1))) }
    }
    rows.toSeq.toDF("iter", "feature", "weight")
  }

  /** Probability-calibration report (the reliability diagram, and the
    * inputs to ECE): fit [[logisticGd]], score every row with the FINAL
    * weights, round p to the 6-decimal grid (bins are assigned on the
    * ROUNDED value — the rank-on-rounded recipe, so the bin edge cannot
    * flip on a last-ulp exp difference between engines), and roll
    * `bins` equal-width bins to [bin, n, frac_pos, mean_p]. A
    * well-calibrated model has frac_pos ≈ mean_p per bin; the gap is
    * what Platt/isotonic post-hoc calibration would correct.
    *
    * Shape at scale: one extra corpus scan after the fit (the scoring
    * projection is narrow) into a `bins`-row map-side-combined
    * aggregation; mean_p DECIMAL-sums so the report is bit-identical
    * across engines and partitionings. */
  def calibrationReport(df: DataFrame, labelCol: String,
      featureCols: Seq[String], iters: Int, lr: Double,
      bins: Int = 10): DataFrame = {
    require(bins >= 2, "calibration needs at least 2 bins")
    val traj = logisticGd(df, labelCol, featureCols, iters, lr)
    val w = traj.filter(col("iter") === iters).collect()
      .map(r => r.getString(1) -> r.getDouble(2)).toMap
    val z = featureCols.foldLeft(lit(w("_intercept"))) {
      case (acc, f) => acc + lit(w(f)) * col(f).cast("double")
    }
    val p = round(lit(1.0) / (lit(1.0) + exp(-z)), 6)
    df.select(col(labelCol).cast("long").as("y"), p.as("p"))
      .withColumn("bin",
        least(lit((bins - 1).toLong), floor(col("p") * bins).cast("long")))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n"),
        round(sum(col("y")).cast("double") / count(lit(1)), 6).as("frac_pos"),
        round(sum(col("p").cast("decimal(28,12)")).cast("double")
          / count(lit(1)), 6).as("mean_p"))
      .select(col("bin"), col("n"), col("frac_pos"), col("mean_p"))
  }

  /** Exact tie-aware ROC AUC (the Mann–Whitney U statistic) of each
    * integer-valued score column against a binary label — model
    * EVALUATION as a two-phase aggregation. Phase 1 reduces the corpus
    * to distinct (metric, score) rows with pos/neg counts (map-side
    * combined shuffle, output #distinct-score-values sized, NOT corpus
    * sized); phase 2 runs a prefix-sum window over that small table.
    * Ties get the standard half credit:
    * 2·U = Σ_v (2·cumNeg(<v)·pos(v) + pos(v)·neg(v)), AUC = 2U / (2·P·N).
    * Everything up to the single final division is exact DECIMAL
    * integer arithmetic, so the result is bit-identical across engines
    * and partitionings (the olsByGroup determinism recipe applied to a
    * ranking metric). Degenerate labels (no positives or no negatives)
    * yield null instead of a division error under ANSI.
    *
    * Scale shape: the window partitions by metric over DISTINCT score
    * values — for discrete features (lengths, counts, quantized
    * scores) that table is tiny; a continuous score at 100 TB should
    * be quantized first (which is also what a tie-aware AUC on 6-decimal
    * rounded scores means). */
  def auc(df: DataFrame, labelCol: String, scoreCols: Seq[String]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val melted = scoreCols.map { sc =>
      df.select(lit(sc).as("metric"), col(sc).cast("long").as("score"),
        col(labelCol).cast("long").as("y"))
    }.reduce(_ unionByName _)
    val grouped = melted.groupBy(col("metric"), col("score"))
      .agg(sum(col("y")).as("pos"), count(lit(1)).as("tot"))
      .withColumn("neg", col("tot") - col("pos"))
    val w = Window.partitionBy(col("metric")).orderBy(col("score"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val cum = grouped.withColumn("cum_neg",
      coalesce(sum(col("neg")).over(w), lit(0L)))
    val term = (col("cum_neg").cast("decimal(38,0)") * col("pos") * lit(2)
      + col("pos").cast("decimal(38,0)") * col("neg"))
    cum.groupBy(col("metric"))
      .agg(sum(col("pos")).as("n_pos"), sum(col("neg")).as("n_neg"),
        sum(term).as("num2"))
      .select(col("metric"), col("n_pos"), col("n_neg"),
        when(col("n_pos") === 0L || col("n_neg") === 0L, lit(null))
          .otherwise(round(col("num2").cast("double")
            / (lit(2.0) * col("n_pos") * col("n_neg")), 6)).as("auc"))
  }

  /** Exact precision/recall curve — the [[auc]] companion a threshold
    * is actually picked with: one point per DISTINCT score t for the
    * classifier "positive iff score ≥ t". Scores must be
    * INTEGER-VALUED (the [[auc]] contract — `scoreCol` is cast to
    * long, so fractional scores collapse onto their truncated integer
    * and the curve loses those thresholds; pre-scale real-valued
    * scores to a fixed-point grid first, as the calibration report
    * does). Same scale shape as auc:
    * the corpus collapses to a (score → pos/neg counts) rollup via one
    * map-side-combined aggregation, and the suffix-sum window runs over
    * the DISTINCT-SCORE table only (bounded by score cardinality, never
    * the corpus). Counts are exact integers; precision/recall are each
    * ONE division rounded to 6 — engine-exact. Returns
    * [score, tp, fp, prec, rec]. */
  def prCurve(df: DataFrame, labelCol: String,
      scoreCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val grouped = df
      .select(col(scoreCol).cast("long").as("score"),
        col(labelCol).cast("long").as("y"))
      .groupBy(col("score"))
      .agg(sum(col("y")).as("pos"), count(lit(1)).as("tot"))
      .withColumn("neg", col("tot") - col("pos"))
    val w = Window.orderBy(col("score").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // the single-partition window is over the DISTINCT-SCORE table —
    // bounded by score cardinality (the auc reasoning), not the corpus
    val cum = grouped
      .withColumn("tp", sum(col("pos")).over(w))
      .withColumn("fp", sum(col("neg")).over(w))
    val p = grouped.agg(sum(col("pos"))).head().getLong(0)
    cum.select(col("score"), col("tp"), col("fp"),
      round(col("tp").cast("double") / (col("tp") + col("fp")), 6)
        .as("prec"),
      when(lit(p) === 0L, lit(null))
        .otherwise(round(col("tp").cast("double") / lit(p), 6)).as("rec"))
  }

  /** Two-sample Kolmogorov–Smirnov statistic over INTEGER-valued
    * samples — the distribution-drift test a data pipeline pages on:
    * did this source's (length / quality / score) distribution move vs
    * the reference slice? D = max over distinct values of
    * |F_a(v) − F_b(v)|, reported with the value where the gap peaks
    * (ties to the smallest value). Counts stay integers through both
    * cumulative sums; each CDF point is one exact division, so the
    * raw-double argmax compare is engine-exact (the ml_auc reasoning).
    *
    * Shape at scale: two map-side-combined value rollups, a full-outer
    * merge on the value key, and a cumulative window over the
    * DISTINCT-VALUE table only — bounded by the value domain (the
    * prCurve single-partition caveat), never the corpus. Returns one
    * row [n_a, n_b, ks_stat, at_value]. */
  def ksTest(a: DataFrame, b: DataFrame, valueCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ca = a.select(col(valueCol).cast("long").as("v"))
      .groupBy(col("v")).agg(count(lit(1)).as("na"))
    val cb = b.select(col(valueCol).cast("long").as("v"))
      .groupBy(col("v")).agg(count(lit(1)).as("nb"))
    val merged = ca.join(cb, Seq("v"), "full_outer")
      .select(col("v"), coalesce(col("na"), lit(0L)).as("na"),
        coalesce(col("nb"), lit(0L)).as("nb"))
    val w = Window.orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val tot = merged.agg(sum(col("na")).as("ta"), sum(col("nb")).as("tb"))
    merged
      .withColumn("cna", sum(col("na")).over(w))
      .withColumn("cnb", sum(col("nb")).over(w))
      .crossJoin(broadcast(tot))
      .withColumn("diff", abs(
        col("cna").cast("double") / col("ta").cast("double") -
        col("cnb").cast("double") / col("tb").cast("double")))
      .orderBy(col("diff").desc, col("v"))
      .limit(1)
      .select(col("ta").as("n_a"), col("tb").as("n_b"),
        round(col("diff"), 6).as("ks_stat"), col("v").as("at_value"))
  }

  /** Population Stability Index — [[ksTest]]'s binned sibling and the
    * drift metric model-monitoring dashboards actually alarm on:
    * PSI = Σ_bins (p_b − q_b)·ln(p_b/q_b) over fixed-width integer
    * bins (rule of thumb: <0.1 stable, >0.25 shifted). Zero-count bins
    * take the standard ε floor on BOTH sides before the ratio so the
    * ln never blows up. Bin counts stay integers; each term is a fixed
    * double expression DECIMAL(28,12)-cast before the order-proof sum
    * (the adamicAdar discipline — ln agreement across engines is
    * pinned by the ppmi/adamic rows). Returns one row
    * [n_a, n_b, n_bins, psi]. */
  def psi(a: DataFrame, b: DataFrame, valueCol: String,
      binWidth: Long, epsilon: Double = 1e-4): DataFrame = {
    require(binWidth >= 1, s"binWidth must be >= 1: $binWidth")
    def bins(df: DataFrame, cnt: String) =
      // floor(double / w): Spark's `/` is fractional on integers (and
      // DuckDB's is too) — the explicit double-divide-floor is the form
      // both engines compute identically; values are far below 2^53
      df.select(floor(col(valueCol).cast("double") / lit(binWidth.toDouble))
          .cast("long").as("bin"))
        .groupBy(col("bin")).agg(count(lit(1)).as(cnt))
    val merged = bins(a, "na").join(bins(b, "nb"), Seq("bin"), "full_outer")
      .select(col("bin"), coalesce(col("na"), lit(0L)).as("na"),
        coalesce(col("nb"), lit(0L)).as("nb"))
    val tot = merged.agg(sum(col("na")).as("ta"), sum(col("nb")).as("tb"))
    val p = greatest(col("na").cast("double") / col("ta").cast("double"),
      lit(epsilon))
    val q = greatest(col("nb").cast("double") / col("tb").cast("double"),
      lit(epsilon))
    merged.crossJoin(broadcast(tot))
      .select(col("ta"), col("tb"),
        ((p - q) * log(p / q)).cast("decimal(28,12)").as("term"))
      .groupBy(col("ta"), col("tb"))
      .agg(count(lit(1)).as("n_bins"),
        round(sum(col("term")).cast("double"), 6).as("psi"))
      .select(col("ta").as("n_a"), col("tb").as("n_b"),
        col("n_bins"), col("psi"))
  }

  /** Two-proportion z-test over a deterministic 50/50 user split — the
    * A/B readout an event pipeline ships: users assign to variants by
    * salted-md5 half-space (the [[Sampling.hashPrefix]] split — same
    * user, same variant, on any cluster size), convert iff any of their
    * events matches `conv`, and the one-row report carries counts,
    * rates, and z = (p_a − p_b) / √(p̂(1−p̂)(1/n_a + 1/n_b)).
    *
    * Shape at scale: one map-side-combined per-user aggregation, one
    * 2-row variant rollup, one final 1-row pivot — integer counts to
    * the last step, then a fixed-order double expression rounded once
    * (engine-exact). A missing variant yields null z, never a division
    * error. */
  def abTest(df: DataFrame, userCol: String, conv: Column,
      salt: String = "ab"): DataFrame = {
    val users = df.groupBy(col(userCol).as("u"))
      .agg(max(when(conv, 1L).otherwise(0L)).as("converted"))
      .withColumn("variant",
        when(Sampling.hashPrefix(col("u"), salt) < lit("80000000"), "a")
          .otherwise("b"))
    val piv = users.groupBy(col("variant"))
      .agg(count(lit(1)).as("n"), sum(col("converted")).as("conv"))
      .agg(
        max(when(col("variant") === "a", col("n"))).as("n_a"),
        max(when(col("variant") === "a", col("conv"))).as("conv_a"),
        max(when(col("variant") === "b", col("n"))).as("n_b"),
        max(when(col("variant") === "b", col("conv"))).as("conv_b"))
    val pa = col("conv_a").cast("double") / col("n_a")
    val pb = col("conv_b").cast("double") / col("n_b")
    val pp = (col("conv_a") + col("conv_b")).cast("double") /
      (col("n_a") + col("n_b"))
    piv.select(col("n_a"), col("conv_a"), round(pa, 6).as("p_a"),
      col("n_b"), col("conv_b"), round(pb, 6).as("p_b"),
      // degenerate pooled rate (everyone / no one converts) has zero
      // variance: null z, never an ANSI division error
      when(col("n_a").isNull || col("n_b").isNull ||
          pp === 0.0 || pp === 1.0, lit(null))
        .otherwise(round((pa - pb) /
          sqrt(pp * (lit(1.0) - pp) *
            (lit(1.0) / col("n_a") + lit(1.0) / col("n_b"))), 6)).as("z"))
  }
}
