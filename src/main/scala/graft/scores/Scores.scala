package graft.scores

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.functions.VectorOps

/** Instant (phi-side) score calculators — reference src/artm/score sources.
  * Cumulative scores (perplexity, sparsity-theta, items-processed) are
  * produced by the E-step as per-document partials and merged in
  * graft.operators.Fit.cumulativeScores; the calculators here query Phi /
  * n_wt DataFrames on demand, each a one-aggregate plan. */
object Scores {

  /** SparsityPhi — score/sparsity_phi.cc:20-58: share of |p_wt| < eps over
    * an optional class/topic subset. Returns [zero_tokens, total_tokens,
    * value]. */
  def sparsityPhi(pwt: DataFrame, eps: Double = 1e-37,
      classId: Option[String] = None, topicIndices: Seq[Int] = Nil): DataFrame = {
    val base = classId.map(c => pwt.filter(col("class_id") === c)).getOrElse(pwt)
    val vec =
      if (topicIndices.isEmpty) col("weights")
      else filter(col("weights"), (_, i) => i.isin(topicIndices: _*))
    base
      .select(size(filter(vec, w => abs(w) < eps)).cast("long").as("zeros"),
        size(vec).cast("long").as("total"))
      .agg(sum(col("zeros")).as("zero_tokens"), sum(col("total")).as("total_tokens"))
      .select(col("zero_tokens"), col("total_tokens"),
        (col("zero_tokens").cast("double") / col("total_tokens")).as("value"))
  }

  /** TopTokens — score/top_tokens.cc:18-118: per topic the k tokens with
    * the largest p_wt (deterministic tie-break by token). Returns
    * [topic, rank, token, weight]. One explode + a two-phase top-k
    * aggregate (map-side partial top-k — no per-topic full-vocab sort
    * task, see functions.TopK). */
  def topTokens(pwt: DataFrame, k: Int, classId: String = graft.functions.Rng.DefaultClass): DataFrame = {
    val cells = pwt.filter(col("class_id") === classId)
      .select(col("token"), posexplode(col("weights")).as(Seq("topic", "weight")))
    cells.groupBy(col("topic"))
      .agg(graft.functions.TopK.topK(col("token"), col("weight"), k).as("top"))
      .select(col("topic"), posexplode(col("top")).as(Seq("idx", "kv")))
      .select(col("topic"), (col("idx") + 1).as("rank"),
        col("kv.k").as("token"), col("kv.v").as("weight"))
      .filter(col("weight") > 0.0f)
  }

  /** Average coherence of the top-k tokens of each topic against a cooc
    * table (top_tokens.cc coherence part; pairwise formula
    * core/dictionary.cc:147-193). */
  def topTokensCoherence(pwt: DataFrame, cooc: DataFrame, k: Int,
      classId: String = graft.functions.Rng.DefaultClass): DataFrame = {
    val top = topTokens(pwt, k, classId)
      .select(lit(classId).as("class_id"), col("topic").as("group"), col("token"))
    graft.operators.DictionaryOps.topicCoherence(top, cooc)
      .select(col("group").as("topic"), col("coherence"))
  }

  /** TopicKernel — score/topic_kernel.cc:30-171: kernel W_t = {w : p(t|w) >
    * threshold} with p(t|w) = p_wt·n_t / Σ_s p_ws·n_s; per topic returns
    * size, purity = Σ_{w∈W_t} p_wt, contrast = avg_{w∈W_t} p(t|w).
    * n_t comes from n_wt's per-class topic masses (broadcast). */
  def topicKernel(pwt: DataFrame, nwt: DataFrame, threshold: Double = 0.1,
      classId: String = graft.functions.Rng.DefaultClass): DataFrame = {
    val nt = nwt.filter(col("class_id") === classId)
      .select(col("token"),
        transform(col("weights"), x => when(x > 0f, x).otherwise(0f)).as("pos"))
      .agg(VectorOps.orderedVectorSum(col("token"), col("pos")).as("n_t"))
    val cells = pwt.filter(col("class_id") === classId)
      .crossJoin(broadcast(nt))
      .withColumn("pt_w_raw", zip_with(col("weights"), col("n_t"), (p, n) => p * n))
      .withColumn("norm", aggregate(col("pt_w_raw"), lit(0.0), (a, x) => a + x))
      .select(col("token"), col("weights"),
        posexplode(when(col("norm") > 0.0,
          transform(col("pt_w_raw"), x => x / col("norm"))).otherwise(col("pt_w_raw")))
          .as(Seq("topic", "ptw")))
      .withColumn("pwt", element_at(col("weights"), col("topic") + 1))
      .drop("weights")
    // purity/contrast are REPORTED metrics (facade/tracker surface them
    // unrounded): a plain double sum/avg associates in shuffle-merge
    // order and races at ulp scale across executor processes — the
    // r11/r12 certification-catch pattern (§27h/§28 rule). Fixed-scale
    // DECIMAL addition is exact, hence order-free; contrast = decimal
    // sum / count replaces avg (same null semantics: ptw is never null
    // past the filter).
    cells.filter(col("ptw") > threshold)
      .groupBy(col("topic"))
      .agg(count(lit(1)).as("size"),
        sum(col("pwt").cast("decimal(38,18)")).cast("double").as("purity"),
        (sum(col("ptw").cast("decimal(38,18)")) / count(lit(1)))
          .cast("double").as("contrast"))
      .select(col("topic"), col("size"), col("purity"), col("contrast"))
  }

  /** TopicKernel with the reference's full report (topic_kernel.cc:30-171):
    * per-topic size/purity/contrast (+ kernel coherence against a cooc
    * table when given) and an averages-over-topics summary row with
    * topic = -1. */
  def topicKernelFull(pwt: DataFrame, nwt: DataFrame, threshold: Double = 0.1,
      classId: String = graft.functions.Rng.DefaultClass,
      cooc: Option[DataFrame] = None): DataFrame = {
    val base = topicKernel(pwt, nwt, threshold, classId)
    val withCoh = cooc match {
      case None => base.withColumn("coherence", lit(null).cast("double"))
      case Some(c) =>
        // kernel token sets per topic → pairwise average cooc value
        val nt = nwt.filter(col("class_id") === classId)
          .select(col("token"),
            transform(col("weights"), x => when(x > 0f, x).otherwise(0f)).as("pos"))
          .agg(VectorOps.orderedVectorSum(col("token"), col("pos")).as("n_t"))
        val kernelTokens = pwt.filter(col("class_id") === classId)
          .crossJoin(broadcast(nt))
          .withColumn("raw", zip_with(col("weights"), col("n_t"), (p, n) => p * n))
          .withColumn("norm", aggregate(col("raw"), lit(0.0), (a, x) => a + x))
          .select(col("token"),
            posexplode(when(col("norm") > 0.0,
              transform(col("raw"), x => x / col("norm"))).otherwise(col("raw")))
              .as(Seq("topic", "ptw")))
          .filter(col("ptw") > threshold)
          .select(lit(classId).as("class_id"), col("topic").as("group"), col("token"))
        val coh = graft.operators.DictionaryOps.topicCoherence(kernelTokens, c)
          .select(col("group").as("topic"), col("coherence"))
        base.join(coh, Seq("topic"), "left")
    }
    // summary row: decimal-sum/count instead of avg — same order-free
    // rationale as topicKernel's purity/contrast (sum skips nulls and
    // count(col) matches avg's null semantics for coherence)
    def davg(c: org.apache.spark.sql.Column) =
      (sum(c.cast("decimal(38,18)")) / count(c)).cast("double")
    val averages = withCoh.agg(
      davg(col("size")).as("size"), davg(col("purity")).as("purity"),
      davg(col("contrast")).as("contrast"), davg(col("coherence")).as("coherence"))
      .select(lit(-1).as("topic"), col("size"), col("purity"), col("contrast"), col("coherence"))
    withCoh.unionByName(averages).orderBy(col("topic"))
  }

  /** TopicMassPhi — score/topic_mass_phi.cc:18-80: n_t = Σ_w n_wt per
    * topic of a class (+ ratio to the total mass). */
  def topicMassPhi(nwt: DataFrame, classId: String = graft.functions.Rng.DefaultClass): DataFrame = {
    val nt = nwt.filter(col("class_id") === classId)
      .agg(VectorOps.orderedVectorSum(col("token"), col("weights")).as("n_t"))
    // total from the same aggregated row (array fold) — no empty-partition
    // window, which would plan a single-task WindowExec
    nt.select(posexplode(col("n_t")).as(Seq("topic", "mass")),
        aggregate(col("n_t"), lit(0.0), (a, x) => a + x).as("_total"))
      .withColumn("ratio", col("mass") / col("_total"))
      .drop("_total")
  }

  /** BackgroundTokensRatio — score/background_tokens_ratio.cc:20-92:
    * fraction of tokens with KL(p(t) ‖ p(t|w)) > delta (background
    * tokens); optionally return the tokens. p(t) = n_t/n, p(t|w) as in
    * topicKernel. */
  def backgroundTokensRatio(pwt: DataFrame, nwt: DataFrame, delta: Double = 0.1,
      classId: String = graft.functions.Rng.DefaultClass,
      returnTokens: Boolean = false): DataFrame = {
    val nt = nwt.filter(col("class_id") === classId)
      .select(col("token"),
        transform(col("weights"), x => when(x > 0f, x).otherwise(0f)).as("pos"))
      .agg(VectorOps.orderedVectorSum(col("token"), col("pos")).as("n_t"))
    val scored = pwt.filter(col("class_id") === classId)
      .crossJoin(broadcast(nt))
      .withColumn("ptw_raw", zip_with(col("weights"), col("n_t"), (p, n) => p * n))
      .withColumn("norm", aggregate(col("ptw_raw"), lit(0.0), (a, x) => a + x))
      .withColumn("nsum", aggregate(col("n_t"), lit(0.0), (a, x) => a + x))
      .withColumn("kl", aggregate(
        zip_with(col("n_t"), col("ptw_raw"), (n, raw) => {
          val pt = n / col("nsum")
          val ptw = when(col("norm") > 0.0, raw / col("norm")).otherwise(lit(0.0))
          when(pt > 0.0 && ptw > 0.0, pt * log(pt / ptw)).otherwise(lit(0.0))
        }),
        lit(0.0), (a, x) => a + x))
      .withColumn("is_background", col("kl") > delta)
    if (returnTokens) scored.filter(col("is_background")).select(col("token"), col("kl"))
    else scored.agg(
      sum(when(col("is_background"), 1L).otherwise(0L)).as("background_tokens"),
      count(lit(1)).as("total_tokens"))
      .select(col("background_tokens"), col("total_tokens"),
        (col("background_tokens").cast("double") / col("total_tokens")).as("value"))
  }

  /** ThetaSnippet — score/theta_snippet.cc: theta vectors of the first
    * numItems docs. */
  def thetaSnippet(theta: DataFrame, numItems: Int = 10): DataFrame =
    theta.orderBy(col("doc_id")).limit(numItems)

  /** ClassPrecision — score/class_precision.cc:17-93: accuracy of
    * argmax_c p(c|d) vs the true label token of each document.
    * `predictions` = Fit.transformPredict output; `truth` =
    * [doc_id, label_token]. */
  def classPrecision(predictions: DataFrame, truth: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("doc_id")).orderBy(col("p").desc, col("label_token"))
    val best = predictions.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("doc_id"), col("label_token").as("predicted"))
    best.join(truth, Seq("doc_id"))
      .agg(sum(when(col("predicted") === col("label_token"), 1L).otherwise(0L)).as("correct"),
        count(lit(1)).as("total"))
      .select(col("correct"), col("total"),
        (col("correct").cast("double") / col("total")).as("value"))
  }
}
