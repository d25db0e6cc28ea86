package graft.regularizers

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.operators.{PhiRegularizer, RegContext}
import graft.functions.VectorOps

/** Transform function f applied to matrix values by some regularizers —
  * reference core/transform_function.cc:1-50. */
sealed trait TransformFn extends Serializable {
  /** column expression form (codegen'd — stays inside whole-stage codegen) */
  def expr(x: Column): Column
  /** scalar form for kernel-side (theta) use */
  def apply(x: Float): Float
}
object TransformFn {
  case object Constant extends TransformFn {
    def expr(x: Column): Column = lit(1.0f)
    def apply(x: Float): Float = 1.0f
  }
  case object Logarithm extends TransformFn {
    def expr(x: Column): Column = when(x > 0f, log(x.cast("double")).cast("float")).otherwise(0.0f)
    def apply(x: Float): Float = if (x > 0) math.log(x).toFloat else 0.0f
  }
  case class Polynomial(a: Float, n: Float) extends TransformFn {
    def expr(x: Column): Column =
      when(x > 0f, (lit(a) * pow(x.cast("double"), lit(n.toDouble))).cast("float")).otherwise(0.0f)
    def apply(x: Float): Float = if (x > 0) (a * math.pow(x, n)).toFloat else 0.0f
  }
}

/** Shared helpers for topic/class masking. */
private[regularizers] object RegUtil {
  /** zero out non-selected topics of an array<float> column (mask by
    * topic index). */
  def maskTopics(vec: Column, mask: Option[Array[Boolean]]): Column = mask match {
    case None => vec
    case Some(m) =>
      val maskCol = array(m.map(b => lit(if (b) 1.0f else 0.0f)).toSeq: _*)
      zip_with(vec, maskCol, (v, mm) => v * mm)
  }
  def topicMask(topicNames: Seq[String], selected: Seq[String]): Option[Array[Boolean]] =
    if (selected.isEmpty) None
    else Some(topicNames.map(selected.contains(_)).toArray)
  def classFilter(classIds: Seq[String]): Column =
    if (classIds.isEmpty) lit(true) else col("class_id").isin(classIds: _*)
}

/** SmoothSparsePhi — reference regularizer/smooth_sparse_phi.cc:25-83:
  * r_wt += τ · f(p_wt) · dict_value(w); smooth with τ>0, sparse with τ<0.
  * With a dictionary, tokens absent from it are skipped. Pure columnar
  * transform + optional broadcast dictionary join. */
case class SmoothSparsePhi(
    name: String = "ssphi",
    classIds: Seq[String] = Nil,
    topicNames: Seq[String] = Nil,
    fn: TransformFn = TransformFn.Constant,
    useDictionary: Boolean = false) extends PhiRegularizer {

  def apply(pwt: DataFrame, nwt: DataFrame, ctx: RegContext): DataFrame = {
    val mask = RegUtil.topicMask(ctx.topicNames, topicNames)
    val base = pwt.filter(RegUtil.classFilter(classIds))
    val withCoeff = if (useDictionary) {
      val dict = ctx.dictionary.getOrElse(
        throw new IllegalArgumentException(s"$name: dictionary required"))
      base.join(broadcast(dict.select(col("class_id"), col("token"), col("value").as("_coeff"))),
        Seq("class_id", "token"), "inner") // absent tokens skipped, as in the reference
    } else base.withColumn("_coeff", lit(1.0f))
    withCoeff.select(col("class_id"), col("token"),
      RegUtil.maskTopics(
        transform(col("weights"), w => (col("_coeff") * fn.expr(w)).cast("float")),
        mask).as("weights"))
  }
}

/** DecorrelatorPhi — reference regularizer/decorrelator_phi.cc:17-107:
  * r_wt += −τ · p_wt · (Σ_{s∈selected} p_ws − p_wt). Row-local array
  * expression — zero shuffles, fully codegen'd. */
case class DecorrelatorPhi(
    name: String = "decorrelator",
    classIds: Seq[String] = Nil,
    topicNames: Seq[String] = Nil) extends PhiRegularizer {

  def apply(pwt: DataFrame, nwt: DataFrame, ctx: RegContext): DataFrame = {
    val mask = RegUtil.topicMask(ctx.topicNames, topicNames)
    val masked = RegUtil.maskTopics(col("weights"), mask)
    pwt.filter(RegUtil.classFilter(classIds))
      .withColumn("_sum", aggregate(masked, lit(0.0f), (a, x) => a + x))
      .select(col("class_id"), col("token"),
        RegUtil.maskTopics(
          transform(col("weights"), w => (-w * (col("_sum") - w)).cast("float")),
          mask).as("weights"))
  }
}

/** LabelRegularizationPhi — reference
  * regularizer/label_regularization_phi.cc:20-98:
  * r_wt += τ · dict_value(w) · n_wt / Σ_{t∈selected} n_wt — label
  * balancing over the n_wt row. Row-local. */
case class LabelRegularizationPhi(
    name: String = "label",
    classIds: Seq[String] = Nil,
    topicNames: Seq[String] = Nil,
    useDictionary: Boolean = false) extends PhiRegularizer {

  def apply(pwt: DataFrame, nwt: DataFrame, ctx: RegContext): DataFrame = {
    val mask = RegUtil.topicMask(ctx.topicNames, topicNames)
    val base = nwt.filter(RegUtil.classFilter(classIds))
    val withCoeff = if (useDictionary) {
      val dict = ctx.dictionary.getOrElse(
        throw new IllegalArgumentException(s"$name: dictionary required"))
      base.join(broadcast(dict.select(col("class_id"), col("token"), col("value").as("_coeff"))),
        Seq("class_id", "token"), "left")
        .withColumn("_coeff", coalesce(col("_coeff"), lit(0.0f)))
    } else base.withColumn("_coeff", lit(1.0f))
    val masked = RegUtil.maskTopics(col("weights"), mask)
    withCoeff
      .withColumn("_sum", aggregate(masked, lit(0.0f), (a, x) => a + x))
      .select(col("class_id"), col("token"),
        RegUtil.maskTopics(
          transform(col("weights"), w =>
            when(col("_sum") =!= 0.0f, (col("_coeff") * w / col("_sum")).cast("float"))
              .otherwise(lit(0.0f))),
          mask).as("weights"))
  }
}

/** SpecifiedSparsePhi — reference regularizer/specified_sparse_phi.cc:25-156.
  * SparseTopics mode: per (class, topic) keep the top `maxElements` cells
  * by n_wt, then drop the smallest of those until the kept mass reaches
  * `probabilityThreshold` of the column total; all non-kept cells get
  * r_wt = −n_wt (zeroing them after normalize). SparseTokens mode: same
  * per token row.
  *
  * Implemented with posexplode + a two-phase top-k aggregate
  * (functions.TopK.topMassKeep): partial top-k per partition, merged at
  * the reduce — the reference's priority queue without the per-group
  * full-vocab sort task a rank window would need; shuffle key = (class,
  * topic) or (class, token). */
case class SpecifiedSparsePhi(
    name: String = "sparse",
    classId: String = graft.functions.Rng.DefaultClass,
    topicNames: Seq[String] = Nil,
    maxElements: Int = 20,
    probabilityThreshold: Double = 0.99,
    byTopics: Boolean = true) extends PhiRegularizer {

  def apply(pwt: DataFrame, nwt: DataFrame, ctx: RegContext): DataFrame = {
    val spark = nwt.sparkSession
    val topicSel: Set[Int] =
      if (topicNames.isEmpty) ctx.topicNames.indices.toSet
      else ctx.topicNames.zipWithIndex.filter(t => topicNames.contains(t._1)).map(_._2).toSet
    val inClass = nwt.filter(col("class_id") === classId)
    val cells = inClass
      .select(col("class_id"), col("token"), posexplode(col("weights")).as(Seq("topic", "n")))
      .filter(col("topic").isin(topicSel.toSeq: _*))

    val groupCols = if (byTopics) Seq(col("class_id"), col("topic")) else Seq(col("class_id"), col("token"))
    // tie-break matches the old rank window (n desc, token, topic): the
    // in-group key is the token for byTopics, the zero-padded topic index
    // (numeric order) for byTokens
    val keyCol = if (byTopics) col("token") else format_string("%05d", col("topic"))

    // keep top-maxElements, then within them the largest prefix whose
    // cumulative mass first reaches threshold·total (reference scans the
    // queue from the largest down and stops at the first crossing)
    val keptDf = cells.groupBy(groupCols: _*)
      .agg(graft.functions.TopK.topMassKeep(keyCol, col("n"), maxElements,
        probabilityThreshold).as("_kept"))
    // keptDf has one short row per group — broadcast-sized for byTopics,
    // AQE-planned otherwise
    val joinKeys = if (byTopics) Seq("class_id", "topic") else Seq("class_id", "token")
    val rCells = cells.join(keptDf, joinKeys)
      .withColumn("_r",
        when(array_contains(col("_kept"), keyCol), lit(0.0f))
          .otherwise((-col("n")).cast("float")))

    // reassemble array rows; untouched topics contribute 0
    rCells.groupBy(col("class_id"), col("token"))
      .agg(collect_list(struct(col("topic"), col("_r"))).as("cells"))
      .select(col("class_id"), col("token"),
        expr(s"transform(sequence(0, ${ctx.numTopics - 1}), i -> " +
          "coalesce(element_at(map_from_entries(cells), i), cast(0.0 as float)))")
          .as("weights"))
  }
}

/** ImproveCoherencePhi — reference regularizer/improve_coherence_phi.cc:
  * r_wt += τ · Σ_v cooc(w,v) · n_vt — a sparse mat-mat multiply expressed
  * as cooc ⋈ n_wt + grouped weighted vector sum. The cooc table is the
  * sparse matrix; Spark's shuffle is the reference's hand-written loop. */
case class ImproveCoherencePhi(
    name: String = "coherence",
    classIds: Seq[String] = Nil,
    topicNames: Seq[String] = Nil) extends PhiRegularizer {

  def apply(pwt: DataFrame, nwt: DataFrame, ctx: RegContext): DataFrame = {
    val cooc = ctx.cooc.getOrElse(
      throw new IllegalArgumentException(s"$name: cooc table required"))
    val mask = RegUtil.topicMask(ctx.topicNames, topicNames)
    val nv = nwt.select(col("class_id"), col("token").as("token_b"), col("weights").as("n_v"))
    cooc.filter(RegUtil.classFilter(classIds))
      .join(nv, Seq("class_id", "token_b"))
      .groupBy(col("class_id"), col("token_a").as("token"))
      .agg(VectorOps.weightedVectorSum(col("n_v"), col("cooc_tf")).as("weights"))
      .select(col("class_id"), col("token"), RegUtil.maskTopics(col("weights"), mask).as("weights"))
  }
}

/** BitermsPhi — reference regularizer/biterms_phi.cc:20-152:
  * r_wt += τ · Σ_u cooc(w,u) · p(t|u,w) with p(t|u,w) =
  * norm_t(n_t · p_wt · p_ut). Join cooc against Phi on both endpoints,
  * per-pair row-local normalize, grouped weighted sum. n_t broadcasts. */
case class BitermsPhi(
    name: String = "biterms",
    classIds: Seq[String] = Nil,
    topicNames: Seq[String] = Nil) extends PhiRegularizer {

  def apply(pwt: DataFrame, nwt: DataFrame, ctx: RegContext): DataFrame = {
    val cooc = ctx.cooc.getOrElse(
      throw new IllegalArgumentException(s"$name: cooc table required"))
    val mask = RegUtil.topicMask(ctx.topicNames, topicNames)
    // n_t per topic over the whole n_wt (reference sums all classes);
    // token-keyed ordered fold: this feeds r_wt, so it shares the fit's
    // shuffle-order-independence contract (VectorOps.orderedVectorSum)
    val nt = nwt.agg(VectorOps.orderedVectorSum(
      concat_ws("\u0001", col("class_id"), col("token")),
      col("weights")).as("n_t"))
    val pw = pwt.select(col("class_id"), col("token").as("token_a"), col("weights").as("p_w"))
    val pu = pwt.select(col("class_id"), col("token").as("token_b"), col("weights").as("p_u"))
    cooc.filter(RegUtil.classFilter(classIds))
      .join(pw, Seq("class_id", "token_a"))
      .join(pu, Seq("class_id", "token_b"))
      .crossJoin(broadcast(nt))
      .withColumn("_ptuw", RegUtil.maskTopics(
        zip_with(zip_with(col("n_t"), col("p_w"), (a, b) => a * b), col("p_u"), (a, b) => a * b),
        mask))
      .withColumn("_norm", aggregate(col("_ptuw"), lit(0.0f), (a, x) => a + x))
      .withColumn("_contrib",
        transform(col("_ptuw"), x =>
          when(col("_norm") > 0f && x > 0f, (x / col("_norm")).cast("float"))
            .otherwise(lit(0.0f))))
      .groupBy(col("class_id"), col("token_a").as("token"))
      .agg(VectorOps.weightedVectorSum(col("_contrib"), col("cooc_tf")).as("weights"))
  }
}

/** SmoothTimeInTopicsPhi — reference
  * regularizer/smooth_time_in_topics_phi.cc:15-99: over the time-ordered
  * tokens of one modality, r_wt += τ · p_wt · (sign(p_prev − p) +
  * sign(p_next − p)) — lag/lead window over the token order. `tokenOrder`
  * supplies the time order (defaults to lexicographic). */
case class SmoothTimeInTopicsPhi(
    name: String = "smooth_time",
    classId: String = graft.functions.Rng.DefaultClass,
    topicNames: Seq[String] = Nil,
    tokenOrder: Seq[String] = Nil) extends PhiRegularizer {

  def apply(pwt: DataFrame, nwt: DataFrame, ctx: RegContext): DataFrame = {
    val mask = RegUtil.topicMask(ctx.topicNames, topicNames)
    val base0 = pwt.filter(col("class_id") === classId)
    val base = if (tokenOrder.isEmpty) base0.withColumn("_ord", col("token"))
    else {
      val orderMap = map(tokenOrder.zipWithIndex.flatMap { case (t, i) => Seq(lit(t), lit(i)) }: _*)
      base0.withColumn("_ord", orderMap(col("token")))
    }
    val w = Window.partitionBy(col("class_id")).orderBy(col("_ord"))
    base
      .withColumn("_prev", lag(col("weights"), 1).over(w))
      .withColumn("_next", lead(col("weights"), 1).over(w))
      .select(col("class_id"), col("token"),
        RegUtil.maskTopics(
          expr("""transform(weights, (p, i) ->
            cast(p * ((case when _prev is null then 0.0
                       else sign(element_at(_prev, i + 1) - p) end) +
                      (case when _next is null then 0.0
                       else sign(element_at(_next, i + 1) - p) end)) as float))"""),
          mask).as("weights"))
  }
}

/** NetPlsaPhi — reference regularizer/net_plsa_phi.cc:15-159: vertex-graph
  * Laplacian smoothing on one modality:
  * r_ut += τ · n_t² · Σ_v w_uv · (p_vt/D_v − p_ut/D_u) / D_u.
  * `edges` [vertex_a, vertex_b, weight] (directed as given);
  * `vertexWeights` [vertex, d] optional (default 1.0). Joins phi at both
  * endpoints; n_t per (class, topic) from n_wt — matches FindNormalizers. */
case class NetPlsaPhi(
    name: String = "netplsa",
    classId: String,
    edges: DataFrame,
    vertexWeights: Option[DataFrame] = None,
    topicNames: Seq[String] = Nil) extends PhiRegularizer {

  def apply(pwt: DataFrame, nwt: DataFrame, ctx: RegContext): DataFrame = {
    val mask = RegUtil.topicMask(ctx.topicNames, topicNames)
    val nt = nwt.filter(col("class_id") === classId)
      .select(col("token"),
        transform(col("weights"), x => when(x > 0f, x).otherwise(0f)).as("pos"))
      .agg(VectorOps.orderedVectorSum(col("token"), col("pos")).as("n_t"))

    val phiC = pwt.filter(col("class_id") === classId)
    def vw(alias: String, vcol: String) = vertexWeights match {
      case Some(df) => df.select(col("vertex").as(vcol), col("d").as(alias))
      case None => edges.select(col("vertex_a").as(vcol)).distinct()
        .union(edges.select(col("vertex_b").as(vcol))).distinct()
        .withColumn(alias, lit(1.0f))
    }
    val pu = phiC.select(col("token").as("vertex_a"), col("weights").as("p_u"))
    val pv = phiC.select(col("token").as("vertex_b"), col("weights").as("p_v"))

    edges
      .join(pu, Seq("vertex_a"))
      .join(pv, Seq("vertex_b"))
      .join(broadcast(vw("_du", "vertex_a")), Seq("vertex_a"))
      .join(broadcast(vw("_dv", "vertex_b")), Seq("vertex_b"))
      .withColumn("_contrib",
        zip_with(col("p_v"), col("p_u"), (pv_, pu_) =>
          (col("weight") * (pv_ / col("_dv") - pu_ / col("_du")) / col("_du")).cast("float")))
      .groupBy(col("vertex_a"))
      .agg(VectorOps.vectorSum(col("_contrib")).as("s"))
      .crossJoin(broadcast(nt))
      .select(lit(classId).as("class_id"), col("vertex_a").as("token"),
        RegUtil.maskTopics(
          zip_with(col("s"), col("n_t"), (s, n) => (s * n * n).cast("float")),
          mask).as("weights"))
  }
}

/** Relative-regularization wrapper — reference
  * phi_matrix_operations.cc:25-91,291-357: rescales an inner regularizer's
  * increments per (class, topic) by
  * coeff = γ·(n_t / r_it) + (1−γ)·(n / r_i), where n_t is the class's
  * positive n_wt topic mass, r_it = Σ_w |r_wt| in the class, n = Σ_t n_t,
  * r_i = Σ_t r_it. Two scalar-per-(class,topic) aggregates + a broadcast
  * rescale — no extra full-table shuffle beyond the inner regularizer's. */
case class RelativeRegularization(
    inner: PhiRegularizer,
    gamma: Float) extends PhiRegularizer {
  def name: String = s"relative(${inner.name})"

  def apply(pwt: DataFrame, nwt: DataFrame, ctx: RegContext): DataFrame = {
    val r = inner(pwt, nwt, ctx)
    val nt = nwt
      .select(col("class_id"),
        transform(col("weights"), x => when(x > 0f, x).otherwise(0f)).as("pos"))
      .groupBy(col("class_id"))
      .agg(VectorOps.vectorSum(col("pos")).as("n_t"))
    val rit = r
      .select(col("class_id"), transform(col("weights"), x => abs(x)).as("absw"))
      .groupBy(col("class_id"))
      .agg(VectorOps.vectorSum(col("absw")).as("r_it"))
    val coeff = nt.join(rit, Seq("class_id"))
      .withColumn("_n", aggregate(col("n_t"), lit(0.0), (a, x) => a + x))
      .withColumn("_ri", aggregate(col("r_it"), lit(0.0), (a, x) => a + x))
      .select(col("class_id"),
        zip_with(col("n_t"), col("r_it"), (n, ri) =>
          (lit(gamma) * (n / ri) + lit(1.0f - gamma) * (col("_n") / col("_ri")))
            .cast("float")).as("coeff"))
    r.join(broadcast(coeff), Seq("class_id"))
      .select(col("class_id"), col("token"),
        zip_with(col("weights"), col("coeff"), (w, c) => (w * c).cast("float")).as("weights"))
  }
}

/** MultiLanguagePhi — a stub in the reference too
  * (regularizer/multilanguage_phi.cc:12-20: body "defined later"), kept
  * for API parity: contributes zero increments. */
case class MultiLanguagePhi(name: String = "multilanguage") extends PhiRegularizer {
  def apply(pwt: DataFrame, nwt: DataFrame, ctx: RegContext): DataFrame =
    pwt.select(col("class_id"), col("token"),
      transform(col("weights"), _ => lit(0.0f)).as("weights"))
}
