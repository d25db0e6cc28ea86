package graft.regularizers

import graft.operators.ThetaAgent

/** Theta-side regularizer agents — applied inside the E-step kernel each
  * inner iteration (reference regularizer_interface.h:27-57 agent classes).
  * All state is immutable and serializable; per-item data travels as plain
  * Maps (broadcast by the closure).
  */

/** SmoothSparseTheta — reference regularizer/smooth_sparse_theta.cc:16-117:
  * r_td += mult[d][t] · alpha_iter[iter] · topic_weight[t] · f(n_td) (only
  * where f(n_td) > 0). topic_weight[t] = τ for selected topics else 0;
  * alpha_iter defaults to all-1s of length numDocumentPasses. Item masks:
  * universal per-topic multiplier, or per-title multipliers (items not in
  * the map are untouched). */
case class SmoothSparseTheta(
    tau: Float,
    numTopics: Int,
    topicIndices: Seq[Int] = Nil,
    alphaIter: Seq[Float] = Nil,
    fn: TransformFn = TransformFn.Constant,
    universalMultiplier: Option[Array[Float]] = None,
    itemMultipliers: Option[Map[String, Array[Float]]] = None) extends ThetaAgent {

  private val topicWeight: Array[Float] = {
    val w = new Array[Float](numTopics)
    if (topicIndices.isEmpty) java.util.Arrays.fill(w, tau)
    else topicIndices.foreach(i => if (i >= 0 && i < numTopics) w(i) = tau)
    w
  }

  override def apply(title: String, docId: Long, innerIter: Int,
      nTd: Array[Float], rTd: Array[Float]): Unit = {
    val alpha = if (alphaIter.isEmpty) 1.0f
    else if (innerIter < alphaIter.length) alphaIter(innerIter) else return
    val mult: Array[Float] = itemMultipliers match {
      case Some(m) => m.getOrElse(title, return) // specific items only
      case None => universalMultiplier.orNull
    }
    var t = 0
    while (t < nTd.length) {
      val v = fn(nTd(t))
      if (v > 0.0f) {
        val mm = if (mult == null) 1.0f else mult(t)
        rTd(t) += mm * alpha * topicWeight(t) * v
      }
      t += 1
    }
  }
}

/** TopicSelectionTheta — reference
  * regularizer/topic_selection_theta.cc:15-164:
  * r_td += alpha_iter[iter] · τ · topic_value[t] · n_td (for n_td > 0)
  * where topic_value[t] = n / (n_t · |T|) is recomputed by the driver each
  * pass from the current n_wt topic masses (python artm_model.py:73-103).
  * Pass τ < 0 to kill weak topics. */
case class TopicSelectionTheta(
    tau: Float,
    topicValue: Array[Float],
    topicIndices: Seq[Int] = Nil,
    alphaIter: Seq[Float] = Nil) extends ThetaAgent {

  override def apply(title: String, docId: Long, innerIter: Int,
      nTd: Array[Float], rTd: Array[Float]): Unit = {
    val alpha = if (alphaIter.isEmpty) 1.0f
    else if (innerIter < alphaIter.length) alphaIter(innerIter) else return
    val all = topicIndices.isEmpty
    val sel = if (all) null else topicIndices.toSet
    var t = 0
    while (t < nTd.length) {
      if ((all || sel.contains(t)) && nTd(t) > 0.0f) {
        rTd(t) += alpha * tau * topicValue(t) * nTd(t)
      }
      t += 1
    }
  }
}

object TopicSelectionTheta {
  /** topic_value[t] = n / (n_t · |T|) from the current topic masses. */
  def topicValues(nt: Array[Float]): Array[Float] = {
    val n = nt.sum.toDouble
    nt.map { v =>
      val d = v.toDouble * nt.length
      if (d > 0) (n / d).toFloat else 0.0f
    }
  }
}

/** HierarchySparsingTheta — reference
  * regularizer/hierarchy_sparsing_theta.cc:15-130: active only on the
  * hARTM parent pseudo-batch (items = parent topics): pushes each parent
  * topic's child-topic distribution toward sparsity via a KL term against
  * the uniform prior 1/numItems. `pseudoItemTitles` marks pseudo-batch
  * items; others are untouched. */
case class HierarchySparsingTheta(
    tau: Float,
    pseudoItemTitles: Set[String],
    alphaIter: Seq[Float] = Nil) extends ThetaAgent {

  override def apply(title: String, docId: Long, innerIter: Int,
      nTd: Array[Float], rTd: Array[Float]): Unit = {
    if (!pseudoItemTitles.contains(title)) return
    val alpha = if (alphaIter.isEmpty) 1.0f
    else if (innerIter < alphaIter.length) alphaIter(innerIter) else return
    var sum = 0.0f
    var t = 0
    while (t < nTd.length) { sum += math.max(nTd(t), 0.0f); t += 1 }
    if (sum <= 0.0f) return
    val prior = 1.0f / nTd.length
    t = 0
    while (t < nTd.length) {
      if (nTd(t) > 0.0f) {
        val p = nTd(t) / sum
        // d/dθ of -KL(p ‖ uniform): pull below-prior mass down, above up
        rTd(t) += alpha * tau * nTd(t) * (math.log(p / prior)).toFloat
      }
      t += 1
    }
  }
}
