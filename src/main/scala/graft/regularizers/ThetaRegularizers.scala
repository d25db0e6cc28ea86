package graft.regularizers

import graft.operators.{BatchThetaAgent, ThetaAgent}

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
  * regularizer/hierarchy_sparsing_theta.cc:24-70, faithfully: applied to
  * the whole hARTM parent pseudo-batch at once (items = parent topics).
  * Per inner iteration, with n_d[i] = Σ_t n_td(i) and the cross-item topic
  * proportion n_t[t] = Σ_i prop[i] · n_td(i,t) / n_d[i]:
  *
  *   r_td(i,t) += α_iter · (−τ) · (prior − (n_td(i,t)/n_d[i]) · prop[i] / n_t[t])
  *
  * where prop = parent_topic_proportion (default all 1) and prior is the
  * uniform 1/item_size. NOTE the reference computes `1 / item_size` in C++
  * int arithmetic (hierarchy_sparsing_theta.cc:96), which is 0 for more
  * than one parent topic — we implement the documented intent (a float
  * uniform prior); set `literalIntPrior = true` for bug-compatible output.
  * Runs as a BatchThetaAgent under EStep.runJoint — the per-document
  * kernel cannot see cross-item state. */
case class HierarchySparsingTheta(
    tau: Float,
    parentTopicProportion: Option[Array[Float]] = None,
    alphaIter: Seq[Float] = Nil,
    topicIndices: Seq[Int] = Nil,
    literalIntPrior: Boolean = false) extends BatchThetaAgent {

  override def apply(innerIter: Int, titles: Array[String],
      nTd: Array[Array[Float]], rTd: Array[Array[Float]]): Unit = {
    val items = nTd.length
    if (items == 0) return
    val T = nTd(0).length
    val alpha = if (alphaIter.isEmpty) 1.0f
    else if (innerIter < alphaIter.length) alphaIter(innerIter) else return
    val prop = parentTopicProportion.getOrElse(Array.fill(items)(1.0f))
    require(prop.length == items, "parent_topic_proportion size != item count")
    val sel: Array[Boolean] =
      if (topicIndices.isEmpty) Array.fill(T)(true)
      else { val s = new Array[Boolean](T); topicIndices.foreach(i => if (i >= 0 && i < T) s(i) = true); s }

    val nD = nTd.map { row => var s = 0.0f; var t = 0; while (t < T) { s += row(t); t += 1 }; s }
    val nT = new Array[Float](T)
    var t = 0
    while (t < T) {
      var s = 0.0f
      var i = 0
      while (i < items) { if (nD(i) != 0.0f) s += prop(i) * nTd(i)(t) / nD(i); i += 1 }
      nT(t) = s
      t += 1
    }
    val prior = if (literalIntPrior) (1 / items).toFloat else 1.0f / items
    var i = 0
    while (i < items) {
      t = 0
      while (t < T) {
        if (sel(t) && nTd(i)(t) > 0.0f && nD(i) != 0.0f && nT(t) != 0.0f) {
          rTd(i)(t) += alpha * (-tau) * (prior - (nTd(i)(t) / nD(i)) * prop(i) / nT(t))
        }
        t += 1
      }
      i += 1
    }
  }
}
