package graft.regularizers

/** Ptdw regularizer agents — rewrite the per-document p(t|d,w) matrix
  * between inner passes (reference regularizer_interface.h ptdw agents).
  * `ptdw(i)(k)` = p(topic k | doc, token position i); rows follow the
  * document's token order. */
trait PtdwAgent extends Serializable {
  def apply(title: String, docId: Long, innerIter: Int, ptdw: Array[Array[Float]]): Unit
}

/** SmoothPtdw — reference regularizer/smooth_ptdw.cc:15-115.
  * MovingAverage: ptdw[i] += τ · Σ_{|j-i|<h, j non-background} ptdw0[j]
  * (background positions — those whose mass on background topics exceeds
  * `threshold` — are skipped and excluded from the window sum).
  * MovingProduct: ptdw[i] *= ptdw0[i-1] · ptdw0[i+1]. */
case class SmoothPtdw(
    tau: Float,
    window: Int = 10,
    threshold: Float = 1.0f,
    backgroundTopicIndices: Seq[Int] = Nil,
    movingProduct: Boolean = false) extends PtdwAgent {

  override def apply(title: String, docId: Long, innerIter: Int, ptdw: Array[Array[Float]]): Unit = {
    val n = ptdw.length
    if (n == 0) return
    val T = ptdw(0).length
    val copy = ptdw.map(_.clone())

    if (movingProduct) {
      var i = 0
      while (i < n) {
        var k = 0
        while (k < T) {
          if (i + 1 < n) ptdw(i)(k) *= copy(i + 1)(k)
          if (i - 1 >= 0) ptdw(i)(k) *= copy(i - 1)(k)
          k += 1
        }
        i += 1
      }
      return
    }

    // MovingAverage with sliding sum, background exclusion
    val bg = new Array[Boolean](n)
    if (backgroundTopicIndices.nonEmpty) {
      var i = 0
      while (i < n) {
        var s = 0.0f
        backgroundTopicIndices.foreach(k => s += copy(i)(k))
        bg(i) = s > threshold
        i += 1
      }
    }
    val h = window / 2
    val smoothed = new Array[Float](T)
    var i = 0
    while (i < h && i < n) {
      if (!bg(i)) { var k = 0; while (k < T) { smoothed(k) += copy(i)(k); k += 1 } }
      i += 1
    }
    i = 0
    while (i < n) {
      // reference skips window bookkeeping on background positions too
      if (!bg(i)) {
        var k = 0
        while (k < T) {
          ptdw(i)(k) += tau * smoothed(k)
          if (i + h < n && !bg(i + h)) smoothed(k) += copy(i + h)(k)
          if (i - h >= 0 && !bg(i - h)) smoothed(k) -= copy(i - h)(k)
          k += 1
        }
      }
      i += 1
    }
  }
}

/** TopicSegmentationPtdw — reference
  * regularizer/topic_segmentation_ptdw.cc:20-136: hard-assign each
  * position to a single topic; switch topics only where the left/right
  * window distributions diverge beyond `threshold` (linear text
  * segmentation over the ptdw sequence). */
case class TopicSegmentationPtdw(
    window: Int = 10,
    threshold: Float = 0.3f,
    backgroundTopicIndices: Seq[Int] = Nil) extends PtdwAgent {

  override def apply(title: String, docId: Long, innerIter: Int, ptdw: Array[Array[Float]]): Unit = {
    val n = ptdw.length
    if (n == 0) return
    val T = ptdw(0).length
    val copy = ptdw.map(_.clone())
    val bgProb = new Array[Float](n)
    if (backgroundTopicIndices.nonEmpty) {
      var i = 0
      while (i < n) {
        backgroundTopicIndices.foreach(k => bgProb(i) += copy(i)(k))
        i += 1
      }
    }
    val h = window
    val left = new Array[Float](T)
    val right = new Array[Float](T)
    var leftW = 0.0f
    var rightW = 0.0f

    var mainTopic = 0
    var best = copy(0)(0)
    var k = 0
    while (k < T) { if (copy(0)(k) > best) { best = copy(0)(k); mainTopic = k }; k += 1 }
    setOneHot(ptdw(0), mainTopic)

    var i = 0
    while (i < h && i < n) {
      k = 0
      while (k < T) { right(k) += copy(i)(k) * (1 - bgProb(i)); k += 1 }
      rightW += 1 - bgProb(i)
      i += 1
    }
    i = 1
    while (i < n) {
      k = 0
      while (k < T) {
        left(k) += copy(i - 1)(k) * (1 - bgProb(i - 1))
        right(k) -= copy(i - 1)(k) * (1 - bgProb(i - 1))
        k += 1
      }
      leftW += 1 - bgProb(i - 1)
      rightW -= 1 - bgProb(i - 1)
      if (i <= n - h) {
        k = 0
        while (k < T) { right(k) += copy(i + h - 1)(k) * (1 - bgProb(i + h - 1)); k += 1 }
        rightW += 1 - bgProb(i + h - 1)
      }
      if (i > h) {
        k = 0
        while (k < T) { left(k) -= copy(i - h - 1)(k) * (1 - bgProb(i - h - 1)); k += 1 }
        leftW -= 1 - bgProb(i - h - 1)
      }
      val lTopic = argmax(left)
      val rTopic = argmax(right)
      val changes = leftW > 0 && rightW > 0 &&
        ((left(lTopic) / leftW - right(lTopic) / rightW) / 2 +
         (right(rTopic) / rightW - left(rTopic) / leftW) / 2 > threshold)
      if (changes) mainTopic = rTopic
      setOneHot(ptdw(i), mainTopic)
      i += 1
    }
  }

  private def argmax(a: Array[Float]): Int = {
    var m = 0; var i = 1
    while (i < a.length) { if (a(i) > a(m)) m = i; i += 1 }
    m
  }
  private def setOneHot(row: Array[Float], topic: Int): Unit = {
    java.util.Arrays.fill(row, 0.0f)
    row(topic) = 1.0f
  }
}
