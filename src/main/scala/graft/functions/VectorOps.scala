package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Float-vector aggregation primitives. The reference merges per-thread
  * n_wt partials with per-row spinlocks (dense_phi_matrix.h:41-51); in
  * Spark the associative merge is the shuffle itself: map-side partial
  * aggregation (the kernel pre-combines per partition) + these Aggregators
  * as the reduce. Arithmetic stays float32 to mirror the reference.
  */
object VectorOps {

  private[graft] val floatArrayEncoder: Encoder[Array[Float]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Float]]()

  /** Elementwise sum of array<float> columns. Null-safe: null input rows
    * are skipped; empty group yields null. */
  private object VectorSumAgg extends Aggregator[Array[Float], Array[Float], Array[Float]] {
    def zero: Array[Float] = Array.empty[Float]
    def reduce(b: Array[Float], a: Array[Float]): Array[Float] = {
      if (a == null) return b
      if (b.length == 0) return a.clone()
      var i = 0
      while (i < b.length) { b(i) += a(i); i += 1 }
      b
    }
    def merge(x: Array[Float], y: Array[Float]): Array[Float] =
      if (x.length == 0) y else if (y.length == 0) x else reduce(x, y)
    def finish(b: Array[Float]): Array[Float] = if (b.length == 0) null else b
    def bufferEncoder: Encoder[Array[Float]] = VectorOps.floatArrayEncoder
    def outputEncoder: Encoder[Array[Float]] = VectorOps.floatArrayEncoder
  }

  /** Same but each input row is pre-scaled: sum_i w_i * vec_i (MergeModel's
    * weighted union, reference master_component.cc:937-1013). */
  private object WeightedVectorSumAgg
      extends Aggregator[(Array[Float], Float), Array[Float], Array[Float]] {
    def zero: Array[Float] = Array.empty[Float]
    def reduce(b: Array[Float], a: (Array[Float], Float)): Array[Float] = {
      val (v, w) = a
      if (v == null) return b
      val out = if (b.length == 0) new Array[Float](v.length) else b
      var i = 0
      while (i < v.length) { out(i) += v(i) * w; i += 1 }
      out
    }
    def merge(x: Array[Float], y: Array[Float]): Array[Float] = {
      if (x.length == 0) return y
      if (y.length == 0) return x
      var i = 0
      while (i < x.length) { x(i) += y(i); i += 1 }
      x
    }
    def finish(b: Array[Float]): Array[Float] = if (b.length == 0) null else b
    def bufferEncoder: Encoder[Array[Float]] = VectorOps.floatArrayEncoder
    def outputEncoder: Encoder[Array[Float]] = VectorOps.floatArrayEncoder
  }

  private[graft] val doubleArrayEncoder: Encoder[Array[Double]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Double]]()

  /** Double-precision elementwise vector sum — the aggregation primitive of
    * the relational oracle mirror's array dataflow (RelationalEm): one
    * array row per (doc, token) replaces the corpus×T long-format
    * expansion, and this aggregator's map-side partials replace the
    * long-format groupBy shuffles. Summation order differs from a
    * long-format sum only in float round-off (~1e-15 relative), absorbed
    * by the oracle's round(6). */
  private object DoubleVectorSumAgg
      extends Aggregator[Array[Double], Array[Double], Array[Double]] {
    def zero: Array[Double] = Array.empty[Double]
    def reduce(b: Array[Double], a: Array[Double]): Array[Double] = {
      if (a == null) return b
      if (b.length == 0) return a.clone()
      var i = 0
      while (i < b.length) { b(i) += a(i); i += 1 }
      b
    }
    def merge(x: Array[Double], y: Array[Double]): Array[Double] =
      if (x.length == 0) y else if (y.length == 0) x else reduce(x, y)
    def finish(b: Array[Double]): Array[Double] = if (b.length == 0) null else b
    def bufferEncoder: Encoder[Array[Double]] = VectorOps.doubleArrayEncoder
    def outputEncoder: Encoder[Array[Double]] = VectorOps.doubleArrayEncoder
  }

  /** vector_sum(col): groupBy-able elementwise float-vector sum. */
  def vectorSum(c: Column): Column = {
    val fn = udaf(VectorSumAgg)
    fn(c)
  }

  /** Order-keyed elementwise float-vector sum: buffers (key, vec) pairs
    * and folds them in SORTED-KEY order at finish, so the float32
    * result is independent of shuffle-merge order.
    *
    * Why this exists (round 11, found by the local-cluster
    * certification): a plain float32 reduce merges partials in task-
    * completion order. In one JVM that order happens to be stable, but
    * across executor processes it races — and because the race's
    * wiggle is at float32 ulp scale, i.e. exactly the rounding grid,
    * refitting the SAME model under local-cluster[2,4] changed 22 of
    * 31 phi rows run-to-run. The reference's own repeatability test
    * pins num_processors=1 (artm_tests/repeatable_result_test.cc:27) —
    * its multicore adds race the same way under spinlocks — so a
    * deterministic fold EXCEEDS the reference: fits are bit-reproducible
    * at any executor count, which is what a 1000-executor training run
    * actually wants from "fixed seed" determinism.
    *
    * Cost: the reduce state holds one (key, vec) pair per map-side
    * partial instead of a running sum — the per-group buffer is
    * LINEAR IN THE KEY SET (appends are O(1) prepends, the one sort
    * runs at finish). Callers key by bounded sets: the per-topic
    * normalizers by the dictionary-capped vocab (the same bound as the
    * broadcast Phi that path already carries), MergeModel by source
    * ordinals, and the n_wt path by E-step partition ordinals — which
    * grows with the fit's partition count, so EStep.nwt caps keys per
    * group at [[graft.operators.EStep.FoldWidth]] via a multi-level
    * tree of these folds (flat memory per group at ANY partition
    * count). Never corpus-sized. Keys MUST be unique per group
    * (asserted at finish). */
  def orderedVectorSum(key: Column, vec: Column): Column = {
    val fn = udaf(OrderedVectorSumAgg)
    fn(key, vec)
  }

  private[graft] val orderedBufEncoder: Encoder[List[(String, Array[Float])]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[List[(String, Array[Float])]]()

  /** Test-only instrumentation: when enabled, the ordered aggregators
    * record the largest buffer they folded at finish — the ScaleCheck
    * flat-memory-per-group certification reads it. Off in production
    * (one volatile read per finish call). Local-mode only: the probe is
    * a JVM static, invisible across executor processes. */
  @volatile private[graft] var bufferProbeEnabled: Boolean = false
  private[graft] val maxOrderedBuffer = new java.util.concurrent.atomic.AtomicLong(0)
  private def probeBuffer(n: Int): Unit = if (bufferProbeEnabled) {
    var cur = maxOrderedBuffer.get()
    while (n > cur && !maxOrderedBuffer.compareAndSet(cur, n)) cur = maxOrderedBuffer.get()
  }

  // duplicate fold keys would reintroduce merge-order dependence between
  // their rows — the keying contract is per-group uniqueness; checked
  // after the sort (adjacent-equal) so a miskeyed caller (e.g. the
  // join-based E-step's constant position=-1 partials) fails loudly
  // instead of silently racing
  private def assertUniqueKeys(sortedKeys: IndexedSeq[String]): Unit = {
    var r = 1
    while (r < sortedKeys.length) {
      if (sortedKeys(r) == sortedKeys(r - 1))
        throw new IllegalStateException(
          s"ordered vector fold saw duplicate key '${sortedKeys(r)}' — " +
            "the determinism contract requires one partial per key per group " +
            "(see VectorOps.orderedVectorSum); a caller whose partials are not " +
            "uniquely keyed must use the unordered sum instead")
      r += 1
    }
  }

  private object OrderedVectorSumAgg
      extends Aggregator[(String, Array[Float]), List[(String, Array[Float])], Array[Float]] {
    def zero: List[(String, Array[Float])] = Nil
    // O(1) prepend — finish sorts anyway, so buffer order is free; an
    // append on an immutable Seq is O(n) per row = O(n²) per group,
    // quadratic in vocab on the normalizer path (r11 ADVICE)
    def reduce(b: List[(String, Array[Float])],
        a: (String, Array[Float])): List[(String, Array[Float])] =
      if (a == null || a._2 == null) b else (a._1 -> a._2) :: b
    def merge(x: List[(String, Array[Float])],
        y: List[(String, Array[Float])]): List[(String, Array[Float])] = x ::: y
    def finish(b: List[(String, Array[Float])]): Array[Float] = {
      if (b.isEmpty) return null
      val sorted = b.sortBy(_._1).toIndexedSeq
      assertUniqueKeys(sorted.map(_._1))
      probeBuffer(sorted.length)
      val out = sorted.head._2.clone()
      var r = 1
      while (r < sorted.length) {
        val v = sorted(r)._2
        var i = 0
        while (i < out.length && i < v.length) { out(i) += v(i); i += 1 }
        r += 1
      }
      out
    }
    def bufferEncoder: Encoder[List[(String, Array[Float])]] = orderedBufEncoder
    def outputEncoder: Encoder[Array[Float]] = VectorOps.floatArrayEncoder
  }

  /** Order-keyed weighted float-vector sum: Σ w_i·vec_i folded in
    * sorted-key order — MergeModel's deterministic twin (same rationale
    * as [[orderedVectorSum]]; callers key by a source ordinal, so the
    * buffer holds one entry per merged source). */
  def orderedWeightedVectorSum(key: Column, vec: Column, w: Column): Column = {
    val fn = udaf(OrderedWeightedVectorSumAgg)
    fn(key, vec, w)
  }

  private[graft] val orderedWBufEncoder: Encoder[List[(String, Array[Float], Float)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[List[(String, Array[Float], Float)]]()

  private object OrderedWeightedVectorSumAgg
      extends Aggregator[(String, Array[Float], Float),
        List[(String, Array[Float], Float)], Array[Float]] {
    def zero: List[(String, Array[Float], Float)] = Nil
    def reduce(b: List[(String, Array[Float], Float)],
        a: (String, Array[Float], Float)): List[(String, Array[Float], Float)] =
      if (a == null || a._2 == null) b else a :: b
    def merge(x: List[(String, Array[Float], Float)],
        y: List[(String, Array[Float], Float)]): List[(String, Array[Float], Float)] = x ::: y
    def finish(b: List[(String, Array[Float], Float)]): Array[Float] = {
      if (b.isEmpty) return null
      val sorted = b.sortBy(_._1).toIndexedSeq
      assertUniqueKeys(sorted.map(_._1))
      probeBuffer(sorted.length)
      val out = new Array[Float](sorted.head._2.length)
      var r = 0
      while (r < sorted.length) {
        val (_, v, w) = sorted(r)
        var i = 0
        while (i < out.length && i < v.length) { out(i) += v(i) * w; i += 1 }
        r += 1
      }
      out
    }
    def bufferEncoder: Encoder[List[(String, Array[Float], Float)]] = orderedWBufEncoder
    def outputEncoder: Encoder[Array[Float]] = VectorOps.floatArrayEncoder
  }

  /** double_vector_sum(col): groupBy-able elementwise double-vector sum. */
  def doubleVectorSum(c: Column): Column = {
    val fn = udaf(DoubleVectorSumAgg)
    fn(c)
  }

  /** weighted_vector_sum(vec, w): Σ w·vec. */
  def weightedVectorSum(vec: Column, w: Column): Column = {
    val fn = udaf(WeightedVectorSumAgg)
    fn(vec, w)
  }

  // ---- local (kernel-side) primitives -------------------------------------

  /** dot of a phi row slice against theta, float32. */
  def dotSlice(flat: Array[Float], off: Int, theta: Array[Float]): Float = {
    var s = 0.0f
    var k = 0
    while (k < theta.length) { s += flat(off + k) * theta(k); k += 1 }
    s
  }

  def axpySlice(alpha: Float, flat: Array[Float], off: Int, out: Array[Float]): Unit = {
    var k = 0
    while (k < out.length) { out(k) += alpha * flat(off + k); k += 1 }
  }
}
