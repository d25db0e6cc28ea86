package graft.functions

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Two-phase top-k aggregation: per-partition partial top-k buffers merged
  * at the reduce — the scale-safe replacement for
  * `row_number().over(Window.partitionBy(group).orderBy(desc))`, which
  * sorts each group's ENTIRE contents in one task (a straggler wall when a
  * group spans the vocabulary and #groups ≪ #cores, e.g. per-topic token
  * rankings). k stays small (tens), so buffers are bounded. */
object TopK {

  case class KV(k: String, v: Float)

  private def bound(s: Seq[KV], k: Int): Seq[KV] =
    s.sortBy(x => (-x.v, x.k)).take(k)

  /** Worse-than-the-worst check: buffers stay sorted (v desc, k asc), so
    * a full buffer rejects a non-improving row in O(1) — the reference
    * priority queue's behavior, without re-sorting per row. */
  private def insertBounded(b: Seq[KV], a: KV, k: Int): Seq[KV] = {
    if (b.length >= k) {
      val worst = b.last
      if (a.v < worst.v || (a.v == worst.v && a.k >= worst.k)) return b
    }
    bound(b :+ a, k)
  }

  /** top-k (v desc, k asc) as Seq[KV]. */
  private case class TopKAgg(k: Int) extends Aggregator[KV, Seq[KV], Seq[KV]] {
    def zero: Seq[KV] = Nil
    def reduce(b: Seq[KV], a: KV): Seq[KV] = insertBounded(b, a, k)
    def merge(x: Seq[KV], y: Seq[KV]): Seq[KV] = bound(x ++ y, k)
    def finish(b: Seq[KV]): Seq[KV] = b
    def bufferEncoder: Encoder[Seq[KV]] = ExpressionEncoder()
    def outputEncoder: Encoder[Seq[KV]] = ExpressionEncoder()
  }

  /** `topK(key, value, k)` → array<struct<k,v>> of the group's top k
    * values, sorted (v desc, key asc). */
  def topK(key: Column, value: Column, k: Int): Column = {
    val fn = udaf(TopKAgg(k))
    fn(key, value)
  }

  /** SpecifiedSparsePhi's keep rule (reference
    * specified_sparse_phi.cc:58-110): keep the top `k` cells by value,
    * then the largest prefix whose cumulative mass first crosses
    * `threshold` × (group total). Tracks the FULL group total while only
    * buffering k cells. Returns the kept keys. */
  private case class TopMassKeepAgg(k: Int, threshold: Double)
      extends Aggregator[KV, (Seq[KV], Double), Seq[String]] {
    def zero: (Seq[KV], Double) = (Nil, 0.0)
    def reduce(b: (Seq[KV], Double), a: KV): (Seq[KV], Double) =
      (insertBounded(b._1, a, k), b._2 + a.v)
    def merge(x: (Seq[KV], Double), y: (Seq[KV], Double)): (Seq[KV], Double) =
      (bound(x._1 ++ y._1, k), x._2 + y._2)
    def finish(b: (Seq[KV], Double)): Seq[String] = {
      val total = b._2
      var cum = 0.0
      b._1.filter { x =>
        cum += x.v
        (cum - x.v) < total * threshold
      }.map(_.k)
    }
    def bufferEncoder: Encoder[(Seq[KV], Double)] = ExpressionEncoder()
    def outputEncoder: Encoder[Seq[String]] = ExpressionEncoder()
  }

  /** `topMassKeep(key, value, k, threshold)` → array<string> of kept keys. */
  def topMassKeep(key: Column, value: Column, k: Int, threshold: Double): Column = {
    val fn = udaf(TopMassKeepAgg(k, threshold))
    fn(key, value)
  }
}
