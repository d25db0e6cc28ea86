package graft.functions

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Exact-decimal Gram (scatter-matrix) accumulation for the PCA pass
  * (guide §1.2 step 2 / §4: native per-task work instead of a d²-wide
  * double-posexplode shuffle).
  *
  * The certified PCA arithmetic (Pca.topComponent, mirrored term for term
  * by the DuckDB oracle) defines each scatter cell as
  *
  *   S(i,j) = double( Σ_rows decimal28_8(x_i · x_j) )
  *
  * — products computed in double, each cast to DECIMAL(28,8) HALF_UP
  * (Spark's double→decimal cast = BigDecimal.valueOf shortest-repr
  * semantics), then summed EXACTLY. An exact fixed-scale decimal sum is
  * associative and commutative, so ANY computation order yields the
  * identical value — which is what makes this kernel certifiable: it
  * accumulates the same addends as the old `posexplode × posexplode →
  * groupBy(i,j) → sum(decimal)` plan, as scale-8 unscaled longs in a flat
  * d² array, one pass per row, no explode and no shuffle of d² partials
  * per row. `Math.addExact` keeps overflow loud (the decimal sum's
  * precision-38 headroom is far beyond any real embedding corpus; a long
  * holds |Σ x_i·x_j| up to 9.2e10 at scale 8, still far beyond the
  * bench's centered unit-scale embeddings — and a corpus that large
  * should move the mean pass to DECIMAL(38) anyway).
  *
  * GramDecimalSpec pins byte-equality against the decimal-expression form
  * on random and near-tie fixtures.
  */
object GramDecimal {

  private[graft] val longArrayEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()

  /** Spark's `cast(x as decimal(·,8))` as an unscaled long: HALF_UP on
    * the SHORTEST-DECIMAL-REPRESENTATION of the double
    * (java.math.BigDecimal.valueOf semantics — what Spark's Cast does).
    * Fast path: plain binary rounding, provably equal to the decimal
    * rounding whenever the scaled value sits further from a .5 tie than
    * the double's own representation error (guard band 1e-4 ≫ ulp(y)
    * for |y| < 1e11); near-ties and big magnitudes take the exact
    * BigDecimal path. */
  def dec8Unscaled(x: Double): Long = {
    val y = x * 1e8
    if (java.lang.Math.abs(y) < 1e11) {
      val f = java.lang.Math.floor(y)
      val frac = y - f
      if (java.lang.Math.abs(frac - 0.5) > 1e-4)
        (if (frac > 0.5) f + 1.0 else f).toLong
      else slowDec8(x)
    } else slowDec8(x)
  }

  private def slowDec8(x: Double): Long =
    java.math.BigDecimal.valueOf(x)
      .setScale(8, java.math.RoundingMode.HALF_UP)
      .unscaledValue().longValueExact()

  /** Aggregator: rows are centered d-vectors; buffer/output is the flat
    * row-major d² array of scale-8 unscaled-long sums. */
  private object GramAgg extends Aggregator[Array[Double], Array[Long], Array[Long]] {
    def zero: Array[Long] = Array.empty[Long]
    def reduce(b: Array[Long], a: Array[Double]): Array[Long] = {
      if (a == null) return b
      val d = a.length
      val buf = if (b.length == 0) new Array[Long](d * d) else b
      var i = 0
      while (i < d) {
        val xi = a(i)
        val off = i * d
        var j = 0
        while (j < d) {
          buf(off + j) = java.lang.Math.addExact(buf(off + j), dec8Unscaled(xi * a(j)))
          j += 1
        }
        i += 1
      }
      buf
    }
    def merge(x: Array[Long], y: Array[Long]): Array[Long] = {
      if (x.length == 0) return y
      if (y.length == 0) return x
      var i = 0
      while (i < x.length) { x(i) = java.lang.Math.addExact(x(i), y(i)); i += 1 }
      x
    }
    def finish(b: Array[Long]): Array[Long] = if (b.length == 0) null else b
    def bufferEncoder: Encoder[Array[Long]] = longArrayEncoder
    def outputEncoder: Encoder[Array[Long]] = longArrayEncoder
  }

  /** gram_decimal_sum(vec): flat d² scale-8 unscaled sums of the rows'
    * outer products. */
  def gramSum(c: Column): Column = {
    val fn = udaf(GramAgg)
    fn(c)
  }

  /** An unscaled scale-8 sum back to the double the old
    * `sum(decimal(28,8)).cast(double)` produced. */
  def unscaledToDouble(u: Long): Double =
    java.math.BigDecimal.valueOf(u, 8).doubleValue
}
