package graft

import org.apache.spark.sql.functions._
import graft.functions.GramDecimal

/** Pins the flat exact-long Gram kernel ([[graft.functions.GramDecimal]])
  * value-equal to the decimal-expression plan it replaced in
  * Pca.topComponent:
  *
  *   posexplode(a) × posexplode(a) → groupBy(i, j)
  *     → sum(cast(xi·xj as decimal(28,8))).cast(double)
  *
  * Exact fixed-scale decimal sums are order-free, so equality of every
  * cell (not approximate closeness) is the contract — including HALF_UP
  * tie cells, which exercise the kernel's slow BigDecimal path. */
class GramDecimalSpec extends SparkSpec {

  private def oldGram(rows: Seq[Seq[Double]]): Map[(Int, Int), Double] = {
    import spark.implicits._
    rows.toDF("a")
      .select(posexplode(col("a")).as(Seq("i", "xi")), col("a"))
      .select(col("i"), col("xi"), posexplode(col("a")).as(Seq("j", "xj")))
      .groupBy(col("i"), col("j"))
      .agg(sum((col("xi") * col("xj")).cast("decimal(28,8)")).cast("double").as("g"))
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getDouble(2)).toMap
  }

  private def newGram(rows: Seq[Seq[Double]]): Map[(Int, Int), Double] = {
    import spark.implicits._
    val flat = rows.toDF("a")
      .agg(GramDecimal.gramSum(col("a")).as("g"))
      .head().getSeq[Long](0)
    val d = math.sqrt(flat.length.toDouble).round.toInt
    (for (i <- 0 until d; j <- 0 until d)
      yield (i, j) -> GramDecimal.unscaledToDouble(flat(i * d + j))).toMap
  }

  test("gramSum == decimal-expression Gram on random rows") {
    val rnd = new scala.util.Random(42)
    val rows = Seq.fill(50)(Seq.fill(7)(rnd.nextGaussian() * 3.0))
    assert(newGram(rows) === oldGram(rows))
  }

  test("gramSum == decimal-expression Gram on HALF_UP tie cells") {
    // products land exactly on the 1e-8 rounding grid's .5 ties
    // (0.000000005 · 1.0, negative ties, zero, and a large-magnitude cell)
    val rows = Seq(
      Seq(0.000000005, 1.0, -0.000000015, 123456.789),
      Seq(1.0, 0.5e-8, -1.0, 0.0),
      Seq(-0.000000025, 2.0, 0.000000035, -99999.25))
    assert(newGram(rows) === oldGram(rows))
  }

  test("dec8Unscaled matches Spark's double→decimal(28,8) cast semantics") {
    val vals = Seq(0.0, 1.0, -1.0, 0.000000005, -0.000000005, 0.123456785,
      -0.123456785, 3.14159265358979, 1e10 + 0.000000005, -2.5e-8,
      987654321.123456785, Double.MinPositiveValue)
    vals.foreach { v =>
      val expect = java.math.BigDecimal.valueOf(v)
        .setScale(8, java.math.RoundingMode.HALF_UP).unscaledValue().longValueExact()
      assert(GramDecimal.dec8Unscaled(v) === expect, s"for $v")
    }
  }
}
