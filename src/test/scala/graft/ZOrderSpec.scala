package graft

import org.apache.spark.sql.functions._
import graft.sources.ZOrder

/** Z-order layout: hand-checked Morton interleave, bucket-grid bounds,
  * and the property the layout exists for — files written in z-key
  * order carry narrow min/max footer ranges on BOTH columns, where a
  * single-column sort leaves the second column's per-file range at
  * full width (no skipping). */
class ZOrderSpec extends SparkSpec {
  import spark.implicits._

  test("interleaved: hand-checked Morton key") {
    // a = 0b101, b = 0b011 -> a bits on odd lanes (1,3,5), b on even
    // (0,2,4): z = a0*2 + a1*8 + a2*32 + b0*1 + b1*4 + b2*16
    //            = 2 + 0 + 32 + 1 + 4 + 0 = 39
    val z = Seq((5L, 3L)).toDF("a", "b")
      .select(ZOrder.interleaved(col("a"), col("b"), 3).as("z"))
      .head().getLong(0)
    assert(z === 39L)
  }

  test("zorderKey: buckets span [0, 2^bits), extremes land on the edges") {
    val df = (0L until 100L).map(i => (i, i, 99L - i)).toDF("id", "x", "y")
    val k = ZOrder.zorderKey(df, "x", "y", bits = 3).collect()
    assert(k.forall(r => r.getAs[Long]("bucket_a") >= 0 &&
      r.getAs[Long]("bucket_a") < 8))
    assert(k.forall(r => r.getAs[Long]("bucket_b") >= 0 &&
      r.getAs[Long]("bucket_b") < 8))
    val byId = k.map(r => r.getAs[Long]("id") ->
      (r.getAs[Long]("bucket_a"), r.getAs[Long]("bucket_b"))).toMap
    assert(byId(0L) === ((0L, 7L)))   // x min -> 0, y max -> 7
    assert(byId(99L) === ((7L, 0L)))
    // deterministic under repartitioning (integer arithmetic only)
    val again = ZOrder.zorderKey(df.repartition(7), "x", "y", bits = 3)
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[Long]("zkey")).toMap
    val first = k.map(r => r.getAs[Long]("id") -> r.getAs[Long]("zkey")).toMap
    assert(again === first)
  }

  test("z-ordered files skip on BOTH columns; x-sorted files cannot skip on y") {
    val grid = (for (x <- 0L until 64L; y <- 0L until 64L)
      yield (x * 64 + y, x, y)).toDF("id", "x", "y")
    def perFileYSpan(path: String): Seq[Long] = {
      val files = new java.io.File(path).listFiles()
        .filter(f => f.getName.endsWith(".parquet")).map(_.toString).toSeq
      files.map { f =>
        val r = spark.read.parquet(f).agg(min("y"), max("y")).head()
        r.getLong(1) - r.getLong(0)
      }
    }
    val zDir = java.nio.file.Files.createTempDirectory("graft_z").toString
    ZOrder.writeZOrdered(grid, zDir, "x", "y", bits = 6, numFiles = 16)
    val xDir = java.nio.file.Files.createTempDirectory("graft_x").toString
    grid.repartitionByRange(16, col("x")).sortWithinPartitions(col("x"))
      .write.mode("overwrite").parquet(xDir)
    val zSpans = perFileYSpan(zDir)
    val xSpans = perFileYSpan(xDir)
    assert(zSpans.size >= 8, s"expected >=8 z files, got ${zSpans.size}")
    val zAvg = zSpans.sum.toDouble / zSpans.size
    val xAvg = xSpans.sum.toDouble / xSpans.size
    // x-sorted files each cover (essentially) the full y range; z-curve
    // segments cover compact rectangles — materially narrower on y
    assert(xAvg > 55.0, s"x-sorted baseline should span ~full y, got $xAvg")
    assert(zAvg < 0.6 * xAvg, s"z layout y-span $zAvg !<< x-sorted $xAvg")
    // round-trip preserves content
    assert(spark.read.parquet(zDir).count() === 64L * 64L)
  }

  test("zorderKey on an empty input fails with a clear contract message") {
    val empty = Seq.empty[(Long, Long)].toDF("x", "y")
    val e = intercept[IllegalArgumentException] {
      ZOrder.zorderKey(empty, "x", "y")
    }
    assert(e.getMessage.contains("no non-null rows"),
      s"expected the empty-input contract message, got: ${e.getMessage}")
  }
}
