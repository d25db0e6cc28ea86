package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.GraftColumnBridge

/** Pins the one-pass native winnowing selection
  * ([[graft.functions.WinnowSelect]]) value-equal to the HOF shape it
  * replaced (slice + array_min + rightmost-min aggregate per window),
  * over the edges that matter: ties (rightmost min), arrays shorter
  * than the window (the slice-truncation single window), exact-w
  * arrays, and the empty array. */
class WinnowSelectSpec extends SparkSpec {

  private def hofSels(w: Int) =
    when(size(col("h")) === 0, array().cast("array<bigint>"))
      .otherwise(transform(
        sequence(lit(0), greatest(size(col("h")) - lit(w), lit(0))),
        i => {
          val sub = slice(col("h"), i + lit(1), lit(w))
          val m = array_min(sub)
          val ri = aggregate(sequence(lit(0), size(sub) - lit(1)),
            lit(0L), (acc, j) =>
              when(element_at(sub, j.cast("int") + 1) === m,
                j.cast("long")).otherwise(acc))
          (i.cast("long") + ri) * lit(4294967296L) + m
        }))

  private def nativeSels(w: Int) =
    GraftColumnBridge.column(graft.functions.WinnowSelect(
      GraftColumnBridge.expression(col("h")), w))

  test("WinnowSelect == slice/array_min/aggregate HOF on edge fixtures") {
    import spark.implicits._
    val df = Seq(
      Seq(5L, 3L, 3L, 7L, 1L, 1L, 9L), // ties inside and across windows
      Seq(2L, 2L, 2L, 2L),             // all-equal (rightmost everywhere)
      Seq(42L),                        // shorter than w
      Seq(9L, 8L),                     // still shorter than w=4
      Seq(4L, 1L, 4L, 1L),             // exactly w
      Seq.empty[Long]
    ).toDF("h")
    Seq(1, 3, 4).foreach { w =>
      val rows = df.select(col("h"), nativeSels(w).as("fast"),
        hofSels(w).as("slow")).collect()
      rows.foreach { r =>
        assert(r.getSeq[Long](1) == r.getSeq[Long](2),
          s"w=$w mismatch on ${r.getSeq[Long](0)}: " +
            s"${r.getSeq[Long](1)} vs ${r.getSeq[Long](2)}")
      }
    }
  }
}
