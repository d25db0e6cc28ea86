package graft

import org.apache.spark.sql.functions._
import graft.pipeline.Dedup

/** Pins the fused native MinHash kernel
  * ([[graft.functions.MinhashSignature]]) value-equal to the HOF form it
  * replaced (`array(array_min(transform(sh, s => md5(i || ' ' || s))))`)
  * — including the empty-array all-nulls edge and multi-byte shingles.
  * The r13 optimization swapped the kernel under every minhash entry
  * (LSH pairs, index, incremental, streams); equality here plus the
  * oracle hashes is what certifies the swap. */
class MinhashSignatureSpec extends SparkSpec {

  private def hofSignature(shingleCol: org.apache.spark.sql.Column,
      numHashes: Int) =
    array((0 until numHashes).map { i =>
      array_min(transform(shingleCol,
        s => md5(concat(lit(i.toString), lit(" "), s))))
    }: _*)

  test("native minhash == HOF minhash, incl. empty and unicode shingles") {
    import spark.implicits._
    val df = Seq(
      Seq("the quick fox", "quick fox jumps", "fox jumps over"),
      Seq("café au lait", "日本語"),
      Seq("a"),
      Seq.empty[String]
    ).toDF("sh")
    Seq(1, 8, 32).foreach { n =>
      val rows = df.select(
          Dedup.minhashSignature(col("sh"), n).as("fast"),
          hofSignature(col("sh"), n).as("slow"))
        .collect()
      rows.foreach { r =>
        assert(r.getSeq[String](0) == r.getSeq[String](1),
          s"n=$n mismatch: ${r.getSeq[String](0)} vs ${r.getSeq[String](1)}")
      }
    }
  }
}
