package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SaveMode}
import org.apache.spark.sql.functions._

/** Z-ORDER (Morton-curve) layout clustering — the MULTI-column
  * data-skipping lever: interleave the bits of two columns' coarse
  * bucket ordinals into one sort key, and files written in that order
  * carry NARROW min/max footer ranges on BOTH columns simultaneously,
  * so a 2-D selective scan (user × time window; language × length band)
  * prunes most files from the footer stats alone. Sorting by a single
  * column gives perfect pruning on it and NONE on the second — the
  * z-curve trades a little of each for skipping on both (the
  * Delta/Iceberg OPTIMIZE ZORDER idea, re-expressed as plain Spark:
  * key expression + repartitionByRange + sortWithinPartitions; no
  * table-format dependency).
  *
  * Bucket ordinals are RANGE-scaLED from the column's min/max with
  * pure integer arithmetic — `((v − min) · 2^bits) div (span + 1)` —
  * so the key is deterministic and engine-portable (the oracle replays
  * it bit for bit); at 100 TB the min/max ride as a broadcast 1-row
  * aggregate, and the write is one range shuffle on the key. Rank-based
  * ordinals (ntile) would equalize bucket mass under skew but cost a
  * global sort per column and lose engine-exactness — range scaling is
  * the layout-grade trade. */
object ZOrder {

  /** `df` + [bucket_a, bucket_b, zkey]: per-column bucket ordinals in
    * [0, 2^bits) and their bit-interleaved Morton key (column A on the
    * high lanes). Columns must be integral (cast long); min/max come
    * from ONE broadcast 1-row aggregate. */
  def zorderKey(df: DataFrame, colA: String, colB: String,
      bits: Int = 8): DataFrame = {
    require(bits >= 1 && bits <= 20, "zorderKey: bits must be in [1, 20]")
    val nb = 1L << bits
    val mm = df.agg(
      min(col(colA).cast("long")).as("_mna"),
      max(col(colA).cast("long")).as("_mxa"),
      min(col(colB).cast("long")).as("_mnb"),
      max(col(colB).cast("long")).as("_mxb")).head()
    // min/max of an empty (or all-null) input are null — fail with a
    // clear contract message instead of an NPE in getLong
    require(!mm.isNullAt(0) && !mm.isNullAt(2),
      s"zorderKey: no non-null rows in ($colA, $colB) — " +
        "cannot derive the bucket grid from an empty input")
    val (mna, mxa, mnb, mxb) =
      (mm.getLong(0), mm.getLong(1), mm.getLong(2), mm.getLong(3))
    require(mxa - mna <= Long.MaxValue / nb && mxb - mnb <= Long.MaxValue / nb,
      s"zorderKey: column span overflows the $nb-bucket grid — lower bits")
    def bucket(c: String, mn: Long, mx: Long): Column =
      expr(s"((cast($c as bigint) - ${mn}L) * ${nb}L) div ${mx - mn + 1L}L")
    val out = df
      .withColumn("bucket_a", bucket(colA, mna, mxa))
      .withColumn("bucket_b", bucket(colB, mnb, mxb))
    out.withColumn("zkey", interleaved(col("bucket_a"), col("bucket_b"), bits))
  }

  /** Σ_i ((a>>i)&1)·2^(2i+1) + ((b>>i)&1)·2^(2i) — disjoint bit lanes,
    * so the sum IS the bitwise OR; plain shifts/ands/multiplies that
    * any engine evaluates identically. */
  private[graft] def interleaved(a: Column, b: Column, bits: Int): Column =
    (0 until bits).map { i =>
      shiftright(a, i).bitwiseAND(lit(1L)) * lit(1L << (2 * i + 1)) +
        shiftright(b, i).bitwiseAND(lit(1L)) * lit(1L << (2 * i))
    }.reduce(_ + _)

  /** Write `df` z-ordered on (colA, colB): one range shuffle on the
    * Morton key into `numFiles` output files, rows sorted by the key
    * within each — every file then covers a compact z-curve segment,
    * i.e. a small rectangle-ish region of the (A, B) plane, which is
    * what makes its min/max footer stats selective on both columns. */
  def writeZOrdered(df: DataFrame, path: String, colA: String, colB: String,
      bits: Int = 8, numFiles: Int = 64): Unit =
    zorderKey(df, colA, colB, bits)
      .repartitionByRange(numFiles, col("zkey"))
      .sortWithinPartitions(col("zkey"))
      .drop("bucket_a", "bucket_b", "zkey")
      .write.mode(SaveMode.Overwrite).parquet(path)
}
