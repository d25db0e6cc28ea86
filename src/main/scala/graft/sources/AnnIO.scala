package graft.sources

import org.apache.spark.sql.{SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import graft.pipeline.Ann

/** IVF-PQ index persistence — the ANN serving artifact as parquet (the
  * ModelIO pattern for search indexes): the routing centroids and PQ
  * codebooks in long layout (tiny — they reassemble to driver arrays on
  * load), the encoded corpus as-is (the only corpus-sized part, and it
  * is m code bytes + a cell id per vector — the ~64× compression that
  * makes a 100 TB corpus servable). Build once with
  * [[graft.pipeline.Ann.buildIvfPq]], `save`, then serve query traffic
  * from `load` without ever touching raw vectors again. */
object AnnIO {

  def save(index: Ann.IvfPqIndex, path: String): Unit = {
    val spark = index.codes.sparkSession
    import spark.implicits._
    // routing mode rides with the artifact: a hierarchically-assigned
    // codes table served with exact probe routing would silently lose
    // boundary-cell recall (the flag is one row; the router itself is
    // rebuilt deterministically from the cells on use)
    Seq(("hierarchical", if (index.hierarchical) 1L else 0L),
        ("router_levels", index.routerLevels.toLong))
      .toDF("key", "value")
      .coalesce(1).write.mode(SaveMode.Overwrite).parquet(s"$path/meta.parquet")
    index.cells.zipWithIndex
      .flatMap { case (cv, c) => cv.zipWithIndex.map { case (v, p) => (c, p, v) } }
      .toSeq.toDF("cell", "pos", "v")
      .coalesce(1).write.mode(SaveMode.Overwrite).parquet(s"$path/cells.parquet")
    index.codebooks.zipWithIndex
      .flatMap { case (cb, sub) => cb.zipWithIndex.flatMap { case (cw, code) =>
        cw.zipWithIndex.map { case (v, p) => (sub, code, p, v) } } }
      .toSeq.toDF("sub", "code", "pos", "v")
      .coalesce(1).write.mode(SaveMode.Overwrite).parquet(s"$path/codebooks.parquet")
    index.codes.write.mode(SaveMode.Overwrite).parquet(s"$path/codes.parquet")
  }

  def load(spark: SparkSession, path: String): Ann.IvfPqIndex = {
    val cellRows = spark.read.parquet(s"$path/cells.parquet")
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getFloat(2)))
    val nCells = cellRows.map(_._1).max + 1
    val dim = cellRows.map(_._2).max + 1
    val cells = Array.ofDim[Float](nCells, dim)
    cellRows.foreach { case (c, p, v) => cells(c)(p) = v }
    val cbRows = spark.read.parquet(s"$path/codebooks.parquet")
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getInt(2), r.getFloat(3)))
    val m = cbRows.map(_._1).max + 1
    val codes = cbRows.map(_._2).max + 1
    val sub = cbRows.map(_._3).max + 1
    val cbs = Array.ofDim[Float](m, codes, sub)
    cbRows.foreach { case (s, c, p, v) => cbs(s)(c)(p) = v }
    // pre-round-10 artifacts have no meta file: exact routing (the only
    // mode that existed when they were written); pre-round-11 metas
    // have no router_levels key: depth 1 (ditto)
    val meta: Map[String, Long] =
      try spark.read.parquet(s"$path/meta.parquet")
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      catch { case _: Exception => Map.empty }
    Ann.IvfPqIndex(cells, cbs,
      spark.read.parquet(s"$path/codes.parquet")
        .select(col("id"), col("cell"), col("codes")),
      hierarchical = meta.getOrElse("hierarchical", 0L) == 1L,
      routerLevels = meta.getOrElse("router_levels", 1L).toInt)
  }

  /** SQ8 index persistence — the quantized-serving artifact: the int
    * code table (corpus-sized, 4× smaller than float32 — the point of
    * SQ) plus the per-dimension [lo, hi] codebook (2·d doubles — the
    * ENTIRE state needed to encode future queries identically, so a
    * serving fleet can load yesterday's index and quantize today's
    * traffic against the same grid). */
  def saveSq8(codes: org.apache.spark.sql.DataFrame, lo: Seq[Double],
      hi: Seq[Double], path: String): Unit = {
    require(lo.length == hi.length && lo.nonEmpty,
      s"saveSq8: lo/hi must be equal-length and non-empty " +
        s"(${lo.length}/${hi.length})")
    val spark = codes.sparkSession
    import spark.implicits._
    lo.indices.map(i => (i, lo(i), hi(i))).toDF("pos", "lo", "hi")
      .coalesce(1).write.mode(SaveMode.Overwrite).parquet(s"$path/stats.parquet")
    codes.select(col("id"), col("codes"))
      .write.mode(SaveMode.Overwrite).parquet(s"$path/codes.parquet")
  }

  /** Load the [[saveSq8]] artifact: (codes table, lo, hi). */
  def loadSq8(spark: SparkSession,
      path: String): (org.apache.spark.sql.DataFrame, Seq[Double], Seq[Double]) = {
    val stats = spark.read.parquet(s"$path/stats.parquet")
      .orderBy(col("pos")).collect() // d rows
    (spark.read.parquet(s"$path/codes.parquet").select(col("id"), col("codes")),
      stats.map(_.getAs[Double]("lo")).toSeq,
      stats.map(_.getAs[Double]("hi")).toSeq)
  }
}
