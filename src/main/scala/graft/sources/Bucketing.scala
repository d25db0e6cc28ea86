package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed table layout — the storage-level answer to repeated
  * same-key joins and aggregations: write a table hash-bucketed (and
  * in-bucket sorted) on its join key ONCE, and every subsequent
  * equi-join or groupBy on that key reads the bucketing from the scan
  * instead of exchanging — the single biggest shuffle eliminator a
  * 100 TB pipeline has. Two tables bucketed on the same key with the
  * same bucket count join with ZERO Exchange on either side
  * (BucketingSpec asserts this on the executed plan).
  *
  * Bucketing lives in the catalog (Spark's bucket layout is metadata +
  * file naming, not a parquet property), so these helpers register the
  * table; pass `path` to keep the data external at a known location.
  * Bucket count is a layout contract: pick it for the TARGET corpus
  * (buckets ≈ corpus size / healthy-partition size) and keep it stable
  * across tables that join — mismatched counts fall back to a normal
  * shuffle on the smaller side. */
object Bucketing {

  /** Save `df` as a bucketed, in-bucket-sorted table on `key`. */
  def writeBucketed(df: DataFrame, table: String, key: String,
      numBuckets: Int, path: Option[String] = None): Unit = {
    require(numBuckets > 0)
    val w = df.write.mode(SaveMode.Overwrite)
      .bucketBy(numBuckets, key).sortBy(key)
    path.fold(w)(p => w.option("path", p)).saveAsTable(table)
  }

  /** The bucketed table back as a DataFrame (scan reports the hash
    * partitioning — joins/aggs on `key` skip their Exchange). */
  def readBucketed(spark: SparkSession, table: String): DataFrame =
    spark.table(table)
}
