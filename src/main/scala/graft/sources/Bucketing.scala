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

  /** Hive-style PARTITIONED layout — the other storage-level pruning
    * lever: one directory per partition value, so a filter on the
    * partition column prunes at FILE LISTING time (the scan's
    * PartitionFilters — zero bytes read from excluded partitions,
    * where an ordinary column filter still scans every file's
    * footers). The layout for the dominant access dimension of a
    * 100 TB corpus store (source, date, language); combine with
    * [[writeBucketed]] when the partition interior also joins on a
    * key. Partition values ride in directory names, not data files —
    * keep them low-cardinality and path-safe. */
  def writePartitioned(df: DataFrame, path: String,
      partitionCol: String): Unit =
    df.write.mode(SaveMode.Overwrite).partitionBy(partitionCol).parquet(path)

  /** The partitioned layout back; filters on the partition column
    * prune directories before any file is opened. */
  def readPartitioned(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)
}
