package graft
import org.apache.spark.sql.SparkSession

/** Dump a named subset of SparkEntry.queries (plus oracle_sql.json) for a
  * fast local oracle loop on new entries:
  * `sbt "Test/runMain graft.EntryVerify dedup_semantic ann_pq"` then
  * `python3 dev/check_oracle.py /root/testdata/sf0.01 /tmp/verify_subset
  *  dedup_semantic ann_pq`. Same session shape as Verify. */
object EntryVerify {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val outDir = sys.env.getOrElse("SPARK_GRAFT_OUT_DIR", "/tmp/verify_subset")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    args.foreach { name =>
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, sfDir).coalesce(1)
        .write.mode("overwrite").parquet(s"$outDir/$name")
      println(f"[entry-verify] $name dumped in ${(System.nanoTime() - t0) / 1e9}%.2f s")
      spark.catalog.clearCache()
    }
    Verify.writeOracleJson(outDir)
    spark.stop()
  }
}
