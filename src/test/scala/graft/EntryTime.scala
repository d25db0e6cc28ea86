package graft
import org.apache.spark.sql.SparkSession

/** Time a named subset of SparkEntry.queries in isolation (bench
  * triage): `sbt "Test/runMain graft.EntryTime dedup_minhash cooc_window"`.
  * Same session shape as Bench (local[32], 32 shuffle partitions). */
object EntryTime {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.read.parquet(s"$sfDir/documents.parquet").groupBy("lang").count().collect()
    graft.streaming.StreamStats.install(spark)
    args.foreach { name =>
      val fn = SparkEntry.queries(name)
      (1 to 2).foreach { i =>
        val t0 = System.nanoTime()
        val n = fn(spark, sfDir).count()
        println(f"$name run$i: ${(System.nanoTime() - t0) / 1e9}%.2f s ($n rows)")
        Thread.sleep(50)
        graft.streaming.StreamStats.drain().foreach(s => println(s"  $s"))
        spark.catalog.clearCache()
      }
    }
    spark.stop()
  }
}
