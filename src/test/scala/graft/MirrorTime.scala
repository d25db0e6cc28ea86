package graft
import org.apache.spark.sql.SparkSession
object MirrorTime {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    // warm
    docs.groupBy("lang").count().collect()
    def time(tag: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"$tag: ${(System.nanoTime()-t0)/1e9}%.2f s")
    }
    import graft.operators._
    time("fit baseline (aqe on, 32 parts)") {
      RelationalEm.fitOffline(RelationalEm.tokens(docs), 8, 2).pwt.count()
    }
    spark.conf.set("spark.sql.shuffle.partitions", 8)
    time("fit 8 parts") {
      RelationalEm.fitOffline(RelationalEm.tokens(docs), 8, 2).pwt.count()
    }
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    time("fit 8 parts, aqe off") {
      RelationalEm.fitOffline(RelationalEm.tokens(docs), 8, 2).pwt.count()
    }
    spark.conf.set("spark.sql.shuffle.partitions", 32)
    time("fit 32 parts, aqe off") {
      RelationalEm.fitOffline(RelationalEm.tokens(docs), 8, 2).pwt.count()
    }
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    time("fit again (warm, aqe on, 32)") {
      RelationalEm.fitOffline(RelationalEm.tokens(docs), 8, 2).pwt.count()
    }
    spark.stop()
  }
}
