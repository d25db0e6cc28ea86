package graft
import org.apache.spark.sql.SparkSession

/** Dump `.explain("formatted")` for named SparkEntry queries to files —
  * the round-13 optimization-evidence tool:
  * `sbt "Test/runMain graft.EntryExplain <outDir> <suffix> <entry...>"`
  * writes `<outDir>/<entry>_<suffix>.txt` per entry. Plans are captured
  * WITHOUT executing the entry (explain analyzes but does not run), so
  * memoized-fit entries show the serving plan their first run would
  * build. Streaming replay entries return a driver-local DataFrame whose
  * plan is the sink-side shape; their in-stream plan is documented in
  * OPTIMIZATION_r13.md instead. */
object EntryExplain {
  def main(args: Array[String]): Unit = {
    val outDir = args(0)
    val suffix = args(1)
    val names = args.drop(2)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    names.foreach { name =>
      val df = SparkEntry.queries(name)(spark, sfDir)
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      java.nio.file.Files.write(
        java.nio.file.Paths.get(outDir, s"${name}_$suffix.txt"),
        plan.getBytes("UTF-8"))
      println(s"wrote $name")
    }
    spark.stop()
  }
}
