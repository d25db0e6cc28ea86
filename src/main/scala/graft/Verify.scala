package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val (sfDir, outDir) = (args(0), args(1))
    val only = args.drop(2).toSet // optional entry filter (local dev)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    // Multi-JVM certification knob (round 11): local[N] shares one JVM, so
    // task/broadcast serialization of the custom codegen expressions and
    // broadcast model artifacts is never exercised. SPARK_GRAFT_MASTER=
    // local-cluster[2,4,4096] runs the same surface across separate
    // executor processes; SPARK_GRAFT_JARS must then point at the
    // `sbt package` app jar so executors can load graft classes.
    val master = sys.env.getOrElse("SPARK_GRAFT_MASTER", s"local[$cpus]")
    val builder = SparkSession.builder()
      .master(master)
      .config("spark.sql.shuffle.partitions", cpus)
      // 328 entries > the default 100-class codegen cache; 10000 covers
      // the full sweep (2000 measured short in Bench's double sweep —
      // evicted plans recompile inside tasks, PLANS §26f)
      .config("spark.sql.codegen.cache.maxEntries", "10000")
      // periodic driver GC: a 328-entry dump accumulates heap garbage a
      // big -Xmx JVM never collects on its own, inflating late entries
      // (the Bench/ScaleCheck lesson, PLANS §22/§27c)
      .config("spark.cleaner.periodicGC.interval", "1min")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
    sys.env.get("SPARK_GRAFT_JARS").foreach(j => builder.config("spark.jars", j))
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.isEmpty || only(name) }
      .foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
      spark.catalog.clearCache() // no cross-entry cache leakage
      // the streaming twin of clearCache: drop accumulated state-store
      // providers from replayed queries (they tax later stateful
      // entries' task time — PLANS §26f); the spark-arg form also
      // reaches executor JVMs under SPARK_GRAFT_MASTER=local-cluster
      org.apache.spark.sql.GraftColumnBridge.unloadStateStores(spark)
    }
    writeOracleJson(outDir)
    spark.stop()
  }

  /** Dump SparkEntry.oracleSql as `<outDir>/oracle_sql.json`.
    * JSON string escape: backslash, quote, and ALL control chars (<0x20)
    * — a tab or CR in builder-authored SQL would otherwise make the
    * driver's json.load fail and silently zero the round's correctness. */
  def writeOracleJson(outDir: String): Unit = {
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
  }
}
