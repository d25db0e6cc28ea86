package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler._

/** Dev triage: run named entries once and print every Spark job's wall
  * time, task time and stage shapes — where an entry's seconds actually
  * go (driver gaps vs task compute). Same session shape as Bench.
  * `sbt "Test/runMain graft.JobTime artm_class_precision"`. */
object JobTime {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", cpus))
      .config("spark.sql.codegen.cache.maxEntries", "10000")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.streaming.StreamStats.install(spark)
    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, (Long, Int)]()
    val taskMs = new java.util.concurrent.atomic.AtomicLong()
    val out = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit =
        jobs.put(j.jobId, (System.nanoTime(), j.stageIds.size))
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit =
        if (t.taskMetrics != null) taskMs.addAndGet(t.taskMetrics.executorRunTime)
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        val i = s.stageInfo
        val ms = i.taskMetrics.executorRunTime
        if (ms > 500) out.add(f"  stage ${i.stageId}%4d task=${ms / 1000.0}%7.1f s  " +
          f"tasks=${i.numTasks}%4d  ${i.name.take(90)}")
      }
      override def onJobEnd(j: SparkListenerJobEnd): Unit = {
        val (t0, nStages) = jobs.getOrDefault(j.jobId, (0L, 0))
        val ms = (System.nanoTime() - t0) / 1e6
        if (ms > 20) out.add(f"  job ${j.jobId}%4d  ${ms}%8.0f ms  stages=$nStages")
      }
    })
    spark.read.parquet(s"$sfDir/documents.parquet").groupBy("lang").count().collect()
    args.foreach { name =>
      val fn = SparkEntry.queries(name)
      (1 to 2).foreach { i =>
        out.clear(); taskMs.set(0)
        val t0 = System.nanoTime()
        val n = fn(spark, sfDir).count()
        val wall = (System.nanoTime() - t0) / 1e9
        Thread.sleep(100)
        println(f"== $name run$i: $wall%.2f s  task=${taskMs.get / 1000.0}%.1f s  ($n rows)")
        out.forEach(println(_))
        graft.streaming.StreamStats.drain().foreach(s => println(s"  $s"))
        spark.catalog.clearCache()
      }
    }
    spark.stop()
  }
}
