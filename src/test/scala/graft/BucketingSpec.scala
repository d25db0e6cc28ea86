package graft

import org.apache.spark.sql.functions._
import graft.sources.Bucketing

/** Plan-level proof of the bucketed layout: two tables bucketed on the
  * same key with the same bucket count must JOIN and AGGREGATE with no
  * Exchange in the executed plan — the storage-level shuffle
  * elimination a 100 TB pipeline builds its repeated-join topology on. */
class BucketingSpec extends SparkSpec {

  private def withNoBroadcast[A](f: => A): A = {
    val key = "spark.sql.autoBroadcastJoinThreshold"
    val prev = spark.conf.get(key)
    spark.conf.set(key, "-1")
    try f finally spark.conf.set(key, prev)
  }

  test("same-key bucketed tables join and aggregate with zero Exchange") {
    import spark.implicits._
    val wh = java.nio.file.Files.createTempDirectory("bucketed").toString
    val docsDf = (0L until 500L).map(i => (i, s"text $i", s"src${i % 4}"))
      .toDF("doc_id", "text", "source")
    val scores = (0L until 500L).map(i => (i, i % 7 / 6.0))
      .toDF("doc_id", "quality")
    Bucketing.writeBucketed(docsDf, "b_docs", "doc_id", 8,
      Some(s"$wh/b_docs"))
    Bucketing.writeBucketed(scores, "b_scores", "doc_id", 8,
      Some(s"$wh/b_scores"))
    try withNoBroadcast {
      val joined = Bucketing.readBucketed(spark, "b_docs")
        .join(Bucketing.readBucketed(spark, "b_scores"), "doc_id")
      assert(joined.count() === 500L)
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"bucketed join must not shuffle:\n$plan")
      // groupBy on the bucket key rides the same layout
      val agg = Bucketing.readBucketed(spark, "b_docs")
        .groupBy("doc_id").agg(count(lit(1)))
      agg.collect()
      val aggPlan = agg.queryExecution.executedPlan.toString
      assert(!aggPlan.contains("Exchange"),
        s"bucketed groupBy must not shuffle:\n$aggPlan")
      // correctness unchanged vs the plain join
      val plain = docsDf.join(scores, "doc_id")
        .select("doc_id", "quality").collect()
        .map(r => r.getLong(0) -> r.getDouble(1)).toSet
      val bucketed = joined.select("doc_id", "quality").collect()
        .map(r => r.getLong(0) -> r.getDouble(1)).toSet
      assert(bucketed === plain)
    } finally {
      spark.sql("DROP TABLE IF EXISTS b_docs")
      spark.sql("DROP TABLE IF EXISTS b_scores")
    }
  }

  test("partitioned layout prunes excluded partitions at listing time") {
    import spark.implicits._
    val path = java.nio.file.Files.createTempDirectory("partd").toString
    val docsDf = (0L until 400L).map(i => (i, s"text $i", s"src${i % 8}"))
      .toDF("doc_id", "text", "source")
    Bucketing.writePartitioned(docsDf, path, "source")
    val filtered = Bucketing.readPartitioned(spark, path)
      .filter(col("source").isin("src0", "src1"))
    assert(filtered.count() === 100L)
    val scan = filtered.queryExecution.executedPlan.collectLeaves()
      .collectFirst {
        case f: org.apache.spark.sql.execution.FileSourceScanExec => f }
      .getOrElse(fail("no file scan in the plan"))
    assert(scan.metadata("PartitionFilters").contains("source"),
      s"filter did not reach PartitionFilters: ${scan.metadata}")
    // the listing itself is pruned: 2 of 8 directories survive
    val listed = scan.relation.location.listFiles(
      scan.partitionFilters, scan.dataFilters)
    assert(listed.map(_.values).length === 2,
      s"expected 2 pruned partitions, got ${listed.length}")
    assert(listed.flatMap(_.files).forall { f =>
      val p = f.getPath.toString
      p.contains("source=src0") || p.contains("source=src1")
    }, "pruned listing still contains excluded partitions")
  }
}
