package graft

/** Schema-drift tripwire over the driver-generated testdata.
  *
  * The driver regenerates /root/testdata between rounds and has changed
  * physical encodings under us before (round 5: events.ts went from
  * TIMESTAMP(NANOS) to timestamp[us], silently breaking all 14 events_*
  * entries). This spec asserts, per table, exactly the column names and
  * Spark-visible types our readers assume — so a regeneration breaks ONE
  * obvious test with a readable diff instead of a family of entries.
  *
  * If this spec fails after a testdata refresh: fix the reader the failing
  * table feeds (see the map below), re-run graft.Verify at sf0.01, THEN
  * update the expectation here.
  */
class TestdataSchemaSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  /** table -> (assumed (column, typeName) list, reader that assumes it). */
  private val expected: Map[String, (Seq[(String, String)], String)] = Map(
    "events" -> (Seq(
      "event_id" -> "bigint", "ts" -> "timestamp_ntz", "user_id" -> "bigint",
      "event_type" -> "string", "value" -> "double", "props" -> "string"),
      "graft.pipeline.Temporal.readEvents (ts dispatch: long => epoch-ns, timestamp => unix_micros*1000)"),
    "documents" -> (Seq(
      "doc_id" -> "bigint", "text" -> "string", "lang" -> "string",
      "source" -> "string", "n_chars" -> "bigint"),
      "graft.pipeline.{Dedup, TextAnalysis, Curation, Sampling}"),
    "embeddings" -> (Seq(
      "vec_id" -> "bigint", "embedding" -> "array<float>", "label" -> "int"),
      "graft.pipeline.{Ann, Dedup.embeddingNearDup/semanticDedup}"),
    "lineitem" -> (Seq(
      "l_orderkey" -> "bigint", "l_partkey" -> "bigint", "l_suppkey" -> "bigint",
      "l_linenumber" -> "int", "l_quantity" -> "double",
      "l_extendedprice" -> "double", "l_discount" -> "double", "l_tax" -> "double",
      "l_returnflag" -> "string", "l_linestatus" -> "string",
      "l_shipdate" -> "timestamp_ntz"),
      "SparkEntry relational entries"),
    "orders" -> (Seq(
      "o_orderkey" -> "bigint", "o_custkey" -> "bigint", "o_orderstatus" -> "string",
      "o_totalprice" -> "double", "o_orderdate" -> "timestamp_ntz",
      "o_orderpriority" -> "string"),
      "SparkEntry relational entries"),
    "customer" -> (Seq(
      "c_custkey" -> "bigint", "c_name" -> "string", "c_nationkey" -> "int",
      "c_acctbal" -> "double", "c_mktsegment" -> "string"),
      "SparkEntry relational entries"),
    "part" -> (Seq(
      "p_partkey" -> "bigint", "p_name" -> "string", "p_brand" -> "string",
      "p_type" -> "string", "p_size" -> "int", "p_retailprice" -> "double"),
      "SparkEntry relational entries"),
    "supplier" -> (Seq(
      "s_suppkey" -> "bigint", "s_name" -> "string", "s_nationkey" -> "int",
      "s_acctbal" -> "double"),
      "SparkEntry relational entries"),
    "nation" -> (Seq(
      "n_nationkey" -> "int", "n_name" -> "string", "n_regionkey" -> "int"),
      "SparkEntry relational entries"),
    "region" -> (Seq("r_regionkey" -> "int", "r_name" -> "string"),
      "SparkEntry relational entries"))

  for ((table, (cols, reader)) <- expected.toSeq.sortBy(_._1)) {
    test(s"testdata schema: $table matches what $reader assumes") {
      val schema = spark.read.parquet(s"$sfDir/$table.parquet").schema
      val actual = schema.fields.toSeq.map(f => f.name -> f.dataType.simpleString)
      assert(actual === cols,
        s"\nDRIVER TESTDATA DRIFT on $table.parquet — update the reader first: $reader")
    }
  }

  test("testdata schema: events.ts min value is the UTC-interpreted epoch the oracle sees") {
    // Cross-engine anchor: DuckDB epoch_ns(min(ts)) on this file.
    val e = graft.pipeline.Temporal.readEvents(spark, sfDir)
    assert(e.agg(org.apache.spark.sql.functions.min("ts")).head.getLong(0)
      === 1704067798778549000L)
  }
}
