package graft

import org.apache.spark.sql.functions._
import graft.pipeline.{Sampling, TextAnalysis}

class C4CleanSpec extends SparkSpec {

  private def corpus = {
    import spark.implicits._
    Seq(
      // all three lines survive
      (0L, "alpha beta gamma.\nthe quick brown fox!\nwords end here?"),
      // no terminal punct / too short / javascript -> 0 kept
      (1L, "alpha beta gamma\nok fine.\nplease enable javascript now."),
      // two good lines but page mentions lorem ipsum -> page drop
      (2L, "alpha beta gamma.\nlorem ipsum dolor sit."),
      // two good lines but a code brace -> page drop
      (3L, "alpha beta gamma.\nvar x = { 1 };\nanother good line here."),
      // exactly one good line with minKeptLines = 2 -> page drop
      (4L, "only one good line.\nno punct line"),
      // quoted terminal punctuation counts; trailing spaces are trimmed
      (5L, "he said \"stop right there.\"\nsecond good line stays.  ")
    ).toDF("doc_id", "text")
  }

  test("c4Clean applies the per-line and page-level rules") {
    val r = TextAnalysis.c4Clean(corpus, minKeptLines = 2)
      .orderBy("doc_id").collect()
    val byId = r.map(x => x.getLong(0) ->
      (x.getLong(1), x.getLong(2), x.getBoolean(3), x.getBoolean(4),
        x.getBoolean(5))).toMap
    assert(byId(0L) === ((3L, 3L, false, false, true)))
    assert(byId(1L) === ((3L, 0L, false, false, false)))
    assert(byId(2L) === ((2L, 2L, true, false, false)), "lorem page drops")
    assert(byId(3L) === ((3L, 2L, false, true, false)), "brace page drops")
    assert(byId(4L) === ((2L, 1L, false, false, false)), "minKeptLines floor")
    assert(byId(5L) === ((2L, 2L, false, false, true)),
      "quote-terminal + rtrim both count")
    // digest non-empty iff kept ('' sentinel, never NULL — a mixed
    // NULL/string column cannot be row-sorted by the driver compare)
    r.foreach { x =>
      assert(x.getString(6).nonEmpty === x.getBoolean(5),
        s"digest presence for doc ${x.getLong(0)}")
    }
  }

  test("c4CleanGate agrees with the report and rewrites text") {
    val report = TextAnalysis.c4Clean(corpus, minKeptLines = 2)
    val gate = TextAnalysis.c4CleanGate(corpus, minKeptLines = 2)
    val keptIds = report.filter(col("kept")).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    val gateIds = gate.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(gateIds === keptIds)
    // the gate's rewritten text hashes to the report's clean_digest
    val joined = gate.select(col("doc_id"), md5(col("text")).as("h"))
      .join(report.select(col("doc_id"), col("clean_digest")), "doc_id")
      .collect()
    joined.foreach(r => assert(r.getString(1) === r.getString(2)))
    val t5 = gate.filter(col("doc_id") === 5L).select("text").head.getString(0)
    assert(t5 === "he said \"stop right there.\"\nsecond good line stays.  ",
      "surviving lines keep their original bytes")
  }

  test("domainCap keeps the per-domain top-k by merit, deterministically") {
    import spark.implicits._
    val df = (0L until 100L)
      .map(i => (i, s"d${i % 4}", (i * 13) % 50)) // scores repeat -> ties
      .toDF("doc_id", "domain", "score")
    val capped = Sampling.domainCap(df, "domain", "score", 5)
    val rows = capped.collect()
    assert(rows.length === 20, "4 domains x k=5")
    val perDomain = rows.groupBy(_.getString(1))
    perDomain.foreach { case (_, rs) =>
      assert(rs.map(_.getLong(3)).toSet === Set(1L, 2L, 3L, 4L, 5L))
    }
    // survivors are exactly the top-k by (score desc, doc_id asc)
    val d0 = df.filter(col("domain") === "d0")
      .collect().map(r => (r.getLong(2), r.getLong(0)))
      .sortBy { case (s, id) => (-s, id) }.take(5).map(_._2).toSet
    val got0 = rows.filter(_.getString(1) == "d0").map(_.getLong(0)).toSet
    assert(got0 === d0)
    // partition-count independent
    val re = Sampling.domainCap(df.repartition(13), "domain", "score", 5)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(re === rows.map(_.getLong(0)).toSet)
  }
}
