package graft

import org.apache.spark.sql.functions._
import graft.pipeline.{Classify, TextAnalysis}

class ClassifySpec extends SparkSpec {

  test("naiveBayes recovers an obvious class structure and is confident") {
    import spark.implicits._
    // two classes with disjoint core vocabulary + shared filler
    val a = (0L until 30L).map(i => (i, "the quick brown fox jumps over lazy dog " * 3, "animals"))
    val b = (30L until 60L).map(i => (i, "stock market index fund yield bond equity rate " * 3, "finance"))
    val df = (a ++ b).toDF("doc_id", "text", "source")
    val out = Classify.naiveBayes(df, labelCol = "source").collect()
    assert(out.length === 60)
    assert(out.forall(r => r.getAs[String]("pred") === r.getAs[String]("source")))
    // disjoint vocab ⇒ huge margins — nowhere near the rounding boundary
    assert(out.forall(_.getAs[Double]("margin") > 1.0))
  }

  test("naiveBayes margins on the real corpus are far from the argmax boundary") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val out = Classify.naiveBayes(docs, labelCol = "source")
    val m = out.agg(min("margin")).head.getDouble(0)
    // the oracle ranks on round(score,6); engines agree to ~1e-12, so any
    // margin ≥ 1e-3 certifies the argmax can never flip cross-engine
    assert(m >= 0.001, s"min margin $m too close to boundary")
    assert(out.count() === docs.filter(length(trim(col("text"))) > 0).count())
  }

  test("naiveBayes prior matters: empty-overlap doc falls back to prior+length term") {
    import spark.implicits._
    val df = Seq(
      (0L, "alpha alpha alpha", "big"), (1L, "alpha alpha", "big"),
      (2L, "alpha beta", "big"), (3L, "gamma", "small"),
      // tokens unseen in training DON'T exist: every token here is seen;
      // doc 4 has only the shared token, so prior + denom decides
      (4L, "alpha", "big")).toDF("doc_id", "text", "source")
    val out = Classify.naiveBayes(df).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("pred")).toMap
    assert(out(0L) === "big")
    assert(out(3L) === "small")
  }

  test("ccnetBuckets: per-lang terciles are balanced and ordered by ppl") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val out = TextAnalysis.ccnetBuckets(docs).cache()
    val byLang = out.groupBy("lang").pivot("bucket").count().collect()
    byLang.foreach { r =>
      val (h, m, t) = (r.getAs[Long]("head"), r.getAs[Long]("middle"), r.getAs[Long]("tail"))
      val n = h + m + t
      // terciles: each bucket within ±2 of n/3 (interpolated thresholds)
      assert(math.abs(h - n / 3.0) <= 2 && math.abs(m - n / 3.0) <= 2 &&
        math.abs(t - n / 3.0) <= 2, s"unbalanced: $h/$m/$t")
    }
    // ordering: max ppl in head <= min ppl in tail per lang
    val agg = out.groupBy("lang").agg(
      max(when(col("bucket") === "head", col("ppl"))).as("maxHead"),
      min(when(col("bucket") === "tail", col("ppl"))).as("minTail")).collect()
    agg.foreach(r => assert(r.getAs[Double]("maxHead") <= r.getAs[Double]("minTail")))
    out.unpersist()
  }

  test("ccnetBuckets: approx (default/scale) mode agrees with exact mode off-boundary") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val approx = TextAnalysis.ccnetBuckets(docs)
      .select(col("doc_id"), col("bucket").as("b_approx"))
    val exact = TextAnalysis.ccnetBuckets(docs, exact = true)
      .select(col("doc_id"), col("bucket").as("b_exact"))
    val joined = approx.join(exact, "doc_id").cache()
    val n = joined.count()
    val agree = joined.where(col("b_approx") === col("b_exact")).count()
    // the sketch can only move documents sitting within rank-noise of a
    // tercile boundary; at accuracy=10000 over ~500 docs that is at most
    // a couple of rows per language boundary
    assert(agree >= (n * 0.95).toLong, s"approx/exact bucket agreement $agree/$n")
    joined.unpersist()
  }

  test("languageIdNgram separates languages with distinct character statistics") {
    import spark.implicits._
    // two pseudo-languages with disjoint trigram inventories; short
    // no-space text included (where the stopword heuristic is blind)
    val docs = Seq(
      (0L, "aaa bbb aab aba bab", "aa"),
      (1L, "aab aaa bba abb", "aa"),
      (2L, "zzz yyy zzy yzz", "zz"),
      (3L, "zyz yzy zzz", "zz"),
      (4L, "aababa", "aa"),     // no spaces at all
      (5L, "zyzyzy", "zz"),
      (6L, "ab", "aa"))         // < 3 chars: excluded, no evidence
      .toDF("doc_id", "text", "lang")
    val out = TextAnalysis.languageIdNgram(docs, n = 3).collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getString(2), r.getDouble(3))))
      .toMap
    assert(!out.contains(6L), "sub-n doc must be excluded")
    (0L to 5L).foreach { id =>
      val (lang, pred, margin) = out(id)
      assert(pred === lang, s"doc $id: pred $pred != $lang")
      assert(margin > 0.5, s"doc $id margin $margin too tight")
    }
  }
}
