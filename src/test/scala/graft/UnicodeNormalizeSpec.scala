package graft

import org.apache.spark.sql.functions._
import graft.pipeline.{Dedup, TextAnalysis}

/** The opt-in Unicode normalization stage (functions.UnicodeNormalize):
  * composed/decomposed collapse under NFC, compatibility folding under
  * NFKC, default-off byte behavior preserved, SQL registration. */
class UnicodeNormalizeSpec extends SparkSpec {
  import spark.implicits._

  private val composed = "caf\u00e9 latte"
  private val decomposed = "cafe\u0301 latte"

  test("NFC collapses canonically-equivalent composed/decomposed text") {
    val out = Seq(composed, decomposed).toDF("t")
      .select(TextAnalysis.unicodeNormCol(col("t"), "NFC").as("n"))
      .as[String].collect()
    assert(out(0) == out(1), s"NFC forms differ: ${out.toSeq}")
    assert(out(0) == composed, "NFC must produce the composed form")
  }

  test("NFKC additionally folds compatibility forms (ligature, full-width)") {
    val out = Seq("ﬁsh", "ＡBC", decomposed).toDF("t")
      .select(TextAnalysis.unicodeNormCol(col("t"), "NFKC").as("n"))
      .as[String].collect()
    assert(out(0) == "fish", s"ligature not folded: ${out(0)}")
    assert(out(1) == "ABC", s"full-width not folded: ${out(1)}")
    assert(out(2) == composed, s"NFKC must also compose: ${out(2)}")
  }

  test("invalid form is rejected loudly") {
    val e = intercept[IllegalArgumentException] {
      TextAnalysis.unicodeNormCol(col("t"), "NFX")
    }
    assert(e.getMessage.contains("form must be one of"))
  }

  test("Dedup.exact: NFD twin collapses under NFC option, stays distinct by default") {
    val docs = Seq((1L, composed), (2L, decomposed)).toDF("doc_id", "text")
    val off = Dedup.exact(docs).collect()
    assert(off.length == 2, s"default (no normalization) must keep 2 groups: ${off.toSeq}")
    val on = Dedup.exact(docs, unicodeForm = Some("NFC")).collect()
    assert(on.length == 1 && on.head.getAs[Long]("dup_count") == 2L,
      s"NFC must collapse the twins into one group: ${on.toSeq}")
    assert(on.head.getAs[Long]("canonical_id") == 1L)
  }

  test("fingerprint: NFC option equalizes md5 AND rolling fp of the twins") {
    val docs = Seq((1L, composed), (2L, decomposed)).toDF("doc_id", "text")
    val fps = TextAnalysis.fingerprint(docs, unicodeForm = Some("NFC"))
      .select(col("fingerprint"), col("rolling_fp")).collect()
    assert(fps(0) == fps(1), s"NFC fingerprints differ: ${fps.toSeq}")
    val raw = TextAnalysis.fingerprint(docs)
      .select(col("fingerprint")).as[String].collect()
    assert(raw(0) != raw(1), "default fingerprints must stay byte-keyed")
  }

  test("graft_unicode_normalize is registered on the SQL surface") {
    GraftFunctions.install(spark)
    val r = spark.sql(
      "SELECT graft_unicode_normalize('cafe' || '\u0301', 'NFC') AS n")
      .as[String].head()
    assert(r == "caf\u00e9")
  }

  test("Curation facade: unicodeForm collapses NFD twins under exact dedup") {
    val long = ("the quick brown fox jumps over the lazy dog and keeps " +
      "going for a while longer today ") * 2
    val docs = Seq(
      (1L, long + composed, "src0"),
      (2L, long + decomposed, "src0"),
      (3L, long + "another body entirely distinct", "src0"))
      .toDF("doc_id", "text", "source")
    val cfg = graft.pipeline.Curation.Config(
      unicodeForm = Some("NFC"), minQuality = 0.0, piiRedact = false,
      nearDupThreshold = 1.0)
    val out = graft.pipeline.Curation.curate(docs, cfg)
      .select(col("doc_id")).as[Long].collect().sorted.toSeq
    assert(out == Seq(1L, 3L),
      s"NFD twin must dedup away under the facade's NFC stage: $out")
    val offCfg = cfg.copy(unicodeForm = None)
    val off = graft.pipeline.Curation.curate(docs, offCfg)
      .select(col("doc_id")).as[Long].collect().sorted.toSeq
    assert(off == Seq(1L, 2L, 3L),
      s"default-off must keep byte-distinct twins: $off")
  }

  test("null and already-normalized inputs pass through") {
    val out = Seq(Some(composed), None).toDF("t")
      .select(TextAnalysis.unicodeNormCol(col("t"), "NFC").as("n"))
      .collect()
    assert(out(0).getString(0) == composed)
    assert(out(1).isNullAt(0))
  }
}
