package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.pipeline._

/** Scratch: stage-level timing of the Curation facade chain (bench
  * triage for the curation_facade entry). */
object FacadeProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    docs.count()
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[probe] $name%-28s ${(System.nanoTime() - t0) / 1e9}%6.2f s")
      r
    }
    // stage-by-stage, mirroring Curation.curate's config for the entry
    val d0 = TextAnalysis.qualityScore(docs).filter(col("quality") >= 0.3)
      .drop("n_chars_q", "n_tokens_q", "punct_ratio", "stopword_ratio",
        "mean_token_len", "repetition_ratio")
      .withColumn("text", TextAnalysis.piiScrubCol(col("text")))
    t("gate+pii count")(d0.count())
    val bl = Dedup.boilerplateNgrams(d0, 3, 50L)
    t("boilerplateNgrams")(bl.count())
    val scrubbed = Dedup.boilerplateScrub(d0, bl, 3).select(col("id"), col("scrubbed"))
    t("boilerplateScrub")(scrubbed.count())
    var d = d0.join(scrubbed, d0("doc_id") === scrubbed("id"))
      .drop("id").withColumn("text", col("scrubbed")).drop("scrubbed")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    t("persist materialize")(d.count())
    val canon = Dedup.exact(d).select(col("canonical_id"))
    t("exact canon")(canon.count())
    d = d.join(canon, d("doc_id") === canon("canonical_id"), "left_semi")
    t("dedup join")(d.count())
    d = Sampling.mixSources(d, "source",
      Map("src0" -> 1.0, "src1" -> 0.5, "src2" -> 0.25, "src3" -> 0.1), "doc_id", "graft")
    t("mix")(d.count())
    val counted = TextAnalysis.tokenCounts(d).drop("bpeish_tokens")
    val packed = t("packSequences build")(
      Sampling.packSequences(counted, "ws_tokens", 512L))
    t("pack count")(packed.count())
    t("final select+collect")(packed.select(col("doc_id"), md5(col("text"))).collect())
    t("full facade (Curation.curate)")(
      Curation.curate(docs, Curation.Config(minQuality = 0.3, piiRedact = true,
        boilerplateN = 3, boilerplateMinDocs = 50L, nearDupThreshold = 1.0,
        mixRates = Map("src0" -> 1.0, "src1" -> 0.5, "src2" -> 0.25, "src3" -> 0.1),
        salt = "graft", packBudget = 512L)).count())
    spark.stop()
  }
}
