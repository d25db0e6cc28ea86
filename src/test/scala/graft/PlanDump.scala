package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators._
import graft.sources.Corpus

/** Regenerates the plan extracts behind PLANS.md: prints the executed
  * plan of each scale-critical operator at sf0.001. Run with
  * `sbt "Test/runMain graft.PlanDump"` after changing an operator's plan
  * shape, and update PLANS.md from the output. */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.001"
    val docsDf = spark.read.parquet(s"$dir/documents.parquet")

    def show(name: String, df: org.apache.spark.sql.DataFrame): Unit = {
      df.collect() // force AQE-final plan
      println(s"\n===== $name =====")
      println(df.queryExecution.executedPlan.toString.take(6000))
    }

    val corpus = Corpus.fromDocumentsTable(docsDf)
    val dict = DictionaryOps.gather(corpus)
    show("dict_gather (value normalization)", dict)
    show("dict_filter (recalculateValue)",
      DictionaryOps.filter(dict, DictionaryOps.numItems(corpus),
        DictionaryOps.FilterArgs(minDf = Some(2.0f), recalculateValue = true)))
    show("minhash_lsh (bucket cap)",
      graft.pipeline.Dedup.minhashLsh(docsDf, shingleSize = 3,
        numHashes = 8, bands = 4, threshold = 0.25))
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    show("lsh_topk (multi-table)",
      graft.pipeline.Ann.lshTopK(emb, emb.filter(col("vec_id") < 5), 10,
        planes = 4, probes = 5, tables = 8))
    show("sample_stratified (WindowGroupLimit expected)",
      graft.pipeline.Sampling.stratifiedSample(docsDf, "source", "doc_id", 5, "s"))
    val packed = graft.pipeline.Sampling.packSequences(
      graft.pipeline.TextAnalysis.tokenCounts(docsDf)
        .select(col("doc_id"), col("ws_tokens")), "ws_tokens", 512L)
    show("pack_sequences (per-partition windows + offsets, no global window)", packed)
    graft.pipeline.Sampling.unpersistPacked(packed)
    show("decontaminate (benchmark side aggregated before join)",
      graft.pipeline.Dedup.decontaminate(
        docsDf.filter(col("doc_id") >= 20), docsDf.filter(col("doc_id") < 20), n = 5))
    spark.stop()
  }
}
