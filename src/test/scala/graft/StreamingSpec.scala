package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.core.{Doc, TokenEntry, Txn}
import graft.operators._
import graft.sources.{Corpus, SyntheticCollection}
import graft.streaming.{StreamingOnlineFit, StreamingPipeline}

/** Structured Streaming extensions: online fit over micro-batches and the
  * streaming clean/dedup pipeline, driven through MemoryStream. */
class StreamingSpec extends SparkSpec {

  test("streaming online fit converges over micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val docs = SyntheticCollection.dataset(spark, numPartitions = 1).cache()
    val dict = DictionaryOps.gather(docs)
    val pwt0 = PhiOps.initializeModel(dict, numTopics = 10, seed = -1)

    val fitter = new StreamingOnlineFit(pwt0,
      Fit.Config(numTopics = 10, estep = EStepConfig(numDocumentPasses = 10)),
      tau0 = 1.0, kappa = 0.5)

    val stream = MemoryStream[Doc]
    val query = fitter.writer(stream.toDS()).start()
    try {
      (0 until 4).foreach { _ =>
        stream.addData(docs.collect().toSeq)
        query.processAllAvailable()
      }
    } finally query.stop()

    assert(fitter.scores.length == 4)
    val perps = fitter.scores.map(_.perplexity)
    info(s"streaming perplexities: ${perps.map(p => f"$p%.2f").mkString(", ")}")
    assert(perps.last < perps.head * 0.7, s"no convergence: $perps")
    // final model is a proper stochastic phi
    val colSums = fitter.currentPwt
      .agg(graft.functions.VectorOps.vectorSum(col("weights"))).head().getSeq[Float](0)
    colSums.foreach(s => assert(math.abs(s - 1.0f) < 1e-3))
  }

  test("streaming clean+dedup drops low-quality docs and duplicates") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val stream = MemoryStream[(Long, String)]
    val df = stream.toDS().toDF("doc_id", "text")
    val cleaned = StreamingPipeline.cleanDocuments(df, minQuality = 0.5)
    val query = cleaned.select("doc_id", "text", "fingerprint")
      .writeStream.format("memory").queryName("cleaned_docs")
      .outputMode("append").start()
    try {
      stream.addData(
        (1L, "the quick brown fox jumps over the lazy dog near the river bank"),
        (2L, "the quick brown fox jumps over the lazy dog near the river bank"), // dup
        (3L, "!!! ??? !!!"), // punctuation garbage
        (4L, "a a a a a a a a a a a a a a")) // repetition
      query.processAllAvailable()
      stream.addData(
        (5L, "THE  quick brown fox jumps over the lazy dog near the river bank"), // dup modulo case/ws
        (6L, "completely different sentence with many ordinary interesting words inside"))
      query.processAllAvailable()
    } finally query.stop()
    val got = spark.sql("SELECT doc_id FROM cleaned_docs").collect().map(_.getLong(0)).sorted
    assert(got.toSeq == Seq(1L, 6L), s"expected docs 1 and 6, got ${got.mkString(",")}")
  }
}
