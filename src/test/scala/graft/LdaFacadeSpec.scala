package graft

import org.apache.spark.sql.functions._
import graft.operators._
import graft.sources.Corpus

/** The LDA sugar facade is EXACTLY the general model with the LDA
  * regularizer set (python/artm/lda_model.py parity): same phi, same
  * score trajectory, bit for bit. */
class LdaFacadeSpec extends SparkSpec {

  private def corpus() = Corpus.fromDocumentsTable(
    spark.read.parquet("/root/testdata/sf0.001/documents.parquet")).cache()

  test("Lda(alpha, beta) == Artm with SmoothSparseTheta+SmoothSparsePhi") {
    val docs = corpus()
    val lda = new Lda(spark, numTopics = 5, alpha = 0.1f, beta = -0.05f,
      seed = 11, numDocumentPasses = 2)
    lda.gatherDictionary(docs).initialize()
      .fitOffline(docs, numCollectionPasses = 3)

    val artm = new Artm(spark, numTopics = 5, seed = 11,
      numDocumentPasses = 2,
      phiRegularizers = Seq((graft.regularizers.SmoothSparsePhi(), -0.05f)),
      thetaAgents = Seq(graft.regularizers.SmoothSparseTheta(0.1f, 5)),
      reuseTheta = true)
    artm.gatherDictionary(docs).initialize()
      .fitOffline(docs, numCollectionPasses = 3)

    // identical per-pass perplexity trajectory (the reference's
    // perp_score through the pre-wired LDA score set)
    assert(lda.perplexityValue === artm.scoreTracker.map(_.perplexity))
    assert(lda.sparsityThetaValue === artm.scoreTracker.map(_.sparsityTheta))
    assert(lda.perplexityLastValue < lda.perplexityValue.head,
      s"no convergence: ${lda.perplexityValue}")
    assert(lda.sparsityPhiValue >= 0.0)

    // identical phi, bit for bit
    val diff = lda.phi.unionByName(artm.getPhi)
      .groupBy(col("class_id"), col("token"), col("weights"))
      .count().filter(col("count") =!= 2).count()
    assert(diff == 0, "LDA phi differs from the equivalent ARTM phi")

    // top-tokens works through the facade
    val tt = lda.topTokens(3)
    assert(tt.groupBy("topic").count().collect().forall(_.getLong(1) <= 3))
  }

  test("betaByTopic mirrors the reference's per-topic-beta quirk") {
    val docs = corpus()
    // reference lda_model.py:95-97: a beta LIST creates one untargeted
    // SmoothSparsePhi per entry — additively Σ beta_i on EVERY topic
    val lda = new Lda(spark, numTopics = 4, alpha = 0.05f,
      betaByTopic = Seq(0.01f, 0.02f, 0.03f, 0.04f), seed = 7,
      numDocumentPasses = 2)
    lda.gatherDictionary(docs).initialize()
      .fitOffline(docs, numCollectionPasses = 2)

    val artm = new Artm(spark, numTopics = 4, seed = 7,
      numDocumentPasses = 2,
      phiRegularizers = Seq(0.01f, 0.02f, 0.03f, 0.04f).map(b =>
        (graft.regularizers.SmoothSparsePhi(): graft.operators.PhiRegularizer, b)),
      thetaAgents = Seq(graft.regularizers.SmoothSparseTheta(0.05f, 4)),
      reuseTheta = true)
    artm.gatherDictionary(docs).initialize()
      .fitOffline(docs, numCollectionPasses = 2)

    assert(lda.perplexityValue === artm.scoreTracker.map(_.perplexity))
    val diff = lda.phi.unionByName(artm.getPhi)
      .groupBy(col("class_id"), col("token"), col("weights"))
      .count().filter(col("count") =!= 2).count()
    assert(diff == 0)

    // constructor guard: wrong-length beta list rejected (lda_model.py:57)
    intercept[IllegalArgumentException] {
      new Lda(spark, numTopics = 4, betaByTopic = Seq(0.01f))
    }
  }

  test("Lda save/load round-trips the model and score history") {
    val docs = corpus()
    val lda = new Lda(spark, numTopics = 4, alpha = 0.02f, beta = 0.01f,
      seed = 3, numDocumentPasses = 2)
    lda.gatherDictionary(docs).initialize()
      .fitOffline(docs, numCollectionPasses = 2)

    val path = java.nio.file.Files.createTempDirectory("graft-lda").toString
    lda.save(path)
    val loaded = Lda.load(spark, path, alpha = 0.02f, beta = 0.01f,
      numDocumentPasses = 2)
    assert(loaded.numTopics == 4)
    assert(loaded.perplexityValue === lda.perplexityValue)
    val t1 = lda.transform(docs).select(col("doc_id"), col("weights"))
    val t2 = loaded.transform(docs).select(col("doc_id"), col("weights"))
    val diff = t1.unionByName(t2).groupBy(col("doc_id"), col("weights"))
      .count().filter(col("count") =!= 2).count()
    assert(diff == 0, "loaded LDA transforms differently")
  }
}
