package graft

import org.apache.spark.sql.functions._
import graft.operators._
import graft.sources.{Corpus, SyntheticCollection}

/** fit_online (decay-weight merge, reference master_component.cc:1364-1385
  * + artm_model.py:610-680): pinned to the DuckDB-verified relational
  * online mirror, plus a convergence check against fit_offline on the
  * golden synthetic collection. */
class FitOnlineSpec extends SparkSpec {

  test("kernel fit_online matches the relational online EM within 5e-4") {
    val docsTable = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val tok = RelationalEm.tokens(docsTable).cache()
    val tau0 = 16.0
    val kappa = 0.7

    val relPwt = RelationalEm.fitOnline(
      Seq(tok.filter(col("doc_id") % 2 === 0), tok.filter(col("doc_id") % 2 === 1)),
      numTopics = 8, tau0, kappa).cache()

    val corpus = Corpus.fromDocumentsTable(docsTable).cache()
    val chunks = Seq(corpus.filter(_.doc_id % 2 == 0), corpus.filter(_.doc_id % 2 == 1))
    val pwt0 = RelationalEm.toPhiRows(RelationalEm.initPhi(tok, 8))
    val fit = Fit.fitOnline(chunks, pwt0, Fit.Config(
      numTopics = 8, estep = EStepConfig(numDocumentPasses = 1)), tau0, kappa)

    val kern = PhiOps.explodePhi(fit.pwt, sparseEps = -1.0)
      .select(col("token"), col("topic").cast("long").as("topic"),
        col("weight").cast("double").as("pk"))
    val joined = relPwt.join(kern, Seq("token", "topic"), "full")
      .select(coalesce(col("p"), lit(0.0)).as("p"), coalesce(col("pk"), lit(0.0)).as("pk"))
    val row = joined.agg(max(abs(col("p") - col("pk"))), count(lit(1))).head()
    info(f"${row.getLong(1)} cells, max |relational - kernel| = ${row.getDouble(0)}%.2e")
    assert(row.getLong(1) > 0)
    assert(row.getDouble(0) < 5e-4)
  }

  test("async online matches sync online with depth 1 and overlaps with depth 2") {
    val docsTable = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val tok = RelationalEm.tokens(docsTable).cache()
    val corpus = Corpus.fromDocumentsTable(docsTable).cache()
    val chunks = Seq(corpus.filter(_.doc_id % 2 == 0), corpus.filter(_.doc_id % 2 == 1))
    val pwt0 = RelationalEm.toPhiRows(RelationalEm.initPhi(tok, 8)).cache()
    val cfg = Fit.Config(numTopics = 8, estep = EStepConfig(numDocumentPasses = 1))

    val sync = Fit.fitOnline(chunks, pwt0, cfg, tau0 = 16.0, kappa = 0.7)
    // depth 1 = no overlap → exactly the sync algorithm
    val async1 = Fit.fitOnlineAsync(chunks, pwt0, cfg, tau0 = 16.0, kappa = 0.7, asyncDepth = 1)
    val a = PhiOps.explodePhi(sync.pwt, sparseEps = -1)
      .select(col("token"), col("topic"), col("weight").as("ws"))
    val b = PhiOps.explodePhi(async1.pwt, sparseEps = -1)
      .select(col("token"), col("topic"), col("weight").as("wa"))
    val maxDiff = a.join(b, Seq("token", "topic"))
      .agg(max(abs(col("ws") - col("wa")))).head().getFloat(0)
    info(f"depth-1 async vs sync max diff = $maxDiff%.2e")
    assert(maxDiff < 1e-6f)

    // depth 2 overlaps (stale phi for chunk 2) — still converges sanely
    val async2 = Fit.fitOnlineAsync(chunks, pwt0, cfg, tau0 = 16.0, kappa = 0.7, asyncDepth = 2)
    assert(async2.scores.length == 2)
    assert(async2.scores.last.perplexity > 0 && !async2.scores.last.perplexity.isNaN)
  }

  test("online fit approaches the offline trajectory on the synthetic collection") {
    val docs = SyntheticCollection.dataset(spark, numPartitions = 1).cache()
    val dict = DictionaryOps.gather(docs)
    val pwt0 = PhiOps.initializeModel(dict, numTopics = 10, seed = -1)
    val estep = EStepConfig(numDocumentPasses = 10)

    val offline = Fit.fitOffline(docs, pwt0, Fit.Config(
      numTopics = 10, numCollectionPasses = 5, estep = estep))

    // online over 5 repeats of the collection (update per "chunk" = full
    // collection here, tau0 small so updates actually apply)
    val online = Fit.fitOnline(Seq.fill(5)(docs), pwt0, Fit.Config(
      numTopics = 10, estep = estep), tau0 = 1.0, kappa = 0.5)

    // evaluate both final models by one transform pass perplexity
    def perp(pwt: org.apache.spark.sql.DataFrame): Double = {
      val bPhi = spark.sparkContext.broadcast(PhiOps.collectPhi(pwt, 10))
      val out = EStep.run(docs, bPhi, estep.copy(computeNwt = false))
      Fit.cumulativeScores(0, out, 10).perplexity
    }
    val pOff = perp(offline.pwt)
    val pOn = perp(online.pwt)
    info(f"offline final perplexity $pOff%.3f, online $pOn%.3f")
    // online should land in the same basin (within 15% of offline)
    assert(pOn < pOff * 1.15, s"online perplexity $pOn too far from offline $pOff")
    assert(online.scores.length == 5)
  }
}
