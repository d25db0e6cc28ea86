package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators._
import graft.regularizers._
import graft.sources.Corpus

/** Kernel ↔ relational-mirror parity for the round-4 oracle paths:
  * the driver's gate checks DuckDB == mirror hash-exactly at sf0.01;
  * these tests pin the float32 production regularizers to the mirror at
  * sf0.001 so `sbt test` alone catches a kernel-side regression.
  * Same τs as the SparkEntry oracle entries. */
class RegPathParitySpec extends SparkSpec {

  private def docsTable = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")

  private def maxDiffPwt(rel: DataFrame, fitPwt: DataFrame): (Long, Double) = {
    val kern = PhiOps.explodePhi(fitPwt, sparseEps = -1.0)
      .select(col("token"), col("topic").cast("long").as("topic"),
        col("weight").cast("double").as("pk"))
    val joined = rel.select(col("token"), col("topic"), col("p"))
      .join(kern, Seq("token", "topic"), "full")
      .select(coalesce(col("p"), lit(0.0)).as("p"), coalesce(col("pk"), lit(0.0)).as("pk"))
    val row = joined.agg(count(lit(1)), max(abs(col("p") - col("pk")))).head()
    (row.getLong(0), row.getDouble(1))
  }

  private def coocTable(): DataFrame =
    Cooc.symmetrize(Cooc.gather(Corpus.fromDocumentsTablePositional(docsTable),
      windowWidth = 3))

  test("regularizer-mix kernel (label + improve-coherence + specified-sparse) matches the mirror") {
    val tok = RelationalEm.tokens(docsTable).cache()
    val cooc = coocTable().cache()
    val rel = RelationalEm.fitOffline(tok, 8, 2, RelationalEm.RegCfg(
      labelTau = 0.5, cohTau = 0.002,
      cooc = Some(cooc.select(col("token_a"), col("token_b"), col("cooc_tf"))),
      sparseKeep = 2)).pwt
    val pwt0 = RelationalEm.toPhiRows(RelationalEm.initPhi(tok, 8))
    val fit = Fit.fitOffline(Corpus.fromDocumentsTable(docsTable), pwt0, Fit.Config(
      numTopics = 8, numCollectionPasses = 2,
      estep = EStepConfig(numDocumentPasses = 1),
      phiRegularizers = Seq(
        (LabelRegularizationPhi(), 0.5f),
        (ImproveCoherencePhi(), 0.002f),
        (SpecifiedSparsePhi(byTopics = false, maxElements = 2,
          probabilityThreshold = 1.0), 1.0f)),
      cooc = Some(cooc)))
    val (n, d) = maxDiffPwt(rel, fit.pwt)
    info(f"$n cells, max |mirror - kernel| = $d%.2e")
    assert(n > 0 && d < 5e-4, f"regmix kernel diverges: $d%.2e")
  }

  test("biterms + time-smoothing kernel matches the mirror") {
    val tok = RelationalEm.tokens(docsTable).cache()
    val cooc = coocTable().cache()
    val rel = RelationalEm.fitOffline(tok, 8, 2, RelationalEm.RegCfg(
      timeTau = 50.0, bitermsTau = 0.5,
      cooc = Some(cooc.select(col("token_a"), col("token_b"), col("cooc_tf"))))).pwt
    val pwt0 = RelationalEm.toPhiRows(RelationalEm.initPhi(tok, 8))
    val fit = Fit.fitOffline(Corpus.fromDocumentsTable(docsTable), pwt0, Fit.Config(
      numTopics = 8, numCollectionPasses = 2,
      estep = EStepConfig(numDocumentPasses = 1),
      phiRegularizers = Seq(
        (SmoothTimeInTopicsPhi(), 50.0f),
        (BitermsPhi(), 0.5f)),
      cooc = Some(cooc)))
    val (n, d) = maxDiffPwt(rel, fit.pwt)
    info(f"$n cells, max |mirror - kernel| = $d%.2e")
    assert(n > 0 && d < 5e-4, f"biterms+time kernel diverges: $d%.2e")
  }

  test("NetPlsa kernel matches the mirror") {
    val tok = RelationalEm.tokens(docsTable).cache()
    val cooc = coocTable().cache()
    val rel = RelationalEm.fitOffline(tok, 8, 2, RelationalEm.RegCfg(
      netTau = 1e-6,
      cooc = Some(cooc.select(col("token_a"), col("token_b"), col("cooc_tf"))))).pwt
    val pwt0 = RelationalEm.toPhiRows(RelationalEm.initPhi(tok, 8))
    val fit = Fit.fitOffline(Corpus.fromDocumentsTable(docsTable), pwt0, Fit.Config(
      numTopics = 8, numCollectionPasses = 2,
      estep = EStepConfig(numDocumentPasses = 1),
      phiRegularizers = Seq((NetPlsaPhi(
        classId = graft.functions.Rng.DefaultClass,
        edges = cooc.select(col("token_a").as("vertex_a"),
          col("token_b").as("vertex_b"), col("cooc_tf").as("weight"))), 1e-6f))))
    val (n, d) = maxDiffPwt(rel, fit.pwt)
    info(f"$n cells, max |mirror - kernel| = $d%.2e")
    assert(n > 0 && d < 5e-4, f"netplsa kernel diverges: $d%.2e")
  }

  test("topic-selection kernel (two-phase topicValues recompute) matches the mirror") {
    val tok = RelationalEm.tokens(docsTable).cache()
    val rel = RelationalEm.topicSelectFit(tok, 8, -0.4).pwt
    val corpus = Corpus.fromDocumentsTable(docsTable)
    val pwt0 = RelationalEm.toPhiRows(RelationalEm.initPhi(tok, 8))
    val fit1 = Fit.fitOffline(corpus, pwt0, Fit.Config(
      numTopics = 8, numCollectionPasses = 1,
      estep = EStepConfig(numDocumentPasses = 1)))
    val pwt1 = PhiOps.phiFromLocal(spark, PhiOps.collectPhi(fit1.pwt, 8))
    val nt = fit1.nwt.agg(graft.functions.VectorOps.vectorSum(col("weights")).as("nt"))
      .head.getSeq[Float](0).toArray
    val tv = TopicSelectionTheta.topicValues(nt)
    val fit2 = Fit.fitOffline(corpus, pwt1, Fit.Config(
      numTopics = 8, numCollectionPasses = 1,
      estep = EStepConfig(numDocumentPasses = 1,
        thetaAgents = Seq(TopicSelectionTheta(-0.4f, tv)))))
    val (n, d) = maxDiffPwt(rel, fit2.pwt)
    info(f"$n cells, max |mirror - kernel| = $d%.2e")
    assert(n > 0 && d < 5e-4, f"topic-select kernel diverges: $d%.2e")
  }

  test("SmoothPtdw moving-product kernel matches the positional mirror") {
    val tokPos = RelationalEm.tokensPos(docsTable).cache()
    val rel = RelationalEm.ptdwSmooth(tokPos, 8)
    val corpus = Corpus.fromDocumentsTablePositional(docsTable)
    val pwt0 = RelationalEm.toPhiRows(RelationalEm.initPhi(tokPos, 8))
    val bPhi = spark.sparkContext.broadcast(PhiOps.collectPhi(pwt0, 8))
    val out = EStep.run(corpus, bPhi, EStepConfig(numDocumentPasses = 1,
      emitPtdw = true, computeNwt = false,
      ptdwAgents = Seq(SmoothPtdw(0f, movingProduct = true))))
    val kern = EStep.ptdw(out)
      .select(col("doc_id"), col("position").cast("long").as("pos"),
        posexplode(col("weights")).as(Seq("topic", "vk")))
      .select(col("doc_id"), col("pos"), col("topic").cast("long").as("topic"),
        col("vk").cast("double").as("vk"))
    val joined = rel.select(col("doc_id"), col("pos"), col("topic"), col("ptdw"))
      .join(kern, Seq("doc_id", "pos", "topic"), "full")
      .select(coalesce(col("ptdw"), lit(0.0)).as("v"), coalesce(col("vk"), lit(0.0)).as("vk"))
    val row = joined.agg(count(lit(1)), max(abs(col("v") - col("vk")))).head()
    info(f"${row.getLong(0)} cells, max |mirror - kernel| = ${row.getDouble(1)}%.2e")
    assert(row.getLong(0) > 0 && row.getDouble(1) < 5e-4,
      f"ptdw-smooth kernel diverges: ${row.getDouble(1)}%.2e")
  }
}
