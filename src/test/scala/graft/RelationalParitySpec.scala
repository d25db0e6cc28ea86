package graft

import org.apache.spark.sql.functions._
import graft.operators._
import graft.sources.Corpus

/** Closes the verification chain for the driver's DuckDB oracle:
  * the oracle checks DuckDB == RelationalEm hash-exactly; this spec checks
  * the float32 E-step kernel against RelationalEm on the same corpus, same
  * md5 init, same (passes=2, numDocumentPasses=1) schedule. Together they
  * pin the kernel's EM math to an independent engine. */
class RelationalParitySpec extends SparkSpec {

  test("float32 kernel fit matches the relational double EM within 5e-4") {
    val docsTable = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val tok = RelationalEm.tokens(docsTable).cache()

    val rel = RelationalEm.fitOffline(tok, numTopics = 8, passes = 2)
    val relPwt = rel.pwt.select(col("token"), col("topic"), col("p")).cache()

    val corpus = Corpus.fromDocumentsTable(docsTable)
    val pwt0 = RelationalEm.toPhiRows(RelationalEm.initPhi(tok, 8))
    val fit = Fit.fitOffline(corpus, pwt0, Fit.Config(
      numTopics = 8, numCollectionPasses = 2,
      estep = EStepConfig(numDocumentPasses = 1)))

    val kern = PhiOps.explodePhi(fit.pwt, sparseEps = -1.0)
      .select(col("token"), col("topic").cast("long").as("topic"),
        col("weight").cast("double").as("pk"))

    val joined = relPwt.join(kern, Seq("token", "topic"), "full")
      .select(col("token"), col("topic"),
        coalesce(col("p"), lit(0.0)).as("p"), coalesce(col("pk"), lit(0.0)).as("pk"))
      .withColumn("diff", abs(col("p") - col("pk")))
    val row = joined.agg(max(col("diff")), count(lit(1))).head()
    val maxDiff = row.getDouble(0)
    val n = row.getLong(1)
    info(f"$n cells, max |relational - kernel| = $maxDiff%.2e")
    assert(n > 0)
    assert(maxDiff < 5e-4, f"kernel diverges from relational EM: $maxDiff%.2e")

    // reuse_theta parity: kernel pass-2-with-cached-theta vs the
    // relational reuse mirror
    val p1 = RelationalEm.fitOffline(tok, 8, 1)
    val relReuse = RelationalEm.emPassReuse(tok, p1.pwt, p1.theta, 8)
      .select(col("doc_id"), col("topic"), col("th"))
    val kernReuse = Fit.fitOffline(corpus, pwt0, Fit.Config(
      numTopics = 8, numCollectionPasses = 2,
      estep = EStepConfig(numDocumentPasses = 1), reuseTheta = true)).theta
    val kr = kernReuse.select(col("doc_id"),
      posexplode(col("weights")).as(Seq("topic", "thk")))
      .select(col("doc_id"), col("topic").cast("long").as("topic"),
        col("thk").cast("double").as("thk"))
    val rj = relReuse.join(kr, Seq("doc_id", "topic"), "full")
      .select(coalesce(col("th"), lit(0.0)).as("th"), coalesce(col("thk"), lit(0.0)).as("thk"))
    val rrow = rj.agg(max(abs(col("th") - col("thk"))), count(lit(1))).head()
    info(f"reuse_theta: ${rrow.getLong(1)} cells, max diff = ${rrow.getDouble(0)}%.2e")
    assert(rrow.getLong(1) > 0 && rrow.getDouble(0) < 5e-4)

    // perplexity trajectory parity (per pass, relative 1e-3)
    val relPerp = rel.perplexities.map(_.select(col("perplexity")).head().getDouble(0))
    val kernPerp = fit.scores.map(_.perplexity)
    relPerp.zip(kernPerp).zipWithIndex.foreach { case ((r, k), i) =>
      info(f"pass $i: relational $r%.4f kernel $k%.4f")
      assert(math.abs(r - k) / r < 1e-3, s"pass $i perplexity: relational $r kernel $k")
    }
  }

  test("regularized float32 kernel fit matches the regularized relational EM within 5e-4") {
    // backs the artm_fit_regularized_kernel oracle entry: the kernel's
    // SmoothSparsePhi + DecorrelatorPhi path against the mirror's RegCfg
    // (same τs as SparkEntry.RegTaus)
    val docsTable = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val tok = RelationalEm.tokens(docsTable).cache()
    val rel = RelationalEm.fitOffline(tok, 8, 2,
      RelationalEm.RegCfg(smoothTau = -0.5, decorrTau = 50.0))

    val corpus = graft.sources.Corpus.fromDocumentsTable(docsTable)
    val pwt0 = RelationalEm.toPhiRows(RelationalEm.initPhi(tok, 8))
    val fit = Fit.fitOffline(corpus, pwt0, Fit.Config(
      numTopics = 8, numCollectionPasses = 2,
      estep = EStepConfig(numDocumentPasses = 1),
      phiRegularizers = Seq(
        (graft.regularizers.SmoothSparsePhi(), -0.5f),
        (graft.regularizers.DecorrelatorPhi(), 50.0f))))
    val kern = PhiOps.explodePhi(fit.pwt, sparseEps = -1.0)
      .select(col("token"), col("topic").cast("long").as("topic"),
        col("weight").cast("double").as("pk"))
    val joined = rel.pwt.join(kern, Seq("token", "topic"), "full")
      .select(coalesce(col("p"), lit(0.0)).as("p"), coalesce(col("pk"), lit(0.0)).as("pk"))
    val row = joined.agg(max(abs(col("p") - col("pk"))), count(lit(1))).head()
    info(f"regularized: ${row.getLong(1)} cells, max |relational - kernel| = ${row.getDouble(0)}%.2e")
    assert(row.getLong(1) > 0)
    assert(row.getDouble(0) < 5e-4)
    fit.unpersist()
    tok.unpersist()
  }
}
