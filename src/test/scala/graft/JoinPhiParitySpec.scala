package graft

import org.apache.spark.sql.functions._
import graft.operators._
import graft.sources.Corpus

/** The join-based (distributed-Phi) fit against the broadcast fit: same
  * corpus, same init, same schedule — per-document math is identical, so
  * pwt must agree to float32 shuffle-order tolerance. This is the spec
  * that certifies the scale path for Phi > one executor. */
class JoinPhiParitySpec extends SparkSpec {

  test("join-based fit matches broadcast fit (forced tiny maxBroadcastRows)") {
    val docsTable = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val corpus = Corpus.fromDocumentsTable(docsTable).cache()
    val dict = DictionaryOps.gather(corpus).cache()
    val pwt0 = PhiOps.initializeModel(dict, numTopics = 8, seed = 11)
      .persist()

    val base = Fit.Config(numTopics = 8, numCollectionPasses = 3,
      estep = EStepConfig(numDocumentPasses = 2))
    val broadcastFit = Fit.fitOffline(corpus, pwt0, base)
    val joinFit = Fit.fitOffline(corpus, pwt0, base.copy(maxBroadcastRows = 1L))

    val a = PhiOps.explodePhi(broadcastFit.pwt, sparseEps = -1)
      .select(col("class_id"), col("token"), col("topic"), col("weight").as("wa"))
    val b = PhiOps.explodePhi(joinFit.pwt, sparseEps = -1)
      .select(col("class_id"), col("token"), col("topic"), col("weight").as("wb"))
    val joined = a.join(b, Seq("class_id", "token", "topic"), "full")
      .select(coalesce(col("wa"), lit(0f)).as("wa"), coalesce(col("wb"), lit(0f)).as("wb"))
    val row = joined.agg(max(abs(col("wa") - col("wb"))), count(lit(1))).head()
    val maxDiff = row.getFloat(0)
    info(f"${row.getLong(1)} cells, max |broadcast - join| = $maxDiff%.2e")
    assert(row.getLong(1) > 0)
    assert(maxDiff < 1e-6f, f"join-based fit diverged: $maxDiff%.2e")

    // perplexity trajectories agree to shuffle-order tolerance
    broadcastFit.scores.zip(joinFit.scores).foreach { case (x, y) =>
      info(f"pass ${x.pass}: broadcast ${x.perplexity}%.6f join ${y.perplexity}%.6f")
      assert(math.abs(x.perplexity - y.perplexity) / x.perplexity < 1e-7)
    }
    // theta row counts match (every doc produced a theta either way)
    assert(broadcastFit.theta.count() == joinFit.theta.count())
  }
}
