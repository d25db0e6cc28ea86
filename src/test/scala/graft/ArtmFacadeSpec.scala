package graft

import org.apache.spark.sql.functions._
import graft.operators._
import graft.sources.Corpus

/** End-to-end reference workflow through the Artm facade
  * (test_artm_model.py shape): gather → filter → init → fit → scores →
  * top tokens → save/load → transform. */
class ArtmFacadeSpec extends SparkSpec {

  test("full ARTM workflow through the facade") {
    val docsTable = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val corpus = Corpus.fromDocumentsTable(docsTable).cache()

    val model = new Artm(spark, numTopics = 6, seed = 3, numDocumentPasses = 2,
      phiRegularizers = Seq((graft.regularizers.SmoothSparsePhi(), -0.2f)))
    model.gatherDictionary(corpus)
      .filterDictionary(DictionaryOps.FilterArgs(minDf = Some(1.0f)))
      .initialize()
      .fitOffline(corpus, numCollectionPasses = 3)

    // score history accumulated; perplexity decreasing
    val perps = model.scoreTracker.map(_.perplexity)
    assert(perps.length == 3)
    assert(perps.last < perps.head, s"no convergence: $perps")
    assert(model.sparsityPhi >= 0.0)

    // continued fitting appends to the tracker with advancing pass ids
    model.fitOffline(corpus, numCollectionPasses = 2)
    assert(model.scoreTracker.length == 5)
    assert(model.scoreTracker.map(_.pass) == Seq(0, 1, 2, 3, 4))

    val tt = model.topTokens(3)
    assert(tt.groupBy("topic").count().collect().forall(_.getLong(1) <= 3))
    assert(model.getPhiSparse().count() > 0)
    assert(model.getThetaSparse().count() > 0)
    assert(model.topicKernel(0.05).filter(col("topic") === -1).count() == 1)

    // save → load → identical transform
    val path = java.nio.file.Files.createTempDirectory("graft-artm").toString
    model.save(path)
    val loaded = Artm.load(spark, path, numDocumentPasses = 2)
    assert(loaded.numTopics == 6)
    assert(loaded.scoreTracker.length == 5)
    assert(loaded.dictionary.isDefined)
    val t1 = model.transform(corpus).select(col("doc_id"), col("weights"))
    val t2 = loaded.transform(corpus).select(col("doc_id"), col("weights"))
    val diff = t1.unionByName(t2).groupBy(col("doc_id"), col("weights"))
      .count().filter(col("count") =!= 2).count()
    assert(diff == 0, "loaded model transforms differently")

    // online continuation through the facade
    val chunks = Seq(corpus.filter(_.doc_id % 2 == 0), corpus.filter(_.doc_id % 2 == 1))
    model.fitOnline(chunks, tau0 = 8.0, kappa = 0.7)
    assert(model.scoreTracker.length == 7)

    // ptdw-mode transform: one row per in-model token position, each a
    // probability distribution over topics
    val ptdw = model.transformPtdw(corpus.filter(_.doc_id < 5)).cache()
    assert(ptdw.count() > 0)
    val sums = ptdw
      .select(aggregate(col("weights"), lit(0.0), (a, x) => a + x).as("s"))
      .agg(min(col("s")), max(col("s"))).head()
    assert(math.abs(sums.getDouble(0) - 1.0) < 1e-4 && math.abs(sums.getDouble(1) - 1.0) < 1e-4)
  }
}
