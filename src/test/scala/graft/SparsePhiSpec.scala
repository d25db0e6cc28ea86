package graft

import org.apache.spark.sql.functions._
import graft.operators._
import graft.sources.Corpus

/** use_sparse_computation parity (reference messages.proto:799-800 +
  * processor_helpers.cc:445-461): packing near-zero phi rows must be a
  * pure execution optimization — bit-identical fit and transform. */
class SparsePhiSpec extends SparkSpec {

  test("sparse-packed kernel is bit-identical to dense on a sparsified model") {
    val docsTable = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val corpus = Corpus.fromDocumentsTable(docsTable).cache()
    val dict = DictionaryOps.gather(corpus).cache()
    val pwt0 = PhiOps.initializeModel(dict, numTopics = 8, seed = 3)

    // sparsify hard (keep top-3 cells per topic) so many rows actually pack
    val cfgBase = Fit.Config(numTopics = 8, numCollectionPasses = 3,
      estep = EStepConfig(numDocumentPasses = 2),
      phiRegularizers = Seq((graft.regularizers.SpecifiedSparsePhi(
        maxElements = 3, probabilityThreshold = 1.0), 1.0f)))
    val dense = Fit.fitOffline(corpus, pwt0, cfgBase)
    val sparse = Fit.fitOffline(corpus, pwt0,
      cfgBase.copy(estep = cfgBase.estep.copy(useSparseComputation = true)))

    val sparsity = graft.scores.Scores.sparsityPhi(dense.pwt).head().getDouble(2)
    info(f"model sparsity after sparsing fit: $sparsity%.3f")
    assert(sparsity > 0.2, "fixture model not sparse enough to exercise packing")

    val diff = dense.pwt.select(col("class_id"), col("token"), col("weights"))
      .unionByName(sparse.pwt.select(col("class_id"), col("token"), col("weights")))
      .groupBy(col("class_id"), col("token"), col("weights"))
      .count().filter(col("count") =!= 2).count()
    assert(diff == 0, "sparse computation changed the fitted model")

    val t1 = Fit.transform(corpus, dense.pwt, 8)
    val t2 = Fit.transform(corpus, dense.pwt, 8,
      EStepConfig(useSparseComputation = true))
    val tdiff = t1.select(col("doc_id"), col("weights"))
      .unionByName(t2.select(col("doc_id"), col("weights")))
      .groupBy(col("doc_id"), col("weights")).count().filter(col("count") =!= 2).count()
    assert(tdiff == 0, "sparse computation changed transform theta")
  }
}
