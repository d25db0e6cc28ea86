package graft

import org.apache.spark.sql.functions._
import graft.operators._
import graft.regularizers.HierarchySparsingTheta
import graft.sources.Corpus

/** HierarchySparsingTheta against the reference increment
  * (hierarchy_sparsing_theta.cc:24-70) on a hand-computed 2-item fixture,
  * plus the joint-E-step integration through Hartm.fit. */
class HierarchySparsingSpec extends SparkSpec {

  test("batch agent reproduces the reference increment on a 2-item fixture") {
    val tau = 0.5f
    val agent = HierarchySparsingTheta(tau)
    val nTd = Array(Array(0.2f, 0.3f, 0.5f), Array(0.4f, 0.4f, 0.2f))
    val rTd = Array.fill(2)(new Array[Float](3))
    agent.apply(0, Array("p0", "p1"), nTd, rTd)

    // reference math: n_d = [1, 1]; n_t[t] = Σ_i prop·n_td/n_d;
    // r += α·(−τ)·(1/items − (n_td/n_d)·prop/n_t)
    val nD = Array(1.0, 1.0)
    val nT = Array(0.2 / 1 + 0.4 / 1, 0.3 + 0.4, 0.5 + 0.2)
    for (i <- 0 until 2; t <- 0 until 3) {
      val expected = -tau * (1.0 / 2 - (nTd(i)(t) / nD(i)) / nT(t))
      assert(math.abs(rTd(i)(t) - expected) < 1e-6,
        s"r($i,$t): got ${rTd(i)(t)} expected $expected")
    }
  }

  test("literal int-prior mode reproduces the reference's 1/item_size int division") {
    val agent = HierarchySparsingTheta(0.5f, literalIntPrior = true)
    val nTd = Array(Array(0.5f, 0.5f), Array(0.5f, 0.5f))
    val rTd = Array.fill(2)(new Array[Float](2))
    agent.apply(0, Array("p0", "p1"), nTd, rTd)
    // prior = 1/2 in C++ int arithmetic = 0; n_t = 1.0 per topic
    val expected = -0.5f * (0.0f - 0.5f / 1.0f)
    assert(math.abs(rTd(0)(0) - expected) < 1e-6)
  }

  test("alpha_iter gates the increment by inner iteration") {
    val agent = HierarchySparsingTheta(1.0f, alphaIter = Seq(2.0f))
    val nTd = Array(Array(0.4f, 0.6f), Array(0.7f, 0.3f))
    val titles = Array("p0", "p1")
    val r0 = Array.fill(2)(new Array[Float](2))
    agent.apply(0, titles, nTd, r0)
    assert(r0.exists(_.exists(_ != 0.0f)))
    val r1 = Array.fill(2)(new Array[Float](2))
    agent.apply(1, titles, nTd, r1) // beyond alpha_iter → no-op
    assert(r1.forall(_.forall(_ == 0.0f)))
  }

  test("chunked pseudo-docs cover the same tokens per parent topic") {
    val docsTable = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val corpus = Corpus.fromDocumentsTable(docsTable).cache()
    val dict = DictionaryOps.gather(corpus)
    val pwt = PhiOps.initializeModel(dict, numTopics = 3, seed = 2)
    val names = Seq("p0", "p1", "p2")
    val whole = Hartm.pseudoDocs(pwt, names).collect()
    val chunked = Hartm.pseudoDocs(pwt, names, maxTokensPerChunk = 4).collect()
    assert(whole.length == 3)
    assert(chunked.length > 3, "expected multiple chunks per parent topic")
    // identical (token -> weight) multiset per title, and bounded chunks
    def byTitle(ds: Array[graft.core.Doc]) = ds.groupBy(_.title).map { case (t, docs) =>
      t -> docs.flatMap(_.tokens).map(e => (e.class_id, e.token, e.weight)).sortBy(_._2).toSeq
    }
    assert(byTitle(whole) == byTitle(chunked))
  }

  test("hARTM with hierarchy sparsing runs jointly and changes Psi") {
    val docsTable = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val corpus = Corpus.fromDocumentsTable(docsTable).cache()
    val dict = DictionaryOps.gather(corpus).cache()
    val levels = Seq(
      Fit.Config(numTopics = 3, numCollectionPasses = 2, estep = EStepConfig(numDocumentPasses = 2)),
      Fit.Config(numTopics = 6, numCollectionPasses = 2, estep = EStepConfig(numDocumentPasses = 2)))

    val plain = Hartm.fit(corpus, dict, levels, parentWeight = 2.0f, seed = 5)
    val sparse = Hartm.fit(corpus, dict, levels, parentWeight = 2.0f, seed = 5,
      hierarchySparsingTau = Some(10.0f))

    val psiPlain = plain(1).psi.select(col("parent_topic"), col("weights")).collect()
    val psiSparse = sparse(1).psi.select(col("parent_topic"), col("weights")).collect()
    assert(psiPlain.length == 3 && psiSparse.length == 3)
    // each Psi column is a distribution over child topics
    psiSparse.foreach { r =>
      val w = r.getSeq[Float](1)
      assert(math.abs(w.sum - 1.0) < 1e-3, s"psi not stochastic: ${w.mkString(",")}")
    }
    // the regularizer must actually change the decomposition
    val changed = psiPlain.map(_.getSeq[Float](1)).zip(psiSparse.map(_.getSeq[Float](1)))
      .exists { case (a, b) => a.zip(b).exists { case (x, y) => math.abs(x - y) > 1e-4 } }
    assert(changed, "hierarchy sparsing had no effect on Psi")
  }
}
