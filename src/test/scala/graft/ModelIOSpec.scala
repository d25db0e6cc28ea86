package graft

import org.apache.spark.sql.functions._
import graft.operators._
import graft.sources.{Corpus, ModelIO}

/** Persistence round-trips (reference ExportModel/ImportModel,
  * Export/ImportDictionary, Export/ImportScoreTracker, theta cache) and
  * the reuse_theta E-step path. */
class ModelIOSpec extends SparkSpec {

  private def tmp(name: String): String = {
    val d = java.nio.file.Files.createTempDirectory(name)
    d.toFile.deleteOnExit()
    d.toString
  }

  private lazy val fixture: (FitResult, org.apache.spark.sql.DataFrame) = {
    val docsTable = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val corpus = Corpus.fromDocumentsTable(docsTable).cache()
    val dict = DictionaryOps.gather(corpus).cache()
    val pwt0 = PhiOps.initializeModel(dict, numTopics = 4, seed = 7)
    val res = Fit.fitOffline(corpus, pwt0, Fit.Config(
      numTopics = 4, numCollectionPasses = 2, estep = EStepConfig(numDocumentPasses = 2)))
    (res, dict)
  }

  test("model export/import round-trips bit-exactly and transforms identically") {
    val (res, _) = fixture
    val names = Seq("t0", "t1", "t2", "t3")
    val path = tmp("graft-model")
    ModelIO.exportModel(res.pwt, names, path)
    val (phi2, names2) = ModelIO.importModel(spark, path)
    assert(names2 == names)

    // bit-exact round trip
    val a = res.pwt.select(col("class_id"), col("token"), col("weights"))
    val diff = a.unionByName(phi2).groupBy(col("class_id"), col("token"), col("weights"))
      .count().filter(col("count") =!= 2).count()
    assert(diff == 0, "phi rows changed across export/import")

    // imported model transforms identically to the in-session model
    val docsTable = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val corpus = Corpus.fromDocumentsTable(docsTable)
    val t1 = Fit.transform(corpus, res.pwt, 4).select(col("doc_id"), col("weights"))
    val t2 = Fit.transform(corpus, phi2, 4).select(col("doc_id"), col("weights"))
    val tdiff = t1.unionByName(t2).groupBy(col("doc_id"), col("weights"))
      .count().filter(col("count") =!= 2).count()
    assert(tdiff == 0, "imported model transforms differently")
  }

  test("dictionary (+cooc) export/import round-trips") {
    val (_, dict) = fixture
    val docsTable = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val corpus = Corpus.fromDocumentsTablePositional(docsTable)
    val cooc = Cooc.gather(corpus, windowWidth = 2)
    val n = DictionaryOps.numItems(Corpus.fromDocumentsTable(docsTable))
    val path = tmp("graft-dict")
    ModelIO.exportDictionary(dict, n, path, Some(cooc))
    val (dict2, n2, cooc2) = ModelIO.importDictionary(spark, path)
    assert(n2 == n)
    assert(cooc2.isDefined)
    assert(dict2.count() == dict.count())
    val diff = dict.unionByName(dict2)
      .groupBy(dict.columns.map(col).toSeq: _*).count().filter(col("count") =!= 2).count()
    assert(diff == 0)
    assert(cooc2.get.count() == cooc.count())
  }

  test("score tracker export/import round-trips") {
    val (res, _) = fixture
    val path = tmp("graft-scores")
    ModelIO.exportScoreTracker(res.scores, spark, path)
    val back = ModelIO.importScoreTracker(spark, path)
    assert(back == res.scores)
  }

  test("CSV writers emit readable per-topic columns") {
    val (res, _) = fixture
    val names = Seq("t0", "t1", "t2", "t3")
    val mPath = tmp("graft-csv-model")
    val tPath = tmp("graft-csv-theta")
    ModelIO.writeModelCsv(res.pwt, names, mPath)
    ModelIO.writeThetaCsv(res.theta, names, tPath)
    val m = spark.read.option("header", "true").csv(mPath)
    assert(m.columns.toSeq == Seq("class_id", "token") ++ names)
    assert(m.count() == res.pwt.count())
    val t = spark.read.option("header", "true").csv(tPath)
    assert(t.columns.toSeq == Seq("doc_id", "title") ++ names)
    assert(t.count() == res.theta.count())
    // values survive the round trip (as strings → doubles)
    val v = m.select(col("t0").cast("double")).collect().map(_.getDouble(0))
    assert(v.forall(x => x >= 0.0 && x <= 1.0))
  }

  test("MultiLanguagePhi stub contributes exactly zero (API parity)") {
    val (res, _) = fixture
    val ctx = RegContext(spark, 4, Seq("t0", "t1", "t2", "t3"))
    val r = graft.regularizers.MultiLanguagePhi()(res.pwt, res.nwt, ctx)
    val nonzero = r.select(explode(col("weights")).as("w"))
      .filter(col("w") =!= 0.0f).count()
    assert(nonzero == 0)
    assert(r.count() == res.pwt.count())
  }

  test("theta cache round-trips and reuse_theta seeds the next pass") {
    val (res, _) = fixture
    val path = tmp("graft-theta")
    ModelIO.exportTheta(res.theta, path)
    val back = ModelIO.importTheta(spark, path)
    assert(back.count() == res.theta.count())

    // with numDocumentPasses = 0 the E-step leaves theta at its init —
    // so under reuse_theta pass 2's theta must equal pass 1's exactly,
    // while without reuse it collapses to uniform. This isolates the
    // init plumbing from EM convergence.
    val docsTable = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val corpus = Corpus.fromDocumentsTable(docsTable).cache()
    val dict = DictionaryOps.gather(corpus)
    val pwt0 = PhiOps.initializeModel(dict, 4, seed = 7)
    def thetaOf(reuse: Boolean) = Fit.fitOffline(corpus, pwt0, Fit.Config(
      numTopics = 4, numCollectionPasses = 2,
      estep = EStepConfig(numDocumentPasses = 0, useRandomTheta = true, thetaSeed = 3),
      reuseTheta = reuse)).theta
    val reused = thetaOf(true).select(col("doc_id"), col("weights"))
    val fresh = thetaOf(false).select(col("doc_id"), col("weights"))
    // both passes random-init from the same seed → identical under reuse
    // AND without (random init is deterministic) — instead check reuse with
    // ONE doc pass: theta evolves, so pass-2-with-reuse ≠ pass-2-fresh
    val cfgBase = Fit.Config(numTopics = 4, numCollectionPasses = 2,
      estep = EStepConfig(numDocumentPasses = 1))
    val tReuse = Fit.fitOffline(corpus, pwt0, cfgBase.copy(reuseTheta = true)).theta
      .select(col("doc_id"), col("weights"))
    val tFresh = Fit.fitOffline(corpus, pwt0, cfgBase).theta
      .select(col("doc_id"), col("weights"))
    val differing = tReuse.unionByName(tFresh).groupBy(col("doc_id"), col("weights"))
      .count().filter(col("count") =!= 2).count()
    assert(differing > 0, "reuse_theta produced identical theta to fresh init — plumbing inert")
    assert(reused.count() == fresh.count())
  }
}
