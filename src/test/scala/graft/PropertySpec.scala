package graft

import org.apache.spark.sql.functions._
import graft.operators._
import graft.sources.Corpus

/** Property tests promised by SURVEY §5 (seeded random draws — the
  * scalatest/scalacheck bridge isn't on the classpath, so properties are
  * checked over 10 deterministic samples each): stochasticity of
  * normalize, merge linearity, filter monotonicity, and determinism
  * across partition counts (stronger than the reference's
  * fixed-thread-layout guarantee). */
class PropertySpec extends SparkSpec {

  private val rnd = new scala.util.Random(20260812L)
  private def randWeights(n: Int): Array[Float] =
    Array.fill(n)(rnd.nextFloat() * 10.0f)

  test("normalizeModel columns always sum to 1 (or are all-zero)") {
    import spark.implicits._
    (0 until 10).foreach { _ =>
      val rows = (0 until 6).map(i => ("c", s"tok$i", randWeights(4)))
      val nwt = rows.toDF("class_id", "token", "weights")
      val sums = PhiOps.normalizeModel(nwt)
        .agg(graft.functions.VectorOps.vectorSum($"weights")).head().getSeq[Float](0)
      sums.foreach(s => assert(math.abs(s - 1.0f) < 1e-4 || s == 0.0f, s"col sum $s"))
    }
  }

  test("normalizeModel normalizes PER (class, topic) with multiple modalities") {
    import spark.implicits._
    (0 until 10).foreach { _ =>
      val rows = (0 until 4).map(i => ("text", s"w$i", randWeights(3))) ++
        (0 until 2).map(i => ("@label", s"l$i", randWeights(3)))
      val nwt = rows.toDF("class_id", "token", "weights")
      val sums = PhiOps.normalizeModel(nwt)
        .groupBy($"class_id")
        .agg(graft.functions.VectorOps.vectorSum($"weights").as("s"))
        .collect().map(r => r.getString(0) -> r.getSeq[Float](1)).toMap
      assert(sums.keySet == Set("text", "@label"))
      sums.values.foreach(_.foreach(s =>
        assert(math.abs(s - 1.0f) < 1e-4 || s == 0.0f, s"per-class col sum $s")))
    }
  }

  test("mergeModels is linear: merge(x, a) = a·x and weights add over union") {
    import spark.implicits._
    (0 until 10).foreach { _ =>
      val w = randWeights(4)
      val a = 0.1f + rnd.nextFloat() * 5.0f
      val x = Seq(("c", "t", w)).toDF("class_id", "token", "weights")
      val scaled = PhiOps.mergeModels(Seq((x, a))).head().getSeq[Float](2)
      scaled.zip(w).foreach { case (s, v) =>
        assert(math.abs(s - a * v) < 1e-4f * math.max(1f, math.abs(a * v)))
      }
      val summed = PhiOps.mergeModels(Seq((x, a), (x, 1.0f))).head().getSeq[Float](2)
      summed.zip(w).foreach { case (s, v) =>
        assert(math.abs(s - (a + 1) * v) < 1e-4f * math.max(1f, math.abs((a + 1) * v)))
      }
    }
  }

  test("dictionary filter monotonicity: tighter df bound keeps a subset") {
    val docsTable = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val corpus = Corpus.fromDocumentsTable(docsTable).cache()
    val dict = DictionaryOps.gather(corpus).cache()
    val n = DictionaryOps.numItems(corpus)
    (0 until 10).foreach { _ =>
      val minDf = 1.0f + rnd.nextFloat() * 9.0f
      val delta = rnd.nextFloat() * 5.0f
      val loose = DictionaryOps.filter(dict, n, DictionaryOps.FilterArgs(minDf = Some(minDf)))
      val tight = DictionaryOps.filter(dict, n, DictionaryOps.FilterArgs(minDf = Some(minDf + delta)))
      val extra = tight.select("token").exceptAll(loose.select("token")).count()
      assert(extra == 0, "tighter filter produced tokens the looser one dropped")
    }
  }

  test("fit is deterministic across partition counts (tolerance 1e-5)") {
    val docsTable = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    def fitWith(parts: Int) = {
      val corpus = Corpus.fromDocumentsTable(docsTable).repartition(parts).cache()
      val dict = DictionaryOps.gather(corpus)
      val pwt0 = PhiOps.initializeModel(dict, numTopics = 8, seed = 17)
      Fit.fitOffline(corpus, pwt0, Fit.Config(numTopics = 8, numCollectionPasses = 2,
        estep = EStepConfig(numDocumentPasses = 2)))
    }
    val one = fitWith(1)
    val many = fitWith(7)
    val a = PhiOps.explodePhi(one.pwt, sparseEps = -1)
      .select(col("token"), col("topic"), col("weight").as("wa"))
    val b = PhiOps.explodePhi(many.pwt, sparseEps = -1)
      .select(col("token"), col("topic"), col("weight").as("wb"))
    val maxDiff = a.join(b, Seq("token", "topic"))
      .agg(max(abs(col("wa") - col("wb")))).head().getFloat(0)
    info(f"1 vs 7 partitions: max pwt diff = $maxDiff%.2e")
    assert(maxDiff < 1e-5f, f"partitioning changed the model by $maxDiff%.2e")
    one.scores.zip(many.scores).foreach { case (x, y) =>
      assert(math.abs(x.perplexity - y.perplexity) / x.perplexity < 1e-6,
        s"perplexity differs across partitionings: ${x.perplexity} vs ${y.perplexity}")
    }
  }
}
