package graft

import org.apache.spark.sql.functions._
import graft.core.{Doc, TokenEntry, Txn}
import graft.operators._
import graft.regularizers.{SmoothPtdw, TopicSegmentationPtdw}
import graft.sources.{SyntheticCollection, VwReader}

class CoocAndVariantsSpec extends SparkSpec {

  def doc(id: Long, tokens: String*): Doc =
    Doc(id, s"d$id", tokens.map(t => TokenEntry("@default_class", t, 1.0f)).toArray, Array.empty[Txn])

  test("cooc gather counts windowed pairs with df per doc") {
    import spark.implicits._
    val docs = spark.createDataset(Seq(
      doc(0, "a", "b", "a"), // window 2: (a,b),(a,a)+2,(b,a) -> ab tf=2, aa tf=2
      doc(1, "a", "b")))     // ab tf=1
    val cooc = Cooc.gather(docs, windowWidth = 2).collect()
      .map(r => (r.getString(1), r.getString(2)) -> (r.getFloat(3), r.getFloat(4))).toMap
    assert(cooc(("a", "b")) == ((3.0f, 2.0f)))
    assert(cooc(("a", "a")) == ((2.0f, 1.0f)))
  }

  test("ppmi matches hand computation") {
    import spark.implicits._
    val docs = spark.createDataset(Seq(doc(0, "a", "b"), doc(1, "a", "b"), doc(2, "a", "c")))
    val sym = Cooc.symmetrize(Cooc.gather(docs, windowWidth = 1))
    val p = Cooc.ppmi(sym, "tf").collect()
      .map(r => (r.getString(1), r.getString(2)) -> r.getDouble(3)).toMap
    // pairs: ab tf2, ac tf1 -> sym total n=6; n_a=3, n_b=2, n_c=1
    // ppmi(a,b) = ln((6/3)/(2/2)) = ln 2
    assert(math.abs(p(("a", "b")) - math.log(2.0)) < 1e-9)
    // ppmi(a,c) = ln((6/3)/(1/1)) = ln 2
    assert(math.abs(p(("a", "c")) - math.log(2.0)) < 1e-9)
  }

  test("transaction corpus parses and fits") {
    import spark.implicits._
    val line = "doc1 hello world:2 ||trans1 |user mel-lain:3 |action click:3 || |user mel-lain |action show ||"
    val d = VwReader.parseLine(line, 0L)
    assert(d.txns.length === 4) // hello, world singles + 2 multi-token txns
    assert(d.txns.count(_.length > 1) === 2)
    assert(d.tokens(2).class_id === "user")

    val docs = spark.createDataset(Seq(d))
    val dict = DictionaryOps.gather(docs)
    val pwt0 = PhiOps.initializeModel(dict, 4, seed = 7)
    val res = Fit.fitOffline(docs, pwt0, Fit.Config(
      numTopics = 4, numCollectionPasses = 2,
      estep = EStepConfig(numDocumentPasses = 3,
        transactionWeights = Map("@default_transaction" -> 1.0f, "trans1" -> 2.0f))))
    val theta = res.theta.head().getSeq[Float](2)
    assert(math.abs(theta.sum - 1.0f) < 1e-4)
    assert(res.nwt.count() === dict.count())
  }

  test("ptdw path emits per-position rows and agents run") {
    import spark.implicits._
    val docs = spark.createDataset(Seq(doc(0, "a", "b", "c", "a", "b")))
    val dict = DictionaryOps.gather(docs)
    val pwt0 = PhiOps.initializeModel(dict, 3, seed = 5)
    val bPhi = spark.sparkContext.broadcast(PhiOps.collectPhi(pwt0, 3))
    val out = EStep.run(docs, bPhi, EStepConfig(
      numDocumentPasses = 2, emitPtdw = true,
      ptdwAgents = Seq(SmoothPtdw(tau = 0.1f, window = 2)))).cache()
    val ptdw = EStep.ptdw(out)
    assert(ptdw.count() === 5)
    // rows normalized before agents may perturb; after final agent pass sums can drift
    val sums = ptdw.select(aggregate(col("weights"), lit(0.0), (a, x) => a + x)).collect()
    sums.foreach(r => assert(r.getDouble(0) > 0.0))

    // segmentation agent makes rows one-hot
    val out2 = EStep.run(docs, bPhi, EStepConfig(
      numDocumentPasses = 2, emitPtdw = true,
      ptdwAgents = Seq(TopicSegmentationPtdw(window = 2, threshold = 0.0f))))
    val oneHot = EStep.ptdw(out2)
      .select(size(filter(col("weights"), w => w > 0f)).as("nz")).collect()
    oneHot.foreach(r => assert(r.getInt(0) === 1))
  }

  test("hARTM fits two levels and yields a stochastic Psi") {
    val docs = SyntheticCollection.dataset(spark, numPartitions = 2)
    val dict = DictionaryOps.gather(docs)
    val levels = Seq(
      Fit.Config(numTopics = 4, numCollectionPasses = 2, estep = EStepConfig(numDocumentPasses = 3)),
      Fit.Config(numTopics = 8, numCollectionPasses = 2, estep = EStepConfig(numDocumentPasses = 3)))
    val res = Hartm.fit(docs, dict, levels, parentWeight = 2.0f, seed = 11)
    assert(res.length === 2)
    val psi = res(1).psi
    assert(psi.count() === 4) // one row per parent topic
    val sums = psi.select(aggregate(col("weights"), lit(0.0), (a, x) => a + x)).collect()
    sums.foreach(r => assert(math.abs(r.getDouble(0) - 1.0) < 1e-3))
  }
}
