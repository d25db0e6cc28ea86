package graft

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import graft.core.Doc
import graft.operators._
import graft.sources.ModelIO

/** User-facing facade mirroring the reference's Python `artm.ARTM` class
  * (python/artm/artm_model.py): hold a model + dictionary + score history,
  * drive fit_offline / fit_online / transform, retrieve phi/theta/scores,
  * save/load. Each method delegates to the operator library — this class
  * only holds state, exactly like the reference master holds its
  * registries. Not thread-safe (neither is the reference model object).
  *
  * Reference workflow shape (test_artm_model.py):
  * {{{
  *   val model = new Artm(spark, numTopics = 15, seed = 7,
  *     phiRegularizers = Seq((SmoothSparsePhi(), -0.1f)))
  *   model.gatherDictionary(docs)
  *   model.initialize()
  *   model.fitOffline(docs, numCollectionPasses = 15)
  *   model.scoreTracker.map(_.perplexity)
  *   model.topTokens(10)
  *   model.save("/models/m1");  val m2 = Artm.load(spark, "/models/m1")
  *   m2.transform(newDocs)
  * }}} */
class Artm(
    val spark: SparkSession,
    val numTopics: Int,
    topicNames: Seq[String] = Nil,
    seed: Int = -1,
    numDocumentPasses: Int = 10,
    classWeights: Map[String, Float] = Map.empty,
    phiRegularizers: Seq[(PhiRegularizer, Float)] = Nil,
    thetaAgents: Seq[ThetaAgent] = Nil,
    reuseTheta: Boolean = false,
    useSparseComputation: Boolean = false) {

  val resolvedTopicNames: Seq[String] =
    if (topicNames.nonEmpty) topicNames else (0 until numTopics).map(i => s"topic_$i")

  private var dictOpt: Option[DataFrame] = None
  private var coocOpt: Option[DataFrame] = None
  private var numItems: Long = 0L
  private var pwtOpt: Option[DataFrame] = None
  private var nwtOpt: Option[DataFrame] = None
  private var thetaOpt: Option[DataFrame] = None
  private val tracker = scala.collection.mutable.ArrayBuffer.empty[PassScores]

  private def cfg(passes: Int) = Fit.Config(
    numTopics = numTopics, numCollectionPasses = passes,
    estep = EStepConfig(numDocumentPasses = numDocumentPasses,
      classWeights = classWeights, thetaAgents = thetaAgents,
      useSparseComputation = useSparseComputation),
    phiRegularizers = phiRegularizers, dictionary = dictOpt, cooc = coocOpt,
    topicNames = resolvedTopicNames, reuseTheta = reuseTheta)

  // ---- dictionary lifecycle ----

  def gatherDictionary(docs: Dataset[Doc]): this.type = {
    dictOpt = Some(DictionaryOps.gather(docs).cache())
    numItems = DictionaryOps.numItems(docs)
    this
  }

  def filterDictionary(args: DictionaryOps.FilterArgs): this.type = {
    val d = dictOpt.getOrElse(throw new IllegalStateException("gather a dictionary first"))
    dictOpt = Some(DictionaryOps.filter(d, numItems, args).cache())
    coocOpt = coocOpt.map(c => DictionaryOps.filterCooc(c, dictOpt.get))
    this
  }

  /** ImportDictionary path — attach an externally built/loaded dictionary
    * instead of gathering one (reference ArtmImportDictionary +
    * use_dictionary CLI flow). */
  def useDictionary(dict: DataFrame, numItemsInCollection: Long,
      cooc: Option[DataFrame] = None): this.type = {
    dictOpt = Some(dict)
    numItems = numItemsInCollection
    coocOpt = cooc.orElse(coocOpt)
    this
  }

  def numItemsInCollection: Long = numItems

  def attachCooc(cooc: DataFrame): this.type = { coocOpt = Some(cooc); this }
  def dictionary: Option[DataFrame] = dictOpt

  // ---- model lifecycle ----

  /** InitializeModel from the gathered dictionary (md-seeded deterministic;
    * optional sparse init). */
  def initialize(denseInitRate: Float = 1.0f, guaranteedZerosRate: Float = 0.0f): this.type = {
    val d = dictOpt.getOrElse(throw new IllegalStateException("gather a dictionary first"))
    pwtOpt = Some(PhiOps.initializeModel(d, numTopics, seed,
      denseInitRate = denseInitRate, guaranteedZerosRate = guaranteedZerosRate))
    this
  }

  def fitOffline(docs: Dataset[Doc], numCollectionPasses: Int): this.type = {
    val res = Fit.fitOffline(docs, requirePwt(), cfg(numCollectionPasses))
    update(res)
  }

  /** fit_offline with TopicSelectionTheta, recomputing the per-topic
    * value n/(n_t·|T|) between passes the way the reference Python
    * wrapper resyncs it on every update (artm_model.py:73-103,
    * topic_selection_theta.cc:15-164). Starts from a uniform value
    * (no nwt exists before the first pass). */
  def fitOfflineTopicSelection(docs: Dataset[Doc], numCollectionPasses: Int,
      tau: Float): this.type = {
    import org.apache.spark.sql.functions.col
    var tv = Array.fill(numTopics)(1.0f / numTopics)
    (0 until numCollectionPasses).foreach { _ =>
      val c = cfg(1)
      val res = Fit.fitOffline(docs, requirePwt(), c.copy(estep =
        c.estep.copy(thetaAgents = c.estep.thetaAgents :+
          graft.regularizers.TopicSelectionTheta(tau, tv))))
      update(res)
      val nt = res.nwt
        .agg(graft.functions.VectorOps.orderedVectorSum(
          org.apache.spark.sql.functions.concat_ws("\u0001", col("class_id"), col("token")),
          col("weights")).as("nt"))
        .head.getSeq[Float](0).toArray
      tv = graft.regularizers.TopicSelectionTheta.topicValues(nt)
    }
    this
  }

  def fitOnline(chunks: Seq[Dataset[Doc]],
      tau0: Double = 1024.0, kappa: Double = 0.7, async: Boolean = false): this.type = {
    val res =
      if (async) Fit.fitOnlineAsync(chunks, requirePwt(), cfg(1), tau0, kappa)
      else Fit.fitOnline(chunks, requirePwt(), cfg(1), tau0, kappa)
    update(res)
  }

  def transform(docs: Dataset[Doc]): DataFrame =
    Fit.transform(docs, requirePwt(), numTopics,
      EStepConfig(numDocumentPasses = numDocumentPasses, classWeights = classWeights,
        useSparseComputation = useSparseComputation))

  def transformPredict(docs: Dataset[Doc], predictClassId: String): DataFrame =
    Fit.transformPredict(docs, requirePwt(), numTopics, predictClassId,
      EStepConfig(numDocumentPasses = numDocumentPasses, classWeights = classWeights))

  /** transform with theta_matrix_type = "ptdw" (reference
    * artm_model.py transform + processor_helpers.cc:261-382): one
    * p(t|d,w) row per in-model token position —
    * [doc_id, title, position, class_id, token, weights]. */
  def transformPtdw(docs: Dataset[Doc]): DataFrame = {
    val bPhi = spark.sparkContext.broadcast(
      PhiOps.collectPhi(requirePwt(), numTopics, useSparseComputation))
    EStep.ptdw(EStep.run(docs, bPhi,
      EStepConfig(numDocumentPasses = numDocumentPasses, classWeights = classWeights,
        emitPtdw = true, computeNwt = false)))
  }

  // ---- retrieval (get_phi / get_theta / scores) ----

  def getPhi: DataFrame = requirePwt()
  def getPhiSparse(eps: Double = 1e-37): DataFrame = PhiOps.explodePhi(requirePwt(), eps)
  def getTheta: DataFrame =
    thetaOpt.getOrElse(throw new IllegalStateException("fit first"))
  def getThetaSparse(eps: Double = 1e-37): DataFrame = PhiOps.explodeTheta(getTheta, eps)
  def getNwt: DataFrame = nwtOpt.getOrElse(throw new IllegalStateException("fit first"))
  def scoreTracker: Seq[PassScores] = tracker.toSeq

  def topTokens(k: Int): DataFrame = graft.scores.Scores.topTokens(requirePwt(), k)
  def sparsityPhi: Double =
    graft.scores.Scores.sparsityPhi(requirePwt()).head().getDouble(2)
  def topicKernel(threshold: Double = 0.1): DataFrame =
    graft.scores.Scores.topicKernelFull(requirePwt(), getNwt, threshold, cooc = coocOpt)

  // ---- persistence ----

  def save(path: String): Unit = {
    ModelIO.exportModel(requirePwt(), resolvedTopicNames, path)
    ModelIO.exportScoreTracker(scoreTracker, spark, s"$path/scores")
    dictOpt.foreach(d => ModelIO.exportDictionary(d, numItems, s"$path/dictionary", coocOpt))
  }

  private def requirePwt(): DataFrame =
    pwtOpt.getOrElse(throw new IllegalStateException("initialize or load a model first"))

  private def update(res: FitResult): this.type = {
    pwtOpt = Some(res.pwt)
    nwtOpt = Some(res.nwt)
    thetaOpt = Some(res.theta)
    tracker ++= res.scores.map(s => s.copy(pass = tracker.length + s.pass))
    this
  }

  private[graft] def restore(pwt: DataFrame, scores: Seq[PassScores],
      dict: Option[(DataFrame, Long, Option[DataFrame])]): this.type = {
    pwtOpt = Some(pwt)
    tracker.clear(); tracker ++= scores
    dict.foreach { case (d, n, c) => dictOpt = Some(d); numItems = n; coocOpt = c }
    this
  }
}

object Artm {
  /** ImportModel: rebuild a model object from [[Artm.save]] output. Fit
    * parameters are constructor state (as in the reference's Python class,
    * not part of the exported matrix) — pass them again here. */
  def load(spark: SparkSession, path: String,
      numDocumentPasses: Int = 10,
      classWeights: Map[String, Float] = Map.empty,
      phiRegularizers: Seq[(PhiRegularizer, Float)] = Nil): Artm = {
    val (phi, names) = ModelIO.importModel(spark, path)
    val scores =
      try ModelIO.importScoreTracker(spark, s"$path/scores")
      catch { case _: Exception => Nil }
    val dict =
      try Some(ModelIO.importDictionary(spark, s"$path/dictionary"))
      catch { case _: Exception => None }
    new Artm(spark, names.length, names,
      numDocumentPasses = numDocumentPasses, classWeights = classWeights,
      phiRegularizers = phiRegularizers).restore(phi, scores, dict)
  }
}
