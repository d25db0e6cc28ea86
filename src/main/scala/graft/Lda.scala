package graft

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import graft.core.Doc
import graft.operators.DictionaryOps
import graft.regularizers.{SmoothSparsePhi, SmoothSparseTheta}

/** LDA convenience facade mirroring the reference's Python `artm.LDA`
  * class (python/artm/lda_model.py:24-368): classic LDA parameterization
  * (alpha smooths Theta, beta smooths Phi) as sugar over the general
  * additive-regularization model, with the standard score set
  * (perplexity, Phi/Theta sparsity, top tokens) pre-wired. Everything
  * delegates to [[Artm]] — this class only maps hyperparameters, exactly
  * like the reference wraps its ARTM object.
  *
  * Parameter mapping (lda_model.py:93-100,214-230):
  *  - `alpha` → one SmoothSparseTheta with τ = alpha over all topics;
  *  - `beta` scalar → one SmoothSparsePhi with τ = beta;
  *  - `betaByTopic` (reference: beta as a list, length == numTopics) →
  *    one SmoothSparsePhi PER entry with τ = beta_i. NOTE the reference
  *    quirk mirrored here: those per-topic regularizers are NOT
  *    topic-restricted in the reference (`SmoothSparsePhiRegularizer(
  *    name=..., tau=b)` with no topic_names), so additively they smooth
  *    EVERY topic by Σ beta_i — parity means reproducing that, not the
  *    presumable intent.
  *  - `reuse_theta=True` is forced, as the reference constructor does
  *    (lda_model.py:61-67).
  *
  * {{{
  *   val lda = new Lda(spark, numTopics = 10, alpha = 0.01f, beta = 0.01f)
  *   lda.gatherDictionary(docs).initialize()
  *   lda.fitOffline(docs, numCollectionPasses = 10)
  *   lda.perplexityLastValue; lda.sparsityPhiValue; lda.topTokens(10)
  * }}} */
class Lda(
    val spark: SparkSession,
    val numTopics: Int,
    val alpha: Float = 0.01f,
    val beta: Float = 0.01f,
    betaByTopic: Seq[Float] = Nil,
    seed: Int = -1,
    numDocumentPasses: Int = 10) {

  require(betaByTopic.isEmpty || betaByTopic.length == numTopics,
    s"Lda.betaByTopic should have length == numTopics ($numTopics), " +
      s"got ${betaByTopic.length}") // lda_model.py:57-58

  private val betas: Seq[Float] =
    if (betaByTopic.nonEmpty) betaByTopic else Seq(beta)

  /** The wrapped general model — exposed like the reference's
    * `_internal_model` is reachable via `.master` for power users. */
  val internal: Artm = new Artm(spark, numTopics,
    seed = seed, numDocumentPasses = numDocumentPasses,
    phiRegularizers = betas.zipWithIndex.map { case (b, i) =>
      (SmoothSparsePhi(name = s"lda_phi_reg_$i"), b)
    },
    thetaAgents = Seq(SmoothSparseTheta(alpha, numTopics)),
    reuseTheta = true)

  // ---- lifecycle (delegation, lda_model.py:233-305) ----

  def gatherDictionary(docs: Dataset[Doc]): this.type =
    { internal.gatherDictionary(docs); this }
  def filterDictionary(args: DictionaryOps.FilterArgs): this.type =
    { internal.filterDictionary(args); this }
  def useDictionary(dict: DataFrame, numItemsInCollection: Long): this.type =
    { internal.useDictionary(dict, numItemsInCollection); this }
  def initialize(): this.type = { internal.initialize(); this }

  def fitOffline(docs: Dataset[Doc], numCollectionPasses: Int = 1): this.type =
    { internal.fitOffline(docs, numCollectionPasses); this }
  def fitOnline(chunks: Seq[Dataset[Doc]], tau0: Double = 1024.0,
      kappa: Double = 0.7): this.type =
    { internal.fitOnline(chunks, tau0, kappa); this }

  def transform(docs: Dataset[Doc]): DataFrame = internal.transform(docs)

  // ---- the pre-wired score set (lda_model.py:160-183) ----

  /** Per-pass perplexity history (`LDA.perplexity_value`). */
  def perplexityValue: Seq[Double] = internal.scoreTracker.map(_.perplexity)
  def perplexityLastValue: Double = perplexityValue.last
  /** Per-pass Theta sparsity history (`LDA.sparsity_theta_value`). */
  def sparsityThetaValue: Seq[Double] =
    internal.scoreTracker.map(_.sparsityTheta)
  def sparsityThetaLastValue: Double = sparsityThetaValue.last
  /** Phi sparsity of the CURRENT matrix (`LDA.sparsity_phi_last_value`;
    * the reference tracks it per pass through its score pipeline — here
    * the matrix-side score is computed on demand, same number). */
  def sparsityPhiValue: Double = internal.sparsityPhi

  // ---- retrieval ----

  def phi: DataFrame = internal.getPhi           // LDA.phi_
  def getTheta: DataFrame = internal.getTheta    // LDA.get_theta()

  /** `LDA.get_top_tokens(num_tokens, with_weights)` — most probable
    * tokens per topic, as the engine's columnar
    * [topic, token, weight, rank] table (collect client-side for the
    * reference's list-of-lists shape). */
  def topTokens(numTokens: Int = 10): DataFrame = internal.topTokens(numTokens)

  // ---- persistence (lda_model.py:320-345) ----

  def save(path: String): Unit = internal.save(path)
}

object Lda {
  /** `LDA.load`: rebuild from [[Lda#save]] output, re-wiring the LDA
    * regularizer set the way lda_model.py:336-345 re-creates
    * regularizers and scores after load. */
  def load(spark: SparkSession, path: String,
      alpha: Float = 0.01f, beta: Float = 0.01f,
      numDocumentPasses: Int = 10): Lda = {
    val general = Artm.load(spark, path, numDocumentPasses)
    val lda = new Lda(spark, general.numTopics, alpha, beta,
      numDocumentPasses = numDocumentPasses)
    lda.internal.restore(general.getPhi, general.scoreTracker,
      general.dictionary.map(d => (d, general.numItemsInCollection, None)))
    lda
  }
}
