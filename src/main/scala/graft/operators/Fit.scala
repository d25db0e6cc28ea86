package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel
import graft.core.{Doc, DocWithTheta}

/** A phi-side regularizer: produces an r_wt increment DataFrame
  * [class_id, token, weights] from the current (p_wt, n_wt). The final
  * r_wt is τ-weighted sum of all increments — reference
  * core/master_component.cc:1015-1045 RegularizeModel. */
trait PhiRegularizer {
  def name: String
  def apply(pwt: DataFrame, nwt: DataFrame, ctx: RegContext): DataFrame
}

/** Context handed to phi regularizers (dictionary, topic metadata). */
case class RegContext(
    spark: SparkSession,
    numTopics: Int,
    topicNames: Seq[String],
    dictionary: Option[DataFrame] = None,
    cooc: Option[DataFrame] = None)

/** Per-pass cumulative score values (theta-side scores merged across the
  * collection — reference core/score_manager.cc). */
case class PassScores(
    pass: Int,
    perplexity: Double, perplexityRaw: Double, perplexityNormalizer: Double,
    zeroWords: Long,
    sparsityTheta: Double,
    itemsProcessed: Long, tokenWeightProcessed: Double)

/** Result of a fit: final pwt + nwt + per-pass score history (ScoreTracker,
  * reference core/score_manager.h:24-61).
  *
  * `retained` are the cached datasets the lazy pwt/nwt/theta still read
  * from (the final pass's persisted E-step output, the online loop's
  * merged nwt). Call [[unpersist]] once the outputs have been
  * materialized (collected / written / re-persisted) to release them —
  * the fit loops clean up every OTHER intermediate themselves. */
case class FitResult(
    pwt: DataFrame,
    nwt: DataFrame,
    theta: DataFrame,
    scores: Seq[PassScores],
    retained: Seq[Dataset[_]] = Nil) {
  def unpersist(): Unit = retained.foreach(_.unpersist(false))
}

/** EM driver loops — reference core/master_component.cc:1350-1439
  * (ArtmExecutor offline/online algorithms).
  *
  * Per pass: broadcast pwt -> E-step mapPartitions -> persist -> n_wt
  * groupBy-sum -> regularize (DataFrame transforms) -> normalize -> next
  * pwt. Lineage is truncated every pass because pwt is re-collected for
  * broadcast (a deliberate local-checkpoint: EM is iterative, carrying N
  * passes of lineage would blow the plan). */
object Fit {

  /** A small side batch processed jointly (single task, cross-item theta
    * regularization) — the hARTM parent pseudo-batch (reference
    * kParentPhiMatrixBatch, master_component.cc:1613-1634). */
  case class JointBatch(docs: Dataset[Doc], agents: Seq[BatchThetaAgent])

  case class Config(
      numTopics: Int,
      numCollectionPasses: Int = 1,
      estep: EStepConfig = EStepConfig(),
      phiRegularizers: Seq[(PhiRegularizer, Float)] = Nil,
      dictionary: Option[DataFrame] = None,
      cooc: Option[DataFrame] = None,
      topicNames: Seq[String] = Nil,
      /** reuse_theta (reference messages.proto ProcessBatchesArgs +
        * cache_manager.cc): initialize each pass's theta from the previous
        * pass's cached theta (joined back by doc_id) instead of uniform. */
      reuseTheta: Boolean = false,
      jointBatch: Option[JointBatch] = None,
      /** Phi rows above this count switch fit_offline to the join-based
        * E-step (EStep.runJoinBased): Phi stays distributed instead of
        * being collected + broadcast — the scale path when vocab × topics
        * exceeds one executor. */
      maxBroadcastRows: Long = 5000000L,
      /** Opt-in determinism for the join-based path: fold its
        * per-document n_wt partials in (doc, pre/raw) order through the
        * multi-level tree (EStep.nwtOrderedByDoc) and the per-topic
        * normalizers through a hash-ranged tree (PhiOps.normalizeModel
        * vocabRanges) — the fit is then bit-reproducible at any executor
        * count, like the broadcast path. Costs ⌈log_256(2·docSpan)⌉
        * grouping levels per pass instead of one and ~FoldWidth× larger
        * (spillable) aggregation state; off = the reference's
        * per-topology determinism with the lean streaming sum. */
      orderedJoinPhi: Boolean = false) {
    def resolvedTopicNames: Seq[String] =
      if (topicNames.nonEmpty) topicNames else (0 until numTopics).map(i => s"topic_$i")
  }

  /** fit_offline — reference master_component.cc:1350-1362: per pass,
    * ProcessBatches -> Regularize -> Normalize.
    *
    * Lineage is cut every pass: the new pwt is collected to the driver
    * (needed for the next broadcast anyway) and re-created as a local
    * relation, so pass N's plan never references pass N-1's E-step.
    *
    * Path selection: `maxBroadcastRows = 0` forces the join-based
    * (distributed-Phi) E-step and `Long.MaxValue` forces broadcast —
    * neither pays a counting job. Anything between sizes Phi with one
    * count per fit (not per pass). */
  def fitOffline(docs: Dataset[Doc], initialPwt: DataFrame, cfg: Config): FitResult =
    if (cfg.maxBroadcastRows <= 0L) fitOfflineJoinPhi(docs, initialPwt, cfg)
    else if (cfg.maxBroadcastRows == Long.MaxValue ||
      initialPwt.count() <= cfg.maxBroadcastRows) fitOfflineBroadcast(docs, initialPwt, cfg)
    else fitOfflineJoinPhi(docs, initialPwt, cfg)

  private def fitOfflineBroadcast(docs: Dataset[Doc], initialPwt: DataFrame, cfg: Config): FitResult = {
    val spark = docs.sparkSession
    var phiLocal = PhiOps.collectPhi(initialPwt, cfg.numTopics, cfg.estep.useSparseComputation)
    var pwt: DataFrame = PhiOps.phiFromLocal(spark, phiLocal)
    var nwt: DataFrame = null
    var theta: DataFrame = null
    var out: Dataset[EStepOut] = null
    val scores = scala.collection.mutable.ArrayBuffer.empty[PassScores]
    val (regCtx, regRetained) = prepareRegCtx(spark, cfg)

    var pass = 0
    while (pass < cfg.numCollectionPasses) {
      val bPhi = spark.sparkContext.broadcast(phiLocal)
      val prevOut = out
      val estepOut =
        if (cfg.reuseTheta && theta != null) {
          // join the previous pass's theta back by doc_id (one shuffle of
          // [doc_id, T floats] — the Spark form of the reference's theta
          // cache keyed by item)
          import spark.implicits._
          val prev = theta.select(col("doc_id").cast("long").as("_1"),
            col("weights").as("_2")).as[(Long, Array[Float])]
          val docsT = docs.joinWith(prev, docs("doc_id") === prev("_1"), "left_outer")
            .map { case (d, t) => DocWithTheta(d, if (t == null) null else t._2) }
          EStep.runWithInit(docsT, bPhi, cfg.estep)
        } else EStep.run(docs, bPhi, cfg.estep)
      val withJoint = cfg.jointBatch match {
        case Some(jb) => estepOut.union(EStep.runJoint(jb.docs, bPhi, cfg.estep, jb.agents))
        case None => estepOut
      }
      out = withJoint.persist(StorageLevel.MEMORY_AND_DISK)

      // persist barrier (r14, guide §5): nwt is referenced by
      // normalizeModel TWICE (normalizer branch + output branch) plus
      // once per phi regularizer — unpersisted, the ordered fold over
      // `out` re-executes per reference (2-4 fold shuffles per pass).
      // The fold is deterministic, so the cache replays identical rows.
      val prevNwt = nwt
      nwt = EStep.nwt(out).persist(StorageLevel.MEMORY_AND_DISK)
      scores += cumulativeScores(pass, out, cfg.numTopics) // action: materializes `out`
      theta = EStep.theta(out)

      val rwt = regularize(pwt, nwt, cfg, regCtx)
      val newPwt = PhiOps.normalizeModel(nwt, rwt)

      pass += 1
      if (pass < cfg.numCollectionPasses) {
        phiLocal = PhiOps.collectPhi(newPwt, cfg.numTopics, cfg.estep.useSparseComputation) // consumes persisted `out`
        pwt = PhiOps.phiFromLocal(spark, phiLocal)
        // under reuse_theta the next pass still reads this pass's theta —
        // keep `out` persisted until the next pass has materialized
        if (!cfg.reuseTheta) out.unpersist(false)
      } else {
        pwt = newPwt // last pass: lazy over the still-persisted `out`
      }
      if (prevOut != null) prevOut.unpersist(false)
      if (prevNwt != null) prevNwt.unpersist(false)
      bPhi.unpersist(false)
    }
    FitResult(pwt, nwt, theta, scores.toSeq,
      retained = Seq(out, nwt) ++ regRetained)
  }

  /** fit_offline with the join-based E-step: Phi stays a distributed
    * DataFrame end to end (lineage cut per pass by an eager
    * localCheckpoint — no driver collect, no broadcast). The path for
    * vocabularies beyond one executor; same per-document math as the
    * broadcast loop (JoinPhiParitySpec pins them together). */
  private def fitOfflineJoinPhi(docs: Dataset[Doc], initialPwt: DataFrame, cfg: Config): FitResult = {
    require(cfg.jointBatch.isEmpty && !cfg.reuseTheta,
      "jointBatch/reuseTheta require the broadcast fit path (raise maxBroadcastRows)")
    var pwt = initialPwt.persist(StorageLevel.MEMORY_AND_DISK)
    var nwt: DataFrame = null
    var theta: DataFrame = null
    var out: Dataset[EStepOut] = null
    val scores = scala.collection.mutable.ArrayBuffer.empty[PassScores]
    val (regCtx, regRetained) = prepareRegCtx(docs.sparkSession, cfg)
    // ordered mode: DENSE doc ranks for the tree-fold keys (round 13).
    // r12 keyed folds by raw (doc_id − min), so sparse ids inflated the
    // key span ~19× on the §27g ladder (3×10⁸ keys for 1.6×10⁷ docs at
    // the 16× rung — 1-2 extra grouping levels, each an extra shuffle
    // per pass). The dense rank — sorted distinct ids zipped with their
    // global ordinal, a pure function of the id SET (zipWithIndex on a
    // globally sorted RDD assigns sort ranks regardless of partition
    // boundaries) — makes the span exactly 2·numDocs. Computed once per
    // fit (one docs-sized sort), the corpus is re-keyed once and reused
    // across passes; theta remaps back to the original ids lazily.
    val denseCtx = if (cfg.orderedJoinPhi) {
      val spark = docs.sparkSession
      import spark.implicits._
      val mapDF = docs.toDF().select(col("doc_id")).distinct()
        .orderBy(col("doc_id")).rdd.map(_.getLong(0)).zipWithIndex()
        .toDF("orig_doc_id", "dense_id")
        .persist(StorageLevel.MEMORY_AND_DISK)
      val n = mapDF.count()
      require(n > 0,
        "orderedJoinPhi requires a non-empty corpus (no doc ids to key the ordered fold)")
      val dense = docs.toDF()
        .join(mapDF.withColumnRenamed("orig_doc_id", "doc_id"), "doc_id")
        .select(col("dense_id").as("doc_id"), col("title"),
          col("tokens"), col("txns"))
        .as[Doc]
        .persist(StorageLevel.MEMORY_AND_DISK)
      dense.count()
      Some((dense, mapDF, n))
    } else None
    val fitDocs = denseCtx.map(_._1).getOrElse(docs)
    var pass = 0
    while (pass < cfg.numCollectionPasses) {
      val prevOut = out
      out = EStep.runJoinBased(fitDocs, pwt, cfg.numTopics, cfg.estep)
        .persist(StorageLevel.MEMORY_AND_DISK)
      // default: per-document partials through the streaming (raced) sum
      // — the reference's per-topology determinism with minimal state.
      // orderedJoinPhi: the doc-keyed multi-level tree fold + hash-ranged
      // normalizer fold — bit-reproducible at any executor count (see
      // EStep.nwtOrderedByDoc / Config.orderedJoinPhi for the trade).
      // Persist barrier (r14): normalizeModel references nwt twice, so
      // without it the whole multi-level fold re-executes per reference
      // (same rationale as the broadcast loop above).
      val prevNwt = nwt
      nwt = (denseCtx match {
        case Some((_, _, n)) => EStep.nwtOrderedByDoc(out, 0L, n - 1L)
        case None => EStep.nwt(out, ordered = false)
      }).persist(StorageLevel.MEMORY_AND_DISK)
      scores += cumulativeScores(pass, out, cfg.numTopics) // action: materializes `out`
      theta = denseCtx match {
        case Some((_, mapDF, _)) =>
          EStep.theta(out).withColumnRenamed("doc_id", "dense_id")
            .join(mapDF, "dense_id")
            .select(col("orig_doc_id").as("doc_id"), col("title"), col("weights"))
        case None => EStep.theta(out)
      }
      val rwt = regularize(pwt, nwt, cfg, regCtx)
      val newPwt = (denseCtx match {
        case Some(_) => PhiOps.normalizeModel(nwt, rwt, ordered = true,
          vocabRanges = PhiOps.HugeVocabNormalizerRanges)
        case None => PhiOps.normalizeModel(nwt, rwt, ordered = false)
      }).localCheckpoint(true)
      pwt.unpersist(false)
      pwt = newPwt
      if (prevOut != null) prevOut.unpersist(false)
      if (prevNwt != null) prevNwt.unpersist(false)
      pass += 1
    }
    FitResult(pwt, nwt, theta, scores.toSeq,
      retained = Seq(out, pwt, nwt) ++
        denseCtx.toSeq.flatMap(c => Seq[Dataset[_]](c._1, c._2)) ++ regRetained)
  }

  /** fit_online — reference master_component.cc:1364-1385: for each chunk
    * of documents, E-step on the chunk -> nwt_hat; then
    * nwt = decay_i·nwt + apply_i·nwt_hat -> Regularize -> Normalize.
    * Weight schedules follow python/artm/artm_model.py:610-680:
    * rho_i = (tau0 + i)^(-kappa), apply = rho, decay = 1 - rho.
    * Synchronous only — the reference's async pipelined variant
    * (master_component.cc:1387-1439) changes scheduling, not results. */
  def fitOnline(chunks: Seq[Dataset[Doc]], initialPwt: DataFrame, cfg: Config,
      tau0: Double = 1024.0, kappa: Double = 0.7): FitResult = {
    val spark = chunks.head.sparkSession
    var pwt = initialPwt
    var nwt: DataFrame = null
    var theta: DataFrame = null
    val scores = scala.collection.mutable.ArrayBuffer.empty[PassScores]
    var lastOut: Dataset[EStepOut] = null

    var phiLocal = PhiOps.collectPhi(initialPwt, cfg.numTopics, cfg.estep.useSparseComputation)
    pwt = PhiOps.phiFromLocal(spark, phiLocal)
    val (regCtx, regRetained) = prepareRegCtx(spark, cfg)

    chunks.zipWithIndex.foreach { case (chunk, i) =>
      val rho = math.pow(tau0 + i + 1, -kappa).toFloat
      val bPhi = spark.sparkContext.broadcast(phiLocal)
      val out = EStep.run(chunk, bPhi, cfg.estep).persist(StorageLevel.MEMORY_AND_DISK)
      val nwtHat = EStep.nwt(out)
      scores += cumulativeScores(i, out, cfg.numTopics)
      theta = EStep.theta(out)

      val merged =
        if (nwt == null) PhiOps.mergeModels(Seq((nwtHat, rho)))
        else PhiOps.mergeModels(Seq((nwt, 1.0f - rho), (nwtHat, rho)))
      // materialize merged nwt to truncate lineage across chunks
      val mergedP = merged.persist(StorageLevel.MEMORY_AND_DISK)
      mergedP.count()
      if (nwt != null) nwt.unpersist()
      nwt = mergedP

      val rwt = regularize(pwt, nwt, cfg, regCtx)
      val newPwt = PhiOps.normalizeModel(nwt, rwt)
      if (i < chunks.length - 1) {
        phiLocal = PhiOps.collectPhi(newPwt, cfg.numTopics, cfg.estep.useSparseComputation)
        pwt = PhiOps.phiFromLocal(spark, phiLocal)
        out.unpersist(false)
      } else {
        pwt = newPwt
        lastOut = out
      }
      bPhi.unpersist(false)
    }
    FitResult(pwt, nwt, theta, scores.toSeq,
      retained = Seq(lastOut, nwt) ++ regRetained)
  }

  /** fit_online with async pipelining — reference master_component.cc:
    * 1387-1439 (AsyncProcessBatches/Await): chunk i+1's E-step starts with
    * the PRE-merge phi while the driver merges chunk i — the same one-step
    * staleness as the reference's interleave. `asyncDepth` ≥ 1 is how many
    * chunk E-steps may run ahead (Spark schedules the concurrent jobs). */
  def fitOnlineAsync(chunks: Seq[Dataset[Doc]], initialPwt: DataFrame, cfg: Config,
      tau0: Double = 1024.0, kappa: Double = 0.7, asyncDepth: Int = 1): FitResult = {
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration.Duration
    import scala.concurrent.ExecutionContext.Implicits.global
    require(asyncDepth >= 1, "asyncDepth must be >= 1")
    val spark = chunks.head.sparkSession
    var nwt: DataFrame = null
    var theta: DataFrame = null
    val scores = scala.collection.mutable.ArrayBuffer.empty[PassScores]
    var lastOut: Dataset[EStepOut] = null

    var phiLocal = PhiOps.collectPhi(initialPwt, cfg.numTopics, cfg.estep.useSparseComputation)
    var pwt = PhiOps.phiFromLocal(spark, phiLocal)
    val (regCtx, regRetained) = prepareRegCtx(spark, cfg)
    // in-flight E-steps: (chunk index, broadcast, persisted-out future)
    val inflight = scala.collection.mutable.Queue.empty[
      (Int, org.apache.spark.broadcast.Broadcast[PhiLocal], Future[Dataset[EStepOut]])]

    def launch(i: Int): Unit = {
      val bPhi = spark.sparkContext.broadcast(phiLocal)
      val fut = Future {
        val out = EStep.run(chunks(i), bPhi, cfg.estep).persist(StorageLevel.MEMORY_AND_DISK)
        out.count() // materialize with the phi this job was launched with
        out
      }
      inflight.enqueue((i, bPhi, fut))
    }

    var next = 0
    while (next < math.min(asyncDepth, chunks.length)) { launch(next); next += 1 }
    while (inflight.nonEmpty) {
      val (i, bPhi, fut) = inflight.dequeue()
      val out = Await.result(fut, Duration.Inf)
      val rho = math.pow(tau0 + i + 1, -kappa).toFloat
      val nwtHat = EStep.nwt(out)
      scores += cumulativeScores(i, out, cfg.numTopics)
      theta = EStep.theta(out)
      val merged =
        if (nwt == null) PhiOps.mergeModels(Seq((nwtHat, rho)))
        else PhiOps.mergeModels(Seq((nwt, 1.0f - rho), (nwtHat, rho)))
      val mergedP = merged.persist(StorageLevel.MEMORY_AND_DISK)
      mergedP.count()
      if (nwt != null) nwt.unpersist()
      nwt = mergedP
      val rwt = regularize(pwt, nwt, cfg, regCtx)
      val newPwt = PhiOps.normalizeModel(nwt, rwt)
      if (inflight.isEmpty && next >= chunks.length) {
        pwt = newPwt
        lastOut = out
      } else {
        phiLocal = PhiOps.collectPhi(newPwt, cfg.numTopics, cfg.estep.useSparseComputation)
        pwt = PhiOps.phiFromLocal(spark, phiLocal)
        out.unpersist(false)
        if (next < chunks.length) { launch(next); next += 1 }
      }
      bPhi.unpersist(false)
    }
    FitResult(pwt, nwt, theta, scores.toSeq,
      retained = Seq(lastOut, nwt) ++ regRetained)
  }

  /** transform (inference) — reference master_component.cc:1145-1212: the
    * E-step without the n_wt update; returns theta. */
  def transform(docs: Dataset[Doc], pwt: DataFrame, numTopics: Int,
      estep: EStepConfig = EStepConfig()): DataFrame = {
    val spark = docs.sparkSession
    val bPhi = spark.sparkContext.broadcast(
      PhiOps.collectPhi(pwt, numTopics, estep.useSparseComputation))
    EStep.theta(EStep.run(docs, bPhi, estep.copy(computeNwt = false)))
  }

  /** transform with predict_class_id — p(c|d) = Σ_t φ_ct·θ_td for every
    * token c of the label class (reference processor_helpers.cc:27-42).
    * Pure relational: explode label phi + join theta — a broadcast
    * matmul. Returns [doc_id, title, label_token, p]. */
  def transformPredict(docs: Dataset[Doc], pwt: DataFrame, numTopics: Int,
      predictClassId: String, estep: EStepConfig = EStepConfig()): DataFrame = {
    val theta = transform(docs, pwt, numTopics, estep)
    val labels = pwt.filter(col("class_id") === predictClassId)
      .select(col("token").as("label_token"), col("weights").as("phi_c"))
    theta.crossJoin(broadcast(labels))
      .select(col("doc_id"), col("title"), col("label_token"),
        aggregate(zip_with(col("weights"), col("phi_c"), (t, p) => t * p),
          lit(0.0), (acc, x) => acc + x).as("p"))
  }

  /** r_wt = Σ_i τ_i · R_i(p_wt, n_wt) — reference RegularizeModel. */
  private def regularize(pwt: DataFrame, nwt: DataFrame, cfg: Config,
      ctx: RegContext): Option[DataFrame] = {
    if (cfg.phiRegularizers.isEmpty) return None
    val increments = cfg.phiRegularizers.map { case (reg, tau) =>
      (reg(pwt, nwt, ctx), tau)
    }
    Some(PhiOps.mergeModels(increments))
  }

  /** Build the per-fit [[RegContext]] ONCE: when phi regularizers are
    * present, the cooc table (re-joined by biterms / improve-coherence /
    * NetPLSA on EVERY pass) is persisted and materialized up front so
    * each pass reads a cached table instead of re-running the upstream
    * cooc chain per pass. Returns (ctx, retained) — the persisted cooc
    * must outlive the fit's lazy outputs, so it rides
    * [[FitResult.retained]] (empty when nothing was persisted). */
  private def prepareRegCtx(spark: SparkSession, cfg: Config): (RegContext, Seq[Dataset[_]]) = {
    val prepared =
      if (cfg.phiRegularizers.isEmpty) cfg.cooc
      else cfg.cooc.map { c =>
        val p = c.persist(StorageLevel.MEMORY_AND_DISK)
        p.count()
        p
      }
    val retained = if (cfg.phiRegularizers.isEmpty) Nil else prepared.toSeq
    (RegContext(spark, cfg.numTopics, cfg.resolvedTopicNames,
      cfg.dictionary, prepared), retained)
  }

  /** Merge the per-document cumulative-score partials of one pass.
    * perplexity = exp(-raw/normalizer) (score/perplexity.cc:290-350);
    * sparsity_theta = zero fraction over all theta entries. */
  def cumulativeScores(pass: Int, out: Dataset[EStepOut], numTopics: Int): PassScores = {
    val spark = out.sparkSession
    import spark.implicits._
    // DECIMAL(38,18) sums: the per-item raw/normalizer partials are
    // doubles, and a plain double sum associates in shuffle-merge order —
    // stable within one topology but racing at the last couple of ulps
    // across executor processes (caught by DeterminismSpec's join-phi leg
    // under local-cluster: pass-0 perplexity differed in the 15th digit
    // between identical refits). Fixed-scale decimal addition is exact,
    // hence order-free; the per-row cast quantizes at 1e-18 (~5e-13
    // absolute over a million docs — far below every consumer's
    // tolerance), and the tracker becomes deterministic at any executor
    // count on BOTH fit paths, matching the model folds.
    // the DECIMAL cast turns non-finite partials into NULL, which a
    // plain sum would silently drop — a numerically diverged fit would
    // then report a finite-looking perplexity where the old double sum
    // propagated NaN and made the divergence visible (r12 ADVICE).
    // Count non-finite partials explicitly and propagate NaN when any
    // exist: divergence stays loud, determinism stays exact.
    def nonFinite(c: org.apache.spark.sql.Column) =
      isnan(c) || c === lit(Double.PositiveInfinity) || c === lit(Double.NegativeInfinity)
    val row = out.filter($"kind" === 1)
      .agg(
        sum($"raw".cast("decimal(38,18)")).cast("double").as("raw"),
        sum($"normalizer".cast("decimal(38,18)")).cast("double").as("normalizer"),
        sum($"zero_words").as("zero_words"),
        sum($"theta_zeros").as("theta_zeros"),
        count(lit(1)).as("items"),
        sum($"doc_len").as("doc_len"),
        sum(when(nonFinite($"raw") || nonFinite($"normalizer"), 1L)
          .otherwise(0L)).as("non_finite"))
      .head()
    val items = row.getLong(4)
    val bad = if (row.isNullAt(6)) 0L else row.getLong(6)
    val raw = if (bad > 0) Double.NaN
      else if (row.isNullAt(0)) 0.0 else row.getDouble(0)
    val norm = if (bad > 0) Double.NaN
      else if (row.isNullAt(1)) 0.0 else row.getDouble(1)
    val zw = if (row.isNullAt(2)) 0L else row.getLong(2)
    val tz = if (row.isNullAt(3)) 0L else row.getLong(3)
    val perp = if (bad > 0) Double.NaN
      else if (norm > 0) math.exp(-raw / norm) else 0.0
    val spTheta = if (items > 0) tz.toDouble / (items.toDouble * numTopics) else 0.0
    PassScores(pass, perp, raw, norm, zw, spTheta, items, norm)
  }
}
