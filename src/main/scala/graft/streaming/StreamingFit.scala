package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, Trigger}
import graft.core.Doc
import graft.operators._

/** Structured Streaming extensions (SURVEY §7.5 — beyond the reference,
  * which has no event-time notion; its "online" algorithm is ordered
  * mini-batching and maps 1:1 onto foreachBatch).
  *
  * StreamingOnlineFit: each micro-batch is one online chunk —
  * E-step on the chunk with the current Phi, then the reference decay
  * merge nwt = (1−ρ_i)·nwt + ρ_i·nwt_hat, regularize, normalize
  * (master_component.cc:1364-1385; ρ schedule artm_model.py:610-680).
  * Model state lives on the driver between micro-batches exactly like the
  * reference's master holds Phi between updates; per-batch work is fully
  * distributed. */
final class StreamingOnlineFit(
    initialPwt: DataFrame,
    cfg: Fit.Config,
    tau0: Double = 1024.0,
    kappa: Double = 0.7,
    /** Resume point: a restarted fit (e.g. from a ModelIO-exported phi)
      * must continue the ρ schedule where it stopped — restarting at 0
      * would re-apply the largest learning rates to a mature model. The
      * resumed fit's first merge seeds from the imported phi's mass
      * (nwtState restarts empty), the same warm-start the reference's
      * ImportModel + continued fit performs. */
    startChunkIndex: Int = 0) extends Serializable {

  @volatile private var phiLocal = PhiOps.collectPhi(initialPwt, cfg.numTopics)
  @volatile private var nwtState: DataFrame = null
  private val history = scala.collection.mutable.ArrayBuffer.empty[PassScores]
  private var chunkIndex = startChunkIndex

  /** Chunks processed so far (pass to a resumed fit's startChunkIndex). */
  def processedChunks: Int = chunkIndex

  /** Current p_wt as a DataFrame (driver-held state re-materialized). */
  def currentPwt: DataFrame = {
    val spark = initialPwt.sparkSession
    PhiOps.phiFromLocal(spark, phiLocal)
  }

  /** Release the persisted running n_wt. `currentPwt` is driver-held
    * (phiLocal) and stays valid; call this once the fit is finished —
    * the batch twin's FitResult.unpersist contract. A later
    * processChunk re-seeds the merge from scratch (decay restarts),
    * so only close a FINISHED fit. */
  def close(): Unit = synchronized {
    if (nwtState != null) { nwtState.unpersist(false); nwtState = null }
  }

  def scores: Seq[PassScores] = history.toSeq

  /** Attach to a streaming Dataset[Doc]; caller starts the returned
    * writer (choose trigger/checkpoint there). */
  def writer(docsStream: Dataset[Doc]): DataStreamWriter[Doc] =
    docsStream.writeStream
      .outputMode("append")
      .foreachBatch { (chunk: Dataset[Doc], _: Long) => processChunk(chunk) }

  /** One online update from a static chunk (also the foreachBatch body —
    * callable directly for tests or batch-driven replays). */
  def processChunk(chunk: Dataset[Doc]): Unit = synchronized {
    if (chunk.isEmpty) return
    val spark = chunk.sparkSession
    val rho = math.pow(tau0 + chunkIndex + 1, -kappa).toFloat
    val bPhi = spark.sparkContext.broadcast(phiLocal)
    val out = EStep.run(chunk, bPhi, cfg.estep)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nwtHat = EStep.nwt(out)
    history += Fit.cumulativeScores(chunkIndex, out, cfg.numTopics)

    val merged =
      if (nwtState == null) PhiOps.mergeModels(Seq((nwtHat, rho)))
      else PhiOps.mergeModels(Seq((nwtState, 1.0f - rho), (nwtHat, rho)))
    val mergedP = merged.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    mergedP.count()
    if (nwtState != null) nwtState.unpersist(false)
    nwtState = mergedP

    val pwt = PhiOps.phiFromLocal(spark, phiLocal)
    val rwt =
      if (cfg.phiRegularizers.isEmpty) None
      else {
        val ctx = RegContext(spark, cfg.numTopics, cfg.resolvedTopicNames,
          cfg.dictionary, cfg.cooc)
        Some(PhiOps.mergeModels(cfg.phiRegularizers.map { case (r, tau) =>
          (r(pwt, nwtState, ctx), tau)
        }))
      }
    phiLocal = PhiOps.collectPhi(PhiOps.normalizeModel(nwtState, rwt), cfg.numTopics)
    out.unpersist(false)
    bPhi.unpersist(false)
    chunkIndex += 1
  }
}

/** One streaming near-dup claim from [[StreamingPipeline.nearDupStream]]:
  * `doc_id` shares minhash band `band`'s bucket with the earlier doc
  * `dup_of`. */
case class DupClaim(doc_id: Long, band: Int, dup_of: Long)

/** One running-aggregate row from [[StreamingPipeline.cumulativeStream]]:
  * the user's lifetime event count and exact micro-unit value total AS OF
  * this event (`cum_micro` = running sum of 6-decimal-quantized values —
  * divide by 1e6 for the value). */
case class UserRunning(user_id: Long, ts_ns: Long, event_id: Long,
    event_type: String, n_events_so_far: Long, cum_micro: Long)

/** One whole-second inter-event gap from
  * [[StreamingPipeline.interarrivalStream]]. */
case class UserGap(user_id: Long, gap_s: Long)

/** One observed event-type transition from
  * [[StreamingPipeline.markovStream]]. */
case class Transition(user_id: Long, from_type: String, to_type: String,
    ts_ns: Long, event_id: Long)

/** One enriched left-side event from [[StreamingPipeline.asofStream]]
  * (`matched_* = -1` when no right event preceded it). */
case class AsofMatch(event_id: Long, user_id: Long, ts_ns: Long,
    matched_event_id: Long, matched_ts: Long, gap_ns: Long)

/** One first-activity-in-week observation from
  * [[StreamingPipeline.retentionStream]]: `user_id` (whose cohort is
  * `cohort_week`) was first seen in week `cohort_week + week_offset`.
  * Emitted at most once per (user, offset). */
case class CohortVisit(user_id: Long, cohort_week: Long, week_offset: Long)

/** One funnel-step advance from [[StreamingPipeline.funnelStream]]:
  * `user_id` first satisfied step index `step` (0-based) at `ts_ns`.
  * Emitted at most once per (user, step). */
case class StepReached(user_id: Long, step: Int, ts_ns: Long)

/** One closed user session from [[StreamingPipeline.sessionize]]. */
case class UserSession(
    user_id: Long, session_start: java.sql.Timestamp,
    session_end: java.sql.Timestamp, events: Long, total_value: Double)

/** Streaming training-data hygiene: quality-score + fingerprint the
  * incoming documents and drop duplicates within the watermark window —
  * the streaming form of the batch Dedup/TextAnalysis operators. */
object StreamingPipeline {

  /** Streaming inference: per-document theta over a document stream with
    * a FIXED fitted model — the streaming form of `Fit.transform`
    * (reference master_component.cc:1145-1212 applied to a live feed).
    * Stateless: one phi broadcast + a narrow mapPartitions, no shuffle and
    * no state store, so it runs under any trigger/output mode and scales
    * with input partitions alone. Returns [doc_id, title, weights]. */
  def transformStream(docsStream: Dataset[graft.core.Doc], pwt: DataFrame,
      numTopics: Int,
      estep: graft.operators.EStepConfig = graft.operators.EStepConfig()): DataFrame = {
    val spark = docsStream.sparkSession
    val bPhi = spark.sparkContext.broadcast(
      graft.operators.PhiOps.collectPhi(pwt, numTopics, estep.useSparseComputation))
    graft.operators.EStep.theta(
      graft.operators.EStep.run(docsStream, bPhi, estep.copy(computeNwt = false)))
  }

  /** Streaming bigram-LM perplexity scoring — the CCNet-style quality
    * gate served on a live feed (train-batch / score-stream, the
    * [[classifyStream]] split): the [[graft.pipeline.TextAnalysis]]
    * LmModel rides in as a broadcast, scoring is a STATELESS per-doc
    * fold — no aggregation, no state store, append-safe. Tokenization
    * replicates the batch normTextCol exactly (UTF8String lowercase =
    * Spark lower(); Spark trim strips 0x20 only — NOT String.trim,
    * which also strips control chars); per-bigram math is the batch
    * expression tree term for term, and the 6-decimal rounding absorbs
    * the fold-vs-shuffle summation-order ulp exactly as the batch row's
    * oracle compare does. Returns [doc_id, n_bigrams, ppl]; docs with
    * under 2 tokens emit nothing (the batch contract). */
  def lmScoreStream(stream: DataFrame,
      model: graft.pipeline.TextAnalysis.LmModel, addK: Double,
      textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    val spark = stream.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(model)
    stream.filter(length(trim(col(textCol))) > 0)
      .select(col(idCol).cast("long"), col(textCol).cast("string"))
      .as[(Long, String)]
      .mapPartitions { it =>
        val m = bc.value
        val kv = addK * m.vocab.toDouble
        it.flatMap { case (id, text) =>
          lmDocScore(m, addK, kv, text).map { case (n, ppl) => (id, n, ppl) }
        }
      }
      .toDF(idCol, "n_bigrams", "ppl")
  }

  /** [[lmScoreStream]] with a carried language column — the composed
    * at-ingest curation gate (StreamReplay.curationIngest) needs lang
    * downstream for the per-lang CCNet bucket without a second stream
    * pass or a sink-side join. Identical scoring kernel. Returns
    * [doc_id, lang, n_bigrams, ppl]. */
  def lmScoreLangStream(stream: DataFrame,
      model: graft.pipeline.TextAnalysis.LmModel, addK: Double,
      textCol: String = "text", idCol: String = "doc_id",
      langCol: String = "lang"): DataFrame = {
    val spark = stream.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(model)
    stream.filter(length(trim(col(textCol))) > 0)
      .select(col(idCol).cast("long"), col(langCol).cast("string"),
        col(textCol).cast("string"))
      .as[(Long, String, String)]
      .mapPartitions { it =>
        val m = bc.value
        val kv = addK * m.vocab.toDouble
        it.flatMap { case (id, lang, text) =>
          lmDocScore(m, addK, kv, text).map { case (n, ppl) =>
            (id, lang, n, ppl) }
        }
      }
      .toDF(idCol, langCol, "n_bigrams", "ppl")
  }

  /** Kneser-Ney perplexity SERVING — arriving docs score statelessly
    * against the broadcast [[graft.pipeline.TextAnalysis.KnModel]]
    * (bigram-type-bounded, the LmModel contract). Per-bigram math is
    * the batch lmPerplexityKneserNey expression term for term
    * (max-discount + lambda·continuation, add-k floored continuation,
    * unseen context → continuation only); 6-decimal rounding absorbs
    * the fold-vs-shuffle summation ulp exactly as the batch oracle
    * compare does. Caller applies the held-out split filter. Returns
    * [doc_id, n_bigrams, n_unseen_ctx, ppl]. */
  def knScoreStream(stream: DataFrame,
      model: graft.pipeline.TextAnalysis.KnModel, discount: Double,
      addK: Double, textCol: String = "text",
      idCol: String = "doc_id"): DataFrame = {
    val spark = stream.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(model)
    stream.filter(length(trim(col(textCol))) > 0)
      .select(col(idCol).cast("long"), col(textCol).cast("string"))
      .as[(Long, String)]
      .mapPartitions { it =>
        val m = bc.value
        val denom = m.b + addK * m.v
        it.flatMap { case (id, text) =>
          val toks = normSplit(text)
          if (toks.length < 2) None
          else {
            var s = 0.0
            var unseen = 0L
            var i = 0
            while (i < toks.length - 1) {
              val pc = (m.cont.getOrElse(toks(i + 1), 0L).toDouble + addK) /
                denom
              val p = m.ctx.get(toks(i)) match {
                case Some((c1b, nAfter)) =>
                  val c = m.c12.getOrElse((toks(i), toks(i + 1)), 0L).toDouble
                  math.max(c - discount, 0.0) / c1b.toDouble +
                    (discount * nAfter.toDouble / c1b.toDouble) * pc
                case None => unseen += 1; pc
              }
              s += math.log(p)
              i += 1
            }
            val n = toks.length - 1
            val ppl = java.math.BigDecimal.valueOf(math.exp(-s / n))
              .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
            Some((id, n.toLong, unseen, ppl))
          }
        }
      }
      .toDF(idCol, "n_bigrams", "n_unseen_ctx", "ppl")
  }

  /** Feature-hash embedding AT INGEST — each arriving doc's whole
    * vector is computable in one stateless fold (every bucket of a doc
    * depends only on that doc's tokens), so the hashing-trick
    * vectorizer serves without the batch plan's (doc, bucket) shuffle.
    * Arithmetic replays [[graft.pipeline.TextAnalysis.hashEmbed]] term
    * for term: md5 bucket + sign-bit parity, integer bucket sums,
    * sqrt of the integer squared norm, one division per TOUCHED bucket
    * (sign-cancelled buckets emit 0.0 exactly like the batch groupBy
    * row), all-cancelled and blank docs excluded. Returns
    * [id, pos, val]. */
  def hashEmbedStream(stream: DataFrame, dims: Int,
      textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    val spark = stream.sparkSession
    import spark.implicits._
    stream.filter(length(trim(col(textCol))) > 0)
      .select(col(idCol).cast("long"), col(textCol).cast("string"))
      .as[(Long, String)]
      .mapPartitions { it =>
        val md = java.security.MessageDigest.getInstance("MD5")
        it.flatMap { case (id, text) =>
          val v = new Array[Long](dims)
          val touched = new Array[Boolean](dims)
          normSplit(text).foreach { t =>
            if (t.nonEmpty) {
              md.reset()
              val h = md.digest(t.getBytes(java.nio.charset.StandardCharsets.UTF_8))
                .map(b => f"${b & 0xff}%02x").mkString
              val pos = (java.lang.Long.parseLong(h.substring(0, 8), 16) %
                dims).toInt
              val sgn = if (java.lang.Long.parseLong(h.substring(8, 9), 16)
                % 2 == 0) 1L else -1L
              v(pos) += sgn
              touched(pos) = true
            }
          }
          var ss = 0L
          var i = 0
          while (i < dims) { ss += v(i) * v(i); i += 1 }
          if (ss == 0L) Iterator.empty
          else {
            val norm = math.sqrt(ss.toDouble)
            (0 until dims).iterator.filter(touched).map { p =>
              (id, p, java.math.BigDecimal.valueOf(v(p).toDouble / norm)
                .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue())
            }
          }
        }
      }
      .toDF(idCol, "pos", "val")
  }

  /** Batch-exact normalization + split shared by the LM scorers:
    * UTF8String lowercase, 0x20-only trim, whitespace collapse. */
  private def normSplit(text: String): Array[String] = {
    def sparkTrim(s: String): String = {
      var i = 0; var j = s.length
      while (i < j && s.charAt(i) == ' ') i += 1
      while (j > i && s.charAt(j - 1) == ' ') j -= 1
      s.substring(i, j)
    }
    sparkTrim(org.apache.spark.unsafe.types.UTF8String
      .fromString(text).toLowerCase.toString)
      .replaceAll("\\s+", " ").split(" ")
  }

  /** The per-doc bigram-LM scoring kernel shared by [[lmScoreStream]]
    * and [[lmScoreLangStream]]: batch-exact normalization (UTF8String
    * lowercase, 0x20-only trim) + the batch expression's per-bigram
    * math, 6-decimal rounded. None for docs with under 2 tokens. */
  private def lmDocScore(m: graft.pipeline.TextAnalysis.LmModel,
      addK: Double, kv: Double, text: String): Option[(Long, Double)] = {
    def sparkTrim(s: String): String = {
      var i = 0; var j = s.length
      while (i < j && s.charAt(i) == ' ') i += 1
      while (j > i && s.charAt(j - 1) == ' ') j -= 1
      s.substring(i, j)
    }
    val norm = sparkTrim(org.apache.spark.unsafe.types.UTF8String
      .fromString(text).toLowerCase.toString)
      .replaceAll("\\s+", " ")
    val toks = norm.split(" ")
    if (toks.length < 2) None
    else {
      var s = 0.0
      var i = 0
      while (i < toks.length - 1) {
        val c12 = m.c12.getOrElse((toks(i), toks(i + 1)), 0L).toDouble
        val c1 = m.c1.getOrElse(toks(i), 0L).toDouble
        s += math.log((c12 + addK) / (c1 + kv))
        i += 1
      }
      val n = toks.length - 1
      val ppl = java.math.BigDecimal.valueOf(math.exp(-s / n))
        .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
      Some((n.toLong, ppl))
    }
  }

  /** DSIR importance scoring as a stream (the serving half of
    * [[graft.pipeline.Sampling.importanceSample]]): both frozen bigram
    * LMs ride as ONE broadcast pair, every arriving doc scores in a
    * stateless per-row fold — the [[lmScoreStream]] recipe with the
    * target/raw log-ratio in the loop. Per-bigram ln args are the exact
    * doubles the batch joins produce (getOrElse(0) == the LEFT-join
    * coalesce floor); the per-doc sum order differs from the batch hash
    * aggregate's, absorbed by the same round(6) the batch row rides.
    * Returns [<id>, n_bigrams, score] for every scorable doc — the
    * top-k selection happens wherever the consumer ranks. */
  def importanceScoreStream(stream: DataFrame,
      target: graft.pipeline.TextAnalysis.LmModel,
      raw: graft.pipeline.TextAnalysis.LmModel, addK: Double,
      textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    val spark = stream.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast((target, raw))
    def sparkTrim(s: String): String = {
      var i = 0; var j = s.length
      while (i < j && s.charAt(i) == ' ') i += 1
      while (j > i && s.charAt(j - 1) == ' ') j -= 1
      s.substring(i, j)
    }
    stream.filter(length(trim(col(textCol))) > 0)
      .select(col(idCol).cast("long"), col(textCol).cast("string"))
      .as[(Long, String)]
      .mapPartitions { it =>
        val (t, r) = bc.value
        val kvT = addK * t.vocab.toDouble
        val kvR = addK * r.vocab.toDouble
        it.flatMap { case (id, text) =>
          val norm = sparkTrim(org.apache.spark.unsafe.types.UTF8String
            .fromString(text).toLowerCase.toString)
            .replaceAll("\\s+", " ")
          val toks = norm.split(" ")
          if (toks.length < 2) None
          else {
            var s = 0.0
            var i = 0
            while (i < toks.length - 1) {
              val bg = (toks(i), toks(i + 1))
              val lnT = math.log(
                (t.c12.getOrElse(bg, 0L).toDouble + addK) /
                (t.c1.getOrElse(toks(i), 0L).toDouble + kvT))
              val lnR = math.log(
                (r.c12.getOrElse(bg, 0L).toDouble + addK) /
                (r.c1.getOrElse(toks(i), 0L).toDouble + kvR))
              s += lnT - lnR
              i += 1
            }
            val n = toks.length - 1
            val score = java.math.BigDecimal.valueOf(s / n)
              .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
            Some((id, n.toLong, score))
          }
        }
      }
      .toDF(idCol, "n_bigrams", "score")
  }

  /** `stream` must carry a `text` column; when `eventTimeCol` is given the
    * stream is watermarked so the dedup state is bounded (exact dedup
    * within the lateness window — at 100 TB/day unbounded dedup state is
    * not an option). Returns the filtered stream with quality columns +
    * fingerprint. */
  /** The deterministic stage of [[cleanDocuments]]: quality-score +
    * fingerprint + gate — a stateless narrow map (no state store, no
    * shuffle), so its streamed output is row-for-row the batch result
    * and can sit under the DuckDB oracle (`text_clean_stream`). The
    * dedup stage stays separate: keep-first-arrival is ARRIVAL-order
    * semantics, meaningless to hash-gate. */
  def scoreAndGate(stream: DataFrame, minQuality: Double): DataFrame =
    graft.pipeline.TextAnalysis.qualityScore(stream)
      .withColumn("fingerprint",
        md5(regexp_replace(trim(lower(col("text"))), "\\s+", " ")))
      .filter(col("quality") >= minQuality)

  /** Streaming NB inference — the train-batch / score-stream serving
    * shape: a [[graft.pipeline.Classify.NbModel]] trained offline rides
    * into the stream as a BROADCAST HASH model and scoring is a
    * STATELESS per-row pass (one `mapPartitions` — no aggregation, no
    * state store, append-mode-safe on an unbounded stream). The hash
    * map is the point: the literal-map expression form pays a LINEAR
    * scan of the vocabulary per token lookup (Spark's GetMapValue on a
    * literal is O(map size)), which made scoring the bench's slowest
    * streaming entry; the broadcast HashMap is O(1) per token
    * (measured ~3× on the replay). Every arithmetic step keeps the
    * expression form's exact IEEE association order — token-order sum
    * folded separately, then added to the prior/denominator base; the
    * same HALF_UP round(6) argmax key and (nr, cls, raw) sort — so the
    * output is row-for-row the batch
    * [[graft.pipeline.Classify.naiveBayes]] prediction and sits under
    * the same oracle SQL. Returns [doc_id, labelCol, pred, margin]. */
  def classifyStream(stream: DataFrame,
      model: graft.pipeline.Classify.NbModel,
      labelCol: String = "source"): DataFrame = {
    val spark = stream.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(model)
    def round6(x: Double): Double = java.math.BigDecimal.valueOf(x)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
    def round3(x: Double): Double = java.math.BigDecimal.valueOf(x)
      .setScale(3, java.math.RoundingMode.HALF_UP).doubleValue()
    stream.filter(length(trim(col("text"))) > 0)
      .select(col("doc_id").cast("long"), col(labelCol).cast("string"),
        col("text").cast("string"))
      .as[(Long, String, String)]
      .mapPartitions { it =>
        val cls = bc.value.classes.toArray
        it.map { case (id, lbl, text) =>
          // lowercase through UTF8String — the EXACT code Spark's
          // lower() runs (ASCII fast path; default-locale slow path for
          // non-ASCII), so stream and batch tokenize identically even
          // for non-ASCII text under a non-ROOT default locale
          val toks = org.apache.spark.unsafe.types.UTF8String
            .fromString(text.trim).toLowerCase.toString
            .replaceAll("\\s+", " ").split(" ").filter(_.nonEmpty)
          val scored = cls.map { c =>
            // token-order fold FIRST, then one add to the base — the
            // exact association order of the expression form
            var tokSum = 0.0
            var j = 0
            while (j < toks.length) {
              tokSum += c.lnCounts.getOrElse(toks(j), 0.0); j += 1
            }
            val raw = c.lnPrior - toks.length.toDouble * c.lnDenom + tokSum
            (-round6(raw), c.cls, raw)
          }.sortBy(t => (t._1, t._2, t._3))
          // single-class model: no runner-up — null margin, like the
          // batch form's missing second array element
          val margin: java.lang.Double =
            if (scored.length > 1) round3(scored(0)._3 - scored(1)._3)
            else null
          (id, lbl, scored(0)._2, margin)
        }
      }
      .toDF("doc_id", labelCol, "pred", "margin")
  }

  /** Streaming CHAR-N-GRAM language ID — [[classifyStream]]'s serving
    * split over the n-gram-profile model: the broadcast
    * [[graft.pipeline.Classify.NbModel]] trained on char n-grams scores
    * each arriving doc in one stateless pass. Normalization replicates
    * the batch `regexp_replace(trim(lower(text)), "\s+", " ")` exactly
    * (UTF8String lowercase, 0x20-only trim), and gram spans slice by
    * CODE POINT — the semantics of Spark's `substr`/`length` on
    * UTF8String, NOT Java's UTF-16 indexing, so astral-plane text grams
    * identically to the batch scorer. Docs with fewer than n normalized
    * chars emit nothing (the batch contract). Returns
    * [doc_id, labelCol, pred, margin]. */
  def classifyNgramStream(stream: DataFrame,
      model: graft.pipeline.Classify.NbModel, n: Int,
      labelCol: String = "lang"): DataFrame = {
    val spark = stream.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(model)
    def round6(x: Double): Double = java.math.BigDecimal.valueOf(x)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
    def round3(x: Double): Double = java.math.BigDecimal.valueOf(x)
      .setScale(3, java.math.RoundingMode.HALF_UP).doubleValue()
    def sparkTrim(s: String): String = {
      var i = 0; var j = s.length
      while (i < j && s.charAt(i) == ' ') i += 1
      while (j > i && s.charAt(j - 1) == ' ') j -= 1
      s.substring(i, j)
    }
    stream
      .select(col("doc_id").cast("long"), col(labelCol).cast("string"),
        col("text").cast("string"))
      .as[(Long, String, String)]
      .mapPartitions { it =>
        val cls = bc.value.classes.toArray
        it.flatMap { case (id, lbl, text) =>
          val norm = sparkTrim(org.apache.spark.unsafe.types.UTF8String
            .fromString(text).toLowerCase.toString)
            .replaceAll("\\s+", " ")
          val cps = norm.codePoints().toArray
          if (cps.length < n) None
          else {
            val nGrams = cps.length - n + 1
            val scored = cls.map { c =>
              var tokSum = 0.0
              var i = 0
              while (i < nGrams) {
                tokSum += c.lnCounts.getOrElse(new String(cps, i, n), 0.0)
                i += 1
              }
              val raw = c.lnPrior - nGrams.toDouble * c.lnDenom + tokSum
              (-round6(raw), c.cls, raw)
            }.sortBy(t => (t._1, t._2, t._3))
            val margin: java.lang.Double =
              if (scored.length > 1) round3(scored(0)._3 - scored(1)._3)
              else null
            Some((id, lbl, scored(0)._2, margin))
          }
        }
      }
      .toDF("doc_id", labelCol, "pred", "margin")
  }

  /** Streaming benchmark decontamination, the stateless half: shingle
    * the incoming docs and stream-static INNER join against the
    * benchmark n-gram pool (broadcast by hint — stream-static inner
    * joins are stateless in Structured Streaming, so this is
    * append-safe with no state store and no watermark). Emits one
    * [id, g] row per benchmark hit; the per-doc rollup happens
    * downstream of the sink (the Kappa shape: the stream pays the
    * expensive scan — shingling + join — and a batch rollup over the
    * sink table produces the same [id, n_hits] as
    * [[graft.pipeline.Dedup.decontaminate]]). */
  def decontaminateHitsStream(stream: DataFrame, benchShingles: DataFrame,
      n: Int = 5): DataFrame =
    stream
      .filter(length(trim(col("text"))) > 0)
      .select(col("doc_id").cast("long").as("id"),
        explode(graft.pipeline.Dedup.shingles(col("text"), n)).as("g"))
      // distinct HERE, like the batch operators do internally — a
      // caller-supplied non-deduplicated pool must not multiply hits
      .join(broadcast(benchShingles.select(col("g")).distinct()), Seq("g"))

  def cleanDocuments(stream: DataFrame, minQuality: Double,
      eventTimeCol: Option[String] = None, watermark: String = "1 hour"): DataFrame = {
    val scored = scoreAndGate(stream, minQuality)
    eventTimeCol match {
      case Some(ts) => scored.withWatermark(ts, watermark)
        .dropDuplicates("fingerprint", ts)
      case None => scored.dropDuplicates("fingerprint")
    }
  }

  /** Streaming MinHash near-dup flagging — the streaming form of
    * [[graft.pipeline.Dedup.minhashLsh]]'s candidate generation: each
    * arriving document's banded minhash buckets (the SAME
    * `md5(array_join(slice(sig, …), "|"))` band keys as the batch
    * operator, so streamed claims are a subset of batch candidate
    * pairs) are checked against a bucket → first-claimer state; a doc
    * whose bucket is already claimed by an EARLIER doc (event-time
    * order, ties by id; across micro-batches, arrival order) emits a
    * [[DupClaim]] naming that claimer. Consumers near-dup-verify /
    * min-aggregate claims exactly as they would batch LSH pairs.
    *
    * State is ONE long per seen (band, bucket), expired by event-time
    * timeout once the watermark passes `stateGapSeconds` beyond the
    * bucket's last activity — near-dup detection within the lateness
    * window, the same bounded-state contract as [[cleanDocuments]]
    * (unbounded bucket state at 100 TB/day is not an option). The
    * signature itself is the narrow codegen'd batch kernel
    * (shingles → minhash), no UDF, no shuffle before the keyed state. */
  def nearDupStream(stream: DataFrame, idCol: String = "doc_id",
      textCol: String = "text", tsCol: String = "ts",
      watermark: String = "1 hour", stateGapSeconds: Long = 3600,
      shingleSize: Int = 3, numHashes: Int = 12,
      bands: Int = 4): Dataset[DupClaim] = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val rows = numHashes / bands
    val spark = stream.sparkSession
    import spark.implicits._
    val sh = stream.select(col(idCol).cast("long").as("id"),
        col(tsCol).cast("timestamp").as("ts"),
        graft.pipeline.Dedup.shingles(col(textCol), shingleSize).as("sh"))
      .filter(size(col("sh")) > 0) // shingle-less docs claim nothing
    // Generate barrier: the signature must be COMPUTED ONCE per row —
    // referencing the minhash expression inside every band projection
    // would re-evaluate the whole shingles->minhash kernel x bands
    // (CollapseProject inlines deterministic expressions; the batch
    // operator uses a persist barrier for the same reason, measured 17 s
    // vs 2 s there). explode(array(sig)) is a Generate operator, so the
    // band keys below reference its OUTPUT attribute, not the kernel.
    val sigOnce = sh.select(col("id"), col("ts"),
      explode(array(
        graft.pipeline.Dedup.minhashSignature(col("sh"), numHashes))).as("sig"))
    val banded = sigOnce.select(col("id"), col("ts"),
        posexplode(array((0 until bands).map { b =>
          md5(array_join(slice(col("sig"), b * rows + 1, rows), "|"))
        }: _*)).as(Seq("band", "bucket")))
      .withWatermark("ts", watermark)

    bucketClaims(banded.select(col("band"), col("bucket"), col("id"), col("ts")),
      stateGapSeconds)
  }

  /** Exactly-once INGEST: watermarked first-occurrence dedup of an
    * event stream by id — Spark's `dropDuplicatesWithinWatermark`
    * (state = one entry per id inside the watermark horizon, evicted as
    * event time passes id's first occurrence + delay), the production
    * answer to at-least-once sources replaying rows. Each id's FIRST
    * arrival is emitted immediately (no aggregation, no flush
    * sentinel); copies arriving within `watermark` of it are dropped.
    * The batch twin is [[graft.pipeline.Temporal.dedupEvents]]. */
  def dedupEventsStream(stream: DataFrame, idCol: String = "event_id",
      tsCol: String = "ts", watermark: String = "30 days"): DataFrame =
    stream.withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark(idCol)

  /** Streamed banded minhash signatures of an arriving doc stream — the
    * INDEX DELTA of [[graft.pipeline.Dedup.minhashIndex]] computed at
    * ingest: one [id, sig, band, bucket] row per (doc, band), the exact
    * rows a daily near-dup pipeline appends to the persisted signature
    * index, and the stream side of the stateless corpus probe
    * ([[graft.pipeline.Dedup.corpusNearDupCandidates]] as a
    * stream-static join). Pure narrow — no state, no watermark; the
    * same Generate barrier as [[nearDupStream]] keeps the
    * shingles→minhash kernel evaluated once per row instead of ×bands.
    * Shingle-less docs emit nothing (the batch index contract). */
  def minhashIndexStream(stream: DataFrame, idCol: String = "doc_id",
      textCol: String = "text", shingleSize: Int = 3, numHashes: Int = 128,
      bands: Int = 32): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val rows = numHashes / bands
    val sh = stream.select(col(idCol).cast("long").as("id"),
        graft.pipeline.Dedup.shingles(col(textCol), shingleSize).as("sh"))
      .filter(size(col("sh")) > 0)
    val sigOnce = sh.select(col("id"),
      explode(array(
        graft.pipeline.Dedup.minhashSignature(col("sh"), numHashes))).as("sig"))
    sigOnce.select(col("id"), col("sig"),
      posexplode(array((0 until bands).map { b =>
        md5(array_join(slice(col("sig"), b * rows + 1, rows), "|"))
      }: _*)).as(Seq("band", "bucket")))
  }

  /** Streaming embedding near-dup flagging — the streaming form of
    * [[graft.pipeline.Dedup.embeddingNearDup]]'s candidate generation:
    * each arriving vector's (table, bucket) hyperplane signatures use
    * the SAME md5-derived planes as the batch operator
    * (Ann.planeComponent), so streamed claims land in exactly the
    * buckets batch LSH would co-join — a claim names the bucket's
    * first (event-time order) earlier vector, and consumers
    * cosine-verify claims exactly as they would batch bucket pairs.
    * Same bounded bucket-claim state contract as [[nearDupStream]]
    * (one long per seen (table, bucket), event-time expiry). `dim`
    * must be given explicitly — a streaming Dataset cannot be probed
    * with a collect. Returns [[DupClaim]]s with `band` = the LSH
    * table index. */
  def embeddingNearDupStream(stream: DataFrame, dim: Int,
      idCol: String = "vec_id", vecCol: String = "embedding",
      tsCol: String = "ts", watermark: String = "1 hour",
      stateGapSeconds: Long = 3600, planes: Int = 12, tables: Int = 2,
      seed: Int = 42): Dataset[DupClaim] = {
    val banded = stream.select(col(idCol).cast("long").as("id"),
        col(tsCol).cast("timestamp").as("ts"),
        posexplode(graft.pipeline.Ann.signaturesCol(col(vecCol), dim,
          planes, seed, tables)).as(Seq("table", "bucket")))
      .withWatermark("ts", watermark)
    bucketClaims(banded.select(col("table"),
      col("bucket").cast("string").as("bucket"), col("id"), col("ts")),
      stateGapSeconds)
  }

  /** The shared bucket-claim state core of [[nearDupStream]] /
    * [[embeddingNearDupStream]]: per (band, bucket) key, remember the
    * first claimer (event-time order, ties by id; across micro-batches,
    * arrival order) as ONE long of state, emit a [[DupClaim]] for every
    * later doc, expire the key `stateGapSeconds` after its last
    * activity. */
  private def bucketClaims(banded: DataFrame,
      stateGapSeconds: Long): Dataset[DupClaim] = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val spark = banded.sparkSession
    import spark.implicits._
    banded
      .as[(Int, String, Long, java.sql.Timestamp)]
      .groupByKey(r => (r._1, r._2))
      .flatMapGroupsWithState[Long, DupClaim](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (key: (Int, String), rs: Iterator[(Int, String, Long, java.sql.Timestamp)],
         state: GroupState[Long]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            val docs = rs.toArray.sortBy(r => (r._4.getTime, r._3))
            if (docs.isEmpty) Iterator.empty
            else {
              var claimer = state.getOption.getOrElse(-1L)
              val out = scala.collection.mutable.ArrayBuffer.empty[DupClaim]
              docs.foreach { d =>
                if (claimer < 0) claimer = d._3
                else if (d._3 != claimer) out += DupClaim(d._3, key._1, claimer)
              }
              state.update(claimer)
              state.setTimeoutTimestamp(docs.map(_._4.getTime).max +
                stateGapSeconds * 1000)
              out.iterator
            }
          }
      }
  }

  /** Watermarked tumbling-window aggregation over the `events` stream
    * shape ([event_id, ts, user_id, event_type, value, …]): late data
    * beyond `watermark` is dropped, window state is bounded. Returns
    * [window, event_type, events, total_value]. */
  def eventWindowCounts(events: DataFrame, windowLength: String = "10 minutes",
      watermark: String = "30 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowLength), col("event_type"))
      .agg(count(lit(1)).as("events"), sum(col("value")).as("total_value"))

  /** Hopping (sliding) variant of [[eventWindowCounts]]: each event lands
    * in windowLength/slide overlapping windows (Spark's `window` with a
    * slide duration expands them — same bounded constant-factor explode
    * as the batch [[graft.pipeline.Temporal.hoppingAgg]]); aggregation
    * stays one watermarked map-side-combined shuffle. */
  def eventHoppingCounts(events: DataFrame, windowLength: String,
      slide: String, watermark: String = "30 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowLength, slide), col("event_type"))
      .agg(count(lit(1)).as("events"), sum(col("value")).as("total_value"))

  /** Watermarked tumbling-window OHLC downsampling over the event
    * stream — the streaming twin of [[graft.pipeline.Temporal.ohlc]]:
    * open/close via min_by/max_by on the (ts, event_id) struct (ties
    * identical to batch), mean via the exact DECIMAL(18,6) sum (the
    * batch entry's order-insensitivity trick carries over unchanged —
    * micro-batch boundaries are just another summation order, which the
    * decimal sum makes irrelevant). State is one partial aggregate per
    * open (type, window), expired by the watermark. Returns
    * [event_type, window, open, close, low, high, n_events, mean_value]. */
  def ohlcStream(events: DataFrame, windowLength: String,
      watermark: String = "30 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(col("event_type"), window(col("ts"), windowLength))
      .agg(
        min_by(col("value"), struct(col("ts"), col("event_id"))).as("open"),
        max_by(col("value"), struct(col("ts"), col("event_id"))).as("close"),
        min(col("value")).as("low"), max(col("value")).as("high"),
        count(lit(1)).as("n_events"),
        round(sum(col("value").cast("decimal(18,6)")).cast("double") /
          count(lit(1)), 6).as("mean_value"))

  /** Watermarked active-users-per-window over the event stream: one
    * mergeable HyperLogLog++ sketch per window — the streaming form of
    * [[graft.pipeline.Temporal.activeUsersApprox]] (same rsd → same
    * deterministic estimate as the batch aggregate on the same rows;
    * StreamingSpec pins the equality). Exact distinct would need the
    * full user-id set per open window in state; the sketch keeps state
    * O(windows × sketch size). Returns [day, n_users]. */
  def activeUsersStream(events: DataFrame, windowLength: String = "1 day",
      watermark: String = "1 day", rsd: Double = 0.02): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowLength))
      .agg(approx_count_distinct(col("user_id"), rsd).as("n_users"))
      .select(col("window.start").as("day"), col("n_users"))

  /** EXACT active-users-per-window over the event stream: two chained
    * stateful operators — watermarked `dropDuplicates` on
    * (user_id, window) so each user counts once per window (state = one
    * row per distinct (user, window), expired by the watermark), then a
    * plain windowed `count` (streaming forbids `count_distinct`, but
    * after the dedup a count IS the distinct count). Matches batch
    * [[graft.pipeline.Temporal.activeUsers]] exactly — this is the
    * oracle-gated form; [[activeUsersStream]]'s HLL sketch is the
    * unbounded-cardinality path (state O(windows × sketch) instead of
    * O(windows × users)). Returns [day, n_users]. */
  def activeUsersExactStream(events: DataFrame, windowLength: String = "1 day",
      watermark: String = "1 day"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .select(col("user_id"), col("ts"), window(col("ts"), windowLength).as("w"))
      .dropDuplicates("user_id", "w")
      .groupBy(col("w"))
      .agg(count(lit(1)).as("n_users"))
      .select(col("w.start").as("day"), col("n_users"))

  /** Per-user running/cumulative aggregates over an event stream — the
    * streaming twin of [[graft.pipeline.Temporal.cumulative]] (the LTV
    * curve, emitted AT ARRIVAL: every event carries the user's lifetime
    * count and value total so far). State per user is TWO LONGS: the
    * event count and the running total in exact micro-units — each value
    * is quantized to 6 decimals with the same HALF_UP rule as Spark's
    * double→DECIMAL(18,6) cast before adding, so integer addition makes
    * the stream's running sum bit-identical to the batch DECIMAL window
    * sum under any micro-batch chunking that respects per-user ts order
    * (within a batch, rows are processed in (ts_ns, event_id) order).
    *
    * Input columns: user_id, ts_ns (epoch-ns long), event_id,
    * event_type, value. NoTimeout: state is 16 bytes per user and never
    * expires — a production deployment with an unbounded key space pairs
    * this with an inactivity timeout snapshotting closed users to the
    * sink. */
  def cumulativeStream(events: DataFrame): Dataset[UserRunning] = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val spark = events.sparkSession
    import spark.implicits._
    val typed = events
      .select(col("user_id").cast("long"), col("ts_ns").cast("long"),
        col("event_id").cast("long"), col("event_type").cast("string"),
        col("value").cast("double"))
      .as[(Long, Long, Long, String, Double)]
    typed.groupByKey(_._1)
      .flatMapGroupsWithState[(Long, Long), UserRunning](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (user: Long, rows: Iterator[(Long, Long, Long, String, Double)],
         state: GroupState[(Long, Long)]) =>
          var (n, micro) = state.getOption.getOrElse((0L, 0L))
          val out = rows.toArray.sortBy(r => (r._2, r._3)).map {
            case (_, tsNs, eventId, eventType, value) =>
              n += 1
              // non-finite or out-of-decimal(18,6)-range values fail the
              // batch twin's ANSI decimal cast too — fail HERE with a
              // named reason instead of an opaque NumberFormatException
              // from the state machine
              require(java.lang.Double.isFinite(value) &&
                math.abs(value) < 1e12,
                s"cumulativeStream: value $value (event $eventId) outside " +
                  "decimal(18,6) range — the batch DECIMAL cast rejects it too")
              // addExact: a running total past ~9.2e18 micro-units must
              // raise loudly (the batch DECIMAL(18,6) window sum does),
              // never wrap silently
              micro = try Math.addExact(micro,
                java.math.BigDecimal.valueOf(value)
                  .setScale(6, java.math.RoundingMode.HALF_UP)
                  .movePointRight(6).longValueExact())
              catch {
                case _: ArithmeticException => throw new IllegalArgumentException(
                  s"cumulativeStream: running micro-unit sum overflowed Long " +
                    s"at event $eventId for user $user — the batch " +
                    "DECIMAL(18,6) running sum fails loudly here too")
              }
              UserRunning(user, tsNs, eventId, eventType, n, micro)
          }
          state.update((n, micro))
          out.iterator
      }
  }

  /** Streaming inter-arrival gaps — the [[cumulativeStream]] sibling
    * for the gap/churn profile: state is the user's LAST event
    * timestamp (ONE long per user, sentinel −1 before the first
    * event); every arrival after the first emits one whole-second gap
    * (`(Δ − Δ mod 1e9) / 1e9`, the batch
    * [[graft.pipeline.Temporal.interarrival]] floor) and advances the
    * state. Within a micro-batch rows are processed in
    * (ts_ns, event_id) order, so with per-user in-order arrival the
    * emitted gap stream is row-identical to the batch lag window.
    * NoTimeout (8-byte state; same boundedness note as
    * [[cumulativeStream]]). Input columns: user_id, ts_ns, event_id. */
  def interarrivalStream(events: DataFrame): Dataset[UserGap] = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val spark = events.sparkSession
    import spark.implicits._
    val ns = graft.pipeline.Temporal.NsPerSecond
    val typed = events
      .select(col("user_id").cast("long"), col("ts_ns").cast("long"),
        col("event_id").cast("long"))
      .as[(Long, Long, Long)]
    typed.groupByKey(_._1)
      .flatMapGroupsWithState[Long, UserGap](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (user: Long, rows: Iterator[(Long, Long, Long)],
         state: GroupState[Long]) =>
          var last = state.getOption.getOrElse(-1L)
          val out = rows.toArray.sortBy(r => (r._2, r._3)).flatMap {
            case (_, tsNs, _) =>
              val gap = if (last >= 0) {
                val d = tsNs - last
                Some(UserGap(user, (d - d % ns) / ns))
              } else None
              last = tsNs
              gap
          }
          state.update(last)
          out.iterator
      }
  }

  /** Streaming as-of enrichment — the classic stream join ("attach the
    * most recent prior `rightType` event to every `leftType` event, per
    * user") as per-key last-value state instead of a range join: state
    * is the last right event's (ts_ns, event_id), two longs per user;
    * every left arrival emits immediately with the current match (or
    * −1s). Within a micro-batch rows are processed in
    * (ts_ns, side, event_id) order with right BEFORE left at equal
    * timestamps and ascending event_id — exactly the batch
    * [[graft.pipeline.Temporal.asofJoin]] union-trick ordering, so an
    * equal-ts right event is eligible and the max event_id wins ties,
    * and with per-user in-order arrival the two surfaces are
    * row-identical. NoTimeout (two-long state; same boundedness note as
    * [[cumulativeStream]]).
    *
    * Input columns: user_id, ts_ns (epoch-ns long), event_id,
    * event_type. Returns one [[AsofMatch]] per left event. */
  def asofStream(events: DataFrame, leftType: String,
      rightType: String): Dataset[AsofMatch] = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val spark = events.sparkSession
    import spark.implicits._
    val typed = events
      .filter(col("event_type").isin(leftType, rightType))
      .select(col("user_id").cast("long"), col("ts_ns").cast("long"),
        col("event_id").cast("long"), col("event_type").cast("string"))
      .as[(Long, Long, Long, String)]
    typed.groupByKey(_._1)
      .flatMapGroupsWithState[(Long, Long), AsofMatch](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (user: Long, rows: Iterator[(Long, Long, Long, String)],
         state: GroupState[(Long, Long)]) =>
          var last = state.getOption // (ts_ns, event_id) of the last right
          val out = rows.toArray
            .sortBy { case (_, tsNs, eventId, et) =>
              (tsNs, if (et == rightType) 0 else 1, eventId) }
            .flatMap { case (_, tsNs, eventId, et) =>
              if (et == rightType) { last = Some((tsNs, eventId)); None }
              else last match {
                case Some((rt, rid)) =>
                  Some(AsofMatch(eventId, user, tsNs, rid, rt, tsNs - rt))
                case None =>
                  Some(AsofMatch(eventId, user, tsNs, -1L, -1L, -1L))
              }
            }
          last.foreach(state.update)
          out.iterator
      }
  }

  /** Streaming cohort retention — the stateful twin of
    * [[graft.pipeline.Temporal.retention]]: per user, state is the
    * cohort week (set by the FIRST event — with in-order arrival that
    * is the batch min-ts cohort) plus the set of week offsets already
    * reported; each event's week emits one [[CohortVisit]] the first
    * time that offset appears. The downstream rollup (count per
    * (cohort, offset) — each pair arrives once per user by
    * construction) equals the batch countDistinct table. State is one
    * long + the user's active-week set (bounded by campaign length in
    * weeks), NoTimeout (same boundedness note as [[cumulativeStream]]). */
  def retentionStream(events: DataFrame,
      bucketNs: Long): Dataset[CohortVisit] = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val spark = events.sparkSession
    import spark.implicits._
    val typed = events
      .select(col("user_id").cast("long"), col("ts_ns").cast("long"))
      .as[(Long, Long)]
    // state rides as (cohort, offsets) with a PRIMITIVE long array —
    // the Seq encoder's per-element boxing tripled this operator's
    // wall-clock at bench scale before the switch
    typed.groupByKey(_._1)
      .flatMapGroupsWithState[(Long, Array[Long]), CohortVisit](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (user: Long, rows: Iterator[(Long, Long)],
         state: GroupState[(Long, Array[Long])]) =>
          var (cohort, seen0) = state.getOption.getOrElse((-1L, Array.empty[Long]))
          var seen = seen0
          val out = scala.collection.mutable.ArrayBuffer.empty[CohortVisit]
          rows.toArray.map(_._2).sorted.foreach { tsNs =>
            val w = tsNs - math.floorMod(tsNs, bucketNs)
            if (cohort < 0) cohort = w
            val off = (w - cohort) / bucketNs
            if (!seen.contains(off)) {
              seen = seen :+ off
              out += CohortVisit(user, cohort, off)
            }
          }
          state.update((cohort, seen))
          out.iterator
      }
  }

  /** Streaming ordered-funnel progress — the stateful twin of
    * [[graft.pipeline.Temporal.funnel]]: per user, state is the step
    * completion times t0..t(K−1) (−1 = unreached), and an arriving
    * event satisfies step K iff it matches the step type, t(K−1) is
    * set, ts is STRICTLY after t(K−1), and ts is within `horizonNs` of
    * t0. The batch operator's tK = "min ts of step-K events after
    * t(K−1) within horizon" is exactly what a greedy in-ts-order scan
    * computes, and the strict inequalities make equal-ts processing
    * order irrelevant — so with per-user in-order arrival, the emitted
    * (user, step) set equals the batch non-null __tK set row for row
    * (the downstream per-step distinct-user rollup then matches the
    * batch counts). Emits one [[StepReached]] per (user, step), at the
    * moment the step is first satisfied — the live funnel dashboard
    * feed. State is |steps| longs per user, NoTimeout (same boundedness
    * note as [[cumulativeStream]]). */
  def funnelStream(events: DataFrame, steps: Seq[String],
      horizonNs: Long): Dataset[StepReached] = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    require(steps.nonEmpty)
    val spark = events.sparkSession
    import spark.implicits._
    val stepsArr = steps.toArray
    val typed = events
      .filter(col("event_type").isin(steps: _*))
      .select(col("user_id").cast("long"), col("ts_ns").cast("long"),
        col("event_id").cast("long"), col("event_type").cast("string"))
      .as[(Long, Long, Long, String)]
    typed.groupByKey(_._1)
      .flatMapGroupsWithState[Array[Long], StepReached](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (user: Long, rows: Iterator[(Long, Long, Long, String)],
         state: GroupState[Array[Long]]) =>
          val t = state.getOption.getOrElse(Array.fill(stepsArr.length)(-1L))
          val out = rows.toArray.sortBy(r => (r._2, r._3)).flatMap {
            case (_, tsNs, _, et) =>
              // every step index of this type is tested — a funnel may
              // legitimately repeat a type ("view" as step 0 AND 2),
              // and one event can be the min for several such steps
              // (each step's own predecessor/horizon bound applies)
              stepsArr.indices.filter(stepsArr(_) == et).flatMap { k =>
                val eligible =
                  if (k == 0) t(0) < 0
                  else t(k) < 0 && t(k - 1) >= 0 && tsNs > t(k - 1) &&
                    tsNs <= t(0) + horizonNs
                if (eligible) { t(k) = tsNs; Some(StepReached(user, k, tsNs)) }
                else None
              }
          }
          state.update(t)
          out.iterator
      }
  }

  /** Event-type transition extraction over a stream — the stateful half
    * of the Markov user-journey model: per user, state is just the LAST
    * event's (ts_ns, event_id, type); every arriving event emits one
    * [user_id, from_type, to_type, ts_ns, event_id] transition row
    * (except a user's first). Downstream, the same
    * [[graft.pipeline.Temporal.transitionMatrix]] aggregation the batch
    * operator uses turns the transition stream into the count/prob
    * matrix — so stream and batch provably share the normalization code.
    *
    * Input columns: user_id, ts_ns (epoch-ns long), event_id,
    * event_type. Rows within a micro-batch are processed in
    * (ts_ns, event_id) order; with per-user in-order arrival across
    * batches the emitted pair multiset equals the batch window pass.
    * State is three fields per user, NoTimeout (same boundedness note
    * as [[cumulativeStream]]). */
  def markovStream(events: DataFrame): Dataset[Transition] = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val spark = events.sparkSession
    import spark.implicits._
    val typed = events
      .select(col("user_id").cast("long"), col("ts_ns").cast("long"),
        col("event_id").cast("long"), col("event_type").cast("string"))
      .as[(Long, Long, Long, String)]
    typed.groupByKey(_._1)
      .flatMapGroupsWithState[(Long, Long, String), Transition](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (user: Long, rows: Iterator[(Long, Long, Long, String)],
         state: GroupState[(Long, Long, String)]) =>
          var prev = state.getOption
          val out = rows.toArray.sortBy(r => (r._2, r._3)).flatMap {
            case (_, tsNs, eventId, eventType) =>
              val t = prev.map { case (_, _, pType) =>
                Transition(user, pType, eventType, tsNs, eventId)
              }
              prev = Some((tsNs, eventId, eventType))
              t
          }
          prev.foreach(state.update)
          out.iterator
      }
  }

  /** Session windows with custom state — flatMapGroupsWithState with an
    * event-time timeout. A user's session closes either when a newer
    * event arrives more than `gapSeconds` after the session's end (the
    * closed session is emitted immediately — gap splitting happens at
    * arrival, so micro-batch boundaries do not change the result) or
    * when the watermark passes end+gap with no newer event (event-time
    * timeout flushes the open session). For in-order-per-user arrival
    * this matches batch [[graft.pipeline.Temporal.sessionize]] exactly
    * (same `> gap` boundary; StreamingSpec pins the equivalence on a
    * chunk-fed fixture); an out-of-order event landing inside an
    * already-open session merges into it — with ts-ordered arrival per
    * user the two surfaces cannot drift. The KeyValueGroupedDataset
    * state machine the reference has no analogue for — pure Structured
    * Streaming surface. */
  def sessionize(events: DataFrame, gapSeconds: Long = 1800,
      watermark: String = "30 minutes"): Dataset[UserSession] = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val spark = events.sparkSession
    import spark.implicits._
    val gapMs = gapSeconds * 1000L
    val typed = events
      .select(col("user_id").cast("long"), col("ts").cast("timestamp"),
        col("value").cast("double"))
      .withWatermark("ts", watermark) // after the projection so the tag survives
      .as[(Long, java.sql.Timestamp, Double)]

    typed.groupByKey(_._1)
      .flatMapGroupsWithState[(java.sql.Timestamp, java.sql.Timestamp, Long, Double), UserSession](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (user: Long, rows: Iterator[(Long, java.sql.Timestamp, Double)],
         state: GroupState[(java.sql.Timestamp, java.sql.Timestamp, Long, Double)]) =>
          if (state.hasTimedOut) {
            val (start, end, n, v) = state.get
            state.remove()
            Iterator.single(UserSession(user, start, end, n, v))
          } else {
            val sorted = rows.toArray.sortBy(_._2.getTime)
            if (sorted.isEmpty) Iterator.empty
            else {
              val closed = scala.collection.mutable.ArrayBuffer.empty[UserSession]
              var cur = state.getOption // (start, end, n, value) of the open session
              sorted.foreach { case (_, ts, value) =>
                cur match {
                  case Some((start, end, n, v)) =>
                    if (ts.getTime - end.getTime > gapMs) {
                      closed += UserSession(user, start, end, n, v)
                      cur = Some((ts, ts, 1L, value))
                    } else {
                      val s = if (ts.before(start)) ts else start
                      val e = if (ts.after(end)) ts else end
                      cur = Some((s, e, n + 1, v + value))
                    }
                  case None => cur = Some((ts, ts, 1L, value))
                }
              }
              val (start, end, n, v) = cur.get
              state.update((start, end, n, v))
              state.setTimeoutTimestamp(end.getTime + gapMs)
              closed.iterator
            }
          }
      }
  }
}
