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
    kappa: Double = 0.7) extends Serializable {

  @volatile private var phiLocal = PhiOps.collectPhi(initialPwt, cfg.numTopics)
  @volatile private var nwtState: DataFrame = null
  private val history = scala.collection.mutable.ArrayBuffer.empty[PassScores]
  private var chunkIndex = 0

  /** Current p_wt as a DataFrame (driver-held state re-materialized). */
  def currentPwt: DataFrame = {
    val spark = initialPwt.sparkSession
    PhiOps.phiFromLocal(spark, phiLocal)
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

/** Streaming training-data hygiene: quality-score + fingerprint the
  * incoming documents and drop duplicates within the watermark window —
  * the streaming form of the batch Dedup/TextAnalysis operators. */
object StreamingPipeline {

  /** `stream` must carry a `text` column; when `eventTimeCol` is given the
    * stream is watermarked so the dedup state is bounded (exact dedup
    * within the lateness window — at 100 TB/day unbounded dedup state is
    * not an option). Returns the filtered stream with quality columns +
    * fingerprint. */
  def cleanDocuments(stream: DataFrame, minQuality: Double,
      eventTimeCol: Option[String] = None, watermark: String = "1 hour"): DataFrame = {
    val scored = graft.pipeline.TextAnalysis.qualityScore(stream)
      .withColumn("fingerprint",
        md5(regexp_replace(trim(lower(col("text"))), "\\s+", " ")))
      .filter(col("quality") >= minQuality)
    eventTimeCol match {
      case Some(ts) => scored.withWatermark(ts, watermark)
        .dropDuplicates("fingerprint", ts)
      case None => scored.dropDuplicates("fingerprint")
    }
  }
}
