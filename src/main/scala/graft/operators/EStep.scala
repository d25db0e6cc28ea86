package graft.operators

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import graft.core.Doc
import graft.functions.{Rng, VectorOps}

/** Per-document theta regularizer agent — the Spark mirror of the
  * reference's RegularizeThetaAgent (regularizer_interface.h:27-57): called
  * once per inner iteration, adds increments to r_td from the current
  * (unnormalized) n_td. Must be Serializable (ships inside the kernel
  * closure); per-item data goes through broadcast variables. */
trait ThetaAgent extends Serializable {
  def apply(title: String, docId: Long, innerIter: Int,
      nTd: Array[Float], rTd: Array[Float]): Unit
}

/** ProcessBatches configuration — reference messages.proto ProcessBatchesArgs. */
case class EStepConfig(
    numDocumentPasses: Int = 10,                  // messages.proto:664 default
    classWeights: Map[String, Float] = Map.empty, // empty = every class weight 1
    batchWeight: Float = 1.0f,
    useRandomTheta: Boolean = false,              // messages.proto:675 default
    thetaSeed: Int = 0,
    thetaAgents: Seq[ThetaAgent] = Nil,
    computeNwt: Boolean = true,
    /** p(c|d) prediction over this label class (transform predict mode) */
    predictClassId: Option[String] = None)

/** One output row of the E-step: either an n_wt partial (kind 0) or a
  * per-document result (kind 1) carrying theta + cumulative-score partials.
  * The wide-row union keeps the kernel single-pass: one mapPartitions
  * produces both streams, split afterwards by a cheap filter on `kind`. */
case class EStepOut(
    kind: Int,
    class_id: String, token: String,
    vec: Array[Float],
    doc_id: Long, title: String,
    raw: Double, normalizer: Double, zero_words: Long,
    theta_zeros: Long, doc_len: Long)

/** The E-step — the one genuinely custom operator of the engine (reference
  * core/processor.cc:50-292 + processor_helpers.cc:384-589).
  *
  * For each document: resolve tokens against a broadcast Phi, run
  * `numDocumentPasses` local EM passes (p_tdw ∝ φ_wt·θ_td; n_td = Σ_w
  * n_dw·p_tdw; theta-regularizer agents; normalize with ≥0 clamp), then
  * emit (a) per-token n_wt partials pre-combined in a per-partition hash
  * map (map-side combine — the shuffle then only merges one partial per
  * (partition, token)), and (b) the document's theta row + perplexity /
  * sparsity partials.
  *
  * Scale notes: the only shuffle downstream is groupBy(class_id, token) of
  * the partials — proportional to (#partitions × vocab-touched), not to
  * corpus size. Phi ships once per executor via broadcast (same memory
  * contract as the reference's shared in-RAM PhiMatrix). For vocabularies
  * too large to broadcast whole, run class-sliced passes (each modality's
  * rows are independent between normalizations). The per-document inner
  * loop is tight float32 array code — whole-stage codegen does not apply,
  * but the JVM JIT vectorizes the hot dot/axpy loops.
  */
object EStep {

  val eps: Float = 1e-16f // reference helpers.h:62

  def run(docs: Dataset[Doc], bPhi: Broadcast[PhiLocal], cfg: EStepConfig): Dataset[EStepOut] = {
    val spark = docs.sparkSession
    import spark.implicits._

    docs.mapPartitions { it =>
      val phi = bPhi.value
      val T = phi.numTopics
      val useClassWeights = cfg.classWeights.nonEmpty
      // per-partition n_wt partial accumulator: phi row -> Σ_d (n_dw/p_wd)·θ_d
      val acc = new java.util.HashMap[Int, Array[Float]]()

      val docRows: Iterator[EStepOut] = it.map { doc =>
        val nTok = doc.tokens.length
        val idx = new Array[Int](nTok)
        val w = new Array[Float](nTok)
        var i = 0
        var hasTokens = false
        while (i < nTok) {
          val te = doc.tokens(i)
          idx(i) = phi.rowIndex(te.class_id, te.token)
          val cw = if (useClassWeights) cfg.classWeights.getOrElse(te.class_id, 0.0f) else 1.0f
          w(i) = te.weight * cw
          if (idx(i) >= 0) hasTokens = true
          i += 1
        }

        // ---- theta init (reference processor_helpers.cc:73-112) ----
        val theta = new Array[Float](T)
        if (cfg.useRandomTheta) {
          val h = {
            var hh = java.lang.Long.rotateLeft(doc.title.hashCode.toLong, 17) ^ doc.doc_id
            if (cfg.thetaSeed != 0) hh = 31 * hh + cfg.thetaSeed
            hh
          }
          val v = Rng.generateRandomVector(T, h)
          System.arraycopy(v, 0, theta, 0, T)
        } else {
          java.util.Arrays.fill(theta, 1.0f / T)
        }

        if (hasTokens) {
          // ---- inner EM passes (processor_helpers.cc:384-514) ----
          val nTd = new Array[Float](T)
          val rTd = new Array[Float](T)
          var pass = 0
          while (pass < cfg.numDocumentPasses) {
            java.util.Arrays.fill(nTd, 0.0f)
            i = 0
            while (i < nTok) {
              val row = idx(i)
              if (row >= 0) {
                val off = phi.offset(row)
                val pdw = VectorOps.dotSlice(phi.flat, off, theta)
                if (math.abs(pdw) >= eps) {
                  VectorOps.axpySlice(w(i) / pdw, phi.flat, off, nTd)
                }
              }
              i += 1
            }
            // theta <- theta ∘ n_td
            var k = 0
            while (k < T) { theta(k) *= nTd(k); k += 1 }
            // regularizer agents then normalization (NormalizeThetaAgent)
            java.util.Arrays.fill(rTd, 0.0f)
            cfg.thetaAgents.foreach(_.apply(doc.title, doc.doc_id, pass, theta, rTd))
            var sum = 0.0f
            k = 0
            while (k < T) {
              val v = theta(k) + rTd(k)
              if (v > 0) sum += v
              k += 1
            }
            val inv = if (sum > 0) 1.0f / sum else 0.0f
            k = 0
            while (k < T) {
              var v = inv * (theta(k) + rTd(k))
              if (v < eps) v = 0.0f
              theta(k) = v
              k += 1
            }
            pass += 1
          }

          // ---- n_wt partials with the FINAL theta (processor_helpers.cc:546-589)
          if (cfg.computeNwt) {
            i = 0
            while (i < nTok) {
              val row = idx(i)
              if (row >= 0 && w(i) != 0.0f) {
                val off = phi.offset(row)
                val pwd = VectorOps.dotSlice(phi.flat, off, theta)
                if (math.abs(pwd) >= eps) {
                  var a = acc.get(row)
                  if (a == null) { a = new Array[Float](T); acc.put(row, a) }
                  val alpha = w(i) / pwd
                  var k2 = 0
                  while (k2 < T) { a(k2) += alpha * theta(k2); k2 += 1 }
                }
              }
              i += 1
            }
          }
        }

        // ---- cumulative score partials (perplexity: score/perplexity.cc:30-260)
        var normalizer = 0.0
        i = 0
        while (i < nTok) { normalizer += w(i); i += 1 }
        var raw = 0.0
        var zeroWords = 0L
        i = 0
        while (i < nTok) {
          if (math.abs(w(i)) >= eps) {
            var sum = 0.0
            val row = idx(i)
            if (row >= 0) {
              val off = phi.offset(row)
              var k = 0
              while (k < T) { sum += theta(k) * phi.flat(off + k); k += 1 }
            } else {
              // token missing from the model: φ factor stays 1.0
              var k = 0
              while (k < T) { sum += theta(k); k += 1 }
            }
            if (math.abs(sum) < eps) {
              sum = w(i) / normalizer // document-unigram fallback
              zeroWords += 1
            }
            raw += w(i) * math.log(sum)
          }
          i += 1
        }

        var thetaZeros = 0L
        var k = 0
        while (k < T) { if (theta(k) == 0.0f) thetaZeros += 1; k += 1 }

        EStepOut(1, null, null, theta.clone(), doc.doc_id, doc.title,
          raw, normalizer, zeroWords, thetaZeros, nTok.toLong)
      }

      def nwtRows: Iterator[EStepOut] = {
        import scala.jdk.CollectionConverters._
        acc.entrySet().iterator().asScala.map { e =>
          val row = e.getKey
          val a = e.getValue
          val off = phi.offset(row)
          val out = new Array[Float](T)
          var k = 0
          // n_wt = φ_wt ∘ Σ_d (n_dw/p_wd)θ_td, scaled by batch weight —
          // the φ product applied AFTER the doc sum, as in the reference
          while (k < T) { out(k) = phi.flat(off + k) * a(k) * cfg.batchWeight; k += 1 }
          EStepOut(0, phi.classIds(row), phi.tokens(row), out,
            -1L, null, 0.0, 0.0, 0L, 0L, 0L)
        }
      }

      docRows ++ nwtRows
    }
  }

  /** Split an E-step output into (n_wt, theta) DataFrames. Callers should
    * persist `out` first — both branches scan it once. */
  def nwt(out: Dataset[EStepOut]): DataFrame =
    out.filter(col("kind") === 0)
      .groupBy(col("class_id"), col("token"))
      .agg(VectorOps.vectorSum(col("vec")).as("weights"))

  def theta(out: Dataset[EStepOut]): DataFrame =
    out.filter(col("kind") === 1)
      .select(col("doc_id"), col("title"), col("vec").as("weights"))
}
