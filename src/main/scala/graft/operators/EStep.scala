package graft.operators

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import graft.core.{Doc, DocWithTheta}
import graft.functions.{Rng, VectorOps}
import graft.regularizers.PtdwAgent

/** Per-document theta regularizer agent — the Spark mirror of the
  * reference's RegularizeThetaAgent (regularizer_interface.h:27-57): called
  * once per inner iteration, adds increments to r_td from the current
  * (unnormalized) n_td. Must be Serializable (ships inside the kernel
  * closure); per-item data goes through broadcast variables. */
trait ThetaAgent extends Serializable {
  def apply(title: String, docId: Long, innerIter: Int,
      nTd: Array[Float], rTd: Array[Float]): Unit
}

/** A batch-level theta regularizer agent: sees ALL items of a batch each
  * inner iteration (the reference's RegularizeThetaAgent matrix overload,
  * regularizer_interface.h:38-44 — needed by HierarchySparsingTheta whose
  * increments depend on cross-item topic proportions). Used by the joint
  * E-step (EStep.runJoint) on small pseudo-batches. */
trait BatchThetaAgent extends Serializable {
  def apply(innerIter: Int, titles: Array[String],
      nTd: Array[Array[Float]], rTd: Array[Array[Float]]): Unit
}

/** ProcessBatches configuration — reference messages.proto
  * ProcessBatchesArgs. `docNwtWeightByTitle` is the per-pseudo-batch
  * weight used by hARTM (reference batch_weight,
  * master_component.cc:1627). */
case class EStepConfig(
    numDocumentPasses: Int = 10,                  // messages.proto:664 default
    classWeights: Map[String, Float] = Map.empty, // empty = every class weight 1
    transactionWeights: Map[String, Float] = Map.empty, // empty = no tt weighting
    batchWeight: Float = 1.0f,
    docNwtWeightByTitle: Map[String, Float] = Map.empty,
    useRandomTheta: Boolean = false,              // messages.proto:675 default
    thetaSeed: Int = 0,
    /** use_sparse_computation (messages.proto:799-800): pack near-zero phi
      * rows before broadcast so the dense kernel skips zeros. Bit-identical
      * output (zero terms add exactly 0). */
    useSparseComputation: Boolean = false,
    thetaAgents: Seq[ThetaAgent] = Nil,
    ptdwAgents: Seq[PtdwAgent] = Nil,
    emitPtdw: Boolean = false,
    computeNwt: Boolean = true,
    /** p(c|d) prediction over this label class (transform predict mode) */
    predictClassId: Option[String] = None) {
  def usePtdw: Boolean = ptdwAgents.nonEmpty || emitPtdw
}

/** One output row of the E-step: an n_wt partial (kind 0), a per-document
  * result carrying theta + cumulative-score partials (kind 1), or — when
  * requested — one p(t|d,w) row per token position (kind 2). The wide-row
  * union keeps the kernel single-pass. */
case class EStepOut(
    kind: Int,
    class_id: String, token: String,
    vec: Array[Float],
    doc_id: Long, title: String, position: Int,
    raw: Double, normalizer: Double, zero_words: Long,
    theta_zeros: Long, doc_len: Long)

/** The E-step — the one genuinely custom operator of the engine (reference
  * core/processor.cc:50-292, processor_helpers.cc:384-589 dense path,
  * :261-382 ptdw path, processor_transaction_helpers.cc:28-161
  * transaction path).
  *
  * For each document: resolve tokens against a broadcast Phi, run the
  * local EM inner loop (dense / ptdw / transaction variant), then emit
  * (a) per-token n_wt partials pre-combined in per-partition hash maps
  * (map-side combine — the shuffle then merges one partial per
  * (partition, token)), and (b) the document's theta row + perplexity /
  * sparsity partials, and optionally (c) ptdw rows.
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

  val eps: Float = 1e-16f          // reference helpers.h:62
  val txnEps: Double = 1e-100      // reference processor_transaction_helpers.cc:9

  def run(docs: Dataset[Doc], bPhi: Broadcast[PhiLocal], cfg: EStepConfig): Dataset[EStepOut] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.mapPartitions { it =>
      kernel(it.map(d => (d, null: Array[Float])), bPhi.value, cfg)
    }
  }

  /** E-step with per-document initial theta (reuse_theta): documents whose
    * theta0 is null fall back to the default init. */
  def runWithInit(docs: Dataset[DocWithTheta], bPhi: Broadcast[PhiLocal],
      cfg: EStepConfig): Dataset[EStepOut] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.mapPartitions { it =>
      kernel(it.map(dt => (dt.doc, dt.theta0)), bPhi.value, cfg)
    }
  }

  /** One (doc, needed-phi-row) pair of the join-based E-step. */
  private[operators] case class DocPhiRow(
      doc_id: Long, class_id: String, token: String, weights: Array[Float])

  /** Join-based E-step — the scale path for Phi matrices too large to
    * broadcast (10M vocab × 1k topics ≫ executor memory). Instead of
    * shipping the whole Phi to every executor, each document is joined
    * with exactly the Phi rows it touches:
    *
    *   distinct (doc, class, token)  ⋈  pwt   (shuffle hash join on token)
    *   cogroup by doc_id with the original docs (co-partitioned shuffle)
    *   per-doc mini-Phi → the SAME per-document kernel as the broadcast
    *   path (bit-identical per-doc math — token order preserved)
    *
    * Shuffle volume per pass = Σ_d |distinct tokens(d)| rows of T floats —
    * linear in corpus size, independent of vocabulary size; Phi itself
    * stays distributed (no driver collect, no single-executor constraint).
    * n_wt partials are per-document here (no partition-level pre-combine),
    * but the downstream vectorSum aggregate still partial-aggregates
    * map-side before its shuffle. */
  def runJoinBased(docs: Dataset[Doc], pwt: DataFrame, numTopics: Int,
      cfg: EStepConfig): Dataset[EStepOut] = {
    val spark = docs.sparkSession
    import spark.implicits._
    val needed = docs.flatMap { d =>
      val seen = new java.util.HashSet[String]()
      d.tokens.iterator
        .filter(t => seen.add(t.class_id + "\u0001" + t.token))
        .map(t => (d.doc_id, t.class_id, t.token))
    }.toDF("doc_id", "class_id", "token")
    val joined = needed
      .join(pwt.select(col("class_id"), col("token"), col("weights")), Seq("class_id", "token"))
      .select(col("doc_id"), col("class_id"), col("token"), col("weights"))
      .as[DocPhiRow]
    docs.groupByKey(_.doc_id).cogroup(joined.groupByKey(_.doc_id)) { (_, dIt, rIt) =>
      // materialize the phi rows ONCE per key, before iterating documents:
      // rIt is a one-shot iterator, and evaluating it lazily inside the
      // docs flatMap would hand every doc after the first an empty
      // mini-Phi if a doc_id ever appeared twice
      val rows = rIt.toArray
      val classIds = rows.map(_.class_id)
      val toks = rows.map(_.token)
      val flat = new Array[Float](rows.length * numTopics)
      var i = 0
      while (i < rows.length) {
        val w = rows(i).weights
        require(w.length == numTopics, s"phi row has ${w.length} topics, expected $numTopics")
        System.arraycopy(w, 0, flat, i * numTopics, numTopics)
        i += 1
      }
      val miniPhi = new PhiLocal(classIds, toks, flat, numTopics)
      // kind-0 partials here are PER DOCUMENT (one kernel call per doc), so
      // tag them with the doc id — [[nwtOrderedByDoc]] derives a unique
      // deterministic fold key from (doc_id, pre/raw parity), giving the
      // huge-vocab path the same any-executor-count bit-reproducibility as
      // the broadcast path (opt-in via Fit.Config.orderedJoinPhi). The
      // unordered sum ignores the tag, so the default path is unchanged.
      dIt.flatMap(doc => kernel(Iterator((doc, null)), miniPhi, cfg).map { o =>
        if (o.kind == 0) o.copy(doc_id = doc.doc_id) else o
      })
    }
  }

  private def kernel(it: Iterator[(Doc, Array[Float])], phi: PhiLocal,
      cfg: EStepConfig): Iterator[EStepOut] = {
    locally {
      val T = phi.numTopics
      val useClassWeights = cfg.classWeights.nonEmpty
      // phi row -> Σ_d (n_dw/p_wd)·θ_d — multiplied by φ at flush (dense path)
      val accPre = new java.util.HashMap[Int, Array[Float]]()
      // phi row -> already-final contributions (txn / ptdw paths)
      val accRaw = new java.util.HashMap[Int, Array[Float]]()

      def addTo(map: java.util.HashMap[Int, Array[Float]], row: Int,
          scale: Float, vec: Array[Float]): Unit = {
        var a = map.get(row)
        if (a == null) { a = new Array[Float](T); map.put(row, a) }
        var k = 0
        while (k < T) { a(k) += scale * vec(k); k += 1 }
      }

      val docRows: Iterator[EStepOut] = it.flatMap { case (doc, theta0) =>
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
        val docW = cfg.docNwtWeightByTitle.getOrElse(doc.title, 1.0f)

        // ---- theta init (reference processor_helpers.cc:73-112; cached
        // theta first, as in the reference's reuse_theta branch) ----
        val theta = new Array[Float](T)
        if (theta0 != null && theta0.length == T) {
          System.arraycopy(theta0, 0, theta, 0, T)
        } else if (cfg.useRandomTheta) {
          val h = {
            var hh = java.lang.Long.rotateLeft(doc.title.hashCode.toLong, 17) ^ doc.doc_id
            if (cfg.thetaSeed != 0) hh = 31 * hh + cfg.thetaSeed
            hh
          }
          System.arraycopy(Rng.generateRandomVector(T, h), 0, theta, 0, T)
        } else {
          java.util.Arrays.fill(theta, 1.0f / T)
        }

        val isTxnDoc = doc.txns.nonEmpty &&
          (cfg.transactionWeights.nonEmpty || doc.txns.exists(_.length > 1))

        var ptdwRows: Iterator[EStepOut] = Iterator.empty
        if (hasTokens) {
          if (isTxnDoc) runTransactionDoc(doc, phi, cfg, idx, w, theta, docW, accRaw, addTo)
          else if (cfg.usePtdw) {
            val ptdw = runPtdwDoc(doc, phi, cfg, idx, w, theta, docW, accRaw, addTo)
            if (cfg.emitPtdw) ptdwRows = ptdw.iterator.zipWithIndex.collect {
              case (row, pos) if row != null =>
                EStepOut(2, doc.tokens(pos).class_id, doc.tokens(pos).token, row,
                  doc.doc_id, doc.title, pos, 0.0, 0.0, 0L, 0L, 0L)
            }
          } else runDenseDoc(doc, phi, cfg, idx, w, theta, docW, accPre, addTo)
        }

        // ---- cumulative score partials (perplexity: score/perplexity.cc)
        val (raw, normalizer, zeroWords) = perplexityPartials(doc, phi, cfg, idx, w, theta, isTxnDoc)

        var thetaZeros = 0L
        var k = 0
        while (k < T) { if (theta(k) == 0.0f) thetaZeros += 1; k += 1 }

        Iterator.single(EStepOut(1, null, null, theta.clone(), doc.doc_id, doc.title, -1,
          raw, normalizer, zeroWords, thetaZeros, nTok.toLong)) ++ ptdwRows
      }

      def nwtRows: Iterator[EStepOut] = {
        import scala.jdk.CollectionConverters._
        val pre = accPre.entrySet().iterator().asScala.map { e =>
          val row = e.getKey
          val a = e.getValue
          val off = phi.offset(row)
          val out = new Array[Float](T)
          var k = 0
          // n_wt = φ_wt ∘ Σ_d (n_dw/p_wd)θ_td · batch_weight — the φ
          // product applied AFTER the doc sum, as in the reference
          while (k < T) { out(k) = phi.flat(off + k) * a(k) * cfg.batchWeight; k += 1 }
          row -> out
        }
        val raw = accRaw.entrySet().iterator().asScala.map { e =>
          val out = e.getValue.clone()
          var k = 0
          while (k < T) { out(k) *= cfg.batchWeight; k += 1 }
          e.getKey -> out
        }
        // kind-0 rows carry a deterministic fold key in `position`:
        // 2·partitionId for the dense pre-combined partial, 2·pid+1 for
        // the raw (ptdw/transaction) one — unique per (token, partition),
        // so EStep.nwt can sum partials in a shuffle-order-independent
        // order (see VectorOps.orderedVectorSum)
        val pid = org.apache.spark.TaskContext.getPartitionId()
        pre.map { case (row, out) =>
          EStepOut(0, phi.classIds(row), phi.tokens(row), out,
            -1L, null, 2 * pid, 0.0, 0.0, 0L, 0L, 0L)
        } ++ raw.map { case (row, out) =>
          EStepOut(0, phi.classIds(row), phi.tokens(row), out,
            -1L, null, 2 * pid + 1, 0.0, 0.0, 0L, 0L, 0L)
        }
      }

      docRows ++ nwtRows
    }
  }

  /** dense path — processor_helpers.cc:384-589 (see scaladoc above). */
  private def runDenseDoc(doc: Doc, phi: PhiLocal, cfg: EStepConfig,
      idx: Array[Int], w: Array[Float], theta: Array[Float], docW: Float,
      acc: java.util.HashMap[Int, Array[Float]],
      addTo: (java.util.HashMap[Int, Array[Float]], Int, Float, Array[Float]) => Unit): Unit = {
    val T = phi.numTopics
    val nTok = idx.length
    val nTd = new Array[Float](T)
    val rTd = new Array[Float](T)
    var pass = 0
    while (pass < cfg.numDocumentPasses) {
      java.util.Arrays.fill(nTd, 0.0f)
      var i = 0
      while (i < nTok) {
        val row = idx(i)
        if (row >= 0) {
          val pdw = phi.dotRow(row, theta)
          if (math.abs(pdw) >= eps) {
            phi.axpyRow(w(i) / pdw, row, nTd)
          }
        }
        i += 1
      }
      var k = 0
      while (k < T) { theta(k) *= nTd(k); k += 1 }
      applyAgentsAndNormalize(doc, cfg, pass, theta, rTd)
      pass += 1
    }

    if (cfg.computeNwt) {
      var i = 0
      while (i < nTok) {
        val row = idx(i)
        if (row >= 0 && w(i) != 0.0f) {
          val pwd = phi.dotRow(row, theta)
          if (math.abs(pwd) >= eps) {
            addTo(acc, row, docW * w(i) / pwd, theta)
          }
        }
        i += 1
      }
    }
  }

  /** ptdw path — processor_helpers.cc:261-382. Returns the final ptdw
    * matrix (rows aligned with doc.tokens; null row = token not in model). */
  private def runPtdwDoc(doc: Doc, phi: PhiLocal, cfg: EStepConfig,
      idx: Array[Int], w: Array[Float], theta: Array[Float], docW: Float,
      acc: java.util.HashMap[Int, Array[Float]],
      addTo: (java.util.HashMap[Int, Array[Float]], Int, Float, Array[Float]) => Unit): Array[Array[Float]] = {
    val T = phi.numTopics
    val nTok = idx.length
    val ptdw = new Array[Array[Float]](nTok)
    var i = 0
    while (i < nTok) { if (idx(i) >= 0) ptdw(i) = new Array[Float](T); i += 1 }
    val nTd = new Array[Float](T)
    val rTd = new Array[Float](T)

    var pass = 0
    while (pass <= cfg.numDocumentPasses) { // inclusive: one extra ptdw refresh
      val last = pass == cfg.numDocumentPasses
      i = 0
      while (i < nTok) {
        val row = idx(i)
        if (row >= 0) {
          val off = phi.offset(row)
          var pdw = 0.0f
          var k = 0
          while (k < T) {
            val v = phi.flat(off + k) * theta(k)
            ptdw(i)(k) = v
            pdw += v
            k += 1
          }
          if (math.abs(pdw) >= eps) {
            val z = 1.0f / pdw
            k = 0
            while (k < T) { ptdw(i)(k) *= z; k += 1 }
          }
        }
        i += 1
      }
      cfg.ptdwAgents.foreach(_.apply(doc.title, doc.doc_id, pass,
        ptdw.filter(_ != null))) // agents see only in-model positions, in order

      if (!last) {
        java.util.Arrays.fill(nTd, 0.0f)
        i = 0
        while (i < nTok) {
          if (ptdw(i) != null) {
            var k = 0
            while (k < T) { nTd(k) += w(i) * ptdw(i)(k); k += 1 }
          }
          i += 1
        }
        System.arraycopy(nTd, 0, theta, 0, T) // replacement, not product
        applyAgentsAndNormalize(doc, cfg, pass, theta, rTd)
      } else if (cfg.computeNwt) {
        i = 0
        while (i < nTok) {
          if (ptdw(i) != null && w(i) != 0.0f) {
            addTo(acc, idx(i), docW * w(i), ptdw(i))
          }
          i += 1
        }
      }
      pass += 1
    }
    ptdw
  }

  /** transaction path — processor_transaction_helpers.cc:28-161:
    * p(x|t) = θ_t · Π_{w∈x} φ_wt; n_kdx = weight of the transaction's
    * first token; theta replaced (not multiplied) each pass; one extra
    * inner pass, as in the reference. Transactions containing tokens
    * missing from the model are skipped (the reference's behavior on
    * missing tokens is undefined). */
  private def runTransactionDoc(doc: Doc, phi: PhiLocal, cfg: EStepConfig,
      idx: Array[Int], w: Array[Float], theta: Array[Float], docW: Float,
      acc: java.util.HashMap[Int, Array[Float]],
      addTo: (java.util.HashMap[Int, Array[Float]], Int, Float, Array[Float]) => Unit): Unit = {
    val T = phi.numTopics
    val useTt = cfg.transactionWeights.nonEmpty
    val txns = doc.txns
    val nTd = new Array[Float](T)
    val rTd = new Array[Float](T)
    val helper = new Array[Double](T)

    def txnHelper(t: graft.core.Txn): Double = {
      // helper[k] = θ_k · Π φ; returns p_dx = Σ_k helper[k]; -1 if skipped
      var k = 0
      while (k < T) { helper(k) = theta(k); k += 1 }
      var j = t.start
      val end = t.start + t.length
      while (j < end) {
        val row = idx(j)
        if (row < 0) return -1.0
        val off = phi.offset(row)
        k = 0
        while (k < T) { helper(k) *= phi.flat(off + k); k += 1 }
        j += 1
      }
      var p = 0.0
      k = 0
      while (k < T) { p += helper(k); k += 1 }
      p
    }

    var pass = 0
    while (pass <= cfg.numDocumentPasses) { // inclusive, as in the reference
      java.util.Arrays.fill(nTd, 0.0f)
      txns.foreach { t =>
        if (t.length > 0) {
          val ttW = if (useTt) cfg.transactionWeights.getOrElse(t.tt_name, 0.0f) else 1.0f
          if (ttW != 0.0f) {
            val nKdx = w(t.start)
            val pDx = txnHelper(t)
            if (pDx >= txnEps) {
              var k = 0
              while (k < T) { nTd(k) += (ttW * nKdx * helper(k) / pDx).toFloat; k += 1 }
            }
          }
        }
      }
      System.arraycopy(nTd, 0, theta, 0, T)
      applyAgentsAndNormalize(doc, cfg, pass, theta, rTd)
      pass += 1
    }

    if (cfg.computeNwt) {
      val values = new Array[Float](T)
      txns.foreach { t =>
        if (t.length > 0) {
          val ttW = if (useTt) cfg.transactionWeights.getOrElse(t.tt_name, 0.0f) else 1.0f
          if (ttW != 0.0f) {
            val nKdx = w(t.start)
            val pDx = txnHelper(t)
            if (pDx >= txnEps) {
              var k = 0
              while (k < T) { values(k) = (ttW * helper(k) * nKdx / pDx).toFloat; k += 1 }
              var j = t.start
              while (j < t.start + t.length) {
                addTo(acc, idx(j), docW, values)
                j += 1
              }
            }
          }
        }
      }
    }
  }

  /** regularizer agents + NormalizeThetaAgent (processor_helpers.h:78-100) */
  private def applyAgentsAndNormalize(doc: Doc, cfg: EStepConfig, pass: Int,
      theta: Array[Float], rTd: Array[Float]): Unit = {
    java.util.Arrays.fill(rTd, 0.0f)
    cfg.thetaAgents.foreach(_.apply(doc.title, doc.doc_id, pass, theta, rTd))
    normalizeTheta(theta, rTd)
  }

  /** NormalizeThetaAgent: theta = max(theta + r, 0) normalized, eps flush. */
  private def normalizeTheta(theta: Array[Float], rTd: Array[Float]): Unit = {
    val T = theta.length
    var sum = 0.0f
    var k = 0
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
  }

  /** Joint (whole-batch) dense E-step for small pseudo-batches whose theta
    * regularization needs cross-item state (hARTM's parent pseudo-batch —
    * reference processes it as ONE batch so HierarchySparsingTheta's agent
    * sees the full theta matrix). Coalesces to a single task; the batch is
    * #parentTopics items by construction, so this is never the scale path.
    * Emits the same EStepOut rows as `run` — union the outputs before the
    * n_wt aggregation. */
  def runJoint(docs: Dataset[Doc], bPhi: Broadcast[PhiLocal], cfg: EStepConfig,
      batchAgents: Seq[BatchThetaAgent]): Dataset[EStepOut] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.coalesce(1).mapPartitions { it =>
      val phi = bPhi.value
      val T = phi.numTopics
      val ds = it.toArray
      val n = ds.length
      if (n == 0) Iterator.empty
      else {
        val titles = ds.map(_.title)
        val useClassWeights = cfg.classWeights.nonEmpty
        val idxs = new Array[Array[Int]](n)
        val ws = new Array[Array[Float]](n)
        var d = 0
        while (d < n) {
          val toks = ds(d).tokens
          idxs(d) = new Array[Int](toks.length)
          ws(d) = new Array[Float](toks.length)
          var i = 0
          while (i < toks.length) {
            idxs(d)(i) = phi.rowIndex(toks(i).class_id, toks(i).token)
            val cw = if (useClassWeights) cfg.classWeights.getOrElse(toks(i).class_id, 0.0f) else 1.0f
            ws(d)(i) = toks(i).weight * cw
            i += 1
          }
          d += 1
        }
        val thetas = Array.fill(n)(Array.fill(T)(1.0f / T))
        val rTds = Array.fill(n)(new Array[Float](T))
        val nTd = new Array[Float](T)

        var pass = 0
        while (pass < cfg.numDocumentPasses) {
          // dense theta update for every item first …
          d = 0
          while (d < n) {
            java.util.Arrays.fill(nTd, 0.0f)
            var i = 0
            while (i < idxs(d).length) {
              val row = idxs(d)(i)
              if (row >= 0) {
                val off = phi.offset(row)
                val pdw = VectorOps.dotSlice(phi.flat, off, thetas(d))
                if (math.abs(pdw) >= eps) VectorOps.axpySlice(ws(d)(i) / pdw, phi.flat, off, nTd)
              }
              i += 1
            }
            var k = 0
            while (k < T) { thetas(d)(k) *= nTd(k); k += 1 }
            d += 1
          }
          // … then batch agents see the full n_td matrix, then per-item
          // agents + normalize (reference RegularizeAndNormalizeTheta order)
          rTds.foreach(java.util.Arrays.fill(_, 0.0f))
          batchAgents.foreach(_.apply(pass, titles, thetas, rTds))
          d = 0
          while (d < n) {
            cfg.thetaAgents.foreach(_.apply(titles(d), ds(d).doc_id, pass, thetas(d), rTds(d)))
            normalizeTheta(thetas(d), rTds(d))
            d += 1
          }
          pass += 1
        }

        // n_wt partials + theta/score rows, as in the per-doc kernel
        val acc = new java.util.HashMap[Int, Array[Float]]()
        val out = scala.collection.mutable.ArrayBuffer.empty[EStepOut]
        d = 0
        while (d < n) {
          val doc = ds(d)
          val docW = cfg.docNwtWeightByTitle.getOrElse(doc.title, 1.0f)
          if (cfg.computeNwt) {
            var i = 0
            while (i < idxs(d).length) {
              val row = idxs(d)(i)
              if (row >= 0 && ws(d)(i) != 0.0f) {
                val off = phi.offset(row)
                val pwd = VectorOps.dotSlice(phi.flat, off, thetas(d))
                if (math.abs(pwd) >= eps) {
                  var a = acc.get(row)
                  if (a == null) { a = new Array[Float](T); acc.put(row, a) }
                  val scale = docW * ws(d)(i) / pwd
                  var k = 0
                  while (k < T) { a(k) += scale * thetas(d)(k) * phi.flat(off + k); k += 1 }
                }
              }
              i += 1
            }
          }
          val (raw, normalizer, zeroWords) =
            perplexityPartials(doc, phi, cfg, idxs(d), ws(d), thetas(d), isTxnDoc = false)
          var thetaZeros = 0L
          var k = 0
          while (k < T) { if (thetas(d)(k) == 0.0f) thetaZeros += 1; k += 1 }
          out += EStepOut(1, null, null, thetas(d).clone(), doc.doc_id, doc.title, -1,
            raw, normalizer, zeroWords, thetaZeros, idxs(d).length.toLong)
          d += 1
        }
        // joint-batch partials get their own fold-key range (offset past
        // any plausible partition count) so a union with the per-doc
        // kernel's output keeps every (token, partial) key unique
        val jpid = 1 << 20 | org.apache.spark.TaskContext.getPartitionId()
        acc.forEach { (row, a) =>
          var k = 0
          while (k < T) { a(k) *= cfg.batchWeight; k += 1 }
          out += EStepOut(0, phi.classIds(row), phi.tokens(row), a,
            -1L, null, jpid, 0.0, 0.0, 0L, 0L, 0L)
        }
        out.iterator
      }
    }
  }

  /** perplexity partials — score/perplexity.cc:30-260. For transaction
    * documents each transaction contributes p(x|d) = Σ_t θ_t Π φ;
    * otherwise per-token (tokens missing from the model keep φ = 1). */
  private def perplexityPartials(doc: Doc, phi: PhiLocal, cfg: EStepConfig,
      idx: Array[Int], w: Array[Float], theta: Array[Float],
      isTxnDoc: Boolean): (Double, Double, Long) = {
    val T = phi.numTopics
    var raw = 0.0
    var normalizer = 0.0
    var zeroWords = 0L

    if (isTxnDoc) {
      val useTt = cfg.transactionWeights.nonEmpty
      // normalizer first (fallback needs it complete)
      doc.txns.foreach { t =>
        var tw = 0.0
        var j = t.start
        while (j < t.start + t.length) { tw += w(j); j += 1 }
        val ttW = if (useTt) cfg.transactionWeights.getOrElse(t.tt_name, 0.0f) else 1.0f
        normalizer += ttW * tw
      }
      doc.txns.foreach { t =>
        var tw = 0.0
        var j = t.start
        while (j < t.start + t.length) { tw += w(j); j += 1 }
        if (math.abs(tw) >= eps) {
          var sum = 0.0
          var k = 0
          while (k < T) {
            var p = theta(k).toDouble
            j = t.start
            while (j < t.start + t.length) {
              val row = idx(j)
              if (row >= 0) p *= phi.flat(phi.offset(row) + k)
              j += 1
            }
            sum += p
            k += 1
          }
          if (math.abs(sum) < eps) {
            sum = tw / normalizer
            zeroWords += 1
          }
          raw += tw * math.log(sum)
        }
      }
    } else {
      var i = 0
      while (i < idx.length) { normalizer += w(i); i += 1 }
      i = 0
      while (i < idx.length) {
        if (math.abs(w(i)) >= eps) {
          var sum = 0.0
          val row = idx(i)
          if (row >= 0) {
            val off = phi.offset(row)
            var k = 0
            while (k < T) { sum += theta(k) * phi.flat(off + k); k += 1 }
          } else {
            var k = 0
            while (k < T) { sum += theta(k); k += 1 }
          }
          if (math.abs(sum) < eps) {
            sum = w(i) / normalizer
            zeroWords += 1
          }
          raw += w(i) * math.log(sum)
        }
        i += 1
      }
    }
    (raw, normalizer, zeroWords)
  }

  /** Split an E-step output into (n_wt, theta) DataFrames. Callers should
    * persist `out` first — both branches scan it once.
    *
    * `ordered = true` (the broadcast-kernel paths) folds the per-partition
    * partials in their `position` fold-key order, making the float32 sum
    * independent of shuffle-merge order — the fit is then bit-reproducible
    * at ANY executor count (found under local-cluster[2,4]: task-completion
    * racing flipped 22/31 phi rows between identical runs; the reference's
    * own repeatable_result_test pins num_processors=1). The join-based
    * E-step emits per-DOCUMENT partials — an ordered fold there would
    * buffer df(token) rows per group, corpus-sized — so that path passes
    * `ordered = false` and keeps the reference's weaker per-topology
    * determinism.
    *
    * MEMORY BOUND (round 12): a single ordered fold buffers one partial
    * per fold key per (class, token) group — ~2 × #E-step-partitions for
    * a token appearing everywhere, GB-scale at a 100k-partition fit. So
    * when the key span exceeds [[FoldWidth]], the fold runs as a TREE:
    * group by (class, token, ⌊key/W⌋) folding ≤ W partials in key order
    * per range, then fold the range sums by range ordinal, recursing
    * until one group remains — per-group buffer ≤ W at EVERY level and
    * ⌈log_W(2p)⌉ levels (one extra shuffle each; p ≤ 128 stays
    * single-level, byte-identical to the round-11 plan). The tree is a
    * pure function of the key set, so the result is still deterministic
    * at any executor count / shuffle-partition setting — it differs from
    * the flat fold only in float32 association, which every consumer
    * already absorbs (the flat fold's own association changes with p). */
  def nwt(out: Dataset[EStepOut], ordered: Boolean = true): DataFrame = {
    val partials = out.filter(col("kind") === 0)
    if (ordered) {
      // kind-0 fold keys are 2·pid / 2·pid+1 — span = 2 × #partitions
      val keySpan = 2L * out.rdd.getNumPartitions
      orderedTreeFold(partials.select(col("class_id"), col("token"),
        col("position").cast("long").as("fk"), col("vec")), keySpan)
    } else
      partials
        .groupBy(col("class_id"), col("token"))
        .agg(VectorOps.vectorSum(col("vec")).as("weights"))
  }

  /** Max partials folded per ordered-fold level (see [[nwt]]): per-group
    * buffer stays ≤ this at any partition count. 256 keeps every
    * certified topology (≤ 128 E-step partitions) on the round-11
    * single-level plan. */
  val FoldWidth = 256

  /** Deterministic n_wt for the JOIN-BASED E-step (opt-in via
    * Fit.Config.orderedJoinPhi): its kind-0 partials are per DOCUMENT
    * (doc-tagged by [[runJoinBased]]), so the fold key is
    * 2·(doc_id − minDocId) + pre/raw parity — unique per (class, token)
    * group. Round 13: the fit re-keys the corpus with DENSE doc ranks
    * before the E-step (Fit.fitOfflineJoinPhi denseCtx), so the span
    * here is exactly 2·numDocs — sparse original ids no longer inflate
    * the tree depth. The multi-level tree bounds every level's buffer at
    * [[FoldWidth]] even though the key span is CORPUS-sized (⌈log_W
    * span⌉ grouping levels; most (class, token, range) groups are
    * sparse, so level-0 state is ∝ the partials themselves, spillable
    * hash-agg state — never one corpus-sized group). This EXCEEDS the
    * round-11 contract, which kept the join path on the raced sum
    * because a single-level ordered fold would have buffered df(token)
    * rows per group. */
  def nwtOrderedByDoc(out: Dataset[EStepOut], minDocId: Long,
      maxDocId: Long): DataFrame = {
    val partials = out.filter(col("kind") === 0)
    val span = 2L * (maxDocId - minDocId + 1L)
    orderedTreeFold(partials.select(col("class_id"), col("token"),
      ((col("doc_id") - lit(minDocId)) * 2L +
        pmod(col("position"), lit(2)).cast("long")).as("fk"),
      col("vec")), span)
  }

  /** Multi-level deterministic fold of uniquely-keyed partials
    * [class_id, token, fk, vec] (0 ≤ fk < keySpan) into
    * [class_id, token, weights]. See [[nwt]] for the contract. */
  private[graft] def orderedTreeFold(partials: DataFrame, keySpan: Long): DataFrame = {
    var df = partials
    var span = keySpan
    while (span > FoldWidth) {
      df = df
        .groupBy(col("class_id"), col("token"),
          floor(col("fk") / FoldWidth).cast("long").as("range"))
        .agg(VectorOps.orderedVectorSum(
          lpad(pmod(col("fk"), lit(FoldWidth.toLong)).cast("string"), 8, "0"),
          col("vec")).as("vec"))
        .withColumnRenamed("range", "fk")
      span = (span + FoldWidth - 1) / FoldWidth
    }
    df.groupBy(col("class_id"), col("token"))
      .agg(VectorOps.orderedVectorSum(
        lpad(col("fk").cast("string"), 8, "0"), col("vec")).as("weights"))
  }

  def theta(out: Dataset[EStepOut]): DataFrame =
    out.filter(col("kind") === 1)
      .select(col("doc_id"), col("title"), col("vec").as("weights"))

  /** ptdw retrieval (theta_matrix_type=ptdw) — [doc_id, title, position,
    * class_id, token, weights]. Requires cfg.emitPtdw. */
  def ptdw(out: Dataset[EStepOut]): DataFrame =
    out.filter(col("kind") === 2)
      .select(col("doc_id"), col("title"), col("position"),
        col("class_id"), col("token"), col("vec").as("weights"))
}
