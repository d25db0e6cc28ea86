package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.PhiRow
import graft.functions.{Rng, VectorOps}

/** Phi-matrix lifecycle operators: initialize / normalize / merge.
  * Reference: src/artm/core/master_component.cc:587-705 (init), :1047-1088 +
  * phi_matrix_operations.cc:383-446 (normalize), :937-1013 (merge).
  *
  * Phi matrices are DataFrames [class_id, token, weights: array<float>].
  * All three operators are single-shuffle (or shuffle-free) transforms:
  * initialize is a narrow map over the dictionary; normalize is one
  * per-class vector-sum aggregate broadcast back; merge is a unionByName +
  * one groupBy. */
object PhiOps {

  val eps: Float = 1e-16f // reference kProcessorEps, processor_helpers.h:27

  /** InitializeModel: one row per dictionary token (optionally restricted
    * to `classIds`), filled with the deterministic hash-seeded random
    * simplex vector (reference master_component.cc:587-705 +
    * helpers.cc:79-140). Deterministic per token — independent of
    * partitioning, matching repeatable_result_test.cc's guarantee.
    *
    * Sparse init (reference :663-691): with denseInitRate < 1, only the
    * top denseInitRate fraction of tokens BY TF get dense vectors; the
    * rest draw with `guaranteedZerosRate` zeros. The dense set is chosen
    * by a tf threshold (distributed TakeOrdered top-k, not a global rank
    * window); ties at the boundary go sparse — a documented deviation
    * from the reference's exact index cut, still a pure function of the
    * dictionary. */
  def initializeModel(dict: DataFrame, numTopics: Int, seed: Int = -1,
      classIds: Seq[String] = Nil,
      denseInitRate: Float = 1.0f, guaranteedZerosRate: Float = 0.0f): DataFrame = {
    val spark = dict.sparkSession
    import spark.implicits._
    val filtered =
      if (classIds.isEmpty) dict else dict.filter($"class_id".isin(classIds: _*))
    val useSparseInit = denseInitRate < 1.0f && guaranteedZerosRate > 0.0f
    val withDense =
      if (!useSparseInit) filtered.withColumn("_dense", lit(true))
      else {
        val n = filtered.count()
        val numDense = (n * denseInitRate).toLong
        if (numDense >= n) filtered.withColumn("_dense", lit(true))
        else if (numDense <= 0) filtered.withColumn("_dense", lit(false))
        else {
          val threshold = filtered.select($"tf").orderBy($"tf".desc)
            .limit(numDense.toInt + 1).agg(min($"tf")).as[Float].head()
          filtered.withColumn("_dense", $"tf" > threshold)
        }
      }
    val init = udf { (classId: String, token: String, dense: Boolean) =>
      Rng.seededTokenVector(numTopics, classId, token, seed,
        if (dense) 0.0f else guaranteedZerosRate)
    }
    val seeded = withDense.select($"class_id", $"token",
      init($"class_id", $"token", $"_dense").as("weights"))
    // reference master_component.cc:699 — FindPwt: per-(class, topic)
    // normalization over tokens turns the seeded rows into a stochastic Phi
    normalizeModel(seeded)
  }

  /** NormalizeModel: p_wt = max(n_wt + r_wt, 0) / n_t with the normalizer
    * n_t = Σ_{w in class} positive(n_wt + r_wt) computed PER (class_id,
    * topic); values below eps flush to zero (denormal clamp, reference
    * phi_matrix_operations.cc:383-446).
    *
    * Plan shape: one groupBy(class_id) vector-sum (few rows out — one per
    * modality) broadcast-joined back; the division is a codegen'd
    * higher-order zip_with. No second shuffle. */
  /** Hash-range count for the huge-vocab ordered normalizer fold (see
    * [[normalizeModel]] vocabRanges): per-(class, range) buffer ≈
    * vocab / 4096, and the cross-range tree adds ⌈log_256(4096)⌉ = 2
    * levels — flat per-group memory without the broadcast-vocab bound. */
  val HugeVocabNormalizerRanges = 4096

  def normalizeModel(nwt: DataFrame, rwt: Option[DataFrame] = None,
      ordered: Boolean = true,
      /** > 0 (with ordered): fold each class's normalizer as a TREE —
        * tokens hash into this many ranges, each range folds in token
        * order, range sums fold by range ordinal (EStep.orderedTreeFold)
        * — so no group ever buffers the whole vocabulary. For the
        * join-phi huge-vocab path, where the single-level token-ordered
        * fold's vocab-sized buffer is exactly the bound that path
        * exists to avoid. 0 = single-level fold (the broadcast-Phi
        * paths; ≤ vocab-sized buffer, the bound the broadcast already
        * carries). Both are deterministic; they differ in float32
        * association, so a fit must pick one and stay with it. */
      vocabRanges: Int = 0): DataFrame = {
    val spark = nwt.sparkSession
    import spark.implicits._

    val adjusted = rwt match {
      case None => nwt.select($"class_id", $"token", $"weights")
      case Some(r) =>
        nwt.join(r.select($"class_id", $"token", $"weights".as("r_weights")),
            Seq("class_id", "token"), "left")
          .select($"class_id", $"token",
            when($"r_weights".isNull, $"weights")
              .otherwise(zip_with($"weights", $"r_weights", (n, rr) => (n + rr).cast("float")))
              .as("weights"))
    }

    // positive part only feeds the normalizer (reference FindNormalizersImpl).
    // ordered: fold token rows in token order so the float32 per-topic
    // normalizer is shuffle-merge-order-independent (the nwt fold's
    // determinism is useless if the divisor still races — see
    // EStep.nwt); buffer is vocab-sized, the same bound as the broadcast
    // Phi this path already carries. The join-phi (huge-vocab) fit
    // passes ordered=false with its unordered nwt.
    val positive = adjusted.select($"class_id", $"token",
      transform($"weights", w => when(w > 0f, w).otherwise(lit(0f))).as("pos"))
    val normalizers =
      if (ordered && vocabRanges > 0)
        // two-level: token-ordered fold within each hash range, then the
        // range sums through the ordinal tree (constant token column —
        // orderedTreeFold groups on (class_id, token), so lit("") makes
        // the group per class)
        EStep.orderedTreeFold(
          positive.groupBy($"class_id",
              pmod(hash($"token"), lit(vocabRanges)).cast("long").as("fk"))
            .agg(VectorOps.orderedVectorSum($"token", $"pos").as("vec"))
            .withColumn("token", lit("")),
          vocabRanges.toLong)
          .select($"class_id", $"weights".as("n_t"))
      else if (ordered)
        positive.groupBy($"class_id")
          .agg(VectorOps.orderedVectorSum($"token", $"pos").as("n_t"))
      else
        positive.groupBy($"class_id")
          .agg(VectorOps.vectorSum($"pos").as("n_t"))

    adjusted
      .join(broadcast(normalizers), Seq("class_id"))
      .select($"class_id", $"token",
        zip_with($"weights", $"n_t", (w, nt) => {
          val v = when(w > 0f, w).otherwise(lit(0f)) / nt
          when(nt <= 0f, lit(0f))
            .when(v < lit(eps), lit(0f))
            .otherwise(v)
            .cast("float")
        }).as("weights"))
  }

  /** MergeModel: target = Σ_i weight_i · source_i, aligned by (class_id,
    * token); missing tokens count as zero (reference
    * master_component.cc:937-1013). One union + one groupBy shuffle. */
  def mergeModels(sources: Seq[(DataFrame, Float)]): DataFrame = {
    require(sources.nonEmpty, "mergeModels needs at least one source")
    // source-ordinal fold key: the per-token weighted sum runs in source
    // order regardless of union-branch completion order (the float32
    // determinism contract — see VectorOps.orderedVectorSum); buffer =
    // one entry per source
    val weighted = sources.zipWithIndex.map { case ((df, w), i) =>
      df.select(col("class_id"), col("token"), col("weights"),
        lit(w).as("w"), lit(f"$i%04d").as("src"))
    }.reduce(_ unionByName _)
    weighted.groupBy(col("class_id"), col("token"))
      .agg(VectorOps.orderedWeightedVectorSum(
        col("src"), col("weights"), col("w")).as("weights"))
  }

  /** Retrieval (get_phi dense/sparse) — reference
    * phi_matrix_operations.cc:93-190: dense = as-is; sparse = explode to
    * (class_id, token, topic, weight) rows with |w| > eps. */
  def explodePhi(phi: DataFrame, sparseEps: Double = 1e-37): DataFrame = {
    phi.select(col("class_id"), col("token"), posexplode(col("weights")).as(Seq("topic", "weight")))
      .filter(abs(col("weight")) > sparseEps)
  }

  /** get_theta sparse retrieval (MatrixLayout sparse,
    * phi_matrix_operations.cc:178-188 applied to theta): explode to
    * (doc_id, title, topic, weight) rows above `sparseEps`. */
  def explodeTheta(theta: DataFrame, sparseEps: Double = 1e-37): DataFrame =
    theta.select(col("doc_id"), col("title"),
      posexplode(col("weights")).as(Seq("topic", "weight")))
      .filter(abs(col("weight")) > sparseEps)

  /** ReconfigureTopicName / reshape_topics — keep matched topic columns by
    * name, new topics zero-filled (reference master_component.cc:728-732).*/
  def reshapeTopics(phi: DataFrame, oldNames: Seq[String], newNames: Seq[String]): DataFrame = {
    val idx = oldNames.zipWithIndex.toMap
    val mapping = newNames.map(n => idx.getOrElse(n, -1)).toArray
    val remap = udf { (w: Seq[Float]) => mapping.map(i => if (i >= 0) w(i) else 0.0f) }
    phi.withColumn("weights", remap(col("weights")))
  }

  /** Rebuild a Phi DataFrame from its collected local form — a local
    * relation with no upstream lineage (used by the fit loops to cut the
    * per-pass plan chain). */
  def phiFromLocal(spark: SparkSession, phi: PhiLocal): DataFrame = {
    import spark.implicits._
    val rows = (0 until phi.numTokens).map { i =>
      PhiRow(phi.classIds(i), phi.tokens(i),
        java.util.Arrays.copyOfRange(phi.flat, phi.offset(i), phi.offset(i) + phi.numTopics))
    }
    spark.createDataset(rows).toDF()
  }

  /** Collect a Phi DataFrame into the compact broadcast-ready local form
    * used by the E-step kernel. Vocab×topics floats must fit on one
    * executor — same constraint as the reference's in-RAM PhiMatrix; for
    * larger models slice by class_id/token range and run the E-step per
    * slice (see EStep scaladoc). */
  def collectPhi(phi: DataFrame, topicCount: Int,
      packSparse: Boolean = false, minSparsityRate: Double = 0.6): PhiLocal = {
    val rows = phi.select("class_id", "token", "weights").collect()
    val n = rows.length
    val classIds = new Array[String](n)
    val tokens = new Array[String](n)
    val flat = new Array[Float](n * topicCount)
    var i = 0
    while (i < n) {
      val r = rows(i)
      classIds(i) = r.getString(0)
      tokens(i) = r.getString(1)
      val w = r.getSeq[Float](2)
      require(w.length == topicCount, s"phi row has ${w.length} topics, expected $topicCount")
      var k = 0
      while (k < topicCount) { flat(i * topicCount + k) = w(k); k += 1 }
      i += 1
    }
    val local = new PhiLocal(classIds, tokens, flat, topicCount)
    if (packSparse) local.packSparse(minSparsityRate)
    local
  }
}

/** Executor-local dense Phi: token-major flat float array + token index.
  * The Spark analogue of the reference's DensePhiMatrix
  * (core/dense_phi_matrix.h:129-165), shipped via broadcast().
  *
  * Rows whose zero-ratio reaches `minSparsityRate` can be packed into
  * (indices, values) pairs (reference PackedValues,
  * dense_phi_matrix.h:103-127 + the sparse kernel path
  * processor_helpers.cc:445-461, config use_sparse_computation /
  * min_sparsity_rate default 0.6): the E-step's dot/axpy then skip the
  * zeros — bit-identical results (zero terms contribute exactly 0 to the
  * float sums) at a fraction of the work on sparsified models. */
final class PhiLocal(
    val classIds: Array[String],
    val tokens: Array[String],
    val flat: Array[Float],
    val numTopics: Int) extends Serializable {

  /** per-row packed nonzeros; null entry = dense row. Null array = no
    * packing (all rows dense). */
  private var sparseIdx: Array[Array[Int]] = null
  private var sparseVal: Array[Array[Float]] = null

  def packSparse(minSparsityRate: Double): Unit = {
    val n = numTokens
    sparseIdx = new Array[Array[Int]](n)
    sparseVal = new Array[Array[Float]](n)
    var row = 0
    while (row < n) {
      val off = offset(row)
      var nnz = 0
      var k = 0
      while (k < numTopics) { if (flat(off + k) != 0.0f) nnz += 1; k += 1 }
      if (numTopics - nnz >= minSparsityRate * numTopics) {
        val idx = new Array[Int](nnz)
        val v = new Array[Float](nnz)
        var j = 0
        k = 0
        while (k < numTopics) {
          if (flat(off + k) != 0.0f) { idx(j) = k; v(j) = flat(off + k); j += 1 }
          k += 1
        }
        sparseIdx(row) = idx
        sparseVal(row) = v
      }
      row += 1
    }
  }

  /** dot(phi[row], theta) honoring sparse packing. */
  def dotRow(row: Int, theta: Array[Float]): Float = {
    if (sparseIdx != null && sparseIdx(row) != null) {
      val idx = sparseIdx(row); val v = sparseVal(row)
      var s = 0.0f
      var j = 0
      while (j < idx.length) { s += v(j) * theta(idx(j)); j += 1 }
      s
    } else graft.functions.VectorOps.dotSlice(flat, offset(row), theta)
  }

  /** out += alpha · phi[row] honoring sparse packing. */
  def axpyRow(alpha: Float, row: Int, out: Array[Float]): Unit = {
    if (sparseIdx != null && sparseIdx(row) != null) {
      val idx = sparseIdx(row); val v = sparseVal(row)
      var j = 0
      while (j < idx.length) { out(idx(j)) += alpha * v(j); j += 1 }
    } else graft.functions.VectorOps.axpySlice(alpha, flat, offset(row), out)
  }

  @transient lazy val index: java.util.HashMap[String, Integer] = {
    val m = new java.util.HashMap[String, Integer](classIds.length * 2)
    var i = 0
    while (i < classIds.length) {
      m.put(key(classIds(i), tokens(i)), i)
      i += 1
    }
    m
  }

  @inline def key(classId: String, token: String): String = classId + "\u0000" + token

  /** phi row index for (class, token), or -1. */
  def rowIndex(classId: String, token: String): Int = {
    val v = index.get(key(classId, token))
    if (v == null) -1 else v.intValue()
  }

  def numTokens: Int = classIds.length
  @inline def offset(row: Int): Int = row * numTopics
}
