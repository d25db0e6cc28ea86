package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.{Doc, TokenEntry, Txn}

/** hARTM — hierarchical topic modeling driver (reference
  * python/artm/hierarchy_utils.py:18-690 + core/master_component.cc:
  * 1613-1634 parent pseudo-batch).
  *
  * Each level below the root is fit on the original corpus PLUS a
  * pseudo-batch built from the parent level's Phi: one pseudo-document per
  * parent topic (title = topic name) whose tokens are the parent's p_wt
  * column (reference ConvertTopicModelToPseudoBatch,
  * phi_matrix_operations.cc:496-531), weighted into n_wt by
  * `parentWeight` (reference parent_master_model_weight). The child
  * theta rows of the pseudo-documents form Psi = p(child topic | parent
  * topic). */
object Hartm {

  case class LevelResult(fit: FitResult, psi: DataFrame)

  /** Parent Phi → pseudo-documents. One doc per (parent topic, chunk):
    * a single doc per topic would hold the ENTIRE vocabulary in one row
    * (hundreds of MB at 10M vocab — a straggler/row-limit wall), so the
    * vocabulary is hash-split into bounded chunks sharing the topic's
    * title. The E-step weights n_wt by title and theta merges back per
    * title (Hartm.fit), so chunking only re-partitions the pseudo-batch
    * work. Chunk membership is a deterministic token hash — stable across
    * runs and partitionings. */
  def pseudoDocs(pwt: DataFrame, topicNames: Seq[String], sparseEps: Double = 1e-37,
      maxTokensPerChunk: Int = 1 << 18): Dataset[Doc] = {
    val spark = pwt.sparkSession
    import spark.implicits._
    val names = topicNames.toArray
    val vocab = pwt.count()
    val chunks = math.max(1L, (vocab + maxTokensPerChunk - 1) / maxTokensPerChunk).toInt
    pwt.select(col("class_id"), col("token"), posexplode(col("weights")).as(Seq("topic", "w")))
      .filter(abs(col("w")) > sparseEps)
      .withColumn("chunk",
        if (chunks == 1) lit(0) else pmod(abs(hash(col("class_id"), col("token"))), lit(chunks)))
      .groupBy(col("topic"), col("chunk"))
      .agg(collect_list(struct(col("class_id"), col("token"), col("w"))).as("toks"))
      .as[(Int, Int, Seq[(String, String, Float)])]
      .map { case (topic, chunk, toks) =>
        Doc(-(topic.toLong * chunks + chunk + 1), names(topic),
          toks.map { case (c, t, w) => TokenEntry(c, t, w) }.toArray, Array.empty[Txn])
      }
  }

  /** Fit a hierarchy: `levels(0)` on the corpus alone, each further level
    * on corpus + parent pseudo-batch. Returns per-level results with Psi
    * (empty for the root). */
  def fit(docs: Dataset[Doc], dict: DataFrame, levels: Seq[Fit.Config],
      parentWeight: Float = 1.0f, seed: Int = -1,
      /** τ for HierarchySparsingTheta on the parent pseudo-batch; when set
        * the pseudo-batch runs through the joint E-step (cross-item agent
        * state — reference hierarchy_sparsing_theta.cc:24-70). */
      hierarchySparsingTau: Option[Float] = None): Seq[LevelResult] = {
    val spark = docs.sparkSession
    import spark.implicits._
    require(levels.nonEmpty)
    val results = scala.collection.mutable.ArrayBuffer.empty[LevelResult]

    var parent: Option[(FitResult, Seq[String])] = None
    levels.foreach { cfg =>
      val pwt0 = PhiOps.initializeModel(dict, cfg.numTopics, seed)
      // under HierarchySparsingTheta each joint-batch item must be exactly
      // ONE parent topic (the agent's prior is 1/item_size and its n_t
      // proportions are cross-item — chunked items would skew both,
      // diverging from the reference where items ARE parent topics);
      // chunking also buys nothing in the single-task joint E-step
      val chunkCap = if (hierarchySparsingTau.isDefined) Int.MaxValue else 1 << 18
      val pseudoOpt = parent.map { case (p, pNames) =>
        pseudoDocs(p.pwt, pNames, maxTokensPerChunk = chunkCap) }
      val (trainDocs, estep, joint) = (parent, pseudoOpt) match {
        case (Some((_, pNames)), Some(pseudo)) =>
          val weights = pNames.map(_ -> parentWeight).toMap
          val estep2 = cfg.estep.copy(
            docNwtWeightByTitle = cfg.estep.docNwtWeightByTitle ++ weights)
          hierarchySparsingTau match {
            case Some(tau) =>
              // pseudo-batch processed jointly (as one reference batch) so
              // the sparsing agent sees all parent-topic items at once
              (docs, estep2, Some(Fit.JointBatch(pseudo,
                Seq(graft.regularizers.HierarchySparsingTheta(tau)))))
            case None =>
              (docs.unionByName(pseudo), estep2, None)
          }
        case _ => (docs, cfg.estep, None)
      }
      val res = Fit.fitOffline(trainDocs, pwt0, cfg.copy(estep = estep, jointBatch = joint))
      val psi = pseudoOpt match {
        case None => spark.emptyDataFrame
        case Some(pseudo) =>
          // Psi = child-topic mixture per parent topic: pseudo-docs may be
          // chunked, so merge chunk thetas per title weighted by chunk
          // token mass (exact for one chunk; mass-weighted average else)
          val mass = pseudo.map(d => (d.doc_id, d.totalWeight)).toDF("doc_id", "mass")
          res.theta.filter(col("doc_id") < 0)
            .join(mass, "doc_id")
            .groupBy(col("title"))
            .agg(graft.functions.VectorOps
              .weightedVectorSum(col("weights"), col("mass").cast("float")).as("wsum"),
              sum(col("mass")).as("msum"))
            .select(col("title").as("parent_topic"),
              transform(col("wsum"), x => (x / col("msum")).cast("float")).as("weights"))
      }
      results += LevelResult(res, psi)
      parent = Some((res, cfg.resolvedTopicNames))
    }
    results.toSeq
  }
}
