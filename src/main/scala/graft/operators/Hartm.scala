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

  def pseudoDocs(pwt: DataFrame, topicNames: Seq[String], sparseEps: Double = 1e-37): Dataset[Doc] = {
    val spark = pwt.sparkSession
    import spark.implicits._
    val names = topicNames.toArray
    pwt.select(col("class_id"), col("token"), posexplode(col("weights")).as(Seq("topic", "w")))
      .filter(abs(col("w")) > sparseEps)
      .groupBy(col("topic"))
      .agg(collect_list(struct(col("class_id"), col("token"), col("w"))).as("toks"))
      .as[(Int, Seq[(String, String, Float)])]
      .map { case (topic, toks) =>
        Doc(-(topic + 1).toLong, names(topic),
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
      val (trainDocs, estep, joint) = parent match {
        case None => (docs, cfg.estep, None)
        case Some((p, pNames)) =>
          val pseudo = pseudoDocs(p.pwt, pNames)
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
      }
      val res = Fit.fitOffline(trainDocs, pwt0, cfg.copy(estep = estep, jointBatch = joint))
      val psi = parent match {
        case None => spark.emptyDataFrame
        case Some((_, pNames)) =>
          // Psi = child-topic mixture of each parent pseudo-doc
          res.theta.filter(col("doc_id") < 0)
            .select(col("title").as("parent_topic"), col("weights"))
      }
      results += LevelResult(res, psi)
      parent = Some((res, cfg.resolvedTopicNames))
    }
    results.toSeq
  }
}
