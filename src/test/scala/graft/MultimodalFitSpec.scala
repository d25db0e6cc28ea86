package graft

import org.apache.spark.sql.functions._
import graft.core.{Doc, TokenEntry, Txn}
import graft.operators._

/** Multimodal (class-weighted) fitting — reference ProcessBatchesArgs
  * class_id/class_weight (messages.proto) + multiple_classes_test.cc:
  * a zero-weighted modality must not influence theta or contribute to
  * n_wt; weights scale the modality's pull on the mixture. */
class MultimodalFitSpec extends SparkSpec {

  private def corpus(withLabels: Boolean) = {
    val docs = (0 until 30).map { i =>
      val topicTok = if (i % 2 == 0) "alpha" else "beta"
      val base = Array(
        TokenEntry("@default_class", topicTok, 3f),
        TokenEntry("@default_class", s"shared", 1f))
      val toks = if (withLabels) base :+ TokenEntry("@label", s"lab${i % 2}", 1f) else base
      Doc(i.toLong, s"doc$i", toks, Array.empty[Txn])
    }
    spark.createDataset(docs)(org.apache.spark.sql.Encoders.product[Doc])
  }

  test("zero class weight excludes a modality from theta and n_wt") {
    val docsL = corpus(withLabels = true).cache()
    val docsP = corpus(withLabels = false).cache()
    val dict = DictionaryOps.gather(docsL).cache()
    val pwt0 = PhiOps.initializeModel(dict, numTopics = 4, seed = 9)

    def fit(docs: org.apache.spark.sql.Dataset[Doc], weights: Map[String, Float]) =
      Fit.fitOffline(docs, pwt0, Fit.Config(numTopics = 4, numCollectionPasses = 2,
        estep = EStepConfig(numDocumentPasses = 2, classWeights = weights)))

    // label modality weighted 0 ⇒ theta identical to fitting without labels
    // (label phi rows exist but receive no n_wt mass)
    val zeroW = fit(docsL, Map("@default_class" -> 1f, "@label" -> 0f))
    val noLab = fit(docsP, Map("@default_class" -> 1f))
    val diff = zeroW.theta.select(col("doc_id"), col("weights"))
      .unionByName(noLab.theta.select(col("doc_id"), col("weights")))
      .groupBy(col("doc_id"), col("weights")).count().filter(col("count") =!= 2).count()
    assert(diff == 0, "zero-weighted modality changed theta")

    val labelMass = zeroW.nwt.filter(col("class_id") === "@label")
      .agg(coalesce(sum(aggregate(col("weights"), lit(0.0), (a, x) => a + x)), lit(0.0)))
      .head().getDouble(0)
    assert(labelMass == 0.0, s"zero-weighted modality accumulated n_wt mass $labelMass")

    // positive label weight does change the decomposition
    val posW = fit(docsL, Map("@default_class" -> 1f, "@label" -> 5f))
    val changed = posW.theta.select(col("doc_id"), col("weights"))
      .unionByName(noLab.theta.select(col("doc_id"), col("weights")))
      .groupBy(col("doc_id"), col("weights")).count().filter(col("count") =!= 2).count()
    assert(changed > 0, "weighted label modality had no effect")
  }
}
