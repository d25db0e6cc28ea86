package graft.sources

import org.apache.spark.sql.{Dataset, SparkSession}
import graft.core.{Doc, TokenEntry, Txn}
import graft.functions.Rng

/** The reference's deterministic synthetic micro-collection, used for the
  * golden perplexity trajectory (54.616 → 20.581) — mirrors
  * python/tests/wrapper/test_01_synthetic_collection.py:49-66 exactly
  * (pure integer arithmetic, no RNG).
  *
  * numItems docs over tokens token_0..token_{numTokens-1}; for item d,
  * token w: weight = background + target where background = (d+w)%5+1 for
  * w >= 40 else 0, target = numTopics when w < 40 and w%10 == d%10 else 0.
  * Zero-weight entries are kept (they are mathematical no-ops but the
  * reference includes them in its batches). */
object SyntheticCollection {

  def docs(numItems: Int = 100, numTokens: Int = 60, numTopics: Int = 10): Seq[Doc] =
    (0 until numItems).map { d =>
      val toks = (0 until numTokens).map { w =>
        val background = if (w >= 40) (d + w) % 5 + 1 else 0
        val target = if (w < 40 && w % 10 == d % 10) numTopics else 0
        TokenEntry(Rng.DefaultClass, s"token_$w", (background + target).toFloat)
      }.toArray
      Doc(d.toLong, d.toString, toks, Array.empty[Txn])
    }

  def dataset(spark: SparkSession, numItems: Int = 100, numTokens: Int = 60,
      numTopics: Int = 10, numPartitions: Int = 1): Dataset[Doc] = {
    import spark.implicits._
    // parallelize keeps documents in order as contiguous slices — matches
    // the reference's single-batch processing order for exact float parity
    spark.createDataset(
      spark.sparkContext.parallelize(docs(numItems, numTokens, numTopics), numPartitions))
  }
}
