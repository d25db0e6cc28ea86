package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import graft.core.Doc

/** Dictionary operators — relational transforms on the vocabulary table.
  * Reference: src/artm/core/dictionary_operations.cc.
  *
  * A dictionary is a DataFrame[class_id, token, value, tf, df] (+ the item
  * count carried alongside). At 100 TB the gather is one explode +
  * map-side-combined groupBy over (class_id, token) — the canonical
  * word-count shape, no skew concerns beyond stop-words (AQE handles the
  * reduce-side; tf/df are associative). */
object DictionaryOps {

  /** Dictionary::Gather — reference dictionary_operations.cc:254-360.
    * Per (class_id, token): tf = Σ weight over all occurrences, df =
    * #distinct docs containing the token (regardless of weight), value =
    * tf / Σ_class tf (class-conditional normalization). */
  def gather(docs: Dataset[Doc]): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val exploded = docs.select($"doc_id", explode($"tokens").as("t"))
      .select($"doc_id", $"t.class_id", $"t.token", $"t.weight")
    val grouped = exploded
      .groupBy($"class_id", $"token")
      .agg(
        sum($"weight").cast("float").as("tf"),
        countDistinct($"doc_id").cast("float").as("df"))
    // per-class normalizer as a tiny aggregate broadcast back (the
    // PhiOps.normalizeModel pattern) — a Window.partitionBy(class_id) here
    // would funnel a whole modality's vocabulary through ONE window task
    // at scale; the groupBy is map-side combined and its exchange is
    // shared with `grouped` by ReuseExchange
    val classTotals = grouped.groupBy($"class_id").agg(sum($"tf").as("_class_tf"))
    grouped
      .join(broadcast(classTotals), Seq("class_id"))
      .withColumn("value", ($"tf" / $"_class_tf").cast("float"))
      .select($"class_id", $"token", $"value", $"tf", $"df")
  }

  /** [[gather]] from PRE-AGGREGATED per-document partials — rows
    * [class_id, token, w] with exactly ONE row per (doc, class, token)
    * carrying that doc's summed token weight. The streaming gather's
    * sink rollup (the stream emits the per-doc half narrowly; this
    * finishes tf = Σw, df = row count, and the same broadcast
    * class-normalizer as [[gather]]). Integer-valued weights keep the
    * two-level summation exact, so the float tf/value match gather's
    * single-level sum bit for bit. */
  def gatherFromPartials(partials: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions._
    val grouped = partials
      .groupBy(col("class_id"), col("token"))
      .agg(sum(col("w")).cast("float").as("tf"),
        count(lit(1)).cast("float").as("df"))
    val classTotals = grouped.groupBy(col("class_id")).agg(sum(col("tf")).as("_class_tf"))
    grouped
      .join(broadcast(classTotals), Seq("class_id"))
      .withColumn("value", (col("tf") / col("_class_tf")).cast("float"))
      .select(col("class_id"), col("token"), col("value"), col("tf"), col("df"))
  }

  /** Number of items in the collection (the dictionary's
    * num_items_in_collection companion scalar). */
  def numItems(docs: Dataset[Doc]): Long = docs.count()

  case class FilterArgs(
      classId: Option[String] = None,
      minDf: Option[Float] = None, maxDf: Option[Float] = None,
      minDfRate: Option[Float] = None, maxDfRate: Option[Float] = None,
      minTf: Option[Float] = None, maxTf: Option[Float] = None,
      maxDictionarySize: Option[Int] = None,
      recalculateValue: Boolean = false)

  /** Dictionary::Filter — reference dictionary_operations.cc:483-584.
    * Faithful semantics: bounds apply only to entries of `classId` (others
    * pass untouched); min bounds are `<` drops, max bounds are `>=` drops;
    * `maxDictionarySize` finds the (k+1)-th largest df among survivors and
    * drops every entry with df <= that threshold (so ties at the boundary
    * are dropped, possibly yielding < k tokens); `recalculateValue`
    * renormalizes tf over the survivors of ALL classes (unlike gather's
    * per-class normalization — this mirrors the reference exactly). */
  def filter(dict: DataFrame, numItemsInCollection: Long, args: FilterArgs): DataFrame = {
    val spark = dict.sparkSession
    import spark.implicits._
    val size = numItemsInCollection.toFloat

    var cond = lit(true)
    args.minDf.foreach(v => cond = cond && $"df" >= v)
    args.maxDf.foreach(v => cond = cond && $"df" < v)
    args.minDfRate.foreach(v => cond = cond && $"df" >= v * size)
    args.maxDfRate.foreach(v => cond = cond && $"df" < v * size)
    args.minTf.foreach(v => cond = cond && $"tf" >= v)
    args.maxTf.foreach(v => cond = cond && $"tf" < v)
    val applies = args.classId.map(c => $"class_id" === c).getOrElse(lit(true))
    var survivors = dict.filter(!applies || cond)

    args.maxDictionarySize.foreach { k =>
      // one driver action: the top-(k+1) df list decides both "is the cap
      // binding" (fewer than k+1 rows back => no-op) and the threshold —
      // the reference's df_values[max_dictionary_size] after a descending
      // sort. A dictionary cap is small by construction, so collecting
      // k+1 floats is bounded.
      val top = survivors.select($"df").orderBy($"df".desc)
        .limit(k + 1).as[Float].collect()
      if (top.length > k) {
        val threshold = top.last
        survivors = survivors.filter($"df" > threshold)
      }
    }

    if (args.recalculateValue) {
      // global tf total as a one-row aggregate cross-joined back — an
      // empty-partition window would pull the whole dictionary into a
      // single task at scale
      val total = survivors.agg(sum($"tf").as("_total_tf"))
      survivors.crossJoin(broadcast(total))
        .withColumn("value",
          when($"_total_tf" > 0.0, ($"tf" / $"_total_tf").cast("float"))
            .otherwise(lit(0.0f)))
        .select($"class_id", $"token", $"value", $"tf", $"df")
    } else survivors.select($"class_id", $"token", $"value", $"tf", $"df")
  }

  /** Restrict a cooc table to pairs whose both tokens survive in `dict`
    * (the reference's index remap, :566-581 — indices are an encoding
    * detail here, tokens are the keys). Accepts both the single-class
    * shape [class_id, token_a, token_b, …] (windowed gather output) and
    * the per-token-class shape [class_a, token_a, class_b, token_b, …]
    * (CoocReader file output, where each token carries its own class). */
  def filterCooc(cooc: DataFrame, dict: DataFrame): DataFrame = {
    val d = dict.select("class_id", "token")
    if (cooc.columns.contains("class_a"))
      cooc
        .join(d.withColumnRenamed("class_id", "class_a").withColumnRenamed("token", "token_a"),
          Seq("class_a", "token_a"), "left_semi")
        .join(d.withColumnRenamed("class_id", "class_b").withColumnRenamed("token", "token_b"),
          Seq("class_b", "token_b"), "left_semi")
    else
      cooc
        .join(d.withColumnRenamed("token", "token_a"), Seq("class_id", "token_a"), "left_semi")
        .join(d.withColumnRenamed("token", "token_b"), Seq("class_id", "token_b"), "left_semi")
  }

  /** Dictionary::Create from explicit arrays — dictionary_operations.cc:31-51. */
  def create(spark: org.apache.spark.sql.SparkSession,
      entries: Seq[graft.core.DictEntry]): DataFrame = {
    import spark.implicits._
    entries.toDF()
  }

  /** CountTopicCoherence — reference core/dictionary.cc:147-193: for a
    * token set K (all same class), coherence = 2/(|K|(|K|-1)) ·
    * Σ_{i<j} cooc_value(w_i, w_j), missing pairs contribute 0. Returns the
    * coherence for each (class, group) in `tokenGroups`
    * [class_id, group, token]. */
  def topicCoherence(tokenGroups: DataFrame, cooc: DataFrame, valueCol: String = "cooc_tf"): DataFrame = {
    val a = tokenGroups.select(col("class_id"), col("group"), col("token").as("token_a"))
    val b = tokenGroups.select(col("class_id"), col("group"), col("token").as("token_b"))
    val pairs = a.join(b, Seq("class_id", "group")).filter(col("token_a") =!= col("token_b"))
    val k = tokenGroups.groupBy("class_id", "group").agg(count("*").cast("double").as("k"))
    pairs
      .join(cooc, Seq("class_id", "token_a", "token_b"), "left")
      .groupBy("class_id", "group")
      // coherence is surfaced unrounded by the facade (topTokensCoherence /
      // topicKernelFull): DECIMAL sum so the pair reduction is order-free
      // across executor topologies (§28 audit; cooc values are float32 or
      // exact tf counts — 1e-18 quantization is far below either)
      .agg(sum(coalesce(col(valueCol), lit(0.0)).cast("decimal(38,18)"))
        .cast("double").as("pair_sum"))
      .join(k, Seq("class_id", "group"))
      .select(col("class_id"), col("group"),
        when(col("k") > 1, col("pair_sum") / (col("k") * (col("k") - 1.0)))
          .otherwise(lit(0.0)).as("coherence"))
  }
}
