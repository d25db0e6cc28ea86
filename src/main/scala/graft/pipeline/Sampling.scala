package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, Dataset, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sampling, mixing, and sequence-packing operators for training-data
  * pipelines. Everything is DETERMINISTIC — a pure function of the row
  * keys, never of partitioning, executor count, or RNG state — so a
  * 100 TB sampling job is reproducible run-over-run and auditable by an
  * external engine (each operator carries a DuckDB oracle entry in
  * SparkEntry).
  *
  * Scale shapes:
  *  - hash sampling / source mixing: pure narrow filters (codegen'd md5
  *    prefix compare) — run at scan speed, no shuffle;
  *  - stratified cap: one shuffle on the stratum key with Spark 4's
  *    WindowGroupLimit keeping ≤k rows per partition pre-shuffle (the
  *    same two-phase top-k shape as Ann.bruteForceTopK — PLANS.md §5);
  *  - sequence packing: a distributed two-phase prefix sum (per-partition
  *    sums → driver prefix over #partitions rows → broadcast back), NOT a
  *    global `Window.orderBy` (which would funnel the corpus through one
  *    task).
  */
object Sampling {

  /** Uniform hex threshold for `rate`: md5 prefixes are uniform in
    * [0, 16^8), so `substr(md5, 1, 8) < hex(rate·2^32)` keeps `rate` of
    * the rows (resolution 2^-32). */
  private[graft] def rateThreshold(rate: Double): String = {
    require(rate >= 0.0 && rate <= 1.0, s"rate must be in [0,1]: $rate")
    f"${math.min((rate * 4294967296.0).toLong, 4294967295L)}%08x"
  }

  private[graft] def hashPrefix(keyCol: Column, salt: String): Column =
    substring(md5(concat(lit(salt), keyCol.cast("string"))), 1, 8)

  /** Deterministic Bernoulli sampling: keep rows whose salted key hash
    * falls below the rate threshold. Same (key, salt, rate) → same
    * decision on any cluster size; disjoint salts give independent
    * samples (train/validation splits without a second scan). `rate = 1`
    * keeps everything. Narrow filter — no shuffle. */
  def sampleHash(df: DataFrame, keyCol: String, rate: Double,
      salt: String = ""): DataFrame =
    if (rate >= 1.0) df
    else df.filter(hashPrefix(col(keyCol), salt) < lit(rateThreshold(rate)))

  /** Weighted source mixing: per-source keep rates (sources absent from
    * the map are dropped — explicit allowlist, as in training-mixture
    * specs). One narrow filter; the hash makes the mixture exact in
    * expectation and reproducible, not a row_number lottery. */
  def mixSources(df: DataFrame, sourceCol: String, rates: Map[String, Double],
      keyCol: String, salt: String = ""): DataFrame = {
    val thr = rates.foldLeft(lit("00000000")) { case (acc, (src, r)) =>
      when(col(sourceCol) === src, lit(rateThreshold(r))).otherwise(acc)
    }
    df.filter(hashPrefix(col(keyCol), salt) < thr)
  }

  /** Stratified cap: at most `k` rows per stratum, chosen by salted hash
    * order (a deterministic uniform sample without replacement per
    * stratum). Rank window + filter ≤ k compiles to Spark 4's
    * WindowGroupLimit: each partition keeps only its local top-k before
    * the stratum shuffle, so a billion-row stratum ships k·#partitions
    * rows, not the stratum. */
  def stratifiedSample(df: DataFrame, strataCol: String, keyCol: String,
      k: Int, salt: String = ""): DataFrame = {
    val w = Window.partitionBy(col(strataCol))
      .orderBy(hashPrefix(col(keyCol), salt), col(keyCol))
    df.withColumn("_rk", row_number().over(w))
      .filter(col("_rk") <= k)
      .drop("_rk")
  }

  /** Greedy concat-and-chunk sequence packing (the GPT-style training
    * layout): documents in `orderCol` order are laid head-to-tail and cut
    * into `budget`-token bins; a document's bin is
    * floor(cum_tokens_before / budget). Emits the input plus
    * [cum_before, bin].
    *
    * The global running sum is a distributed two-phase prefix sum:
    *   1. range-partition + sort by `orderCol` (pinned by persist — the
    *      ONLY shuffle);
    *   2. per-partition token sums → driver (#partitions values, from a
    *      narrow mapPartitions);
    *   3. exclusive partition offsets captured into a second narrow
    *      mapPartitions that emits each row's running total — no window,
    *      no re-shuffle (a `Window.partitionBy(pid)` here would force a
    *      redundant hash exchange: Spark cannot know the pid column
    *      matches the physical layout).
    * Output depends only on the data and `orderCol` — the partition count
    * only changes the execution shape (asserted by SamplingSpec). The
    * caller must release the pinned persist with `unpersistPacked`. */
  def packSequences(df: DataFrame, tokenCountCol: String, budget: Long,
      orderCol: String = "doc_id", numPartitions: Int = 0): DataFrame = {
    require(budget > 0, s"budget must be positive: $budget")
    val spark = df.sparkSession
    val n = if (numPartitions > 0) numPartitions
      else spark.sessionState.conf.numShufflePartitions
    // pin one physical layout for both the offset pass and the output pass
    val ranged = df
      .repartitionByRange(n, col(orderCol))
      .sortWithinPartitions(orderCol)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val tokIdx = ranged.schema.fieldIndex(tokenCountCol)
    import spark.implicits._
    val partSums = ranged.toDF().mapPartitions { it =>
      var s = 0L
      it.foreach(r => s += r.getAs[Number](tokIdx).longValue())
      Iterator.single((org.apache.spark.TaskContext.getPartitionId(), s))
    }.collect().toMap
    val offsets = (0 until n).scanLeft(0L) { (acc, pid) =>
      acc + partSums.getOrElse(pid, 0L)
    }.toArray
    val outSchema = org.apache.spark.sql.types.StructType(ranged.schema.fields ++ Seq(
      org.apache.spark.sql.types.StructField("cum_before",
        org.apache.spark.sql.types.LongType, nullable = false),
      org.apache.spark.sql.types.StructField("bin",
        org.apache.spark.sql.types.LongType, nullable = false)))
    val out = ranged.toDF().mapPartitions { it =>
      var cum = offsets(org.apache.spark.TaskContext.getPartitionId())
      it.map { r =>
        val row = Row.fromSeq(r.toSeq :+ cum :+ (cum / budget))
        cum += r.getAs[Number](tokIdx).longValue()
        row
      }
    }(org.apache.spark.sql.Encoders.row(outSchema))
    pinnedByPack.put(out.queryExecution.analyzed, ranged)
    out
  }

  /** The persist each packSequences output pins, keyed by the output's
    * analyzed-plan node (plans are immutable trees, so that node survives
    * by object identity inside any DataFrame derived from the output).
    * Lets unpersistPacked release exactly that handle — never
    * `clearCache()`, which would evict every OTHER persist in the session
    * (a caller's shingle table, a memoized fit). */
  private val pinnedByPack =
    java.util.Collections.synchronizedMap(
      new java.util.IdentityHashMap[Any, DataFrame]())

  /** Release the persist pinned by packSequences (the plan's layout
    * consistency only matters while both passes run). Pass the DataFrame
    * packSequences returned, or anything derived from it — the pinned
    * handle is found by plan-subtree identity. */
  def unpersistPacked(df: DataFrame): Unit = {
    val nodes = java.util.Collections.newSetFromMap(
      new java.util.IdentityHashMap[Any, java.lang.Boolean]())
    df.queryExecution.analyzed.foreach(n => nodes.add(n))
    pinnedByPack.synchronized {
      val it = pinnedByPack.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        if (nodes.contains(e.getKey)) {
          e.getValue.unpersist(blocking = false)
          it.remove()
        }
      }
    }
  }
}
