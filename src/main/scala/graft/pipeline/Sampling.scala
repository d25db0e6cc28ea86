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

  /** Deterministic Bernoulli sampling with a PER-ROW rate column —
    * importance/quality-weighted sampling (the classifier-filter shape:
    * keep probability rises with a model score instead of being one
    * global rate). keep ⇔ uniform(md5(salt || key)) < rate, with the
    * md5 prefix compared NUMERICALLY so the rate can be any computed
    * double in [0, 1]. Same determinism contract as [[sampleHash]]
    * (pure function of key + salt + rate, any cluster size); still one
    * narrow codegen'd filter — no shuffle. */
  def sampleByRate(df: DataFrame, rateCol: Column, keyCol: String,
      salt: String = ""): DataFrame =
    df.filter(
      conv(hashPrefix(col(keyCol), salt), 16, 10).cast("double") <
        rateCol * lit(4294967296.0))

  /** SOFT deduplication — duplicate-count-weighted sampling: every doc
    * keeps with probability 1/n over its exact-duplicate group
    * (fingerprint of the normalized text), so each group survives with
    * ONE expected copy but no copy is privileged — the unbiased
    * alternative to hard canonical-keep when duplicates carry
    * independent metadata (different crawl dates, sources, labels)
    * that a min-id winner would systematically skew. Deterministic:
    * the same doc makes the same keep decision on any cluster size
    * ([[sampleByRate]]'s salted-hash contract).
    *
    * Shape at scale: one hash-groupBy on the short fingerprint key
    * (map-side combined), one key join back, one narrow filter — the
    * [[graft.pipeline.Dedup.exact]] cost plus a join, never a window.
    * Returns the kept docs' [idCol, dup_count]. */
  def softDedup(df: DataFrame, idCol: String = "doc_id",
      textCol: String = "text", salt: String = ""): DataFrame = {
    val withFp = df.select(col(idCol),
      TextAnalysis.fingerprintCol(col(textCol)).as("__fp"))
    val counts = withFp.groupBy(col("__fp"))
      .agg(count(lit(1)).as("dup_count"))
    sampleByRate(withFp.join(counts, Seq("__fp")),
        lit(1.0) / col("dup_count"), idCol, salt)
      .select(col(idCol), col("dup_count"))
  }

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

  /** Epoch-based source mixing — the "source S sees E_S epochs"
    * training-mixture recipe (LLM data recipes weight high-quality
    * sources by REPEATING them, with fractional epochs allowed:
    * E = 2.5 means two full passes plus a uniform half): every row of
    * source s is replicated floor(E_s) times (epoch index
    * 0..floor−1), plus one more copy (index floor) kept iff the
    * salted key hash falls under the fractional rate — the
    * [[sampleHash]] decision, so the partial epoch is an unbiased,
    * deterministic subset on any cluster size. Each copy carries its
    * `epoch` index for downstream shard shuffling. Sources absent
    * from the map drop (the [[mixSources]] allowlist contract).
    *
    * Scale shape: one narrow filter + one explode(sequence) flatMap —
    * zero shuffles, streams statelessly; output rows ≈ Σ E_s·n_s by
    * construction. E_s = 0.25 degenerates to Bernoulli sampling,
    * E_s = 3.0 to plain replication. Returns df + [epoch]. */
  def epochMix(df: DataFrame, sourceCol: String,
      epochs: Map[String, Double], keyCol: String,
      salt: String = ""): DataFrame = {
    require(epochs.nonEmpty && epochs.values.forall(_ > 0.0),
      "epochMix: epochs must be positive")
    val full = epochs.foldLeft(lit(0)) { case (acc, (src, e)) =>
      when(col(sourceCol) === src, lit(math.floor(e).toInt)).otherwise(acc)
    }
    val fracThr = epochs.foldLeft(lit("00000000")) { case (acc, (src, e)) =>
      when(col(sourceCol) === src,
        lit(rateThreshold(e - math.floor(e)))).otherwise(acc)
    }
    df.filter(col(sourceCol).isin(epochs.keys.toSeq: _*))
      .withColumn("__full", full)
      .withColumn("__epoch", explode(sequence(lit(0), col("__full"))))
      .filter(col("__epoch") < col("__full")
        || hashPrefix(col(keyCol), salt) < fracThr)
      .withColumn("epoch", col("__epoch").cast("long"))
      .drop("__full", "__epoch")
  }

  /** Temperature-based source rates — the multilingual-LM sampling
    * standard (mT5/XLM-R style): source share p_s = n_s/N is flattened
    * to q_s ∝ p_s^α (α < 1 upsamples the tail; α = 1 is natural, α = 0
    * uniform), then converted to per-source Bernoulli keep rates
    * realizing an expected `targetFrac`·N sample:
    * r_s = min(1, q_s·targetFrac·N / n_s).
    *
    * Determinism: with α = 0.5 (the common "T = 2" square-root
    * temperature, and this engine's default) every step is IEEE-exact
    * (sqrt is correctly rounded; the q normalizer folds in source-NAME
    * order so engines agree on the summation) — which is what lets the
    * DuckDB oracle recompute the rates from the data instead of
    * replaying literals. Other α use libm pow (cross-engine last-ulp
    * caveat — flips a decision only if the rate crosses a 1/2^32
    * threshold boundary, documented rather than defended).
    * Source counts collect to the driver — sources are few by contract
    * (the codebook precedent). */
  def temperatureRates(df: DataFrame, sourceCol: String,
      targetFrac: Double, alpha: Double = 0.5): Seq[(String, Long, Double)] = {
    require(targetFrac > 0.0 && targetFrac <= 1.0)
    val counts = df.groupBy(col(sourceCol)).agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
      .sortBy(_._1) // name order: the normalizer fold must match the SQL
    val n = counts.map(_._2).sum
    def pw(x: Double) = if (alpha == 0.5) math.sqrt(x) else math.pow(x, alpha)
    val w = counts.map { case (_, ns) => pw(ns.toDouble / n) }
    val z = w.foldLeft(0.0)(_ + _)
    counts.zip(w).map { case ((src, ns), ws) =>
      (src, ns, math.min(1.0, ws / z * targetFrac * n / ns))
    }
  }

  /** [[mixSources]] with [[temperatureRates]]-derived rates. */
  def temperatureMix(df: DataFrame, sourceCol: String, keyCol: String,
      targetFrac: Double, alpha: Double = 0.5,
      salt: String = ""): DataFrame =
    mixSources(df, sourceCol,
      temperatureRates(df, sourceCol, targetFrac, alpha)
        .map { case (s, _, r) => s -> r }.toMap,
      keyCol, salt)

  /** Deterministic multi-way split (train/valid/test): every row is
    * assigned exactly one label by which band of the salted-hash space
    * it falls in (cumulative-fraction thresholds, the same hex
    * comparison as [[sampleHash]]). Exhaustive and disjoint by
    * construction, reproducible on any cluster, and stable under corpus
    * growth: a doc's split never changes when other docs are added —
    * the property row-number splits lack and leakage audits depend on.
    * One narrow projection, no shuffle. */
  def hashSplit(df: DataFrame, keyCol: String,
      fractions: Seq[(String, Double)], salt: String = ""): DataFrame = {
    require(fractions.nonEmpty, "fractions must be non-empty")
    require(math.abs(fractions.map(_._2).sum - 1.0) < 1e-9,
      s"fractions must sum to 1: $fractions")
    val h = hashPrefix(col(keyCol), salt)
    val cum = fractions.map(_._2).scanLeft(0.0)(_ + _).tail
    val split = fractions.init.zip(cum.init).foldRight(
      lit(fractions.last._1): Column) { case (((name, _), c), acc) =>
      when(h < lit(rateThreshold(c)), name).otherwise(acc)
    }
    df.withColumn("split", split)
  }

  /** Deterministic sharded training-data shuffle: every row gets a
    * (shard, shard_pos) coordinate from a salted md5 of its key — the
    * reproducible "globally shuffle, then write N shards" step between
    * curation and sequence packing. The shard is a uniform hash bucket;
    * the position is the rank of the hash within the shard, so
    * concatenating shards 0..N-1 in position order IS a uniform
    * permutation of the corpus, identical on any cluster size or
    * partitioning, and re-salting gives an independent epoch order.
    *
    * Shape at scale: a single GLOBAL sort is the wrong plan at 100 TB;
    * with nShards ≫ executors this is one hash-partitioned window per
    * shard — embarrassingly parallel, each task sorting ~corpus/nShards
    * rows, which is exactly the unit a shard file writer wants
    * (`partitionBy(shard) sortWithinPartitions(shard_pos)`). */
  def shardShuffle(df: DataFrame, keyCol: String, nShards: Int,
      salt: String = ""): DataFrame = {
    require(nShards > 0, s"nShards must be positive: $nShards")
    val h = md5(concat(lit(salt), col(keyCol).cast("string")))
    val w = Window.partitionBy(col("shard"))
      .orderBy(col("__h"), col(keyCol))
    df.withColumn("__h", h)
      .withColumn("shard",
        pmod(conv(substring(col("__h"), 1, 8), 16, 10).cast("long"),
          lit(nShards.toLong)).cast("int"))
      .withColumn("shard_pos", row_number().over(w).cast("long"))
      .drop("__h")
  }

  /** Shard MANIFEST over [[shardShuffle]]'s assignment — the release
    * artifact a training run actually consumes: per shard, the doc
    * count, total whitespace tokens, and a content digest (md5 of the
    * shard_pos-ordered per-doc text md5s) so a consumer can verify a
    * delivered shard byte-for-byte without re-reading the corpus
    * catalog. Returns [shard, n_docs, n_tokens, content_md5].
    *
    * Shape at scale: rides shardShuffle's one shard-keyed shuffle; the
    * digest aggregation collects one 32-char hash per doc per shard —
    * at 100 TB with nShards sized to ~1 GB shards that is ~thousands of
    * hashes per group, bounded by design (the shard size IS the knob).
    * Output is nShards rows. */
  def shardManifest(df: DataFrame, keyCol: String, textCol: String,
      nShards: Int, salt: String = ""): DataFrame =
    shardManifestFromPerDoc(shardManifestPerDoc(df, keyCol, textCol,
      nShards, salt))

  /** The per-DOCUMENT half of [[shardManifest]] — shard assignment,
    * text digest and token count as one stateless narrow projection
    * (runs unchanged on an arriving doc stream; the rollup half then
    * runs at the sink). The full salted hash `__h` rides along: it IS
    * the shard_pos order key, so the sink can reconstruct the exact
    * batch digest order without a window. */
  private[graft] def shardManifestPerDoc(df: DataFrame, keyCol: String,
      textCol: String, nShards: Int, salt: String = ""): DataFrame = {
    require(nShards > 0, s"nShards must be positive: $nShards")
    val h = md5(concat(lit(salt), col(keyCol).cast("string")))
    df.select(col(keyCol).cast("long").as("__key"),
        md5(col(textCol)).as("__doc_md5"),
        size(split(trim(lower(col(textCol))), "\\s+")).cast("long")
          .as("__toks"), h.as("__h"))
      .withColumn("shard",
        pmod(conv(substring(col("__h"), 1, 8), 16, 10).cast("long"),
          lit(nShards.toLong)).cast("int"))
  }

  /** The rollup half of [[shardManifest]]: per-shard counts + the
    * (hash, key)-ordered content digest — (hash, key) is exactly the
    * shard_pos order of [[shardShuffle]], recomputed without a window
    * so the same code runs on sink-collected per-doc rows. */
  private[graft] def shardManifestFromPerDoc(perDoc: DataFrame): DataFrame =
    perDoc.groupBy(col("shard"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("__toks")).as("n_tokens"),
        md5(array_join(
          transform(array_sort(collect_list(struct(col("__h"), col("__key"),
            col("__doc_md5")))), s => s.getField("__doc_md5")), ","))
          .as("content_md5"))

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

  /** Per-domain document cap — the FineWeb/RefinedWeb web-corpus rule
    * "keep at most k documents per registered domain, preferring the
    * best": rank rows within each domain by `orderCol` DESCENDING
    * (quality score, length — bigger is better) with the id as the
    * deterministic tie-break, keep rank ≤ k. Unlike
    * [[stratifiedSample]]'s hash order this is a PREFERENCE cap: the
    * survivors are the domain's top-k by merit, not a uniform draw.
    *
    * Scale shape: same WindowGroupLimit compilation as
    * stratifiedSample — each map partition keeps only its local top-k
    * per domain before the domain shuffle, so a crawl where one domain
    * holds a billion pages ships k·#partitions rows for it, never the
    * domain. Returns df + [rk] filtered to rk ≤ k. */
  def domainCap(df: DataFrame, domainCol: String, orderCol: String,
      k: Int, idCol: String = "doc_id"): DataFrame = {
    require(k >= 1, s"domainCap: k must be >= 1: $k")
    val w = Window.partitionBy(col(domainCol))
      .orderBy(col(orderCol).desc, col(idCol))
    df.withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= k)
  }

  /** Per-source TOKEN-budget sampling — the "take N tokens from each
    * source" mixture spec (training mixtures are budgeted in tokens, not
    * documents, so per-doc Bernoulli rates over- or under-shoot when
    * sources have different length profiles). Documents are ordered
    * within their source by a salted hash (a deterministic shuffle — the
    * prefix is an unbiased sample) and kept while the source's RUNNING
    * token total before them is under its budget; the one document
    * crossing the boundary is kept (budgets are floors: every source
    * reaches ≥ its budget if it has the tokens). Sources absent from
    * `budgets` drop — the mixSources allowlist contract.
    *
    * Scale shape: the per-source running sum is the packSequences
    * two-phase prefix sum GENERALIZED to keyed prefixes — range-
    * partition on (source, hash), per-partition per-source partial sums
    * (#partitions × #sources tiny rows to the driver), broadcast
    * offsets back, one streaming second pass. NO
    * `Window.partitionBy(source)`: a window would funnel each source
    * through ONE task, and the hottest source IS the workload at
    * 100 TB. Partition-count independent (same contract as
    * packSequences; SamplingSpec asserts it). Like packSequences, the
    * two passes pin a persist of the ranged corpus — the caller must
    * release it with [[unpersistPacked]] once the output is
    * materialized. NULL token counts contribute 0 and keep their row
    * (matching SQL window-sum NULL semantics). */
  def tokenBudget(df: DataFrame, sourceCol: String, tokenCountCol: String,
      budgets: Map[String, Long], idCol: String = "doc_id",
      salt: String = "budget", numPartitions: Int = 0): DataFrame = {
    require(budgets.values.forall(_ > 0), "budgets must be positive")
    val spark = df.sparkSession
    val n = if (numPartitions > 0) numPartitions
      else spark.sessionState.conf.numShufflePartitions
    val allowed = budgets.keys.toSeq
    val withH = df
      .filter(col(sourceCol).isin(allowed: _*))
      .withColumn("_h", hashPrefix(col(idCol), salt))
    val ranged = withH
      .repartitionByRange(n, col(sourceCol), col("_h"), col(idCol))
      .sortWithinPartitions(sourceCol, "_h", idCol)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val srcIdx = ranged.schema.fieldIndex(sourceCol)
    val tokIdx = ranged.schema.fieldIndex(tokenCountCol)
    import spark.implicits._
    // pass 1: per-(partition, source) token sums — #partitions × #sources
    // rows, the only driver traffic
    val partSums = ranged.toDF().mapPartitions { it =>
      val sums = scala.collection.mutable.LinkedHashMap.empty[String, Long]
      it.foreach { r =>
        val s = r.getString(srcIdx)
        // NULL token count contributes 0 (SQL window-sum NULL semantics)
        val t = if (r.isNullAt(tokIdx)) 0L else r.getAs[Number](tokIdx).longValue()
        sums(s) = sums.getOrElse(s, 0L) + t
      }
      val pid = org.apache.spark.TaskContext.getPartitionId()
      sums.iterator.map { case (s, v) => (pid, s, v) }
    }.collect()
    val bySource = partSums.groupBy(_._2)
    val offsets: Map[(Int, String), Long] = bySource.flatMap { case (s, rows) =>
      val byPid = rows.map(r => r._1 -> r._3).toMap
      (0 until n).scanLeft((0, 0L)) { case ((_, acc), pid) =>
        (pid + 1, acc + byPid.getOrElse(pid, 0L))
      }.init.zipWithIndex.map { case ((_, cumBefore), pid) =>
        (pid, s) -> cumBefore
      }
    }
    val bOff = spark.sparkContext.broadcast(offsets)
    val bBudget = spark.sparkContext.broadcast(budgets)
    val outSchema = org.apache.spark.sql.types.StructType(ranged.schema.fields :+
      org.apache.spark.sql.types.StructField("cum_before",
        org.apache.spark.sql.types.LongType, nullable = false))
    // pass 2: streaming keyed prefix sum from the broadcast offsets; keep
    // while the source's running total BEFORE this doc is under budget
    val out = ranged.toDF().mapPartitions { it =>
      val pid = org.apache.spark.TaskContext.getPartitionId()
      var cur: String = null
      var cum = 0L
      it.flatMap { r =>
        val s = r.getString(srcIdx)
        if (s != cur) { cur = s; cum = bOff.value.getOrElse((pid, s), 0L) }
        val before = cum
        cum += (if (r.isNullAt(tokIdx)) 0L else r.getAs[Number](tokIdx).longValue())
        if (before < bBudget.value(s)) Some(Row.fromSeq(r.toSeq :+ before))
        else None
      }
    }(org.apache.spark.sql.Encoders.row(outSchema))
    pinnedByPack.put(out.queryExecution.analyzed, ranged)
    out.drop("_h")
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

  /** Best-fit-decreasing WHOLE-document packing — the GPU-training
    * "sample packing" layout: each bin holds complete documents summing
    * to ≤ `budget` tokens (no document ever splits across a bin
    * boundary, unlike [[packSequences]]' concat-and-chunk), and
    * first-fit-decreasing keeps padding near the bin-packing optimum
    * (FFD ≤ 11/9·OPT + 1 bins).
    *
    * Distributed determinism: documents are salted-hash-bucketed into
    * `numGroups` independent packing groups (the parallel unit — each
    * group packs alone, so bins never span groups); within a group the
    * greedy runs in (token count DESC, id) order. The output is a pure
    * function of (keys, numGroups, budget) — partition-count invariant
    * like every operator here (asserted by SamplingSpec).
    *
    * Scale: one shuffle (repartition on the group id) + a per-group
    * in-memory greedy over a capacity-sorted TreeMap — O(docs·log bins)
    * per group, group state = its bins' residual capacities. Size
    * `numGroups` so groups stay ~10⁵-10⁶ docs; padding cost of grouping
    * is at most one underfull bin per group. Docs longer than `budget`
    * get a bin of their own, flagged `oversize` (callers truncate or
    * reject — silently splitting would corrupt attention boundaries).
    * Returns the input plus [group, bin, bin_fill, oversize]; bin ids
    * are (group, bin) pairs — globally unique as a composite. */
  def packBestFit(df: DataFrame, tokenCountCol: String, budget: Long,
      numGroups: Int = 0, idCol: String = "doc_id",
      salt: String = "pack"): DataFrame = {
    require(budget > 0, s"budget must be positive: $budget")
    val spark = df.sparkSession
    val g = if (numGroups > 0) numGroups
      else spark.sessionState.conf.numShufflePartitions
    val grouped = df.withColumn("group",
      pmod(conv(substring(md5(concat(lit(salt), col(idCol).cast("string"))), 1, 8),
        16, 10).cast("long"), lit(g.toLong)))
    val tokIdx = grouped.schema.fieldIndex(tokenCountCol)
    val idIdx = grouped.schema.fieldIndex(idCol)
    val groupIdx = grouped.schema.fieldIndex("group")
    val outSchema = org.apache.spark.sql.types.StructType(grouped.schema.fields ++ Seq(
      org.apache.spark.sql.types.StructField("bin",
        org.apache.spark.sql.types.LongType, nullable = false),
      org.apache.spark.sql.types.StructField("bin_fill",
        org.apache.spark.sql.types.LongType, nullable = false),
      org.apache.spark.sql.types.StructField("oversize",
        org.apache.spark.sql.types.BooleanType, nullable = false)))
    grouped
      .repartition(g, col("group"))
      .toDF().mapPartitions { it =>
        // a partition may carry several groups (hash collisions when
        // numGroups > partitions is impossible here since we repartition
        // on group, but several group values can land in one partition) —
        // pack each group independently
        it.toSeq.groupBy(_.getLong(groupIdx)).iterator.flatMap { case (_, rows) =>
          val sorted = rows.sortBy { r =>
            (-r.getAs[Number](tokIdx).longValue(), r.getAs[Number](idIdx).longValue())
          }
          // residual capacity -> bin ids with that capacity (best fit =
          // smallest residual that still fits; FFD uses first fit — we
          // implement BEST-fit-decreasing: tighter and same guarantee)
          val byResidual = new java.util.TreeMap[Long, java.util.ArrayDeque[Long]]()
          val fills = scala.collection.mutable.ArrayBuffer.empty[Long]
          def place(bin: Long, residual: Long): Unit = {
            val q = byResidual.computeIfAbsent(residual, _ => new java.util.ArrayDeque[Long]())
            q.addLast(bin)
          }
          val out = sorted.map { r =>
            val sz = r.getAs[Number](tokIdx).longValue()
            if (sz >= budget) {
              val bin = fills.length.toLong
              fills += sz
              Row.fromSeq(r.toSeq :+ bin :+ sz :+ (sz > budget))
            } else {
              val e = byResidual.ceilingEntry(sz)
              val bin = if (e == null) {
                // no open bin fits: open a new one (registered below
                // under its post-placement residual)
                val b = fills.length.toLong
                fills += 0L
                b
              } else {
                // tightest open bin that fits, polled out of its old
                // residual bucket (re-registered below under the new one)
                val q = e.getValue
                val b = q.pollFirst()
                if (q.isEmpty) byResidual.remove(e.getKey)
                b
              }
              val newFill = fills(bin.toInt) + sz
              fills(bin.toInt) = newFill
              place(bin, budget - newFill)
              Row.fromSeq(r.toSeq :+ bin :+ newFill :+ false)
            }
          }
          // rewrite bin_fill to the bin's FINAL fill so every member row
          // reports the same number
          out.map { r =>
            val bin = r.getLong(r.length - 3).toInt
            Row.fromSeq(r.toSeq.updated(r.length - 2, fills(bin)))
          }.iterator
        }
      }(org.apache.spark.sql.Encoders.row(outSchema))
  }

  /** DSIR-style importance selection (Xie et al. 2023, "Data Selection
    * for Language Models via Importance Resampling"): score every doc
    * by how much more likely its text is under a TARGET language model
    * than under the RAW-corpus model, and keep the `topK` most
    * target-like docs — the published recipe for skimming a web crawl
    * toward a curated distribution. Both models are the add-k bigram
    * LM of [[TextAnalysis.lmPerplexity]]; the per-doc score is the mean
    * bigram log-likelihood ratio
    *   (1/n) Σ [ln p_target(w2|w1) − ln p_raw(w2|w1)],
    * with the add-k floor standing in for target-unseen bigrams. The
    * deterministic top-k (rank on the ROUNDED score, ties by id) is the
    * auditable variant of the paper's Gumbel resampling.
    *
    * Shape at scale: the doc-bigram stream is persisted once and feeds
    * four map-side-combined count shuffles plus the scoring join (all
    * key-partitioned on their n-gram keys — never corpus×vocab); the
    * two vocab scalars ride as broadcast 1-row aggregates; the raw
    * joins are inner (self-trained — every bigram is in its own model),
    * the target joins LEFT with the smoothed fallback; selection is a
    * TakeOrderedAndProject, never a global window. The caller releases
    * the persist via clearCache (the simhashPairs lifetime contract).
    * Returns [<id>, n_bigrams, score] for the kept docs. */
  def importanceSample(df: DataFrame, targetPred: Column, topK: Int,
      addK: Double = 0.1, textCol: String = "text",
      idCol: String = "doc_id"): DataFrame = {
    require(topK >= 1, s"topK must be >= 1: $topK")
    val nonBlank = df.filter(length(trim(col(textCol))) > 0)
    val toks = TextAnalysis.tokensCol(col(textCol))
    val bi = nonBlank.filter(size(toks) >= 2)
      .select(col(idCol), targetPred.as("is_t"), explode(zip_with(
        slice(toks, lit(1), size(toks) - 1),
        slice(toks, lit(2), size(toks) - 1),
        (a, b) => struct(a.as("w1"), b.as("w2")))).as("b"))
      .select(col(idCol), col("is_t"),
        col("b.w1").as("w1"), col("b.w2").as("w2"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val c12r = bi.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c12r"))
    val c1r = bi.groupBy(col("w1")).agg(count(lit(1)).as("c1r"))
    val tBi = bi.filter(col("is_t"))
    val c12t = tBi.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c12t"))
    val c1t = tBi.groupBy(col("w1")).agg(count(lit(1)).as("c1t"))
    val vr = nonBlank.select(explode(toks).as("t"))
      .agg(countDistinct(col("t")).as("vr"))
    val vt = nonBlank.filter(targetPred).select(explode(toks).as("t"))
      .agg(countDistinct(col("t")).as("vt"))
    bi.join(c12r, Seq("w1", "w2"))
      .join(c1r, Seq("w1"))
      .join(c12t, Seq("w1", "w2"), "left")
      .join(c1t, Seq("w1"), "left")
      .crossJoin(broadcast(vr)).crossJoin(broadcast(vt))
      .withColumn("lnt", log(
        (coalesce(col("c12t"), lit(0L)).cast("double") + lit(addK)) /
        (coalesce(col("c1t"), lit(0L)).cast("double") +
          lit(addK) * col("vt").cast("double"))))
      .withColumn("lnr", log(
        (col("c12r").cast("double") + lit(addK)) /
        (col("c1r").cast("double") + lit(addK) * col("vr").cast("double"))))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_bigrams"),
        round(sum(col("lnt") - col("lnr")) / count(lit(1)), 6).as("score"))
      .orderBy(col("score").desc, col(idCol))
      .limit(topK)
  }

  /** DoReMi-style domain reweighting (Xie et al. 2023, "DoReMi:
    * Optimizing Data Mixtures Speeds Up Language Model Pretraining"),
    * the deterministic lite form: domains where the corpus LM is most
    * surprised (highest mean perplexity) get upweighted for the next
    * mixing pass. Here the proxy model is the self-scored add-k bigram
    * LM ([[TextAnalysis.lmPerplexity]] — the published method trains a
    * small reference LM, the same seam), and the weight is
    *
    *   w_s ∝ sqrt(mean_ppl_s / min_t mean_ppl_t)
    *
    * — a temperature-2 softening in log space, sqrt because it is
    * IEEE-exact across engines (the sample_temperature precedent; pow
    * with a fractional exponent is not pinned). Per-source means sum
    * the 6-decimal-rounded per-doc ppl in DECIMAL(18,6) and the weight
    * normalizer sums in DECIMAL(28,12) — both order-proof — so the
    * report is bit-stable at any partitioning. Returns
    * [<source>, n_docs, mean_ppl, weight] with Σ weight = 1.
    *
    * Shape at scale: the LM pass is the dominant term (two n-gram count
    * shuffles + the scoring join); everything after is a
    * |sources|-sized aggregate with two broadcast scalar joins. */
  def doremiWeights(df: DataFrame, addK: Double = 0.1,
      idCol: String = "doc_id", textCol: String = "text",
      sourceCol: String = "source"): DataFrame = {
    val ppl = TextAnalysis.lmPerplexity(df, addK, textCol, idCol)
    val m = ppl.join(df.select(col(idCol), col(sourceCol)), Seq(idCol))
      .groupBy(col(sourceCol))
      .agg(count(lit(1)).as("n_docs"),
        (sum(col("ppl").cast("decimal(18,6)")).cast("double") /
          count(lit(1))).as("mean_ppl"))
    val mn = m.agg(min(col("mean_ppl")).as("min_ppl"))
    val w = m.crossJoin(broadcast(mn))
      .withColumn("wr", sqrt(col("mean_ppl") / col("min_ppl")))
    val tot = w.agg(sum(col("wr").cast("decimal(28,12)")).cast("double").as("t"))
    w.crossJoin(broadcast(tot))
      .select(col(sourceCol), col("n_docs"),
        round(col("mean_ppl"), 6).as("mean_ppl"),
        round(col("wr") / col("t"), 6).as("weight"))
  }
}
