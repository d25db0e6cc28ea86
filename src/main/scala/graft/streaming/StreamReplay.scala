package graft.streaming

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._

/** Replay the driver's static `events` table THROUGH the Structured
  * Streaming operators and hand back the (batch) result — the bridge
  * that puts [[StreamingPipeline.sessionize]] and
  * [[StreamingPipeline.activeUsersExactStream]] under the same DuckDB
  * oracle rows as their batch twins.
  *
  * Mechanics: the parquet file is staged into a temp directory together
  * with two far-future SENTINEL files (user_id −1), and streamed with
  * `maxFilesPerTrigger=1` + `Trigger.AvailableNow` into a memory sink.
  * File-source ordering is by modification time (set explicitly), so the
  * real events form batch 1, sentinel A batch 2 (advances the watermark
  * past every real timeout), and sentinel B batch 3 (the batch in which
  * event-time timeouts and closed windows actually FLUSH — a watermark
  * advanced in batch N emits in batch N+1). Sentinel rows are filtered
  * from the output.
  *
  * The memory sink bounds this harness to oracle/driver scale by design:
  * the production deployment writes the same query to a real sink
  * (`writeStream.format("parquet"/"kafka")`) and never collects. Session
  * timezone is pinned to UTC around the whole run — the parquet `ts` is
  * TIMESTAMP_NTZ and both the NTZ→LTZ cast and the epoch extraction
  * must be machine-tz-independent (same contract as
  * [[graft.pipeline.Temporal.readEvents]]). */
object StreamReplay {

  private val eventSchema = StructType(Seq(
    StructField("event_id", LongType), StructField("ts", TimestampNTZType),
    StructField("user_id", LongType), StructField("event_type", StringType),
    StructField("value", DoubleType), StructField("props", StringType)))

  private val counter = new java.util.concurrent.atomic.AtomicInteger(0)

  /** Feed-staging chunk count (round 13): a single staged parquet file
    * gives the file source ONE scan partition (openCostInBytes packs a
    * small file alone, but one file cannot split), so every per-row
    * in-stream kernel — shingles→minhash, NB scoring, entropy folds,
    * window partial aggregation — ran on ONE CORE regardless of
    * machine size, the single largest idle-capacity hole in the replay
    * harness (guide §2.6/§6). Staging the feed as K hash chunks gives
    * the scan K partitions while every consumer still takes the whole
    * set in ONE micro-batch (no maxFilesPerTrigger below K), so
    * arrival-order semantics and watermarks are untouched — partition
    * count is a scan property, not a semantic one; the per-key claim
    * machines additionally sort each state group by (ts, id) before
    * folding, so even row order within the batch is irrelevant. Scales
    * with the session's cores (the production analogue: a real stream
    * arrives as many files/offsets per trigger), capped so sf-scale
    * chunks stay above trivial size. */
  private def feedChunks(spark: SparkSession): Int =
    math.max(1, math.min(spark.sparkContext.defaultParallelism, 16))

  /** Write `df` as `k` parquet chunk files `<prefix>_NNNNN.parquet`
    * under `destDir`, all stamped `mtimeMillis` — the multi-file twin
    * of [[writeSingleParquet]] for feeds whose consumers take every
    * chunk in one micro-batch. Hash-partitioned on `keyCol` so chunk
    * contents are deterministic run-to-run. */
  private def writeSplitParquet(df: DataFrame, destDir: Path, prefix: String,
      keyCol: String, k: Int, mtimeMillis: Long): Unit = {
    val tmp = destDir.resolve(prefix + ".dir")
    df.repartition(k, org.apache.spark.sql.functions.col(keyCol))
      .write.mode("overwrite").parquet(tmp.toString)
    val listing = Files.list(tmp)
    try {
      val parts = new java.util.ArrayList[Path]()
      listing.filter(_.getFileName.toString.endsWith(".parquet"))
        .forEach(p => parts.add(p))
      parts.sort(java.util.Comparator.comparing[Path, String](
        (p: Path) => p.getFileName.toString))
      var i = 0
      while (i < parts.size()) {
        val dest = destDir.resolve(f"${prefix}_$i%05d.parquet")
        Files.move(parts.get(i), dest, StandardCopyOption.REPLACE_EXISTING)
        Files.setLastModifiedTime(dest,
          java.nio.file.attribute.FileTime.fromMillis(mtimeMillis))
        i += 1
      }
    } finally listing.close()
    // recursive delete (r13 ADVICE: a stray non-empty subdir — e.g. an
    // aborted task's _temporary — made the flat sweep throw
    // DirectoryNotEmptyException and fail the staging it should clean)
    val walk = Files.walk(tmp)
    try walk.sorted(java.util.Comparator.reverseOrder())
      .forEach(p => Files.deleteIfExists(p))
    finally walk.close()
  }

  /** Write `df` as ONE parquet file at `dest` with an explicit mtime —
    * the file-source staging primitive every replay here builds on
    * (file-source batch order is mtime order, and single files keep a
    * staged chunk atomic). Closes the directory-listing stream. */
  private def writeSingleParquet(df: DataFrame, dest: Path,
      mtimeMillis: Long): Unit = {
    val tmp = dest.resolveSibling(dest.getFileName.toString + ".dir")
    df.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
    val listing = Files.list(tmp)
    try {
      val part = listing
        .filter(_.getFileName.toString.endsWith(".parquet")).findFirst.get
      Files.move(part, dest, StandardCopyOption.REPLACE_EXISTING)
    } finally listing.close()
    // drop the staging dir — the part file moved out, only _SUCCESS/.crc
    // markers remain, and a long session stages many chunks
    val leftovers = Files.list(tmp)
    try leftovers.forEach(p => Files.deleteIfExists(p))
    finally leftovers.close()
    Files.deleteIfExists(tmp)
    Files.setLastModifiedTime(dest,
      java.nio.file.attribute.FileTime.fromMillis(mtimeMillis))
  }

  /** Synthetic-ts base for id-ordered replays (seconds, ≈2001): an
    * event time of EXACTLY epoch 0 sits at the stream's initial
    * watermark and is silently dropped as late before the stateful
    * operator — measured: vec 0's claims vanished from the near-dup
    * replay until ts moved off zero. */
  private val ReplayTsBase = 1000000000L

  /** Staged replay directories, one per (session, events dir) — the
    * staging (symlink + sentinel writes + max-ts scan) is identical for
    * every operator replayed over the same table, so the second and
    * third replay entries in a Verify/Bench run skip it entirely. */
  private val stages =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), Path]()

  /** Memoized serve ARTIFACTS (saved indexes, staged query files) — the
    * [[stages]] contract applied to bm25Serve/annServe: a long session
    * re-invoking a serve entry reuses the persisted index and staged
    * queries instead of creating fresh temp dirs per call. */
  private val artifacts =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), String]()

  private def stageDir(spark: SparkSession, dir: String): Path =
    stages.computeIfAbsent((spark, dir), { _ =>
      val stage = Files.createTempDirectory("graft_replay")
      val src = Paths.get(s"$dir/events.parquet")
      val staged = stage.resolve("00_events.parquet")
      // COPY, never symlink: setLastModifiedTime FOLLOWS a symlink and
      // would bump the mtime of the read-only source file itself (root
      // bypasses the permission check) — a second staging of the same
      // file then reorders THIS stage's already-built mtime sequence
      // under it, the real events sort after the sentinels, and every
      // later stateful replay crashes on past-watermark timeouts
      // (observed: events_sessionize_stream after the events_dedup
      // double-staging landed)
      Files.copy(src, staged, StandardCopyOption.REPLACE_EXISTING)

      // sentinels 30/31 days past the max real ts: far beyond any
      // watermark delay + session gap used here
      val maxTs = spark.read.parquet(src.toString)
        .agg(max(unix_micros(col("ts").cast(TimestampType)))).head.getLong(0)
      def sentinel(name: String, offsetDays: Int, mtime: Long): Unit = {
        val one = spark.createDataFrame(
          java.util.List.of(org.apache.spark.sql.Row(
            -1L,
            java.time.LocalDateTime.ofEpochSecond(
              (maxTs / 1000000L) + offsetDays * 86400L, 0, java.time.ZoneOffset.UTC),
            -1L, "sentinel", 0.0, "")),
          eventSchema)
        writeSingleParquet(one, stage.resolve(name), mtime)
      }
      val base = System.currentTimeMillis()
      Files.setLastModifiedTime(staged, java.nio.file.attribute.FileTime.fromMillis(base - 60000))
      sentinel("01_sentinel_a.parquet", 30, base - 40000)
      sentinel("02_sentinel_b.parquet", 31, base - 20000)
      stage
    })

  /** [[stageDir]] with the event feed split into `k` hash chunks (plus
    * the same two flush sentinels) — the staging for CHUNKING-INDEPENDENT
    * consumers (watermarked window aggregations, stream-stream inner
    * joins) that take every file in ONE micro-batch: the chunk count
    * only sets scan/partial-aggregation parallelism ([[feedChunks]]
    * scaladoc); outputs are oracle-certified unchanged. Arrival-order-
    * sensitive state machines keep the single-file [[stageDir]]. */
  private def stageDirSplit(spark: SparkSession, dir: String, k: Int): Path =
    stages.computeIfAbsent((spark, s"$dir#split$k"), { _ =>
      val stage = Files.createTempDirectory("graft_replay_split")
      val src = Paths.get(s"$dir/events.parquet")
      val maxTs = spark.read.parquet(src.toString)
        .agg(max(unix_micros(col("ts").cast(TimestampType)))).head.getLong(0)
      def sentinel(name: String, offsetDays: Int, mtime: Long): Unit = {
        val one = spark.createDataFrame(
          java.util.List.of(org.apache.spark.sql.Row(
            -1L,
            java.time.LocalDateTime.ofEpochSecond(
              (maxTs / 1000000L) + offsetDays * 86400L, 0, java.time.ZoneOffset.UTC),
            -1L, "sentinel", 0.0, "")),
          eventSchema)
        writeSingleParquet(one, stage.resolve(name), mtime)
      }
      val base = System.currentTimeMillis()
      writeSplitParquet(spark.read.parquet(src.toString), stage, "00_events",
        "event_id", k, base - 60000)
      sentinel("01_sentinel_a.parquet", 30, base - 40000)
      sentinel("02_sentinel_b.parquet", 31, base - 20000)
      stage
    })

  /** Run `op` on a file-source replay of `$dir/events.parquet`, await
    * completion, return the memory-sink contents as a local batch
    * DataFrame (callers filter their own sentinel artifacts).
    *
    * `filesPerTrigger` controls micro-batch granularity. The default 1
    * delivers events, sentinel A, and sentinel B in three separate
    * batches — required by ARRIVAL-ORDER-SENSITIVE operators (the
    * sessionize gap-split, flatMapGroupsWithState machines) whose
    * within-batch behavior differs from across-batch. Operators whose
    * output is chunking-INDEPENDENT — watermarked window aggregations
    * (the no-data batch after the last file advances the watermark and
    * flushes every closed window) and stream-stream inner joins
    * (matches emit at match time) — pass a value covering all staged
    * files and pay ONE micro-batch of machinery instead of three
    * (events_range_join_stream measured 10.7 s → the join plan's real
    * cost; the oracle gate is unchanged, so the equivalence is
    * certified, not assumed).
    *
    * `shufflePartitions` sizes the query's STATE partitioning (picked up
    * at query start; a fresh checkpoint per replay means no
    * state-compat constraint). Stateful operators pay per-partition
    * store commit/maintenance every micro-batch — a stream-stream join
    * runs FOUR stores per partition — so a replay whose state is tiny
    * relative to the session's batch-sized partition count is paying
    * pure bookkeeping: events_range_join_stream at sf0.1 holds ~40k
    * state rows, and 32 partitions measured 8.7 s warm vs 3.3 s at 8
    * (StreamStats: addBatch 7.5 s → 2.2 s, state bytes unchanged).
    * This is the replay-harness twin of sizing
    * spark.sql.shuffle.partitions to state volume on a real cluster;
    * output values are partitioning-independent (oracle-certified). */
  /** State partitioning for the PER-KEY STATE MACHINE replays
    * (sessionize, asof, funnel, retention, markov, interarrival,
    * cumulative — flatMapGroupsWithState over ~user-count state, ~1.5k
    * rows at sf0.1): their per-event work is a cheap state update, so
    * with 32 state partitions the micro-batch cost is per-partition
    * store commit/maintenance — addBatch ≫ compute (round-11 driver
    * record: asof 7.3 s addBatch over 3 micro-batches holding 1,500
    * rows). Sizing state partitions to state volume is the §26g rule
    * the range join already applies; measured ladder on this family in
    * PLANS §27.
    *
    * r14: NOW ALSO applied to the watermarked window aggregations
    * (windowCounts/dau/topUsers/heavyHitters/eventsDedup). The r12
    * finding that 8 state partitions starves them predates the r13
    * k-chunk staging: the feed's per-row compute now runs in the k
    * SCAN tasks' partial aggregation, and only merged (window, key)
    * rows reach the state exchange — re-measured ladder at sf0.1
    * (32/8/4 partitions, warm): events_dau_stream 4.2/2.4/2.6 s wall
    * with 75/10.6/6.6 TASK-seconds (the excess was tasks blocked in
    * per-partition state-store machinery, not compute),
    * events_topk_stream 3.4/3.0/2.4, heavy_hitters 3.6/-/2.7. State
    * volume stays the sizing rule: ~50-100k state rows at sf0.1 →
    * 8 partitions; a deployment with GB-scale window state raises
    * SPARK_GRAFT_STATE_PARTS (or sizes shuffle partitions) to match.
    * Dev A/B override: SPARK_GRAFT_STATE_PARTS=off|<n> (the ladder in
    * PLANS §27 was measured through this; the driver never sets it). */
  private val StateMachinePartitions: Option[Int] =
    sys.env.get("SPARK_GRAFT_STATE_PARTS") match {
      case Some("off") => None
      case Some(n) => Some(n.toInt)
      case None => Some(8)
    }

  /** State-store provider A/B knob (SPARK_GRAFT_STATESTORE=rocksdb):
    * Spark ships RocksDBStateStoreProvider for exactly the
    * per-partition-bookkeeping tax the HDFSBacked default pays on these
    * replays. Measured on this harness (PLANS §27b): RocksDB is
    * uniformly 1.4-7× SLOWER per entry (asof 2.6→4.7 s, range join
    * 2.6→19.1 s, dau 4.1→21.3 s isolated-warm) — each replay opens
    * FRESH stores for 2-4 micro-batches, so RocksDB pays per-partition
    * instance open + SST/compaction cost without ever amortizing it
    * over a long-running query, and the 4-stores-per-partition join /
    * full-feed dedup shapes multiply it. Negative result recorded
    * §26g-style; a real deployment with days-long queries and
    * larger-than-heap state is where RocksDB wins, so the knob stays. */
  private val StateStoreProviderClass: Option[String] =
    sys.env.get("SPARK_GRAFT_STATESTORE").collect {
      case "rocksdb" =>
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
    }

  /** `splitFeed = true` swaps the staged feed for the [[stageDirSplit]]
    * k-chunk form and raises `filesPerTrigger` to cover every chunk +
    * both sentinels in one micro-batch — the CHUNKING-INDEPENDENT
    * consumers' mode (the old `filesPerTrigger = 3` one-batch contract,
    * now with k-way scan parallelism instead of one task for the whole
    * feed). */
  private def replay(spark: SparkSession, dir: String,
      filesPerTrigger: Int = 1, shufflePartitions: Option[Int] = None,
      splitFeed: Boolean = false)
      (op: DataFrame => DataFrame): DataFrame = {
    val tzKey = "spark.sql.session.timeZone"
    val prevTz = spark.conf.get(tzKey)
    val spKey = "spark.sql.shuffle.partitions"
    val prevSp = spark.conf.get(spKey)
    val provKey = "spark.sql.streaming.stateStore.providerClass"
    val prevProv = spark.conf.getOption(provKey)
    spark.conf.set(tzKey, "UTC")
    shufflePartitions.foreach(p => spark.conf.set(spKey, p.toString))
    StateStoreProviderClass.foreach(c => spark.conf.set(provKey, c))
    try {
      val k = if (splitFeed) feedChunks(spark) else 0
      val stage = if (splitFeed) stageDirSplit(spark, dir, k)
        else stageDir(spark, dir)
      val perTrigger = if (splitFeed) k + 2 else filesPerTrigger
      val stream = spark.readStream.schema(eventSchema)
        .option("maxFilesPerTrigger", perTrigger.toString)
        .parquet(stage.toString)
      val qname = s"graft_replay_${counter.incrementAndGet()}"
      val q = op(stream).writeStream.format("memory").queryName(qname)
        .outputMode("append").trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      // materialize under the pinned tz, before the temp dir goes away
      drainSink(spark, qname)
    } finally {
      spark.conf.set(tzKey, prevTz)
      spark.conf.set(spKey, prevSp)
      if (StateStoreProviderClass.isDefined) prevProv match {
        case Some(p) => spark.conf.set(provKey, p)
        case None => spark.conf.unset(provKey)
      }
    }
  }

  /** Drain a memory sink into a driver-local DataFrame and DROP the
    * backing temp view: the sink otherwise pins every replayed row in
    * the driver for the rest of the session — with 40+ streaming
    * entries in one Bench/Verify JVM that accumulation showed up as
    * GC-pressure inflation of unrelated later entries. */
  private def drainSink(spark: SparkSession, qname: String): DataFrame = {
    val out = spark.table(qname)
    val rows = out.collect()
    val schema = out.schema
    spark.catalog.dropTempView(qname)
    spark.createDataFrame(java.util.Arrays.asList(rows: _*), schema)
  }

  private val docSchema = StructType(Seq(
    StructField("doc_id", LongType), StructField("text", StringType),
    StructField("lang", StringType), StructField("source", StringType),
    StructField("n_chars", LongType)))

  /** Memoized documents staging, split into [[feedChunks]] hash chunks
    * (round 13 — was a single symlinked file, which capped every
    * documents replay's in-stream compute at ONE scan task; see
    * [[feedChunks]]). Every consumer takes all chunks in one
    * AvailableNow micro-batch (none sets maxFilesPerTrigger), so only
    * scan parallelism changes; the claim machines sort each state group
    * by (ts, id), so within-batch row order is irrelevant too. One per
    * (session, dir), shared by every documents replay. */
  private def stageDocs(spark: SparkSession, dir: String): Path =
    stages.computeIfAbsent((spark, s"$dir#docs"), { _ =>
      val d = Files.createTempDirectory("graft_replay_docs")
      writeSplitParquet(spark.read.parquet(s"$dir/documents.parquet"),
        d, "documents", "doc_id", feedChunks(spark),
        System.currentTimeMillis())
      d
    })

  /** Replay the driver's documents table through the STATELESS streaming
    * clean stage ([[StreamingPipeline.scoreAndGate]]) — no sentinels or
    * watermark needed (no state), one AvailableNow pass into a memory
    * sink. Returns [doc_id, quality (6dp), fingerprint]. */
  def cleanDocuments(spark: SparkSession, dir: String,
      minQuality: Double): DataFrame = {
    val stream = spark.readStream.schema(docSchema)
      .parquet(stageDocs(spark, dir).toString)
    val qname = s"graft_replay_docs_${counter.incrementAndGet()}"
    val q = StreamingPipeline.scoreAndGate(stream, minQuality)
      .select(col("doc_id"), round(col("quality"), 6).as("quality"),
        col("fingerprint"))
      .writeStream.format("memory").queryName(qname)
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    drainSink(spark, qname)
  }

  /** Streamed MinHash near-dup claims over the driver's documents table
    * ([[StreamingPipeline.nearDupStream]]): ts = doc_id seconds, one
    * AvailableNow micro-batch — claims emit AT ARRIVAL (the state
    * machine's append output), so no sentinels are needed; the
    * first-claimer of every (band, bucket) is the min doc_id under the
    * single-writer (ts, id) order, which is exactly what the oracle
    * recomputes. Returns [doc_id, band, dup_of]. */
  def nearDupDocs(spark: SparkSession, dir: String, shingleSize: Int,
      numHashes: Int, bands: Int): DataFrame = {
    val stream = spark.readStream.schema(docSchema)
      .parquet(stageDocs(spark, dir).toString)
      .withColumn("ts", timestamp_seconds(col("doc_id") + lit(ReplayTsBase)))
    val qname = s"graft_replay_neardup_${counter.incrementAndGet()}"
    val q = StreamingPipeline.nearDupStream(stream, "doc_id", "text", "ts",
        shingleSize = shingleSize, numHashes = numHashes, bands = bands)
      .toDF()
      .writeStream.format("memory").queryName(qname)
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    drainSink(spark, qname)
  }

  private val embSchema = StructType(Seq(
    StructField("vec_id", LongType),
    StructField("embedding", ArrayType(FloatType)),
    StructField("label", IntegerType)))

  /** Memoized embeddings staging WITH the planted ×2-scaled copies of
    * the dedup_embedding entry (scaling preserves hyperplane sign bits
    * exactly, so each copy provably collides with its original). */
  private def stageEmb(spark: SparkSession, dir: String, plants: Int,
      idOffset: Long): Path =
    stages.computeIfAbsent((spark, s"$dir#emb$plants/$idOffset"), { _ =>
      val d = Files.createTempDirectory("graft_replay_emb")
      val base = spark.read.parquet(s"$dir/embeddings.parquet")
        .select(col("vec_id").cast("long").as("vec_id"), col("embedding"),
          col("label").cast("int").as("label"))
      val planted = base.filter(col("vec_id") < plants)
        .select((col("vec_id") + idOffset).as("vec_id"),
          transform(col("embedding"), x => x * lit(2.0f)).as("embedding"),
          col("label"))
      // split staging (the stageDocs rationale): one batch, k scan tasks
      writeSplitParquet(base.unionByName(planted), d, "embeddings",
        "vec_id", feedChunks(spark), System.currentTimeMillis())
      d
    })

  /** Streamed embedding near-dup claims
    * ([[StreamingPipeline.embeddingNearDupStream]]) over the driver's
    * embeddings ∪ planted scaled copies: same single-batch
    * emit-at-arrival determinism as [[nearDupDocs]] (ts = vec_id
    * seconds, min vec_id claims each (table, bucket)). Returns
    * [vec_id, band, dup_of]. */
  def nearDupEmbeddings(spark: SparkSession, dir: String, plants: Int,
      idOffset: Long, dim: Int, planes: Int, tables: Int,
      seed: Int): DataFrame = {
    val stream = spark.readStream.schema(embSchema)
      .parquet(stageEmb(spark, dir, plants, idOffset).toString)
      .withColumn("ts", timestamp_seconds(col("vec_id") + lit(ReplayTsBase)))
    val qname = s"graft_replay_nearemb_${counter.incrementAndGet()}"
    val q = StreamingPipeline.embeddingNearDupStream(stream, dim,
        planes = planes, tables = tables, seed = seed)
      .toDF()
      .writeStream.format("memory").queryName(qname)
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    drainSink(spark, qname)
  }

  /** Streamed RAG chunking of the driver's documents table
    * ([[graft.pipeline.TextAnalysis.chunkDocuments]] is a pure narrow
    * map, so the streaming form is stateless — no watermark, no
    * sentinels) — gated by the SAME PipelineSql.chunkDocuments oracle
    * as the batch text_chunk row. */
  def chunkDocs(spark: SparkSession, dir: String, chunkTokens: Int,
      strideTokens: Int, minTokens: Int): DataFrame = {
    val stream = spark.readStream.schema(docSchema)
      .parquet(stageDocs(spark, dir).toString)
    val qname = s"graft_replay_chunk_${counter.incrementAndGet()}"
    val q = graft.pipeline.TextAnalysis.chunkDocuments(stream,
        chunkTokens = chunkTokens, strideTokens = strideTokens,
        minTokens = minTokens)
      .writeStream.format("memory").queryName(qname)
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    drainSink(spark, qname)
  }

  /** Run a STATELESS op over the staged document stream and return the
    * sink contents — the generic narrow-map replay for per-row gates
    * (decode, classify, chunk): no watermark, no state store, the op
    * must be expressible on an unbounded stream. */
  def mapDocs(spark: SparkSession, dir: String)
      (op: DataFrame => DataFrame): DataFrame = {
    val stream = spark.readStream.schema(docSchema)
      .parquet(stageDocs(spark, dir).toString)
    val qname = s"graft_replay_map_${counter.incrementAndGet()}"
    val q = op(stream).writeStream.format("memory").queryName(qname)
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    drainSink(spark, qname)
  }

  /** The COMPOSED at-ingest curation front door as ONE streaming pass —
    * the full ingest-time gate a crawl pipeline runs on every arriving
    * document: (1) the Gopher rule battery (pure per-row expressions),
    * (2) the CCNet bigram-LM perplexity score through the BROADCAST
    * batch-trained model ([[StreamingPipeline.lmScoreLangStream]] —
    * lang carried, no second pass, no sink join), then at the sink
    * (3) the per-lang tercile bucket against the batch-trained gate
    * artifact `th` and (4) the deterministic bucket-rate keep
    * ([[graft.pipeline.Sampling.sampleByRate]] — same doc, same
    * decision, any cluster size). Everything data-arrival-side is
    * stateless and narrow; the only batch state is the frozen LM +
    * 1-row-per-lang thresholds, both broadcastable at any corpus size.
    * Returns the KEPT docs [doc_id, lang, ppl, bucket]. */
  def curationIngest(spark: SparkSession, dir: String,
      model: graft.pipeline.TextAnalysis.LmModel,
      th: org.apache.spark.sql.DataFrame, addK: Double,
      minWords: Long, maxWords: Long, minStop: Int,
      rates: Map[String, Double], salt: String): DataFrame = {
    import graft.pipeline.{Sampling, TextAnalysis}
    val stream = spark.readStream.schema(docSchema)
      .parquet(stageDocs(spark, dir).toString)
    val gated = TextAnalysis.gopherRules(stream, minWords = minWords,
        maxWords = maxWords, minStopwords = minStop)
      .filter(col("keep"))
    val scored = StreamingPipeline.lmScoreLangStream(gated, model, addK)
    val qname = s"graft_replay_curation_${counter.incrementAndGet()}"
    val q = scored.writeStream.format("memory").queryName(qname)
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val drained = drainSink(spark, qname)
    val bucketed = TextAnalysis.bucketWithThresholds(
      drained.select(col("doc_id").cast("long").as("doc_id"),
        col("lang"), col("ppl")), th)
    val rate = rates.foldLeft(lit(0.0)) { case (acc, (b, r)) =>
      when(col("bucket") === b, lit(r)).otherwise(acc)
    }
    Sampling.sampleByRate(bucketed, rate, "doc_id", salt)
      .select(col("doc_id"), col("lang"), col("ppl"), col("bucket"))
  }

  /** EXACTLY-ONCE INGEST replay: the events table is staged TWICE (two
    * files, ascending mtimes), so with maxFilesPerTrigger=1 every event
    * arrives in two different micro-batches — the at-least-once
    * delivery scenario — and the watermarked first-occurrence state of
    * [[StreamingPipeline.dedupEventsStream]] must emit each id exactly
    * once. Duplicates carry the SAME event time, so any watermark delay
    * covers them; no flush sentinel is needed (first occurrences emit
    * immediately in append mode). Gated by the batch dedup SQL over the
    * single table. */
  def eventsDedup(spark: SparkSession, dir: String,
      watermark: String = "30 days"): DataFrame = {
    val tzKey = "spark.sql.session.timeZone"
    val prevTz = spark.conf.get(tzKey)
    val spKey = "spark.sql.shuffle.partitions"
    val prevSp = spark.conf.get(spKey)
    spark.conf.set(tzKey, "UTC")
    // state-sized partitions (the r14 window-agg re-measure above):
    // dedup state is event-id-count rows, ~100k at sf0.1
    StateMachinePartitions.foreach(p => spark.conf.set(spKey, p.toString))
    try {
      val stage = stages.computeIfAbsent((spark, s"$dir#double"), { _ =>
        val d = Files.createTempDirectory("graft_replay_double")
        val src = Paths.get(s"$dir/events.parquet")
        val base = System.currentTimeMillis()
        // COPY, never symlink — the stageDir mtime-through-symlink
        // lesson (a symlinked mtime set mutates the shared source file
        // and reorders every OTHER staging built from it)
        Seq("00_events.parquet" -> 60000L, "01_events_again.parquet" -> 30000L)
          .foreach { case (name, back) =>
            val staged = d.resolve(name)
            Files.copy(src, staged, StandardCopyOption.REPLACE_EXISTING)
            Files.setLastModifiedTime(staged,
              java.nio.file.attribute.FileTime.fromMillis(base - back))
          }
        d
      })
      val stream = spark.readStream.schema(eventSchema)
        .option("maxFilesPerTrigger", "1")
        .parquet(stage.toString)
        .withColumn("ts", col("ts").cast(TimestampType))
      val qname = s"graft_replay_evdedup_${counter.incrementAndGet()}"
      val q = StreamingPipeline.dedupEventsStream(stream, watermark = watermark)
        .select(col("event_id"), (unix_micros(col("ts")) * 1000L).as("tsn"),
          col("user_id"), col("event_type"), col("value"))
        .writeStream.format("memory").queryName(qname)
        .outputMode("append").trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      drainSink(spark, qname)
    } finally {
      spark.conf.set(tzKey, prevTz)
      spark.conf.set(spKey, prevSp)
    }
  }

  /** INCREMENTAL NEAR-DUP SERVED ON A STREAM — the daily-ingest
    * near-dup loop live: the v1 corpus's signature index builds in
    * batch ([[graft.pipeline.Dedup.minhashIndex]]), the synthesized
    * ingest batch arrives as a file stream, and TWO stateless in-stream
    * stages run per arriving doc — (1) its banded signature rows (the
    * index DELTA the pipeline appends,
    * [[StreamingPipeline.minhashIndexStream]]) and (2) the corpus probe
    * (the same banded rows stream-static-joined against the capped
    * static index with the estimated-Jaccard verify,
    * [[graft.pipeline.Dedup.corpusNearDupCandidates]]). The sink
    * resolves statuses over the drained (batch-sized) rows with the
    * SAME [[graft.pipeline.Dedup.resolveIncrementalMinhash]] the batch
    * operator uses — so the row is gated by the batch
    * dedup_incremental_minhash SQL (the Kappa split: per-doc heavy work
    * in-stream, batch-bounded resolution at the sink). */
  def incrementalMinhashServe(spark: SparkSession, dir: String,
      shingleSize: Int, numHashes: Int, bands: Int, threshold: Double,
      maxBucketSize: Int = 10000): DataFrame = {
    val d = spark.read.parquet(s"$dir/documents.parquet")
    val ten = pmod(col("doc_id"), lit(10))
    val index = graft.pipeline.Dedup.minhashIndex(d.where(ten =!= 2),
      shingleSize = shingleSize, numHashes = numHashes, bands = bands)
    val capped = graft.pipeline.Dedup.cappedIndexSide(index, maxBucketSize)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val batch = d.where(ten === 3)
      .withColumn("doc_id", col("doc_id") + lit(1000000L))
      .unionByName(d.where(ten === 2)
        .withColumn("doc_id", col("doc_id") + lit(2000000L)))
      .unionByName(d.where(ten === 2)
        .withColumn("doc_id", col("doc_id") + lit(3000000L)))
      .select(col("doc_id"), col("text"))
    val stageDir = Paths.get(artifacts.computeIfAbsent(
      (spark, s"$dir#incbatch"), { _ =>
        val sd = Files.createTempDirectory("graft_replay_incbatch")
        writeSingleParquet(batch, sd.resolve("00_batch.parquet"),
          System.currentTimeMillis())
        sd.toString
      }))
    val batchSchema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType)))
    def stream() = spark.readStream.schema(batchSchema)
      .parquet(stageDir.toString)
    // stage 1: the index delta (stateless narrow)
    val q1 = s"graft_replay_incmh_idx_${counter.incrementAndGet()}"
    val w1 = StreamingPipeline.minhashIndexStream(stream(),
        shingleSize = shingleSize, numHashes = numHashes, bands = bands)
      .writeStream.format("memory").queryName(q1)
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    // stage 2: the corpus probe (stream-static band join + est verify)
    val q2 = s"graft_replay_incmh_cand_${counter.incrementAndGet()}"
    val w2 = graft.pipeline.Dedup.corpusNearDupCandidates(
        StreamingPipeline.minhashIndexStream(stream(),
          shingleSize = shingleSize, numHashes = numHashes, bands = bands),
        capped, numHashes, threshold)
      .writeStream.format("memory").queryName(q2)
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    w1.awaitTermination(); w2.awaitTermination()
    val bIdx = drainSink(spark, q1)
    val cCand = drainSink(spark, q2)
    val out = graft.pipeline.Dedup.resolveIncrementalMinhash(
      batch.select(col("doc_id").cast("long").as("id")), cCand, bIdx,
      numHashes, threshold, maxBucketSize)
    val rows = out.collect()
    capped.unpersist(false)
    spark.createDataFrame(java.util.Arrays.asList(rows: _*), out.schema)
  }

  /** Streamed incremental EDIT-DISTANCE dedup — the crawl-frontier
    * character-level dedup served live (the incrementalMinhashServe
    * shape over the SAME staged ingest batch): per arriving doc the
    * stateless [[graft.pipeline.Dedup.fuzzyEditIndex]] projection
    * (SimHash bands + comparison prefix — a pure narrow map, no
    * StreamingPipeline adapter needed) emits (1) the index delta and
    * (2) the corpus probe ([[graft.pipeline.Dedup.corpusFuzzyCandidates]]
    * stream-static band join + thresholded Levenshtein AT INGEST); the
    * sink resolves statuses with the batch operator's own
    * [[graft.pipeline.Dedup.resolveIncrementalFuzzy]]. The index side
    * is never force-broadcast (corpus-sized by definition). Gated by
    * the batch dedup_incremental_fuzzy SQL. */
  def incrementalFuzzyServe(spark: SparkSession, dir: String,
      maxDist: Int, prefixLen: Int, maxBucketSize: Int = 10000): DataFrame = {
    val d = spark.read.parquet(s"$dir/documents.parquet")
    val ten = pmod(col("doc_id"), lit(10))
    val index = graft.pipeline.Dedup.fuzzyEditIndex(d.where(ten =!= 2),
      prefixLen = prefixLen)
    val capped = graft.pipeline.Dedup.cappedFuzzyIndexSide(index, maxBucketSize)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val batch = d.where(ten === 3)
      .withColumn("doc_id", col("doc_id") + lit(1000000L))
      .unionByName(d.where(ten === 2)
        .withColumn("doc_id", col("doc_id") + lit(2000000L)))
      .unionByName(d.where(ten === 2)
        .withColumn("doc_id", col("doc_id") + lit(3000000L)))
      .select(col("doc_id"), col("text"))
    // the staged ingest batch is IDENTICAL to incrementalMinhashServe's
    // — share the artifact key so the fixture stages once per session
    val stageDir = Paths.get(artifacts.computeIfAbsent(
      (spark, s"$dir#incbatch"), { _ =>
        val sd = Files.createTempDirectory("graft_replay_incbatch")
        writeSingleParquet(batch, sd.resolve("00_batch.parquet"),
          System.currentTimeMillis())
        sd.toString
      }))
    val batchSchema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType)))
    def stream() = spark.readStream.schema(batchSchema)
      .parquet(stageDir.toString)
    val q1 = s"graft_replay_incfz_idx_${counter.incrementAndGet()}"
    val w1 = graft.pipeline.Dedup.fuzzyEditIndex(stream(), prefixLen = prefixLen)
      .writeStream.format("memory").queryName(q1)
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    val q2 = s"graft_replay_incfz_cand_${counter.incrementAndGet()}"
    val w2 = graft.pipeline.Dedup.corpusFuzzyCandidates(
        graft.pipeline.Dedup.fuzzyEditIndex(stream(), prefixLen = prefixLen),
        capped, maxDist)
      .writeStream.format("memory").queryName(q2)
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    w1.awaitTermination(); w2.awaitTermination()
    val bIdx = drainSink(spark, q1)
    val cCand = drainSink(spark, q2)
    val out = graft.pipeline.Dedup.resolveIncrementalFuzzy(
      batch.select(col("doc_id").cast("long").as("id")), cCand, bIdx,
      maxDist, maxBucketSize)
    val rows = out.collect()
    capped.unpersist(false)
    spark.createDataFrame(java.util.Arrays.asList(rows: _*), out.schema)
  }

  /** Streamed incremental EMBEDDING dedup — the daily vector-ingest
    * loop served live (the dedup_url_stream shape on the semantic
    * fingerprint): each arriving vector builds the incremental
    * fixture's batch parts, signatures through the KNOWN-dim
    * [[graft.pipeline.Ann.signaturesCol]] (a streaming Dataset cannot
    * be probed for dim), probes the capped signature index on the
    * bucket key and verifies the exact cosine — all AT INGEST,
    * stateless; the sink runs the SAME batch-bounded resolution as the
    * batch operator
    * ([[graft.pipeline.Dedup.resolveIncrementalEmbedding]]). The index
    * side is NOT force-broadcast — it is corpus-sized by definition
    * (the ml_knn broadcast-direction lesson): the join is a plain
    * bucket-keyed stream-static equi-join, at scale stored bucketed on
    * `bucket` (sources.Bucketing) for an exchange-light probe; the
    * planner broadcasts it on its own when small. Gated by the batch
    * dedup_incremental_embedding SQL. */
  def embeddingDedupServe(spark: SparkSession, dir: String,
      index: DataFrame, threshold: Double, planes: Int, seed: Int,
      dim: Int, maxBucketSize: Int = 10000): DataFrame = {
    import graft.pipeline.{Ann, Dedup}
    val stream = spark.readStream.schema(embSchema)
      .parquet(stageEmb(spark, dir, plants = 0, idOffset = 0L).toString)
    val okIdx = index.groupBy(col("bucket")).agg(count(lit(1)).as("_n"))
      .filter(col("_n") <= maxBucketSize).select(col("bucket"))
    val iB = index.join(okIdx, Seq("bucket"), "left_semi")
      .select(col("bucket"), col("id").as("cid"), col("vec").as("cv"))
    val ten = pmod(col("vec_id"), lit(10))
    val parts = stream.select(col("vec_id"), explode(array(
        struct(lit(3L).as("sel"), (col("vec_id") + 1000000L).as("id"),
          transform(col("embedding"), x => x * lit(2.0f)).as("vec")),
        struct(lit(2L).as("sel"), (col("vec_id") + 2000000L).as("id"),
          transform(col("embedding"), x => x * lit(2.0f)).as("vec")),
        struct(lit(2L).as("sel"), (col("vec_id") + 3000000L).as("id"),
          transform(col("embedding"), x => x * lit(4.0f)).as("vec"))))
        .as("p"))
      .filter(ten === col("p.sel"))
      .select(col("p.id").as("id"), col("p.vec").as("vec"))
    val ingested = parts
      .select(col("id"), col("vec"),
        posexplode(Ann.signaturesCol(col("vec"), dim, planes, seed, 1))
          .as(Seq("tbl", "bucket")))
      .select(col("id"), col("vec"), col("bucket"))
      .join(iB, Seq("bucket"), "left")
      .select(col("id"), col("vec"), col("bucket"), col("cid"),
        when(col("cid").isNotNull,
          round(Ann.cosine(col("vec"), col("cv")), 6)).as("cos"))
    val qname = s"graft_replay_embdedup_${counter.incrementAndGet()}"
    val q = ingested.writeStream.format("memory").queryName(qname)
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val drained = drainSink(spark, qname)
    Dedup.resolveIncrementalEmbedding(
      drained.select(col("id"), col("bucket"), col("vec"))
        .dropDuplicates("id", "bucket"),
      drained.filter(col("cid").isNotNull)
        .select(col("id"), col("cid"), col("cos")),
      threshold, maxBucketSize)
  }

  /** Streamed embedding drift (the embed_drift twin): v1 centroids are
    * the BATCH artifact (groups-sized — broadcastable at any corpus
    * size); arriving v2 vectors resolve their source, apply the
    * fixture perturbation and run the narrow (g, pos, x) projection
    * ([[graft.pipeline.Ann.groupPoints]]) AT INGEST; the sink runs the
    * SAME DECIMAL-mean centroid assembly + full-double cosine compare
    * as the batch operator. Gated by the batch embed_drift SQL. */
  def embedDriftServe(spark: SparkSession, dir: String): DataFrame = {
    import graft.pipeline.Ann
    val src = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id").cast("long").as("vec_id"), col("source"))
    val v1 = spark.read.parquet(s"$dir/embeddings.parquet")
      .join(src, Seq("vec_id"))
    val c1 = Ann.centroidsOf(Ann.groupPoints(v1, "source"))
    val stream = spark.readStream.schema(embSchema)
      .parquet(stageEmb(spark, dir, plants = 0, idOffset = 0L).toString)
    val v2 = stream.join(broadcast(src), Seq("vec_id"))
      .filter(!col("source").rlike("^src1$"))
      .withColumn("embedding",
        when(col("source").rlike("[02468]$"),
          concat(array(element_at(col("embedding"), 1) + lit(0.5f)),
            slice(col("embedding"), 2, 1000000)))
          .otherwise(col("embedding")))
    val qname = s"graft_replay_embdrift_${counter.incrementAndGet()}"
    val q = Ann.groupPoints(v2, "source")
      .writeStream.format("memory").queryName(qname)
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    Ann.driftFromCentroids(c1, Ann.centroidsOf(drainSink(spark, qname)))
  }

  /** Streamed language ID — the stopword-vote classifier as an
    * ingest-time gate: a pure per-row expression (no state, no
    * shuffle), so the streaming form IS the batch operator applied to
    * the staged doc stream; gated by the same langId SQL. */
  def langId(spark: SparkSession, dir: String): DataFrame = {
    val stream = spark.readStream.schema(docSchema)
      .parquet(stageDocs(spark, dir).toString)
    val qname = s"graft_replay_lang_${counter.incrementAndGet()}"
    val q = graft.pipeline.TextAnalysis.languageId(stream)
      .writeStream.format("memory").queryName(qname)
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    drainSink(spark, qname)
  }

  /** ONLINE BM25 SERVING: the inverted index builds in batch, persists
    * through [[graft.sources.SearchIO]] (save → load — the serving
    * artifact round-trip sits on the oracle path), and the QUERY stream
    * explodes to terms and stream-static joins the loaded postings on
    * the term key (stateless — the [[annServe]] shape for text
    * retrieval); the per-(query, doc) sum + top-k rank run at the sink
    * via the SAME [[graft.pipeline.TextAnalysis.bm25RankContrib]] the
    * batch path uses. Gated by the batch text_bm25 oracle. */
  def bm25Serve(spark: SparkSession, docsDf: DataFrame,
      queries: Seq[(Long, String)], topK: Int, k1: Double,
      b: Double): DataFrame = {
    import spark.implicits._
    // memoized on the docs PLAN (semantic hash) — repeat invocations in
    // one session reuse the saved index instead of re-building it
    val ixDir = artifacts.computeIfAbsent(
      (spark, s"bm25ix#${docsDf.queryExecution.logical.semanticHash()}"), { _ =>
        val index = graft.pipeline.TextAnalysis.buildBm25Index(docsDf)
        val d = Files.createTempDirectory("graft_bm25_serve").toString
        graft.sources.SearchIO.save(index, d)
        d
      })
    val loaded = graft.sources.SearchIO.load(spark, ixDir)
    val qDf = queries.toDF("query_id", "query_text")
    val qDir = Paths.get(artifacts.computeIfAbsent(
      (spark, s"bm25q#${queries.hashCode()}"), { _ =>
        val d = Files.createTempDirectory("graft_bm25_q")
        writeSingleParquet(qDf, d.resolve("00_queries.parquet"),
          System.currentTimeMillis())
        d.toString
      }))
    val qStream = spark.readStream.schema(qDf.schema).parquet(qDir.toString)
    val contrib = graft.pipeline.TextAnalysis.bm25Contributions(
      loaded, qStream, k1, b)
    val qname = s"graft_replay_bm25_${counter.incrementAndGet()}"
    val q = contrib.writeStream.format("memory").queryName(qname)
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    graft.pipeline.TextAnalysis.bm25RankContrib(
      drainSink(spark, qname),
      topK, loaded.idCol)
  }

  /** TF-IDF keyword extraction on a stream — the at-ingest twin of the
    * text_tfidf row: corpus statistics (per-term document frequencies +
    * the document count) FREEZE from the batch snapshot, arriving docs
    * explode to per-occurrence (doc, term) rows and stream-static join
    * the frozen df table on the term key (stateless — the bm25Serve
    * shape pointed at documents instead of queries); the per-doc tf
    * roll-up + score + top-k rank run at the sink via the SAME
    * [[graft.pipeline.TextAnalysis.tfidfRankFromTf]] the batch path
    * uses. Because the replayed docs ARE the frozen corpus, the result
    * is gated by the batch text_tfidf oracle. */
  def tfidfServe(spark: SparkSession, dir: String, topK: Int): DataFrame = {
    import graft.pipeline.TextAnalysis
    val docsDf = spark.read.parquet(s"$dir/documents.parquet")
    val nonBlank = docsDf.filter(length(trim(col("text"))) > 0)
    val toks = nonBlank.select(col("doc_id"),
      explode(TextAnalysis.tokensCol(col("text"))).as("term"))
    // vocab-sized df table collected to a lineage-free LocalRelation
    // (r13 ADVICE: the lazy sink-side join kept a .persist() pinned for
    // the rest of the session on every tfidf replay — the LocalRelation
    // needs no cache entry and the broadcast reads it directly)
    val dfT = graft.operators.RelationalEm.collectLocal(
      toks.groupBy(col("term"))
        .agg(countDistinct(col("doc_id")).as("df_t")))
    val nDocs = nonBlank.count()
    // ONE packed row per doc through the memory sink (the
    // bpe_encode_stream sink-traffic rule): the previous shape shipped
    // one (doc, term, df_t) row per token OCCURRENCE through the sink
    // and its driver collect — ~50× the rows for identical math. The
    // stream keeps the expensive scan (tokenize); the df join and the
    // tf rollup move to the sink, where they run as a normal batch job
    // over doc-count rows. Values unchanged (same counts, same join) —
    // gated by the same batch text_tfidf oracle.
    val stream = spark.readStream.schema(docSchema)
      .parquet(stageDocs(spark, dir).toString)
      .filter(length(trim(col("text"))) > 0)
      .select(col("doc_id"), TextAnalysis.tokensCol(col("text")).as("terms"))
    val qname = s"graft_replay_tfidf_${counter.incrementAndGet()}"
    val q = stream.writeStream.format("memory").queryName(qname)
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val tf = drainSink(spark, qname)
      .select(col("doc_id"), explode(col("terms")).as("term"))
      .join(broadcast(dfT), Seq("term"))
      .groupBy(col("doc_id"), col("term"), col("df_t"))
      .agg(count(lit(1)).as("tf"))
      .withColumn("n_docs", lit(nDocs))
    TextAnalysis.tfidfRankFromTf(tf, topK)
  }

  /** UNIGRAM TOKENIZER APPLICATION on a stream — the serving split for
    * the SentencePiece-family tokenizer (the bpe_encode_stream twin):
    * the [[graft.pipeline.Unigram.Model]] trains in batch, arriving
    * docs Viterbi-segment word by word in a stateless broadcast-model
    * pass, and the sink rolls per-piece occurrence counts into the
    * report. Occurrence counting ≡ the weighted word-count form, and
    * one serve pass under the R-round model ≡ the (R+1)-round train's
    * final E-step, so the row is gated by the unigramTrain oracle with
    * rounds+1. */
  def unigramEncode(spark: SparkSession, dir: String,
      model: graft.pipeline.Unigram.Model, maxWordLen: Int,
      reportK: Int): DataFrame = {
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(model)
    // pieces pre-counted PER DOC in-stream, one packed row per doc — the
    // memory sink (and its driver collect) pays per-ROW overhead, and a
    // piece-per-row stream shipped millions of rows through it
    // (bpe_encode_stream lesson; measured 6.6 s → isolated re-measure
    // after packing). Counts are integers, so the pack is exact.
    val perDoc = mapDocs(spark, dir) { st =>
      st.select(split(lower(col("text")), "[^a-z]+").as("words"))
        .as[Seq[String]]
        .map { ws =>
          val m = scala.collection.mutable.HashMap.empty[String, Long]
          ws.foreach { w =>
            if (w.nonEmpty && w.length <= maxWordLen)
              graft.pipeline.Unigram.segment(w, bc.value)
                .foreach(p => m.update(p, m.getOrElse(p, 0L) + 1L))
          }
          m.toArray.unzip
        }.toDF("pieces", "ns")
    }
    val counts = perDoc
      .select(explode(arrays_zip(col("pieces"), col("ns"))).as("z"))
      .groupBy(col("z.pieces").as("piece"))
      .agg(sum(col("z.ns")).as("c"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toSeq
    graft.pipeline.Unigram.report(spark, counts, model.lnp.size, reportK)
  }

  /** Streamed VW ingestion — the reference's primary text format read
    * LIVE: staged VowpalWabbit lines arrive as a text stream and each
    * parses through the SAME [[graft.sources.VwReader.parseLine]] as
    * the batch reader (doc identity rides the title, never line order —
    * which is also why the streaming form is legal: a file stream has
    * no stable global line numbering). Returns the per-(doc, token)
    * digest rows, gated by the batch ingest_vw oracle. */
  def ingestVw(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    val parsed = spark.readStream.text(path).as[String]
      .map(l => graft.sources.VwReader.parseLine(l, -1L))
      .filter(_ != null)
      .flatMap(d => d.tokens.iterator.map(t =>
        (d.title.substring(1).toLong, t.token, t.weight.toDouble.toLong)))
      .toDF("doc_id", "token", "tf")
    val qname = s"graft_replay_vw_${counter.incrementAndGet()}"
    val q = parsed.writeStream.format("memory").queryName(qname)
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    drainSink(spark, qname)
  }

  /** Streamed JSONL ingestion — the staged JSONL corpus read back
    * through readStream.json with the PINNED schema (the Kafka-era
    * pipeline entry point: documents arrive as JSON lines), digested by
    * the same original-parquet oracle as the batch ingest_jsonl row.
    * Stateless; any encode/decode loss breaks the hash. */
  def ingestJsonl(spark: SparkSession, dir: String): DataFrame = {
    val path = graft.sources.JsonlIO.stageDocuments(spark, dir)
    val stream = spark.readStream
      .schema(graft.sources.JsonlIO.documentsSchema).json(path)
      .select(col("doc_id").cast("long").as("doc_id"),
        md5(col("text")).as("text_md5"), col("lang"), col("source"),
        col("n_chars").cast("long").as("n_chars"))
    val qname = s"graft_replay_jsonl_${counter.incrementAndGet()}"
    val q = stream.writeStream.format("memory").queryName(qname)
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    drainSink(spark, qname)
  }

  /** ONLINE ANN SERVING: the IVF-PQ index builds in batch, persists
    * through [[graft.sources.AnnIO]] (save → load — the serving
    * artifact round-trip is on the oracle path), and the QUERY stream
    * runs [[graft.pipeline.Ann.queryIvfPqCandidates]] — probe explode +
    * a stream-static equi-join on the cell key against the loaded CODES
    * table (stateless; raw corpus vectors appear nowhere) — with the
    * per-query top-k ranked at the sink (windows don't stream; the
    * candidate set is nprobe/cells of the corpus per query, the same
    * bound the batch rank pays). Same oracle as ann_ivfpq. */
  def annServe(spark: SparkSession, dir: String, numQueries: Int, k: Int,
      numCentroids: Int, nprobe: Int, m: Int, pqCentroids: Int,
      sampleSize: Int,
      /** route build assignment AND the in-stream query probes through
        * the hierarchical router (levels = 2 -> the IMI TreeProbes
        * tree); AnnIO persists router_levels, so the loaded index
        * serves with exactly the router that assigned it. */
      hierarchicalRouting: Boolean = false, routerLevels: Int = 1): DataFrame = {
    val ixDir = artifacts.computeIfAbsent(
      (spark, s"$dir#annix$numCentroids/$m/$pqCentroids/$sampleSize/" +
        s"$hierarchicalRouting/$routerLevels"), { _ =>
        val emb = spark.read.parquet(s"$dir/embeddings.parquet")
        val built = graft.pipeline.Ann.buildIvfPq(emb,
          numCentroids = numCentroids, m = m, pqCentroids = pqCentroids,
          iters = 0, pqIters = 0, sampleSize = sampleSize,
          hierarchicalRouting = hierarchicalRouting,
          routerLevels = routerLevels)
        val d = Files.createTempDirectory("graft_ann_serve").toString
        graft.sources.AnnIO.save(built, d)
        d
      })
    val index = graft.sources.AnnIO.load(spark, ixDir)
    val qStream = spark.readStream.schema(embSchema)
      .parquet(stageEmb(spark, dir, plants = 0, idOffset = 0L).toString)
      .filter(col("vec_id") < numQueries)
    val qname = s"graft_replay_annserve_${counter.incrementAndGet()}"
    val q = graft.pipeline.Ann.queryIvfPqCandidates(index, qStream, nprobe)
      .writeStream.format("memory").queryName(qname)
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val cand = drainSink(spark, qname)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id")).orderBy(col("adc").asc, col("id"))
    cand.withColumn("rank", org.apache.spark.sql.functions.row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank").cast("long").as("rank"), col("id"),
        round(col("adc"), 6).as("adc"))
  }

  /** Streamed incremental EXACT dedup — the simplest daily-ingest loop
    * served live: each arriving doc fingerprints (md5 of the normalized
    * text — the [[graft.pipeline.Dedup.exact]] key) and LEFT-joins the
    * historical fingerprint index AT INGEST (stream-static, stateless;
    * the index side is never force-broadcast — the dedup_url_stream
    * rule); the sink runs the batch-bounded within-batch min + the SAME
    * [[graft.pipeline.Dedup.resolveIncrementalJoined]] status rules as
    * the batch row. Gated by the batch dedup_incremental SQL. */
  def incrementalExactServe(spark: SparkSession, dir: String): DataFrame = {
    val d = spark.read.parquet(s"$dir/documents.parquet")
    val ten = pmod(col("doc_id"), lit(10))
    val index = graft.pipeline.Dedup.exact(d.where(ten =!= 2))
      .select(col("fingerprint"), col("canonical_id").as("__corpus_canon"))
    val batch = d.where(ten === 3)
      .withColumn("doc_id", col("doc_id") + lit(1000000L))
      .unionByName(d.where(ten === 2)
        .withColumn("doc_id", col("doc_id") + lit(2000000L)))
      .unionByName(d.where(ten === 2)
        .withColumn("doc_id", col("doc_id") + lit(3000000L)))
      .select(col("doc_id"), col("text"))
    // the staged ingest batch is IDENTICAL to incrementalMinhashServe's
    // — share the artifact key so the fixture stages once per session
    val stageDir = Paths.get(artifacts.computeIfAbsent(
      (spark, s"$dir#incbatch"), { _ =>
        val sd = Files.createTempDirectory("graft_replay_incbatch")
        writeSingleParquet(batch, sd.resolve("00_batch.parquet"),
          System.currentTimeMillis())
        sd.toString
      }))
    val batchSchema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType)))
    val stream = spark.readStream.schema(batchSchema)
      .parquet(stageDir.toString)
    val fps = stream.select(col("doc_id").cast("long").as("id"),
      md5(regexp_replace(trim(lower(col("text"))), "\\s+", " "))
        .as("fingerprint"))
    val qname = s"graft_replay_incex_${counter.incrementAndGet()}"
    val q = fps.join(index, Seq("fingerprint"), "left")
      .writeStream.format("memory").queryName(qname)
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val joined = drainSink(spark, qname)
    val firsts = joined.groupBy(col("fingerprint"))
      .agg(min(col("id")).as("__batch_first"))
    graft.pipeline.Dedup.resolveIncrementalJoined(
      joined.join(firsts, Seq("fingerprint")), "fingerprint")
  }

  /** Incremental IMAGE dedup served at ingest — the phash daily-ingest
    * loop with the arriving media batch as a STREAM: each arriving
    * image pays the decode + dHash in-stream
    * ([[graft.pipeline.Multimodal.imagePhash]], a stateless narrow
    * mapPartitions — the expensive stage), and the drained fingerprint
    * table resolves at the sink against the historical index + its own
    * batch through the SAME joins as the batch row
    * ([[graft.pipeline.Multimodal.incrementalPhashFromFps]]). Gated by
    * the batch dedup_incremental_phash SQL. `key` memoizes the staged
    * media parquet per (session, sfDir). */
  def incrementalPhashServe(spark: SparkSession, key: String,
      index: DataFrame, batch: DataFrame, maxHamming: Int): DataFrame = {
    val stageDir = Paths.get(artifacts.computeIfAbsent((spark, key), { _ =>
      val sd = Files.createTempDirectory("graft_replay_phashbatch")
      writeSingleParquet(batch, sd.resolve("00_media.parquet"),
        System.currentTimeMillis())
      sd.toString
    }))
    val mediaSchema = StructType(Seq(
      StructField("media_id", LongType), StructField("payload", BinaryType)))
    val stream = spark.readStream.schema(mediaSchema)
      .parquet(stageDir.toString)
    val qname = s"graft_replay_incph_${counter.incrementAndGet()}"
    val q = graft.pipeline.Multimodal.imagePhash(stream)
      .writeStream.format("memory").queryName(qname)
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    graft.pipeline.Multimodal.incrementalPhashFromFps(index,
      drainSink(spark, qname), maxHamming)
  }

  /** INDEX MAINTENANCE at ingest — the ann_incremental lifecycle with
    * the arriving batch as a STREAM: the index trains on the
    * pre-existing corpus only (vec_id % mod <> 0), each arriving new
    * vector is encoded against the FROZEN centroids/codebooks as one
    * stateless narrow projection ([[graft.pipeline.Ann.encodeIntoIndex]]
    * — two native codegen expressions over broadcast artifacts, exactly
    * what a 100 TB ingest pipeline appends to the codes store), and the
    * serve at the sink unions old + streamed codes through the SAME
    * [[graft.pipeline.Ann.queryIvfPq]] as the batch twin. Gated by the
    * annIvfPqIncremental SQL. */
  def annIncrementalIngest(spark: SparkSession, dir: String,
      numQueries: Int, k: Int, numCentroids: Int, nprobe: Int, m: Int,
      pqCentroids: Int, sampleSize: Int, mod: Int): DataFrame = {
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val index = graft.pipeline.Ann.buildIvfPq(
      emb.filter(col("vec_id") % mod =!= 0),
      numCentroids = numCentroids, m = m, pqCentroids = pqCentroids,
      iters = 0, pqIters = 0, sampleSize = sampleSize)
    val batchStream = spark.readStream.schema(embSchema)
      .parquet(stageEmb(spark, dir, plants = 0, idOffset = 0L).toString)
      .filter(col("vec_id") % mod === 0)
    val qname = s"graft_replay_annincr_${counter.incrementAndGet()}"
    val q = graft.pipeline.Ann.encodeIntoIndex(index, batchStream)
      .writeStream.format("memory").queryName(qname)
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val grown = index.copy(codes =
      index.codes.unionByName(drainSink(spark, qname)))
    graft.pipeline.Ann.queryIvfPq(grown,
        emb.filter(col("vec_id") < numQueries), k, nprobe)
      .select(col("query_id"), col("rank").cast("long").as("rank"),
        col("id"), round(col("adc"), 6).as("adc"))
  }

  /** Quantized (SQ8) vector serving AT INGEST — arriving query vectors
    * are encoded against the FROZEN per-dim [lo, hi] codebook (2·d
    * broadcast doubles, [[graft.pipeline.Ann.sq8Stats]]) as a stateless
    * narrow map, scored against the static int8 code table in-stream
    * ([[graft.pipeline.Ann.sq8Score]] — planner-sized static side,
    * never force-broadcast), and ranked at the sink. Gated by the SAME
    * annSq8 batch SQL. */
  def sq8Serve(spark: SparkSession, dir: String, numQueries: Int, k: Int,
      levels: Int): DataFrame = {
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val (lo, hi) = graft.pipeline.Ann.sq8Stats(emb)
    val codes = graft.pipeline.Ann.sq8EncodeWith(emb, lo, hi, levels)
    val qStream = graft.pipeline.Ann.sq8EncodeWith(
      spark.readStream.schema(embSchema)
        .parquet(stageEmb(spark, dir, plants = 0, idOffset = 0L).toString)
        .filter(col("vec_id") < numQueries), lo, hi, levels)
    val qname = s"graft_replay_sq8serve_${counter.incrementAndGet()}"
    val q = graft.pipeline.Ann.sq8Score(codes, qStream,
        broadcastQueries = false)
      .writeStream.format("memory").queryName(qname)
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    graft.pipeline.Ann.sq8Rank(drainSink(spark, qname), k)
  }

  /** Shard MANIFEST at ingest — every arriving document is assigned its
    * shard, digest and token count as one stateless narrow projection
    * ([[graft.pipeline.Sampling.shardManifestPerDoc]]); the per-shard
    * rollup (counts + the (hash, key)-ordered content digest — no
    * window, the order key rides each row) runs at the sink through the
    * SAME aggregation code as the batch twin. */
  def manifestIngest(spark: SparkSession, dir: String, nShards: Int,
      salt: String): DataFrame = {
    val stream = spark.readStream.schema(docSchema)
      .parquet(stageDocs(spark, dir).toString)
    val qname = s"graft_replay_manifest_${counter.incrementAndGet()}"
    val q = graft.pipeline.Sampling
      .shardManifestPerDoc(stream, "doc_id", "text", nShards, salt)
      .writeStream.format("memory").queryName(qname)
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    graft.pipeline.Sampling.shardManifestFromPerDoc(drainSink(spark, qname))
  }

  /** ONLINE kNN classification — arriving query vectors classified
    * against the static labeled train split: the scoring half
    * (Ann.knnScore — broadcast train side, stateless stream-static
    * join) runs in-stream, the rank + majority vote (Ann.knnVote) at
    * the sink; gated by the batch ml_knn SQL. */
  def knnServe(spark: SparkSession, dir: String, numQueries: Int,
      k: Int): DataFrame = {
    val train = spark.read.parquet(s"$dir/embeddings.parquet")
      .filter(col("vec_id") >= numQueries)
    val qStream = spark.readStream.schema(embSchema)
      .parquet(stageEmb(spark, dir, plants = 0, idOffset = 0L).toString)
      .filter(col("vec_id") < numQueries)
    val qname = s"graft_replay_knnserve_${counter.incrementAndGet()}"
    val q = graft.pipeline.Ann
      .knnScore(train, qStream, "vec_id", "embedding", "label")
      .writeStream.format("memory").queryName(qname)
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    graft.pipeline.Ann.knnVote(drainSink(spark, qname), k)
  }

  /** Streamed source-centroid similarity (the embed_source_sim twin):
    * arriving embedding vectors resolve their source via a broadcast
    * stream-static join and run the narrow (g, pos, x) projection
    * (Ann.groupPoints) AT INGEST; the sink runs the SAME
    * centroidSimFromPoints aggregation as the batch operator — the
    * DECIMAL-sum means are order-insensitive, so micro-batch arrival
    * order can't move the report. Gated by the batch SQL. */
  def sourceCentroidSim(spark: SparkSession, dir: String): DataFrame = {
    val src = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id").cast("long").as("vec_id"), col("source"))
    val stream = spark.readStream.schema(embSchema)
      .parquet(stageEmb(spark, dir, plants = 0, idOffset = 0L).toString)
    val qname = s"graft_replay_srcsim_${counter.incrementAndGet()}"
    val q = graft.pipeline.Ann
      .groupPoints(stream.join(broadcast(src), Seq("vec_id")), "source")
      .writeStream.format("memory").queryName(qname)
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    graft.pipeline.Ann.centroidSimFromPoints(drainSink(spark, qname))
  }

  /** Memoized PARITY-SPLIT documents staging: two single parquet files
    * (doc_id even, then odd) with ascending mtimes, so a
    * maxFilesPerTrigger=1 AvailableNow replay delivers exactly the two
    * doc-parity chunks the batch fit_online entries train on, in
    * order. */
  private def stageDocsParity(spark: SparkSession, dir: String): Path =
    stages.computeIfAbsent((spark, s"$dir#parity"), { _ =>
      val d = Files.createTempDirectory("graft_replay_parity")
      val docs = spark.read.parquet(s"$dir/documents.parquet")
      def one(name: String, parity: Int, mtime: Long): Unit = {
        val chunk = docs.filter(col("doc_id") % 2 === parity)
        // an EMPTY parity file would diverge from the batch twin: the
        // batch loop consumes (and decays by) rho_i for every listed
        // chunk, while an empty micro-batch consumes no rho — refuse
        // rather than silently fit with shifted merge weights
        require(!chunk.isEmpty,
          s"stageDocsParity: parity-$parity chunk is empty — the replay " +
            "would consume different rho indices than the batch fit")
        writeSingleParquet(chunk, d.resolve(name), mtime)
      }
      val base = System.currentTimeMillis()
      one("00_even.parquet", 0, base - 60000)
      one("01_odd.parquet", 1, base - 30000)
      d
    })

  /** Streamed ONLINE FIT: [[StreamingFit]]'s foreachBatch online EM
    * driven by the parity-split document stream — each micro-batch is
    * one online chunk, so the streamed model state equals the batch
    * `Fit.fitOnline` over the same two chunks (same ρ schedule, same
    * decay merge). Returns the final p_wt (driver-held local, like the
    * reference master's Phi). */
  def fitOnline(spark: SparkSession, dir: String, pwt0: DataFrame,
      numTopics: Int, tau0: Double, kappa: Double): DataFrame = {
    val stream = spark.readStream.schema(docSchema)
      .option("maxFilesPerTrigger", "1")
      .parquet(stageDocsParity(spark, dir).toString)
    val docsDs = graft.sources.Corpus.fromDocumentsTable(stream)
    val fitter = new StreamingOnlineFit(pwt0,
      graft.operators.Fit.Config(numTopics = numTopics,
        estep = graft.operators.EStepConfig(numDocumentPasses = 1)),
      tau0, kappa)
    val q = fitter.writer(docsDs).trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val pwt = fitter.currentPwt // driver-held local — survives close()
    fitter.close()
    pwt
  }

  /** Streamed TOPIC INFERENCE: the staged document stream through
    * [[StreamingPipeline.transformStream]] with a fixed batch-trained
    * phi — stateless (one phi broadcast + a narrow mapPartitions, no
    * state store), so the streamed theta is row-for-row the batch
    * `Fit.transform` result. Returns [doc_id, title, weights]. */
  def transformDocs(spark: SparkSession, dir: String, pwt: DataFrame,
      numTopics: Int): DataFrame = {
    val stream = spark.readStream.schema(docSchema)
      .parquet(stageDocs(spark, dir).toString)
    val docsDs = graft.sources.Corpus.fromDocumentsTable(stream)
    val qname = s"graft_replay_transform_${counter.incrementAndGet()}"
    val q = StreamingPipeline.transformStream(docsDs, pwt, numTopics,
        graft.operators.EStepConfig(numDocumentPasses = 1))
      .writeStream.format("memory").queryName(qname)
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    drainSink(spark, qname)
  }

  /** Streamed bigram-LM perplexity scoring: the LM trains in BATCH on
    * the same parquet ([[graft.pipeline.TextAnalysis.trainLmModel]]),
    * the staged doc stream is scored statelessly
    * ([[StreamingPipeline.lmScoreStream]]) — gated by the SAME
    * PipelineSql.lmPerplexity statement as the batch row. */
  def lmPerplexity(spark: SparkSession, dir: String, addK: Double,
      modelOpt: Option[graft.pipeline.TextAnalysis.LmModel] = None)
      : DataFrame = {
    // modelOpt: a pre-trained full-corpus model (SparkEntry memoizes one
    // per session — four entries re-trained the identical LM before r13)
    val model = modelOpt.getOrElse(graft.pipeline.TextAnalysis.trainLmModel(
      spark.read.parquet(s"$dir/documents.parquet")))
    val stream = spark.readStream.schema(docSchema)
      .parquet(stageDocs(spark, dir).toString)
    val qname = s"graft_replay_lm_${counter.incrementAndGet()}"
    val q = StreamingPipeline.lmScoreStream(stream, model, addK)
      .writeStream.format("memory").queryName(qname)
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    drainSink(spark, qname)
  }

  /** Streamed Kneser-Ney scoring: the KN count tables train in BATCH on
    * the same salted-md5 train split as the batch entry
    * ([[graft.pipeline.TextAnalysis.trainKnModel]]), arriving docs are
    * split-filtered in-stream by the same md5 prefix expression and
    * scored statelessly against the broadcast model
    * ([[StreamingPipeline.knScoreStream]]) — gated by the SAME
    * PipelineSql.lmKneserNey statement as the batch row. */
  def lmKneserNey(spark: SparkSession, dir: String, discount: Double,
      addK: Double, trainRate: Double, salt: String): DataFrame = {
    val model = graft.pipeline.TextAnalysis.trainKnModel(
      spark.read.parquet(s"$dir/documents.parquet"), trainRate, salt)
    val heldOut = spark.readStream.schema(docSchema)
      .parquet(stageDocs(spark, dir).toString)
      .filter(!(graft.pipeline.Sampling.hashPrefix(col("doc_id"), salt) <
        lit(graft.pipeline.Sampling.rateThreshold(trainRate))))
    val qname = s"graft_replay_kn_${counter.incrementAndGet()}"
    val q = StreamingPipeline.knScoreStream(heldOut, model, discount, addK)
      .writeStream.format("memory").queryName(qname)
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    drainSink(spark, qname)
  }

  /** Streamed DSIR gate — the daily-ingest shape of
    * [[graft.pipeline.Sampling.importanceSample]]: both bigram LMs are
    * trained batch-side (the frozen selection model), every arriving
    * doc scores statelessly in-stream
    * ([[StreamingPipeline.importanceScoreStream]]), the deterministic
    * top-k ranks at the sink. Gated by the batch sample_importance
    * SQL. */
  def importanceSample(spark: SparkSession, dir: String,
      targetLang: String, topK: Int, addK: Double): DataFrame = {
    val docsDf = spark.read.parquet(s"$dir/documents.parquet")
    val target = graft.pipeline.TextAnalysis.trainLmModel(
      docsDf.filter(col("lang") === targetLang))
    val raw = graft.pipeline.TextAnalysis.trainLmModel(docsDf)
    val stream = spark.readStream.schema(docSchema)
      .parquet(stageDocs(spark, dir).toString)
    val qname = s"graft_replay_dsir_${counter.incrementAndGet()}"
    val q = StreamingPipeline
      .importanceScoreStream(stream, target, raw, addK)
      .writeStream.format("memory").queryName(qname)
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    drainSink(spark, qname)
      .orderBy(col("score").desc, col("doc_id")).limit(topK)
  }

  /** Streamed DICTIONARY GATHER — the reference's collection-ingest →
    * dictionary path as a Kappa split: the stream emits one
    * (class, token, weight-sum) partial per document (a narrow per-doc
    * fold, no state), and [[graft.operators.DictionaryOps
    * .gatherFromPartials]] finishes tf/df/value at the sink with the
    * batch operator's exact math. Gated by the same dict_gather SQL. */
  def dictGather(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val stream = spark.readStream.schema(docSchema)
      .parquet(stageDocs(spark, dir).toString)
    val docsDs = graft.sources.Corpus.fromDocumentsTable(stream)
    val perDoc = docsDs.flatMap { d =>
      val m = scala.collection.mutable.LinkedHashMap.empty[(String, String), Double]
      d.tokens.foreach { t =>
        val k = (t.class_id, t.token)
        m(k) = m.getOrElse(k, 0.0) + t.weight.toDouble
      }
      m.iterator.map { case ((c, tok), w) => (c, tok, w) }
    }.toDF("class_id", "token", "w")
    val qname = s"graft_replay_dict_${counter.incrementAndGet()}"
    val q = perDoc.writeStream.format("memory").queryName(qname)
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    graft.operators.DictionaryOps.gatherFromPartials(
      drainSink(spark, qname))
  }

  /** Streamed WINDOWED CO-OCCURRENCE GATHER — the reference's
    * parse-time cooc collection (core/collection_parser.cc:658-725) as
    * a Kappa split: each arriving doc emits its per-doc pair tfs (the
    * SAME [[graft.operators.Cooc.docPairTfs]] fold the batch gather
    * runs — a narrow stateless map), and the sink finishes
    * cooc_tf = Σtf / cooc_df = doc-row count. In-doc tfs are small
    * integers, so the two-level float sum is exact and the stream is
    * gated by the batch cooc_window SQL. */
  def coocGather(spark: SparkSession, dir: String,
      windowWidth: Int): DataFrame = {
    import spark.implicits._
    val stream = spark.readStream.schema(docSchema)
      .parquet(stageDocs(spark, dir).toString)
    // ONE packed row per doc to the memory sink (the bpe_encode_stream
    // sink-traffic trick — the sink pays per-ROW overhead and the
    // flatMap form shipped docs×pairs rows), re-exploded at the sink
    // into the identical aggregation
    val perDoc = graft.sources.Corpus.fromDocumentsTablePositional(stream)
      .map { doc =>
        graft.operators.Cooc.docPairTfs(doc, windowWidth, symmetric = true)
          .map { case ((c, a, b), tf) => (c, a, b, tf) }.toSeq
      }.toDF("pairs")
    val qname = s"graft_replay_cooc_${counter.incrementAndGet()}"
    val q = perDoc.writeStream.format("memory").queryName(qname)
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    drainSink(spark, qname)
      .select(explode(col("pairs")).as("p"))
      .select(col("p._1").as("class_id"), col("p._2").as("token_a"),
        col("p._3").as("token_b"), col("p._4").as("tf"))
      .groupBy(col("class_id"), col("token_a"), col("token_b"))
      .agg(sum(col("tf")).cast("float").as("cooc_tf"),
        count(lit(1)).cast("float").as("cooc_df"))
  }

  /** Streamed corpus statistics — the Kappa split for the data-card
    * numbers: the per-document token counting (a pure narrow map) runs
    * in the stream, and the per-source rollup is the SAME
    * [[graft.pipeline.TextAnalysis.corpusStats]] aggregation as the
    * batch row, over the docs-sized sink table. */
  def corpusStats(spark: SparkSession, dir: String): DataFrame = {
    val stream = spark.readStream.schema(docSchema)
      .parquet(stageDocs(spark, dir).toString)
    val qname = s"graft_replay_cstats_${counter.incrementAndGet()}"
    val q = graft.pipeline.TextAnalysis.tokenCounts(stream)
      .select(col("source"), col("ws_tokens"))
      .writeStream.format("memory").queryName(qname)
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    graft.pipeline.TextAnalysis.corpusStats(drainSink(spark, qname),
      exact = true)
  }

  /** Streamed BPE tokenizer APPLICATION — the Kappa split for online
    * ingestion: the merge table trains in BATCH (tiny, rides along as
    * stacked codegen'd replaces), the doc stream runs the pure-narrow
    * [[graft.pipeline.Bpe.encode]] statelessly (one row per subword
    * occurrence), and the per-subword count rollup happens over the
    * sink. Occurrence counting ≡ the batch vocabulary form
    * (n_occ = Σ_words cnt·occ), so the row rides the same oracle as
    * bpe_encode. Returns [subword, n_occ]. */
  def bpeSubwordCounts(spark: SparkSession, dir: String,
      merges: Seq[(String, String)], maxWordLen: Int): DataFrame = {
    val stream = spark.readStream.schema(docSchema)
      .parquet(stageDocs(spark, dir).toString)
    val qname = s"graft_replay_bpe_${counter.incrementAndGet()}"
    // one sink row per DOC (subword array), not per occurrence — sink
    // traffic is docs-sized; the rollup explodes at the sink
    val q = graft.pipeline.Bpe.encodeDocSubwords(stream, merges,
        maxWordLen = maxWordLen)
      .select(col("subwords"))
      .writeStream.format("memory").queryName(qname)
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    drainSink(spark, qname)
      .select(explode(col("subwords")).as("subword"))
      .groupBy(col("subword")).agg(count(lit(1)).as("n_occ"))
  }

  /** WORDPIECE TOKENIZER APPLICATION on a stream — the
    * [[bpeSubwordCounts]] twin for the greedy `##`-continuation
    * encoder: vocabulary trains in batch, arriving docs greedy-segment
    * word by word in a stateless narrow pass (one piece-array row per
    * doc), and the sink rolls per-piece occurrence counts — gated by
    * the batch wordpiece_encode oracle. */
  def wordpiecePieceCounts(spark: SparkSession, dir: String,
      vocab: Seq[String], maxWordLen: Int, maxPieceLen: Int): DataFrame = {
    val stream = spark.readStream.schema(docSchema)
      .parquet(stageDocs(spark, dir).toString)
    val qname = s"graft_replay_wp_${counter.incrementAndGet()}"
    val q = graft.pipeline.WordPiece.encodeDocPieces(stream, vocab,
        maxWordLen = maxWordLen, maxPieceLen = maxPieceLen)
      .select(col("pieces"))
      .writeStream.format("memory").queryName(qname)
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    drainSink(spark, qname)
      .select(explode(col("pieces")).as("subword"))
      .groupBy(col("subword")).agg(count(lit(1)).as("n_occ"))
  }

  /** Streamed NB classification of the driver's documents table: the
    * model trains in BATCH on the same parquet, then the staged doc
    * stream is scored statelessly ([[StreamingPipeline.classifyStream]])
    * — gated by the SAME PipelineSql.naiveBayes statement as the batch
    * classify_nb row. Returns [doc_id, source, pred, margin]. */
  def classifyDocs(spark: SparkSession, dir: String,
      modelOpt: Option[graft.pipeline.Classify.NbModel] = None): DataFrame = {
    // modelOpt: a pre-trained NbModel (the lmPerplexity modelOpt seam) —
    // SparkEntry memoizes one model across the four classify/confusion
    // entries instead of retraining per entry
    val model = modelOpt.getOrElse(graft.pipeline.Classify.trainNbModel(
      spark.read.parquet(s"$dir/documents.parquet")))
    val stream = spark.readStream.schema(docSchema)
      .parquet(stageDocs(spark, dir).toString)
    val qname = s"graft_replay_nb_${counter.incrementAndGet()}"
    val q = StreamingPipeline.classifyStream(stream, model)
      .writeStream.format("memory").queryName(qname)
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    drainSink(spark, qname)
  }

  /** Streamed sessionization of the driver's events table, shaped to the
    * batch [[graft.pipeline.Temporal.sessionize]] contract
    * [user_id, session_idx, session_start, session_end (epoch-ns longs),
    * n_events, sum_value]. `session_idx` is recomputed over the closed
    * sessions (1-based in start order per user — identical numbering to
    * the batch running-sum since sessions are disjoint). */
  def sessionize(spark: SparkSession, dir: String, gapNs: Long): DataFrame = {
    val sess = replay(spark, dir, shufflePartitions = StateMachinePartitions) { ev =>
      StreamingPipeline.sessionize(
        ev, gapSeconds = gapNs / 1000000000L, watermark = "30 minutes").toDF()
    }
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy("session_start")
    sess
      .where(col("user_id") >= 0) // drop the sentinel user's sessions
      .withColumn("session_idx", row_number().over(w).cast("long"))
      .select(col("user_id"), col("session_idx"),
        (unix_micros(col("session_start")) * 1000L).as("session_start"),
        (unix_micros(col("session_end")) * 1000L).as("session_end"),
        col("events").as("n_events"),
        round(col("total_value"), 6).as("sum_value"))
  }

  /** Streamed tumbling-window aggregation of the driver's events table,
    * shaped to the batch [[graft.pipeline.Temporal.tumblingAgg]] contract
    * [window_start (epoch-ns long), event_type, n_events, sum_value].
    * `widthNs` must be whole seconds (window duration strings are); epoch
    * alignment matches the batch `ts - ts mod w` floor. */
  def windowCounts(spark: SparkSession, dir: String, widthNs: Long): DataFrame = {
    require(widthNs % 1000000000L == 0, "window width must be whole seconds")
    val maxNs = graft.pipeline.Temporal.readEvents(spark, dir)
      .agg(max("ts")).head.getLong(0)
    val win = replay(spark, dir, shufflePartitions = StateMachinePartitions,
        splitFeed = true) { ev =>
      StreamingPipeline.eventWindowCounts(
        ev.withColumn("ts", col("ts").cast(TimestampType)),
        windowLength = s"${widthNs / 1000000000L} seconds",
        watermark = "30 minutes")
    }
    win.select(
        (unix_micros(col("window.start")) * 1000L).as("window_start"),
        col("event_type"), col("events").as("n_events"),
        round(col("total_value"), 6).as("sum_value"))
      .where(col("window_start") <= maxNs) // drop sentinel-day windows
  }

  /** Streamed hopping-window aggregation, shaped to the batch
    * [[graft.pipeline.Temporal.hoppingAgg]] contract
    * [window_start (epoch-ns long), event_type, n_events, sum_value]. */
  def hoppingCounts(spark: SparkSession, dir: String, widthNs: Long,
      slideNs: Long): DataFrame = {
    require(widthNs % 1000000000L == 0 && slideNs % 1000000000L == 0,
      "window width/slide must be whole seconds")
    val maxNs = graft.pipeline.Temporal.readEvents(spark, dir)
      .agg(max("ts")).head.getLong(0)
    val win = replay(spark, dir, shufflePartitions = StateMachinePartitions,
        splitFeed = true) { ev =>
      StreamingPipeline.eventHoppingCounts(
        ev.withColumn("ts", col("ts").cast(TimestampType)),
        windowLength = s"${widthNs / 1000000000L} seconds",
        slide = s"${slideNs / 1000000000L} seconds",
        watermark = "30 minutes")
    }
    win.select(
        (unix_micros(col("window.start")) * 1000L).as("window_start"),
        col("event_type"), col("events").as("n_events"),
        round(col("total_value"), 6).as("sum_value"))
      .where(col("window_start") <= maxNs)
  }

  /** Streamed tumbling-window OHLC of the driver's events table, shaped
    * to the batch [[graft.pipeline.Temporal.ohlc]] contract
    * [event_type, bucket (epoch-ns long), open, close, low, high,
    * n_events, mean_value]. */
  def ohlc(spark: SparkSession, dir: String, bucketNs: Long): DataFrame = {
    require(bucketNs % 1000000000L == 0, "bucket width must be whole seconds")
    val maxNs = graft.pipeline.Temporal.readEvents(spark, dir)
      .agg(max("ts")).head.getLong(0)
    val out = replay(spark, dir, shufflePartitions = StateMachinePartitions,
        splitFeed = true) { ev =>
      StreamingPipeline.ohlcStream(
        ev.withColumn("ts", col("ts").cast(TimestampType)),
        windowLength = s"${bucketNs / 1000000000L} seconds",
        watermark = "30 minutes")
    }
    out.select(col("event_type"),
        (unix_micros(col("window.start")) * 1000L).as("bucket"),
        col("open"), col("close"), col("low"), col("high"),
        col("n_events"), col("mean_value"))
      .where(col("bucket") <= maxNs) // drop the sentinel-day windows
  }

  /** Streamed exact DAU of the driver's events table, shaped to the batch
    * [[graft.pipeline.Temporal.activeUsers]] contract
    * [day (epoch-ns long), n_users]. */
  def activeUsers(spark: SparkSession, dir: String): DataFrame = {
    val maxNs = graft.pipeline.Temporal.readEvents(spark, dir)
      .agg(max("ts")).head.getLong(0)
    val dau = replay(spark, dir, shufflePartitions = StateMachinePartitions,
        splitFeed = true) { ev =>
      StreamingPipeline.activeUsersExactStream(
        ev.withColumn("ts", col("ts").cast(TimestampType)),
        windowLength = "1 day", watermark = "1 day")
    }
    dau.select((unix_micros(col("day")) * 1000L).as("day"), col("n_users"))
      .where(col("day") <= maxNs) // drop any sentinel-day window
  }

  /** Streamed as-of enrichment of the driver's events table
    * (purchase ← most recent prior view), shaped to the batch
    * [[graft.pipeline.Temporal.asofJoin]] entry contract
    * [event_id, user_id, ts_ns, matched_event_id, matched_ts, gap_ns]. */
  def asof(spark: SparkSession, dir: String, leftType: String,
      rightType: String): DataFrame = {
    val out = replay(spark, dir, shufflePartitions = StateMachinePartitions) { ev =>
      StreamingPipeline.asofStream(
        ev.withColumn("ts_ns",
          unix_micros(col("ts").cast(TimestampType)) * 1000L),
        leftType, rightType).toDF()
    }
    out.where(col("user_id") >= 0)
      .select(col("event_id"), col("user_id"), col("ts_ns"),
        col("matched_event_id"), col("matched_ts"), col("gap_ns"))
  }

  /** TRUE stream-stream interval join — both sides of the
    * click→purchase range join arrive as STREAMS (a self-join of the
    * staged event feed), with a watermark on each side and the
    * event-time range condition in the join predicate: the canonical
    * Structured Streaming interval-join shape, where Spark evicts a
    * buffered row once the other side's watermark passes its
    * ts + window, so join state is bounded at any corpus size (a batch
    * interval join holds both relations). Inner join — matches emit at
    * arrival; gated by the SAME TemporalSql statement as the batch
    * events_range_join row. */
  def rangeJoin(spark: SparkSession, dir: String, leftType: String,
      rightType: String, windowNs: Long): DataFrame = {
    require(windowNs % 1000000000L == 0, "join window must be whole seconds")
    val wSec = windowNs / 1000000000L
    val out = replay(spark, dir, shufflePartitions = Some(8),
        splitFeed = true) { ev =>
      val base = ev.withColumn("ets", col("ts").cast(TimestampType))
      val l = base.where(col("event_type") === leftType)
        .select(col("user_id").as("l_user"),
          col("event_id").as("l_event_id"), col("ets").as("l_ts"))
        .withWatermark("l_ts", "30 minutes")
      val r = base.where(col("event_type") === rightType)
        .select(col("user_id").as("r_user"),
          col("event_id").as("r_event_id"), col("ets").as("r_ts"))
        .withWatermark("r_ts", "30 minutes")
      l.join(r, expr(
        s"""l_user = r_user AND
           |r_ts >= l_ts - INTERVAL $wSec SECONDS AND
           |r_ts <= l_ts + INTERVAL $wSec SECONDS""".stripMargin))
    }
    out.where(col("l_user") >= 0)
      .select(col("l_user").as("user_id"), col("l_event_id"),
        col("r_event_id"),
        ((unix_micros(col("r_ts")) - unix_micros(col("l_ts"))) * 1000L)
          .as("delta_ns"))
  }

  /** Streamed ordered-funnel of the driver's events table, shaped to the
    * batch [[graft.pipeline.Temporal.funnel]] contract
    * [step (1-based long), event_type, n_users]: the stream emits
    * (user, step) advances, the rollup counts users per step with
    * zero-filled rows for unreached steps. */
  def funnel(spark: SparkSession, dir: String, steps: Seq[String],
      horizonNs: Long): DataFrame = {
    import spark.implicits._
    val reached = replay(spark, dir, shufflePartitions = StateMachinePartitions) { ev =>
      StreamingPipeline.funnelStream(
        ev.withColumn("ts_ns",
          unix_micros(col("ts").cast(TimestampType)) * 1000L),
        steps, horizonNs).toDF()
    }
    val counts = reached.where(col("user_id") >= 0)
      .groupBy(col("step")).agg(count(lit(1)).as("n_users"))
    steps.zipWithIndex
      .map { case (et, i) => (i + 1L, et, i) }
      .toDF("step", "event_type", "__idx")
      .join(counts.select(col("step").as("__idx"), col("n_users")),
        Seq("__idx"), "left")
      .select(col("step"), col("event_type"),
        coalesce(col("n_users"), lit(0L)).as("n_users"))
  }

  /** Streamed per-type top-k users — the Kappa split for a leaderboard:
    * the corpus-sized counting runs IN the stream as a watermarked
    * daily-window (window, type, user) aggregation (bounded state:
    * windows expire past the watermark), and the sink sums a user's
    * windows and ranks with the SAME
    * [[graft.pipeline.Temporal.topUsersFromCounts]] as the batch row —
    * integer counts, so the split is exact. Gated by the batch
    * events_topk oracle. */
  def topUsers(spark: SparkSession, dir: String, k: Int): DataFrame = {
    val win = replay(spark, dir, shufflePartitions = StateMachinePartitions,
        splitFeed = true) { ev =>
      ev.withColumn("ts", col("ts").cast(TimestampType))
        .withWatermark("ts", "30 minutes")
        .groupBy(window(col("ts"), "86400 seconds"), col("event_type"),
          col("user_id"))
        .agg(count(lit(1)).as("n"))
    }
    graft.pipeline.Temporal.topUsersFromCounts(
      win.where(col("user_id") >= 0)
        .groupBy(col("event_type"), col("user_id"))
        .agg(sum(col("n")).as("n_events")), k)
  }

  /** Streamed gap-filled resample — the [[windowCounts]] watermarked
    * tumbling aggregation in the stream, the
    * [[graft.pipeline.Temporal.resampleFromAgg]] spine/gap-fill over
    * the bounded bucket table at the sink (per-window sums are already
    * the batch-rounded values, so the split is exact). */
  def resample(spark: SparkSession, dir: String, widthNs: Long): DataFrame =
    graft.pipeline.Temporal.resampleFromAgg(
      windowCounts(spark, dir, widthNs), widthNs)

  /** Streamed session health report — the stateful [[sessionize]]
    * replay produces the closed sessions, and the sink runs the SAME
    * [[graft.pipeline.Temporal.sessionStatsFromSessions]] aggregate as
    * the batch row (whole-second integer durations keep every mean and
    * percentile engine-exact). */
  def sessionStats(spark: SparkSession, dir: String,
      gapNs: Long): DataFrame = {
    val sess = sessionize(spark, dir, gapNs)
    val dur = col("session_end") - col("session_start")
    graft.pipeline.Temporal.sessionStatsFromSessions(
      sess.select(col("user_id"), col("n_events"),
        ((dur - pmod(dur, lit(graft.pipeline.Temporal.NsPerSecond)))
          / lit(graft.pipeline.Temporal.NsPerSecond))
          .cast("long").as("dur_s")))
  }

  /** Streamed heavy-hitter detection — the same Kappa split as
    * [[topUsers]] (watermarked daily (window, type, user) counts
    * in-stream, bounded state), with the sink summing windows and
    * applying the SAME scale-free threshold
    * ([[graft.pipeline.Temporal.heavyHittersFromCounts]]) as the batch
    * row. Integer counts ⇒ the split is exact. */
  def heavyHitters(spark: SparkSession, dir: String,
      factor: Double): DataFrame = {
    val win = replay(spark, dir, shufflePartitions = StateMachinePartitions,
        splitFeed = true) { ev =>
      ev.withColumn("ts", col("ts").cast(TimestampType))
        .withWatermark("ts", "30 minutes")
        .groupBy(window(col("ts"), "86400 seconds"), col("event_type"),
          col("user_id"))
        .agg(count(lit(1)).as("n"))
    }
    graft.pipeline.Temporal.heavyHittersFromCounts(
      win.where(col("user_id") >= 0)
        .groupBy(col("event_type"), col("user_id"))
        .agg(sum(col("n")).as("n_events")), factor)
  }

  /** Streamed rolling z-score anomaly detection: the WATERMARKED
    * tumbling aggregation builds the per-type bucket series in the
    * stream (the corpus-sized pass — [[windowCounts]]' machinery), and
    * the shared [[graft.pipeline.Temporal.anomaliesFromCounts]] scoring
    * runs over the bounded bucket table at the sink — the Kappa split,
    * gated by the SAME TemporalSql.anomalies statement as the batch
    * row. */
  def anomalies(spark: SparkSession, dir: String, widthNs: Long,
      lookback: Int, zThreshold: Double): DataFrame =
    graft.pipeline.Temporal.anomaliesFromCounts(
      windowCounts(spark, dir, widthNs)
        .select(col("window_start"), col("event_type"), col("n_events")),
      lookback, zThreshold)

  /** Streamed cohort retention of the driver's events table, shaped to
    * the batch [[graft.pipeline.Temporal.retention]] contract
    * [cohort_week, week_offset, n_users]: the stream emits one
    * (user, cohort, offset) first-activity row per pair, the rollup
    * counts them. */
  def retention(spark: SparkSession, dir: String, bucketNs: Long): DataFrame = {
    val visits = replay(spark, dir, shufflePartitions = StateMachinePartitions) { ev =>
      StreamingPipeline.retentionStream(
        ev.withColumn("ts_ns",
          unix_micros(col("ts").cast(TimestampType)) * 1000L),
        bucketNs).toDF()
    }
    visits.where(col("user_id") >= 0)
      .groupBy(col("cohort_week"), col("week_offset"))
      .agg(count(lit(1)).as("n_users"))
  }

  /** Streamed benchmark decontamination of the driver's documents table:
    * the benchmark n-gram pool builds in BATCH from the same parquet
    * (doc_id < benchDocs), the doc stream (doc_id >= benchDocs) runs the
    * stateless shingle + stream-static join
    * ([[StreamingPipeline.decontaminateHitsStream]]), and the per-doc
    * rollup happens over the sink — gated by the SAME
    * PipelineSql.textDecontaminate statement as the batch row.
    * Returns [doc_id, n_hits]. */
  def decontaminate(spark: SparkSession, dir: String, benchDocs: Long,
      n: Int): DataFrame = {
    val benchSh = spark.read.parquet(s"$dir/documents.parquet")
      .filter(col("doc_id") < benchDocs)
      .select(explode(graft.pipeline.Dedup.shingles(col("text"), n)).as("g"))
      .distinct()
    val stream = spark.readStream.schema(docSchema)
      .parquet(stageDocs(spark, dir).toString)
      .filter(col("doc_id") >= benchDocs)
    val qname = s"graft_replay_decont_${counter.incrementAndGet()}"
    val q = StreamingPipeline.decontaminateHitsStream(stream, benchSh, n)
      .writeStream.format("memory").queryName(qname)
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val local = drainSink(spark, qname)
    local.groupBy(col("id"))
      .agg(count(lit(1)).as("n_hits"))
      .select(col("id").as("doc_id"), col("n_hits").cast("long").as("n_hits"))
  }

  /** Streamed Markov transition matrix of the driver's events table,
    * shaped to the batch [[graft.pipeline.Temporal.markovTransitions]]
    * contract [from_type, to_type, n, prob]: the stateful pair extractor
    * runs in the stream, then the SAME
    * [[graft.pipeline.Temporal.transitionMatrix]] aggregation as batch. */
  def markov(spark: SparkSession, dir: String): DataFrame = {
    val pairs = replay(spark, dir, shufflePartitions = StateMachinePartitions) { ev =>
      StreamingPipeline.markovStream(
        ev.withColumn("ts_ns",
          unix_micros(col("ts").cast(TimestampType)) * 1000L)).toDF()
    }
    graft.pipeline.Temporal.transitionMatrix(
      pairs.where(col("user_id") >= 0) // drop the sentinel user
        .select(col("from_type"), col("to_type")))
  }

  /** Streamed per-user running aggregates of the driver's events table,
    * shaped to the batch [[graft.pipeline.Temporal.cumulative]] contract
    * [user_id, ts (epoch-ns long), event_id, event_type,
    * n_events_so_far, cum_value]. The micro-unit integer state makes the
    * running sum bit-identical to the batch DECIMAL window sum. */
  /** Kappa inter-arrival stats: the stateful one-long-per-user gap
    * extractor in-stream, the SAME
    * [[graft.pipeline.Temporal.interarrivalFromGaps]] aggregate at the
    * sink — gated by the batch events_interarrival SQL. */
  def interarrival(spark: SparkSession, dir: String): DataFrame = {
    val gaps = replay(spark, dir, shufflePartitions = StateMachinePartitions) { ev =>
      StreamingPipeline.interarrivalStream(
        ev.withColumn("ts_ns",
          unix_micros(col("ts").cast(TimestampType)) * 1000L)).toDF()
    }
    graft.pipeline.Temporal.interarrivalFromGaps(
      gaps.where(col("user_id") >= 0)) // drop the sentinel user
  }

  def cumulative(spark: SparkSession, dir: String): DataFrame = {
    val out = replay(spark, dir, shufflePartitions = StateMachinePartitions) { ev =>
      StreamingPipeline.cumulativeStream(
        ev.withColumn("ts_ns",
          unix_micros(col("ts").cast(TimestampType)) * 1000L)).toDF()
    }
    out.where(col("user_id") >= 0) // drop the sentinel user
      .select(col("user_id"), col("ts_ns").as("ts"), col("event_id"),
        col("event_type"), col("n_events_so_far"),
        round(col("cum_micro").cast("double") / lit(1e6), 6).as("cum_value"))
  }
}
