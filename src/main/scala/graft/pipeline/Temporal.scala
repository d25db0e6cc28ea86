package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal / event-log analytics: sessionization, as-of join, tumbling
  * and hopping window aggregation, ordered funnels, cohort retention —
  * the batch counterparts of `graft.streaming`'s windowed/sessionized
  * streams, over the driver's `events` table.
  *
  * Timestamps: [[readEvents]] normalizes `ts` to an epoch-NANOS plain
  * long whichever way the parquet encodes it (`timestamp[us]` in the
  * current testdata, TIMESTAMP(NANOS) historically — see its doc), and
  * every operator below does pure integer arithmetic on it (pmod for
  * bucket floors, long compares for gaps). That is deliberate: no
  * timezone dependence, and the DuckDB oracle reproduces each value
  * exactly via `epoch_ns(ts)`.
  * Nothing here divides a raw epoch-ns by anything in floating point —
  * 1.7e18 exceeds a double's 2^53 integer range, so ts/width in double
  * arithmetic is off-by-one territory; window starts are computed as
  * `ts - pmod(ts, width)` (exact long ops only).
  *
  * Scale notes: every window below is partitioned by a natural key
  * (user_id) — never a global window. Per-user history is bounded by
  * user activity, so partition skew is bounded; the heavy shuffles are
  * all map-side combined aggregations on (bucket, type)-shaped keys.
  */
object Temporal {

  val NsPerSecond: Long = 1000L * 1000 * 1000
  val NsPerMinute: Long = 60L * NsPerSecond
  val NsPerHour: Long = 60L * NsPerMinute
  val NsPerDay: Long = 24L * NsPerHour
  val NsPerWeek: Long = 7L * NsPerDay

  /** Events table with `ts` as epoch-nanos long (see class doc),
    * accepting either physical encoding the driver has shipped:
    *
    *   - `timestamp[ns]` parquet: read via
    *     `spark.sql.legacy.parquet.nanosAsLong` (Spark rejects NANOS
    *     otherwise) as an epoch-ns long, then TRUNCATE the sub-µs part
    *     (`ts - ts mod 1000`) — DuckDB's TIMESTAMP is µs-granular, so the
    *     oracle can only ever see µs-truncated values.
    *   - `timestamp[us]` parquet (current testdata): arrives as
    *     TIMESTAMP_NTZ (naive wall clock). Converted to epoch-µs with the
    *     wall clock interpreted as UTC — the session timezone is pinned
    *     to UTC for the duration of the (eagerly analyzed) projection so
    *     the NTZ→TIMESTAMP cast inside `unix_micros` is
    *     machine-tz-independent — then ×1000 to epoch-ns. This matches
    *     DuckDB's `epoch_ns(ts)` exactly (DuckDB's naive TIMESTAMP epoch
    *     is UTC-interpreted too), and is already µs-granular so no
    *     further truncation is needed.
    *
    * Either way downstream sees the same thing: a µs-granular epoch-ns
    * long, all-integer arithmetic from here on. */
  def readEvents(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = spark.read.parquet(s"$dir/events.parquet")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", col("ts") - pmod(col("ts"), lit(1000L)))
      case _ => // TIMESTAMP_NTZ (or LTZ): pin tz, convert, restore.
        val tzKey = "spark.sql.session.timeZone"
        val prevTz = spark.conf.get(tzKey)
        spark.conf.set(tzKey, "UTC")
        try {
          // Dataset creation analyzes eagerly, so the cast's zone id is
          // captured HERE (under UTC), not at action time.
          raw.withColumn("ts",
            unix_micros(col("ts").cast(org.apache.spark.sql.types.TimestampType)) * lit(1000L))
        } finally spark.conf.set(tzKey, prevTz)
    }
  }

  /** Exact floor-to-bucket of an epoch-ns long column: `ts - (ts mod w)`.
    * Integer ops only — see class doc for why not `floor(ts / w)`. */
  private def bucketStart(ts: org.apache.spark.sql.Column, widthNs: Long) =
    ts - pmod(ts, lit(widthNs))

  /** Exactly-once event dedup — the idempotent-ingest primitive: one
    * row per `idCol` (at-least-once delivery and replayed partitions
    * produce EXACT copies, so any survivor is the same row; the
    * streamed twin is [[graft.streaming.StreamingPipeline
    * .dedupEventsStream]]'s watermarked first-occurrence state). One
    * hash aggregation on the id key — map-side combined, no window. */
  def dedupEvents(events: DataFrame, idCol: String = "event_id"): DataFrame =
    events.dropDuplicates(idCol)

  /** Gaps-and-islands sessionization: a new session starts where the gap
    * to the user's previous event exceeds `gapNs`. Output is one row per
    * session: (user_id, session_idx, session_start, session_end,
    * n_events, sum_value).
    *
    * Shape: one shuffle for the per-user window (lag + running sum over
    * `Window.partitionBy(user)`), one map-side-combined aggregation for
    * the per-session rollup. The window is never global; each user's
    * history sorts inside its hash partition.
    */
  def sessionize(events: DataFrame, gapNs: Long = 30 * NsPerMinute): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val flagged = events
      .withColumn("__prev", lag("ts", 1).over(w))
      .withColumn("__new", when(col("__prev").isNull ||
        col("ts") - col("__prev") > gapNs, 1L).otherwise(0L))
      .withColumn("session_idx",
        sum("__new").over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    flagged.groupBy(col("user_id"), col("session_idx"))
      .agg(min("ts").as("session_start"), max("ts").as("session_end"),
        count(lit(1)).as("n_events"),
        round(sum("value"), 6).as("sum_value"))
  }

  /** One-row session health report over [[sessionize]]'s output — the
    * sessionize→aggregate seam as a single operator: session counts,
    * per-session event-count stats, and duration stats. Durations are
    * floor-divided to whole SECONDS first (exact integer arithmetic —
    * the numerator is an exact multiple of 10⁹ ≤ 2^53, so the one
    * double division is exact in any engine; a mean over raw epoch-ns
    * magnitudes would be last-ulp engine-dependent), then means and
    * exact interpolating percentiles run on small exact integers (the
    * corpus_stats / quantile_cont precedent). Returns
    * [n_sessions, n_users, mean_events, p50_events, mean_duration_s,
    * p50_duration_s, p90_duration_s]. */
  def sessionStats(events: DataFrame, gapNs: Long = 30 * NsPerMinute): DataFrame = {
    val dur = col("session_end") - col("session_start")
    sessionStatsFromSessions(
      sessionize(events, gapNs).select(col("user_id"), col("n_events"),
        ((dur - pmod(dur, lit(NsPerSecond))) / lit(NsPerSecond))
          .cast("long").as("dur_s")))
  }

  /** The aggregate half of [[sessionStats]] over a per-session
    * [user_id, n_events, dur_s] table — shared by the batch row and the
    * streaming replay (whole-second integer durations keep every mean
    * and percentile engine-exact). */
  def sessionStatsFromSessions(d: DataFrame): DataFrame = {
    d.agg(
      count(lit(1)).as("n_sessions"),
      countDistinct(col("user_id")).as("n_users"),
      round(avg(col("n_events")), 6).as("mean_events"),
      round(expr("percentile(n_events, 0.5)").cast("double"), 6).as("p50_events"),
      round(avg(col("dur_s")), 6).as("mean_duration_s"),
      round(expr("percentile(dur_s, 0.5)").cast("double"), 6).as("p50_duration_s"),
      round(expr("percentile(dur_s, 0.9)").cast("double"), 6).as("p90_duration_s"))
  }

  /** Per-user inter-arrival statistics — the gap/churn profile behind
    * retention models and bot screens (machine traffic shows near-zero
    * gaps; churning users show exploding ones). Consecutive-event deltas
    * per user (ordered by (ts, event_id) — the sessionize tie-break),
    * floor-divided to whole SECONDS first (the [[sessionStats]]
    * exact-integer contract: means/percentiles over small exact longs,
    * never over epoch-ns magnitudes), then aggregated per user:
    * [user_id, n_gaps, mean_gap_s, p50_gap_s, p90_gap_s, max_gap_s].
    * Users with a single event have no gaps and are absent.
    *
    * Shape at scale: ONE user_id shuffle — the lag window and the
    * per-user aggregate share the same hash partitioning, so Catalyst
    * plans a single Exchange; no join, no second pass. */
  def interarrival(events: DataFrame): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val gap = col("ts") - col("__prev")
    interarrivalFromGaps(events
      .withColumn("__prev", lag("ts", 1).over(w))
      .filter(col("__prev").isNotNull)
      .select(col("user_id"),
        ((gap - pmod(gap, lit(NsPerSecond))) / lit(NsPerSecond))
          .cast("long").as("gap_s")))
  }

  /** The aggregate half of [[interarrival]] over a per-gap
    * [user_id, gap_s] table — shared by the batch row and the streaming
    * replay (whose state machine emits one whole-second gap per
    * consecutive-event pair at arrival). */
  def interarrivalFromGaps(gaps: DataFrame): DataFrame =
    gaps.groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_gaps"),
        round(avg(col("gap_s")), 6).as("mean_gap_s"),
        round(expr("percentile(gap_s, 0.5)").cast("double"), 6).as("p50_gap_s"),
        round(expr("percentile(gap_s, 0.9)").cast("double"), 6).as("p90_gap_s"),
        max(col("gap_s")).as("max_gap_s"))

  /** As-of join: for each left row, the most recent right row of the same
    * key with `right.ts <= left.ts` (ties included; among right rows with
    * identical (key, ts) the one with the greatest `tieCol` wins).
    *
    * Implemented as the single-shuffle union trick — no join at all:
    * stack both sides, sort each key's rows by (ts, side, tie) with right
    * rows first at equal ts, and carry the last non-null right payload
    * forward with `last(_, ignoreNulls)` over a running frame. At 100 TB
    * this is ONE shuffle of left+right on the key — a band/range join
    * formulation would explode, and a per-key sort-merge-join with a
    * window afterwards would shuffle twice.
    *
    * `right` must contain `keyCol`, `tsCol`, `tieCol`, and the payload
    * columns; payload columns are emitted with a `matched_` prefix.
    */
  def asofJoin(left: DataFrame, right: DataFrame, keyCol: String,
               tsCol: String, tieCol: String,
               payloadCols: Seq[String]): DataFrame = {
    val payload = struct(payloadCols.map(col): _*)
    val r2 = right.select(col(keyCol), col(tsCol), col(tieCol).as("__tie"),
      payload.as("__p"), lit(0).as("__side"))
    val l2 = left.withColumn("__tie", lit(Long.MaxValue))
      .withColumn("__p", lit(null).cast(r2.schema("__p").dataType))
      .withColumn("__side", lit(1))
    val stacked = l2.unionByName(r2, allowMissingColumns = true)
    val w = Window.partitionBy(keyCol).orderBy(col(tsCol), col("__side"), col("__tie"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matched = stacked
      .withColumn("__m", last("__p", ignoreNulls = true).over(w))
      .where(col("__side") === 1)
    val out = left.columns.map(col) ++
      payloadCols.map(c => col(s"__m.$c").as(s"matched_$c"))
    matched.select(out: _*)
  }

  /** Tumbling-window aggregation: count + value sum per
    * (window_start, event_type) for aligned windows of `widthNs`.
    * One map-side-combined shuffle; the bucket floor is exact long math. */
  def tumblingAgg(events: DataFrame, widthNs: Long = NsPerHour): DataFrame =
    events
      .groupBy(bucketStart(col("ts"), widthNs).as("window_start"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), round(sum("value"), 6).as("sum_value"))

  /** Hopping (sliding) window aggregation: windows of `widthNs` sliding
    * every `slideNs` (width must be a multiple of slide). Each event
    * lands in width/slide windows — generated with a bounded `sequence`
    * + explode (the factor is a compile-time constant, typically 2–8),
    * then the same map-side-combined aggregation as tumbling. */
  def hoppingAgg(events: DataFrame, widthNs: Long = NsPerHour,
                 slideNs: Long = 15 * NsPerMinute): DataFrame = {
    require(widthNs % slideNs == 0, "width must be a multiple of slide")
    val lastStart = bucketStart(col("ts"), slideNs)
    val firstStart = lastStart - (widthNs - slideNs)
    events
      .withColumn("window_start",
        explode(sequence(firstStart, lastStart, lit(slideNs))))
      .groupBy(col("window_start"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), round(sum("value"), 6).as("sum_value"))
  }

  /** Gap-filled resample: the tumbling aggregation DENSIFIED — every
    * (bucket, event_type) combination between the corpus' first and last
    * bucket appears exactly once, zero-filled where no events landed.
    * Downsampling that feeds charts/models must not silently skip empty
    * buckets (a forecaster fed only non-empty buckets learns a biased
    * series).
    *
    * Shape at scale: ONE corpus shuffle (the tumbling agg); everything
    * after runs on the AGGREGATED table, which is bounded by
    * buckets × types regardless of corpus size. The bucket spine is a
    * `sequence` explode of a 1-row min/max aggregate, cross-joined with
    * the distinct type set; the left join back to the agg is between two
    * bounded tables (AQE broadcasts whichever fits). Zero rows never
    * touch the corpus-sized path. */
  def resample(events: DataFrame, bucketNs: Long = NsPerHour): DataFrame =
    resampleFromAgg(tumblingAgg(events, bucketNs), bucketNs)

  /** The gap-fill half of [[resample]] over a pre-aggregated
    * [window_start, event_type, n_events, sum_value] bucket table —
    * shared by the batch row and the streaming replay. */
  def resampleFromAgg(agg0: DataFrame, bucketNs: Long): DataFrame = {
    val agg = agg0
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val bounds = agg.agg(min("window_start").as("lo"), max("window_start").as("hi"))
    val spine = bounds
      .select(explode(sequence(col("lo"), col("hi"), lit(bucketNs))).as("window_start"))
      .crossJoin(agg.select("event_type").distinct())
    spine
      .join(agg, Seq("window_start", "event_type"), "left")
      .select(col("window_start"), col("event_type"),
        coalesce(col("n_events"), lit(0L)).as("n_events"),
        coalesce(col("sum_value"), lit(0.0)).as("sum_value"))
  }

  /** Bounded earliest-N timestamp collector — the skew guard under
    * [[funnel]]'s capped path: a typed Aggregator whose buffer holds AT
    * MOST n longs (replace-the-max insertion, O(n) per row), so a bot
    * key with 10⁶ events costs O(n) aggregation-buffer state instead of
    * a collect_list materializing every event in one task. */
  private final class EarliestN(n: Int)
      extends org.apache.spark.sql.expressions.Aggregator[
        (Long, String, Long), Array[Long], Array[Long]] {
    def zero: Array[Long] = Array.empty
    private def insert(b: Array[Long], ts: Long): Array[Long] =
      if (b.length < n) b :+ ts
      else {
        var mi = 0; var i = 1
        while (i < b.length) { if (b(i) > b(mi)) mi = i; i += 1 }
        if (ts < b(mi)) { val c = b.clone(); c(mi) = ts; c } else b
      }
    def reduce(b: Array[Long], a: (Long, String, Long)): Array[Long] =
      insert(b, a._3)
    def merge(x: Array[Long], y: Array[Long]): Array[Long] =
      y.foldLeft(x)(insert)
    def finish(b: Array[Long]): Array[Long] = b
    def bufferEncoder: org.apache.spark.sql.Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
    def outputEncoder: org.apache.spark.sql.Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  }

  /** Ordered funnel: how many users completed step 1, then step 2 after
    * it, … each within `horizonNs` of their step-1 time. Strictly
    * increasing timestamps between steps; per-user first qualifying
    * completion.
    *
    * Shape: ONE shuffle — per-user sorted event array (collect_list is
    * bounded by per-user activity; the sort is in-memory per user), then
    * a left-to-right fold over the step list computing each step's
    * earliest qualifying timestamp with array `filter`/`array_min`. The
    * chained-self-join formulation would be |steps| shuffles.
    *
    * Skew guard: the default (`maxEventsPerUser` = 0 = unbounded) is
    * EXACT and collects every funnel-step event of a user into one
    * task's aggregation buffer — fine while per-user activity is
    * human-scale, but one 10⁶-event bot key serializes its task. A
    * positive cap routes through a bounded [[EarliestN]]
    * pre-aggregation per (user, step type): only the cap's earliest
    * timestamps of each type survive to the per-user fold, so buffer
    * state is O(cap · steps) per user no matter how hot the key.
    * Results are exact for every user whose per-type event count is
    * within the cap; a hotter user can only DROP later events (its
    * funnel may under-complete — the conservative direction for a bot
    * screen). ScaleCheck measures the 10⁶-event-user fixture. */
  def funnel(events: DataFrame, steps: Seq[String],
             horizonNs: Long = 7 * NsPerDay,
             maxEventsPerUser: Int = 0): DataFrame = {
    require(steps.nonEmpty)
    val stepEvents =
      if (maxEventsPerUser <= 0)
        events.where(col("event_type").isin(steps: _*))
      else {
        val spark = events.sparkSession
        import spark.implicits._
        val capped = events.where(col("event_type").isin(steps: _*))
          .select(col("user_id").cast("long"), col("event_type"),
            col("ts").cast("long"))
          .as[(Long, String, Long)]
          .groupByKey(r => (r._1, r._2))
          .agg(new EarliestN(maxEventsPerUser).toColumn.name("tss"))
        capped.flatMap { case ((u, et), tss) => tss.iterator.map(t => (u, et, t)) }
          .toDF("user_id", "event_type", "ts")
      }
    val withTimes = funnelTimesFrom(stepEvents, steps, horizonNs)
    // n_users reaching each step (a user counts for step K iff __tK non-null)
    val counts = steps.indices.map(i =>
      sum(when(col(s"__t$i").isNotNull, 1L).otherwise(0L)).as(s"__n$i"))
    val agg = withTimes.agg(counts.head, counts.tail: _*)
    val rows = steps.zipWithIndex.map { case (step, i) =>
      struct(lit(i + 1).cast("long").as("step"), lit(step).as("event_type"),
        col(s"__n$i").as("n_users"))
    }
    agg.select(explode(array(rows: _*)).as("r")).select(col("r.*"))
  }

  /** The per-user step-time table shared by [[funnel]] and
    * [[funnelTiming]]: one row per user with `__tK` = min ts of step K
    * events strictly after t(K−1), within horizon of t0. */
  private def funnelTimesFrom(stepEvents: DataFrame, steps: Seq[String],
      horizonNs: Long): DataFrame = {
    val perUser = stepEvents
      .groupBy("user_id")
      .agg(sort_array(collect_list(struct(col("ts"), col("event_type").as("et"))))
        .as("evs"))
    steps.zipWithIndex.foldLeft(perUser) { case (df, (step, i)) =>
      val cond: org.apache.spark.sql.Column => org.apache.spark.sql.Column =
        if (i == 0) e => e("et") === step
        else e => e("et") === step && e("ts") > col(s"__t${i - 1}") &&
          e("ts") <= col("__t0") + horizonNs
      df.withColumn(s"__t$i",
        array_min(transform(filter(col("evs"), e => cond(e)), e => e("ts"))))
    }
  }

  /** Funnel STEP-TIMING report — the "how long do conversions take"
    * half the [[funnel]] counts leave out: for each adjacent
    * transition K→K+1, over the users who completed BOTH steps, the
    * count plus median / p90 / mean of the whole-second delta
    * t(K+1) − t(K). Deltas FLOOR-DIVIDE to whole seconds via integer
    * `div` before any statistic (the session_stats exactness trick —
    * epoch-ns-scale double math is last-ulp engine-dependent, small-int
    * percentiles/means are exact; interpolated quantiles on ints yield
    * exact halves, safe under round 6).
    *
    * Shape at scale: the same ONE per-user fold as [[funnel]], then an
    * explode to (transition, delta) rows and a steps-sized
    * map-side-combined aggregation — no window, no second corpus scan.
    * Returns [step_from, step_to, n_users, median_s, p90_s, mean_s]. */
  def funnelTiming(events: DataFrame, steps: Seq[String],
      horizonNs: Long = 7 * NsPerDay): DataFrame = {
    require(steps.length >= 2, "funnelTiming needs at least 2 steps")
    val stepEvents = events.where(col("event_type").isin(steps: _*))
    val wt = funnelTimesFrom(stepEvents, steps, horizonNs)
    val trans = (1 until steps.length).map { i =>
      struct(lit(i).cast("long").as("step_from"),
        expr(s"CAST((__t$i - __t${i - 1}) DIV 1000000000 AS BIGINT)")
          .as("delta_s"))
    }
    wt.select(explode(array(trans: _*)).as("tr"))
      .select(col("tr.step_from"), col("tr.delta_s"))
      .filter(col("delta_s").isNotNull)
      .groupBy(col("step_from"))
      .agg(count(lit(1)).as("n_users"),
        round(percentile(col("delta_s"), lit(0.5)), 6).as("median_s"),
        round(percentile(col("delta_s"), lit(0.9)), 6).as("p90_s"),
        round(avg(col("delta_s")), 6).as("mean_s"))
      .select(col("step_from"), (col("step_from") + 1L).as("step_to"),
        col("n_users"), col("median_s"), col("p90_s"), col("mean_s"))
  }

  /** RFM segmentation — the classic event-analytics customer split:
    * per user over the `conv` events, Recency (whole days since last,
    * integer floor-div against the corpus max ts — the "now" of the
    * snapshot), Frequency (count) and Monetary (DECIMAL-exact value
    * sum, rounded 6), each scored 1–3 by fixed business-rule cuts
    * (fixed thresholds, NOT corpus quantiles — an ntile over every
    * user is a global sort, the anti-pattern; rule cuts are also what
    * production RFM actually ships), composed into the 3-digit
    * `segment` code (333 = champion). ONE map-side-combined per-user
    * aggregation + a broadcast 1-row max; scores are narrow CASEs on
    * exact integers / the ROUNDED monetary. Returns
    * [user_id, recency_days, frequency, monetary, r, f, m, segment]. */
  def rfm(events: DataFrame, conv: Column,
      recencyCuts: (Long, Long) = (30L, 90L),
      freqCuts: (Long, Long) = (3L, 10L),
      monCuts: (Double, Double) = (100.0, 1000.0)): DataFrame = {
    val purch = events.filter(conv)
    val nowRow = purch.agg(max(col("ts"))).head()
    require(!nowRow.isNullAt(0),
      "rfm: no conversion events match the predicate — recency is undefined")
    val now = nowRow.getLong(0)
    val base = purch.groupBy(col("user_id"))
      .agg(max(col("ts")).as("__last"),
        count(lit(1)).as("frequency"),
        round(sum(col("value").cast("decimal(18,6)")).cast("double"), 6)
          .as("monetary"))
      .select(col("user_id"),
        expr(s"CAST(($now - __last) DIV $NsPerDay AS BIGINT)")
          .as("recency_days"),
        col("frequency"), col("monetary"))
    base
      .withColumn("r",
        when(col("recency_days") <= recencyCuts._1, 3L)
          .when(col("recency_days") <= recencyCuts._2, 2L).otherwise(1L))
      .withColumn("f",
        when(col("frequency") >= freqCuts._2, 3L)
          .when(col("frequency") >= freqCuts._1, 2L).otherwise(1L))
      .withColumn("m",
        when(col("monetary") >= monCuts._2, 3L)
          .when(col("monetary") >= monCuts._1, 2L).otherwise(1L))
      .withColumn("segment",
        col("r") * 100L + col("f") * 10L + col("m"))
  }

  /** Range join without explosion: all (left, right) pairs of the same
    * key whose timestamps lie within `windowNs` of each other. The
    * right side is replicated into its own time bucket and both
    * neighbors, the join runs on the pure EQUI key (key, bucket), and
    * the exact `|Δt| ≤ w` predicate filters afterwards. Each qualifying
    * pair matches exactly once: the left row keeps its single bucket
    * and exactly one right replica lands in it.
    *
    * This is the scalable shape for interval joins — a range predicate
    * in the join condition itself would fall back to a nested-loop /
    * broadcast-nested-loop plan (quadratic per key); here the only
    * overhead is the constant 3× right-side replication, and the join
    * shuffles hash on (key, bucket) like any equi-join. */
  def rangeJoin(left: DataFrame, right: DataFrame, keyCol: String,
      tsCol: String, windowNs: Long,
      leftCols: Seq[String], rightCols: Seq[String]): DataFrame = {
    val lb = left.select(
      (col(keyCol) +: col(tsCol).as("__lts") +:
        leftCols.map(c => col(c).as(s"l_$c"))): _*)
      .withColumn("__bucket", bucketStart(col("__lts"), windowNs))
    val rBucket = bucketStart(col("__rts"), windowNs)
    val rb = right.select(
      (col(keyCol) +: col(tsCol).as("__rts") +:
        rightCols.map(c => col(c).as(s"r_$c"))): _*)
      .withColumn("__bucket", explode(array(
        rBucket - windowNs, rBucket, rBucket + windowNs)))
    lb.join(rb, Seq(keyCol, "__bucket"))
      .where(abs(col("__lts") - col("__rts")) <= windowNs)
      .select((col(keyCol) +: leftCols.map(c => col(s"l_$c"))) ++
        rightCols.map(c => col(s"r_$c")) :+
        (col("__rts") - col("__lts")).as("delta_ns"): _*)
  }

  /** Rolling z-score anomaly detection over the tumbling per-type count
    * series: flag windows whose count deviates from the trailing
    * `lookback`-window mean by more than `zThreshold` sample stddevs.
    *
    * The per-type window function runs on the PRE-AGGREGATED bucket
    * series — one row per (type, bucket), thousands of rows where the
    * raw log has billions — so partitioning by event_type alone is safe
    * at any scale; the corpus-sized work is the map-side-combined
    * tumbling aggregation. The trailing frame is over OBSERVED windows
    * (empty buckets produce no row and are skipped, not zero-filled).
    * z is rounded to 3 decimals and the flag compares the ROUNDED z, so
    * the whole operator is engine-exact under the oracle. */
  def anomalies(events: DataFrame, widthNs: Long = NsPerHour,
                lookback: Int = 24, zThreshold: Double = 3.0): DataFrame =
    anomaliesFromCounts(
      events.groupBy(bucketStart(col("ts"), widthNs).as("window_start"),
          col("event_type"))
        .agg(count(lit(1)).as("n_events")),
      lookback, zThreshold)

  /** The scoring half of [[anomalies]], over an already-built
    * [window_start, event_type, n_events] bucket table — shared with the
    * streaming replay (the stream pays the corpus-sized tumbling
    * aggregation, this scores the bounded bucket series at the sink:
    * the Kappa split). */
  def anomaliesFromCounts(counts: DataFrame, lookback: Int = 24,
      zThreshold: Double = 3.0): DataFrame = {
    val w = Window.partitionBy("event_type").orderBy("window_start")
      .rowsBetween(-lookback, -1)
    counts
      .withColumn("mu", avg(col("n_events").cast("double")).over(w))
      .withColumn("sd", stddev_samp(col("n_events").cast("double")).over(w))
      .where(col("sd").isNotNull && col("sd") > 0)
      .withColumn("z", round((col("n_events").cast("double") - col("mu")) / col("sd"), 3))
      .select(col("window_start"), col("event_type"), col("n_events"),
        col("z"), (abs(col("z")) > zThreshold).as("is_anomaly"))
  }

  /** Multi-level rollup report: per (event_type, day) counts and value
    * sums with ROLLUP subtotals (per-type and grand-total rows). The
    * grouping-null levels are surfaced as 'ALL' sentinels (the data has
    * no real nulls, so the sentinel is unambiguous and keeps the result
    * engine-portable). One shuffle; rollup rows are produced by Spark's
    * Expand — map-side, no extra pass. */
  def rollupReport(events: DataFrame, dayNs: Long = NsPerDay): DataFrame =
    events
      .withColumn("day", bucketStart(col("ts"), dayNs))
      .rollup(col("event_type"), col("day"))
      .agg(count(lit(1)).as("n_events"), round(sum("value"), 6).as("sum_value"))
      .select(coalesce(col("event_type"), lit("ALL")).as("event_type"),
        coalesce(col("day").cast("string"), lit("ALL")).as("day"),
        col("n_events"), col("sum_value"))

  /** Per-type top-k most active users: map-side-combined count, then a
    * two-phase rank-filter top-k (Spark plans the `row_number <= k`
    * filter as WindowGroupLimit — partial top-k per map partition before
    * the per-type shuffle, so a hot event_type never gathers more than
    * k·partitions rows). Deterministic (user_id tie-break). */
  def topUsers(events: DataFrame, k: Int): DataFrame =
    topUsersFromCounts(events.groupBy("event_type", "user_id")
      .agg(count(lit(1)).as("n_events")), k)

  /** The rank half of [[topUsers]] over a pre-aggregated
    * [event_type, user_id, n_events] table — shared by the batch row
    * and the streaming replay (which builds the counts as a watermarked
    * windowed aggregation and sums windows at the sink). */
  def topUsersFromCounts(counts: DataFrame, k: Int): DataFrame = {
    val w = Window.partitionBy("event_type")
      .orderBy(col("n_events").desc, col("user_id"))
    counts.withColumn("rk", row_number().over(w).cast("long"))
      .where(col("rk") <= k)
  }

  /** Daily active users — exact distinct count per day bucket. This is
    * the oracle-checked form; [[activeUsersApprox]] is the 100 TB path
    * (HyperLogLog++ sketch, no exact-distinct shuffle expansion). */
  def activeUsers(events: DataFrame, dayNs: Long = NsPerDay): DataFrame =
    events.groupBy(bucketStart(col("ts"), dayNs).as("day"))
      .agg(countDistinct("user_id").as("n_users"))

  /** Sketch variant of [[activeUsers]]: approx_count_distinct keeps the
    * aggregation single-pass map-side-combinable (a mergeable HLL per
    * day) instead of the exact form's two-phase distinct expansion. */
  def activeUsersApprox(events: DataFrame, dayNs: Long = NsPerDay,
      rsd: Double = 0.02): DataFrame =
    events.groupBy(bucketStart(col("ts"), dayNs).as("day"))
      .agg(approx_count_distinct(col("user_id"), rsd).as("n_users"))

  /** OHLC time-series downsampling: per (event_type, bucket) the first
    * (open) and last (close) event value plus min/max/count/mean — the
    * classic lossy downsample for dashboards and long-horizon models.
    * One map-side-combined shuffle: `min_by`/`max_by` fold the
    * first/last values inside the aggregate (no per-bucket sort, no
    * window). Ordering ties on ts break by event_id, so the result is
    * deterministic even with colliding timestamps (the synthetic log
    * has none — which is also what lets the oracle mirror use DuckDB's
    * scalar-keyed arg_min/arg_max). Returns
    * [event_type, bucket, open, close, low, high, n_events, mean_value]. */
  /** Per-user running lifetime aggregates — the cumulative/running
    * window family (LTV curves, quota tracking, "Nth event" triggers):
    * for every event, how many events the user has produced up to and
    * including it, and their running value total. One shuffle on
    * user_id, then a single ordered pass per partition (running frame —
    * no per-prefix re-aggregation). The running sum uses the exact
    * DECIMAL(18,6) form: engines disagree on the association order of
    * windowed double sums (running accumulation vs segment trees), and
    * the decimal sum is exact under any order. Deterministic total
    * order within a user via the (ts, event_id) tie-break. Returns
    * [user_id, ts, event_id, event_type, n_events_so_far, cum_value]. */
  def cumulative(events: DataFrame): DataFrame = {
    val ord = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val w = ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    events.select(col("user_id"), col("ts"), col("event_id"),
      col("event_type"),
      row_number().over(ord).cast("long").as("n_events_so_far"),
      round(sum(col("value").cast("decimal(18,6)")).over(w).cast("double"), 6)
        .as("cum_value"))
  }

  /** Event-type Markov transition matrix: per-user consecutive event
    * pairs (ordered by ts, event_id) counted into a
    * [from_type, to_type, n, prob] table — the user-journey model behind
    * "what happens after a signup" questions and synthetic-session
    * generators. `prob` is row-normalized over from_type.
    *
    * Shape at scale: ONE user_id-partitioned window pass builds the
    * consecutive pairs (per-user history is activity-bounded, so skew is
    * bounded), then a map-side-combined count on the tiny
    * (from, to) key space; the per-from totals table is types²-sized and
    * broadcast back. No corpus-sized join anywhere. */
  def markovTransitions(events: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val pairs = events
      .select(col("event_type").as("from_type"),
        lead(col("event_type"), 1).over(w).as("to_type"))
      .where(col("to_type").isNotNull)
    transitionMatrix(pairs)
  }

  /** The count/normalize half of [[markovTransitions]], over an already
    * extracted [from_type, to_type] pair table — shared with the
    * streaming pair extractor
    * ([[graft.streaming.StreamingPipeline.markovStream]]), so the batch
    * and stream rows aggregate through identical code. */
  def transitionMatrix(pairs: DataFrame): DataFrame = {
    val counts = pairs.groupBy(col("from_type"), col("to_type"))
      .agg(count(lit(1)).as("n"))
    val totals = counts.groupBy(col("from_type"))
      .agg(sum(col("n")).as("__total"))
    counts.join(broadcast(totals), Seq("from_type"))
      .select(col("from_type"), col("to_type"), col("n"),
        round(col("n").cast("double") / col("__total").cast("double"), 6)
          .as("prob"))
  }

  def ohlc(events: DataFrame, bucketNs: Long = NsPerHour): DataFrame =
    events.groupBy(col("event_type"), bucketStart(col("ts"), bucketNs).as("bucket"))
      .agg(
        min_by(col("value"), struct(col("ts"), col("event_id"))).as("open"),
        max_by(col("value"), struct(col("ts"), col("event_id"))).as("close"),
        min(col("value")).as("low"), max(col("value")).as("high"),
        count(lit(1)).as("n_events"),
        // mean via an exact DECIMAL sum: double summation is
        // order-sensitive in the last ulp, and a bucket mean can land
        // exactly on a round-half boundary (observed at sf0.1) — the
        // decimal sum has no order sensitivity, so the one double
        // division is bit-identical across engines
        round(sum(col("value").cast("decimal(18,6)")).cast("double") /
          count(lit(1)), 6).as("mean_value"))

  /** Per-type heavy hitters: users whose event count is ≥ `factor` ×
    * the type's mean per-user count (a scale-free skew detector — a
    * fixed share threshold empties as the user population grows).
    * Exact form: one map-side-combined (type, user) count shuffle, a
    * per-type rollup of that table (types are few → broadcast back).
    * The comparison n_events·n_users ≥ factor·total is kept in exact
    * integer products (cast to double only for the factor multiply),
    * so no cross-engine division drift. Returns
    * [event_type, user_id, n_events, share]. */
  def heavyHitters(events: DataFrame, factor: Double = 1.5): DataFrame =
    heavyHittersFromCounts(events.groupBy(col("event_type"), col("user_id"))
      .agg(count(lit(1)).as("n_events")), factor)

  /** The threshold half of [[heavyHitters]] over a pre-aggregated
    * [event_type, user_id, n_events] table — shared by the batch row
    * and the streaming replay ([[topUsersFromCounts]] pattern). */
  def heavyHittersFromCounts(counts: DataFrame,
      factor: Double): DataFrame = {
    val totals = counts.groupBy(col("event_type"))
      .agg(sum(col("n_events")).as("total"), count(lit(1)).as("n_users"))
    counts.join(broadcast(totals), Seq("event_type"))
      .where((col("n_events") * col("n_users")).cast("double") >=
        lit(factor) * col("total").cast("double"))
      .select(col("event_type"), col("user_id"), col("n_events"),
        round(col("n_events").cast("double") / col("total").cast("double"), 6)
          .as("share"))
  }

  /** Sketch companion to [[heavyHitters]]: one Count–Min sketch of
    * user_id per event type (mergeable, fixed memory — the 100 TB path
    * when per-(type,user) exact counts are too hot to shuffle). Probe
    * the returned binary with
    * `org.apache.spark.util.sketch.CountMinSketch.readFrom`; estimates
    * never undercount and overshoot by ≤ eps·total at `confidence`.
    * Returns [event_type, cms, total]. */
  def userCountSketch(events: DataFrame, eps: Double = 0.001,
      confidence: Double = 0.99, seed: Int = 42): DataFrame =
    events.groupBy(col("event_type"))
      .agg(count_min_sketch(col("user_id"), lit(eps), lit(confidence),
        lit(seed)).as("cms"), count(lit(1)).as("total"))

  /** Per-bucket HLL user sketches — the MERGEABLE pre-aggregation a
    * 100 TB event store keeps instead of raw distincts: one DataSketches
    * HLL per (bucket) over user_id. Build once per day (this), roll up
    * to any coarser window FOREVER without rescanning events
    * ([[dauFromSketches]]) — union is associative and loss-bounded, so
    * daily sketches answer weekly/monthly/lifetime DAU queries from
    * buckets × lgK-bytes of state. Returns [bucket, sketch]. */
  def dauSketchTable(events: DataFrame, bucketNs: Long = NsPerDay,
      lgK: Int = 12): DataFrame =
    events.groupBy(bucketStart(col("ts"), bucketNs).as("bucket"))
      .agg(hll_sketch_agg(col("user_id"), lit(lgK)).as("sketch"))

  /** Roll a [[dauSketchTable]] up to coarser windows: merge the member
    * sketches (`hll_union_agg`) and estimate — never touching the
    * original events. The fine bucket width must divide the coarse one.
    * Returns [window_start, est_users]. */
  def dauFromSketches(sketches: DataFrame, windowNs: Long): DataFrame =
    sketches.groupBy(bucketStart(col("bucket"), windowNs).as("window_start"))
      .agg(hll_sketch_estimate(hll_union_agg(col("sketch")))
        .as("est_users"))

  /** Weekly cohort retention: users bucketed by the week of their first
    * event; per (cohort_week, week_offset) distinct-user counts.
    * Shape: per-user min (map-side combined), join events back on the
    * natural key (both sides hash on user_id), then a distinct-count
    * aggregation on (cohort, offset) — the classic two-shuffle retention
    * plan. The offset division is exact: both operands are multiples of
    * `bucketNs` and their difference is far below 2^53. */
  def retention(events: DataFrame, bucketNs: Long = NsPerWeek): DataFrame = {
    val firsts = events.groupBy("user_id")
      .agg(min("ts").as("__first_ts"))
      .select(col("user_id"), bucketStart(col("__first_ts"), bucketNs).as("cohort_week"))
    events.join(firsts, "user_id")
      .select(col("user_id"), col("cohort_week"),
        ((bucketStart(col("ts"), bucketNs) - col("cohort_week")) / bucketNs)
          .cast("long").as("week_offset"))
      .groupBy("cohort_week", "week_offset")
      .agg(countDistinct("user_id").as("n_users"))
  }
}
