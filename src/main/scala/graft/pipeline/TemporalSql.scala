package graft.pipeline

/** DuckDB oracle SQL for the Temporal operators. Every statement works on
  * `epoch_ns(ts)` (BIGINT) — the exact integers Spark sees through
  * `nanosAsLong` — and mirrors the corresponding [[Temporal]] plan step
  * by step: same bucket floors (`t - t % w`), same tie-breaks, same
  * 6-decimal value rounding. Counts from `sum(...)` are CAST to BIGINT
  * (DuckDB widens integer sums to HUGEINT, which pandas would surface as
  * a different dtype than Spark's long). */
object TemporalSql {

  private val e = "SELECT event_id, user_id, epoch_ns(ts) AS tsn, event_type, value FROM events"

  /** The normalized events CTE body, for oracle statements composed
    * outside this object (report_skew). */
  def eventsCte: String = e

  /** Mirrors [[Temporal.dedupEvents]] over doubled delivery (and the
    * streamed twin's double-staged replay): exactly-once == the single
    * table. */
  val dedupEvents: String =
    s"""WITH e AS ($e)
       |SELECT CAST(event_id AS BIGINT) AS event_id, tsn,
       |       CAST(user_id AS BIGINT) AS user_id, event_type, value
       |FROM e ORDER BY event_id""".stripMargin

  /** Mirrors [[Temporal.sessionize]]. */
  def sessionize(gapNs: Long): String =
    s"""WITH e AS ($e),
       |f AS (SELECT *, CASE WHEN lag(tsn) OVER w IS NULL
       |                       OR tsn - lag(tsn) OVER w > $gapNs
       |                     THEN 1 ELSE 0 END AS newf
       |      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY tsn, event_id)),
       |s AS (SELECT *, sum(newf) OVER (PARTITION BY user_id ORDER BY tsn, event_id
       |                                ROWS UNBOUNDED PRECEDING) AS session_idx
       |      FROM f)
       |SELECT user_id, CAST(session_idx AS BIGINT) AS session_idx,
       |       min(tsn) AS session_start, max(tsn) AS session_end,
       |       count(*) AS n_events, round(sum(value), 6) AS sum_value
       |FROM s GROUP BY user_id, session_idx
       |ORDER BY user_id, session_idx""".stripMargin

  /** Mirrors [[Temporal.asofJoin]] for the purchase←view entry: the union
    * trick spelled out in SQL (right rows sort before left at equal tsn;
    * last_value IGNORE NULLS carries the match forward). */
  def asofPurchaseView: String =
    s"""WITH e AS ($e),
       |st AS (
       |  SELECT user_id, tsn, event_id AS l_event_id,
       |         CAST(NULL AS BIGINT) AS r_event_id, CAST(NULL AS BIGINT) AS r_tsn,
       |         1 AS side, 9223372036854775807 AS tie
       |  FROM e WHERE event_type = 'purchase'
       |  UNION ALL
       |  SELECT user_id, tsn, NULL, event_id, tsn, 0, event_id
       |  FROM e WHERE event_type = 'view'),
       |m AS (SELECT *,
       |        last_value(r_event_id IGNORE NULLS) OVER w AS me,
       |        last_value(r_tsn IGNORE NULLS) OVER w AS mt
       |      FROM st WINDOW w AS (PARTITION BY user_id ORDER BY tsn, side, tie
       |                           ROWS UNBOUNDED PRECEDING))
       |SELECT l_event_id AS event_id, user_id, tsn AS ts_ns,
       |       coalesce(me, -1) AS matched_event_id,
       |       coalesce(mt, -1) AS matched_ts,
       |       coalesce(tsn - mt, -1) AS gap_ns
       |FROM m WHERE side = 1 ORDER BY event_id""".stripMargin

  /** Mirrors the composed events_e2e entry: the sessionize CTEs and the
    * asof union-trick CTEs, joined purchase→containing-session on
    * (user, interval). */
  def sessionAsofE2e(gapNs: Long): String =
    s"""WITH e AS ($e),
       |f AS (SELECT *, CASE WHEN lag(tsn) OVER w IS NULL
       |                       OR tsn - lag(tsn) OVER w > $gapNs
       |                     THEN 1 ELSE 0 END AS newf
       |      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY tsn, event_id)),
       |s AS (SELECT *, sum(newf) OVER (PARTITION BY user_id ORDER BY tsn, event_id
       |                                ROWS UNBOUNDED PRECEDING) AS session_idx
       |      FROM f),
       |sess AS (SELECT user_id, CAST(session_idx AS BIGINT) AS session_idx,
       |                min(tsn) AS session_start, max(tsn) AS session_end,
       |                count(*) AS n_events
       |         FROM s GROUP BY user_id, session_idx),
       |st AS (
       |  SELECT user_id, tsn, event_id AS l_event_id,
       |         CAST(NULL AS BIGINT) AS r_event_id,
       |         1 AS side, 9223372036854775807 AS tie
       |  FROM e WHERE event_type = 'purchase'
       |  UNION ALL
       |  SELECT user_id, tsn, NULL, event_id, 0, event_id
       |  FROM e WHERE event_type = 'view'),
       |m AS (SELECT *,
       |        last_value(r_event_id IGNORE NULLS) OVER w AS me
       |      FROM st WINDOW w AS (PARTITION BY user_id ORDER BY tsn, side, tie
       |                           ROWS UNBOUNDED PRECEDING)),
       |av AS (SELECT l_event_id AS event_id, user_id, tsn, me
       |       FROM m WHERE side = 1)
       |SELECT a.event_id, a.user_id, a.tsn AS ts_ns,
       |       x.session_idx, x.n_events AS session_events,
       |       coalesce(a.me, -1) AS view_event_id
       |FROM av a JOIN sess x
       |  ON x.user_id = a.user_id
       | AND a.tsn BETWEEN x.session_start AND x.session_end
       |ORDER BY a.event_id""".stripMargin

  /** Mirrors [[Temporal.tumblingAgg]]. */
  def tumbling(widthNs: Long): String =
    s"""WITH e AS ($e)
       |SELECT tsn - tsn % $widthNs AS window_start, event_type,
       |       count(*) AS n_events, round(sum(value), 6) AS sum_value
       |FROM e GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  /** Mirrors [[Temporal.resample]]: tumbling agg densified over the
    * generate_series bucket spine × distinct types, zero-filled. */
  def resample(widthNs: Long): String =
    s"""WITH e AS ($e),
       |a AS (SELECT tsn - tsn % $widthNs AS window_start, event_type,
       |             count(*) AS n, round(sum(value), 6) AS sv
       |      FROM e GROUP BY 1, 2),
       |b AS (SELECT unnest(generate_series((SELECT min(window_start) FROM a),
       |                                    (SELECT max(window_start) FROM a),
       |                                    $widthNs)) AS window_start),
       |t AS (SELECT DISTINCT event_type FROM a)
       |SELECT b.window_start, t.event_type,
       |       CAST(coalesce(a.n, 0) AS BIGINT) AS n_events,
       |       coalesce(a.sv, 0.0) AS sum_value
       |FROM b CROSS JOIN t
       |LEFT JOIN a ON a.window_start = b.window_start AND a.event_type = t.event_type
       |ORDER BY 1, 2""".stripMargin

  /** Mirrors [[Temporal.hoppingAgg]]. */
  def hopping(widthNs: Long, slideNs: Long): String =
    s"""WITH e AS ($e),
       |x AS (SELECT unnest(generate_series(tsn - tsn % $slideNs - ${widthNs - slideNs},
       |                                    tsn - tsn % $slideNs, $slideNs)) AS window_start,
       |             event_type, value
       |      FROM e)
       |SELECT window_start, event_type,
       |       count(*) AS n_events, round(sum(value), 6) AS sum_value
       |FROM x GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  /** Mirrors [[Temporal.funnel]]: chained per-step first-qualifying-time
    * CTEs (tK = min ts of step K strictly after t(K-1) and within the
    * horizon of t0). */
  def funnel(steps: Seq[String], horizonNs: Long): String =
    funnelFrom(steps, horizonNs, s"e AS ($e)")

  /** Mirrors [[Temporal.funnel]] with `maxEventsPerUser` > 0 (the
    * EarliestN skew cap): only each (user, step type)'s `cap` earliest
    * events survive to the fold. Ties at the cap boundary are
    * interchangeable for the min-ts funnel math, so row_number here and
    * the aggregator's replace-the-max buffer agree on RESULTS. */
  def funnelCapped(steps: Seq[String], horizonNs: Long, cap: Int): String = {
    val stepsIn = steps.map(s => s"'$s'").mkString(", ")
    val eCte =
      s"""e0 AS ($e),
         |e AS (SELECT user_id, event_type, tsn FROM (
         |  SELECT user_id, event_type, tsn,
         |         row_number() OVER (PARTITION BY user_id, event_type
         |                            ORDER BY tsn) AS _rn
         |  FROM e0 WHERE event_type IN ($stepsIn)) WHERE _rn <= $cap)"""
        .stripMargin
    funnelFrom(steps, horizonNs, eCte)
  }

  /** The per-step min-ts CTE chain (`t0..tN`) shared by the funnel
    * count and timing mirrors. */
  private def funnelTimeCtes(steps: Seq[String], horizonNs: Long,
      eCte: String): String = {
    val t0 = s"t0 AS (SELECT user_id, min(tsn) AS t0 FROM e WHERE event_type = '${steps.head}' GROUP BY user_id)"
    val rest = steps.indices.tail.map { i =>
      val joins = if (i == 1) "JOIN t0 USING (user_id)"
        else s"JOIN t${i - 1} USING (user_id) JOIN t0 USING (user_id)"
      s"""t$i AS (SELECT e.user_id, min(tsn) AS t$i
         |  FROM e $joins
         |  WHERE event_type = '${steps(i)}' AND tsn > t${i - 1}.t${i - 1}
         |    AND tsn <= t0.t0 + $horizonNs
         |  GROUP BY e.user_id)""".stripMargin
    }
    s"$eCte,\n" + (t0 +: rest).mkString(",\n")
  }

  private def funnelFrom(steps: Seq[String], horizonNs: Long,
      eCte: String): String = {
    val selects = steps.zipWithIndex.map { case (step, i) =>
      s"SELECT CAST(${i + 1} AS BIGINT) AS step, '$step' AS event_type, count(*) AS n_users FROM t$i"
    }
    (s"WITH ${funnelTimeCtes(steps, horizonNs, eCte)}\n" +
      selects.mkString("\nUNION ALL\n") + "\nORDER BY step")
  }

  /** Mirrors [[Temporal.rfm]]: per-user recency (integer `//` days vs
    * the scalar-subquery corpus max), count, DECIMAL-exact monetary
    * (rounded 6 BEFORE the cut comparisons — the rank-on-rounded
    * recipe), fixed business-rule score cuts, 3-digit segment code. */
  def rfm(convType: String, r1: Long, r2: Long, f1: Long, f2: Long,
      m1: Double, m2: Double): String =
    s"""WITH e0 AS ($e),
       |p AS (SELECT user_id, tsn, value FROM e0
       |      WHERE event_type = '$convType'),
       |u AS (SELECT user_id, max(tsn) AS last_ts,
       |             CAST(count(*) AS BIGINT) AS frequency,
       |             round(CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE), 6)
       |               AS monetary
       |      FROM p GROUP BY 1),
       |s AS (SELECT user_id,
       |             CAST(((SELECT max(tsn) FROM p) - last_ts)
       |               // 86400000000000 AS BIGINT) AS recency_days,
       |             frequency, monetary
       |      FROM u),
       |sc AS (SELECT user_id, recency_days, frequency, monetary,
       |         CAST(CASE WHEN recency_days <= $r1 THEN 3
       |                   WHEN recency_days <= $r2 THEN 2
       |                   ELSE 1 END AS BIGINT) AS r,
       |         CAST(CASE WHEN frequency >= $f2 THEN 3
       |                   WHEN frequency >= $f1 THEN 2
       |                   ELSE 1 END AS BIGINT) AS f,
       |         CAST(CASE WHEN monetary >= $m2 THEN 3
       |                   WHEN monetary >= $m1 THEN 2
       |                   ELSE 1 END AS BIGINT) AS m
       |       FROM s)
       |SELECT CAST(user_id AS BIGINT) AS user_id, recency_days, frequency,
       |       monetary, r, f, m, r * 100 + f * 10 + m AS segment
       |FROM sc ORDER BY user_id""".stripMargin

  /** Mirrors [[Temporal.funnelTiming]]: the same t0..tN chain, one
    * delta row per completed transition (whole-second integer `//`
    * floor-div BEFORE any statistic), quantile_cont interpolation on
    * the small ints (exact halves — Spark's percentile uses the same
    * linear-interpolation formula), avg as double sum/count. */
  def funnelTiming(steps: Seq[String], horizonNs: Long): String = {
    val deltas = (1 until steps.length).map { i =>
      s"""SELECT CAST($i AS BIGINT) AS step_from,
         |         CAST((t$i.t$i - t${i - 1}.t${i - 1}) // 1000000000 AS BIGINT)
         |           AS delta_s
         |  FROM t$i JOIN t${i - 1} USING (user_id)""".stripMargin
    }
    s"""WITH ${funnelTimeCtes(steps, horizonNs, s"e AS ($e)")},
       |d AS (
       |  ${deltas.mkString("\n  UNION ALL\n  ")})
       |SELECT step_from, step_from + 1 AS step_to, count(*) AS n_users,
       |       round(quantile_cont(delta_s, 0.5), 6) AS median_s,
       |       round(quantile_cont(delta_s, 0.9), 6) AS p90_s,
       |       round(avg(delta_s), 6) AS mean_s
       |FROM d GROUP BY step_from ORDER BY step_from""".stripMargin
  }

  /** Mirrors [[Temporal.rangeJoin]] for the click↔purchase entry — the
    * oracle states the SEMANTICS directly (equi-key join + abs-delta
    * predicate); the bucket replication is a Spark-side execution
    * strategy that must not change the result. */
  def rangeJoinClickPurchase(windowNs: Long): String =
    s"""WITH e AS ($e),
       |l AS (SELECT user_id, event_id AS l_event_id, tsn AS lts
       |      FROM e WHERE event_type = 'click'),
       |r AS (SELECT user_id, event_id AS r_event_id, tsn AS rts
       |      FROM e WHERE event_type = 'purchase')
       |SELECT l.user_id, l.l_event_id, r.r_event_id, r.rts - l.lts AS delta_ns
       |FROM l JOIN r ON l.user_id = r.user_id AND abs(l.lts - r.rts) <= $windowNs
       |ORDER BY 1, 2, 3""".stripMargin

  /** Mirrors [[Temporal.anomalies]]: trailing-frame mean/stddev over the
    * observed bucket series, z on the rounded value, flag on rounded z. */
  def anomalies(widthNs: Long, lookback: Int, zThreshold: Double): String =
    s"""WITH e AS ($e),
       |c AS (SELECT tsn - tsn % $widthNs AS window_start, event_type,
       |             count(*) AS n_events
       |      FROM e GROUP BY 1, 2),
       |s AS (SELECT *, avg(CAST(n_events AS DOUBLE)) OVER w AS mu,
       |             stddev_samp(CAST(n_events AS DOUBLE)) OVER w AS sd
       |      FROM c WINDOW w AS (PARTITION BY event_type ORDER BY window_start
       |                          ROWS BETWEEN $lookback PRECEDING AND 1 PRECEDING))
       |SELECT window_start, event_type, n_events,
       |       round((CAST(n_events AS DOUBLE) - mu) / sd, 3) AS z,
       |       abs(round((CAST(n_events AS DOUBLE) - mu) / sd, 3)) > $zThreshold AS is_anomaly
       |FROM s WHERE sd IS NOT NULL AND sd > 0
       |ORDER BY window_start, event_type""".stripMargin

  /** Mirrors [[Temporal.rollupReport]]. */
  def rollup(dayNs: Long): String =
    s"""WITH e AS ($e),
       |d AS (SELECT event_type, tsn - tsn % $dayNs AS day, value FROM e)
       |SELECT coalesce(event_type, 'ALL') AS event_type,
       |       coalesce(CAST(day AS VARCHAR), 'ALL') AS day,
       |       count(*) AS n_events, round(sum(value), 6) AS sum_value
       |FROM d GROUP BY ROLLUP (event_type, day)
       |ORDER BY event_type, day""".stripMargin

  /** Mirrors [[Temporal.topUsers]]. */
  def topUsers(k: Int): String =
    s"""WITH e AS ($e),
       |c AS (SELECT event_type, user_id, count(*) AS n_events
       |      FROM e GROUP BY 1, 2),
       |r AS (SELECT *, CAST(row_number() OVER (PARTITION BY event_type
       |        ORDER BY n_events DESC, user_id) AS BIGINT) AS rk FROM c)
       |SELECT event_type, user_id, n_events, rk FROM r WHERE rk <= $k
       |ORDER BY event_type, rk""".stripMargin

  /** Mirrors [[Temporal.activeUsers]] (exact; the sketch variant is the
    * scale path and is unit-tested against this). */
  def activeUsers(dayNs: Long): String =
    s"""WITH e AS ($e)
       |SELECT tsn - tsn % $dayNs AS day, count(DISTINCT user_id) AS n_users
       |FROM e GROUP BY 1 ORDER BY 1""".stripMargin

  /** Mirrors [[Temporal.ohlc]]. Scalar-keyed arg_min/arg_max are exact
    * mirrors of the struct-tie-break min_by/max_by because the log's
    * (type, µs-ts) pairs are collision-free (asserted in TemporalSpec;
    * with ties only the Spark side would stay deterministic). */
  /** Mirrors the events_session_stats entry: the sessionize CTEs
    * aggregated to one report row. Durations are floor-divided to whole
    * seconds FIRST (exact integer arithmetic; a double ns-scale mean
    * would be last-ulp engine-dependent at 1e13 magnitudes), then
    * mean/percentiles run on small exact integers — the corpus_stats
    * quantile_cont precedent. */
  def sessionStats(gapNs: Long): String =
    s"""WITH e AS ($e),
       |f AS (SELECT *, CASE WHEN lag(tsn) OVER w IS NULL
       |                       OR tsn - lag(tsn) OVER w > $gapNs
       |                     THEN 1 ELSE 0 END AS newf
       |      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY tsn, event_id)),
       |s AS (SELECT *, sum(newf) OVER (PARTITION BY user_id ORDER BY tsn, event_id
       |                                ROWS UNBOUNDED PRECEDING) AS session_idx
       |      FROM f),
       |sess AS (SELECT user_id, session_idx,
       |                min(tsn) AS session_start, max(tsn) AS session_end,
       |                count(*) AS n_events
       |         FROM s GROUP BY user_id, session_idx),
       |d AS (SELECT user_id, n_events,
       |        ((session_end - session_start) -
       |         (session_end - session_start) % 1000000000) // 1000000000
       |          AS dur_s
       |      FROM sess)
       |SELECT CAST(count(*) AS BIGINT) AS n_sessions,
       |       CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
       |       round(avg(n_events), 6) AS mean_events,
       |       round(quantile_cont(n_events, 0.5), 6) AS p50_events,
       |       round(avg(dur_s), 6) AS mean_duration_s,
       |       round(quantile_cont(dur_s, 0.5), 6) AS p50_duration_s,
       |       round(quantile_cont(dur_s, 0.9), 6) AS p90_duration_s
       |FROM d""".stripMargin

  /** Mirrors [[graft.sources.ZOrder.zorderKey]] over (user_id, tsn):
    * range-scaled integer bucket ordinals + the bit-interleaved Morton
    * key — pure BIGINT shifts/ands/divides, identical in any engine. */
  def zorder(bits: Int): String = {
    val nb = 1L << bits
    val terms = (0 until bits).map { i =>
      s"((bucket_a >> $i) & 1) * ${1L << (2 * i + 1)} + " +
        s"((bucket_b >> $i) & 1) * ${1L << (2 * i)}"
    }.mkString(" + ")
    s"""WITH e AS ($e),
       |mm AS (SELECT min(user_id) AS mna, max(user_id) AS mxa,
       |              min(tsn) AS mnb, max(tsn) AS mxb FROM e),
       |b AS (SELECT e.event_id,
       |        ((e.user_id - mm.mna) * $nb) // (mm.mxa - mm.mna + 1) AS bucket_a,
       |        ((e.tsn - mm.mnb) * $nb) // (mm.mxb - mm.mnb + 1) AS bucket_b
       |      FROM e CROSS JOIN mm)
       |SELECT CAST(event_id AS BIGINT) AS event_id,
       |       CAST(bucket_a AS BIGINT) AS bucket_a,
       |       CAST(bucket_b AS BIGINT) AS bucket_b,
       |       CAST($terms AS BIGINT) AS zkey
       |FROM b ORDER BY event_id""".stripMargin
  }

  /** Mirrors [[Temporal.interarrival]]: per-user consecutive gaps in
    * whole seconds (exact integer floor-division before any mean —
    * the sessionStats contract), aggregated per user. */
  def interarrival: String =
    s"""WITH e AS ($e),
       |g AS (SELECT user_id,
       |        ((tsn - lag(tsn) OVER w) - (tsn - lag(tsn) OVER w) % 1000000000)
       |          // 1000000000 AS gap_s
       |      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY tsn, event_id))
       |SELECT user_id, CAST(count(*) AS BIGINT) AS n_gaps,
       |       round(avg(gap_s), 6) AS mean_gap_s,
       |       round(quantile_cont(gap_s, 0.5), 6) AS p50_gap_s,
       |       round(quantile_cont(gap_s, 0.9), 6) AS p90_gap_s,
       |       CAST(max(gap_s) AS BIGINT) AS max_gap_s
       |FROM g WHERE gap_s IS NOT NULL
       |GROUP BY user_id ORDER BY user_id""".stripMargin

  /** Mirrors [[Temporal.cumulative]] — the DECIMAL running sum is exact
    * under any association order (DuckDB's windowed double sums use
    * segment trees; Spark accumulates), so the two engines agree to the
    * bit before the one rounding. */
  def cumulative: String =
    s"""WITH e AS ($e)
       |SELECT user_id, tsn AS ts, event_id, event_type,
       |       CAST(row_number() OVER w AS BIGINT) AS n_events_so_far,
       |       round(CAST(sum(CAST(value AS DECIMAL(18,6))) OVER (
       |         PARTITION BY user_id ORDER BY tsn, event_id
       |         ROWS UNBOUNDED PRECEDING) AS DOUBLE), 6) AS cum_value
       |FROM e WINDOW w AS (PARTITION BY user_id ORDER BY tsn, event_id)
       |ORDER BY user_id, ts, event_id""".stripMargin

  /** Mirrors [[Temporal.markovTransitions]]: per-user consecutive
    * event-type pairs (lead over ts, event_id), counted and
    * row-normalized over from_type. */
  def markovTransitions: String =
    s"""WITH e AS ($e),
       |p AS (SELECT event_type AS from_type,
       |             lead(event_type) OVER (PARTITION BY user_id
       |                                    ORDER BY tsn, event_id) AS to_type
       |      FROM e),
       |c AS (SELECT from_type, to_type, CAST(count(*) AS BIGINT) AS n
       |      FROM p WHERE to_type IS NOT NULL GROUP BY 1, 2),
       |t AS (SELECT from_type, CAST(sum(n) AS BIGINT) AS total FROM c GROUP BY 1)
       |SELECT c.from_type, c.to_type, c.n,
       |       round(CAST(c.n AS DOUBLE) / CAST(t.total AS DOUBLE), 6) AS prob
       |FROM c JOIN t USING (from_type)
       |ORDER BY from_type, to_type""".stripMargin

  def ohlc(bucketNs: Long): String =
    s"""WITH e AS ($e)
       |SELECT event_type, tsn - tsn % $bucketNs AS bucket,
       |       arg_min(value, tsn) AS open, arg_max(value, tsn) AS close,
       |       min(value) AS low, max(value) AS high,
       |       count(*) AS n_events,
       |       round(CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE)
       |             / count(*), 6) AS mean_value
       |FROM e GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  /** Mirrors [[Temporal.heavyHitters]] (the sketch companion is
    * unit-probed against this exact form). */
  def heavyHitters(factor: Double): String =
    s"""WITH e AS ($e),
       |c AS (SELECT event_type, user_id, CAST(count(*) AS BIGINT) AS n_events
       |      FROM e GROUP BY 1, 2),
       |t AS (SELECT event_type, CAST(sum(n_events) AS BIGINT) AS total,
       |             CAST(count(*) AS BIGINT) AS n_users
       |      FROM c GROUP BY 1)
       |SELECT c.event_type, c.user_id, c.n_events,
       |       round(CAST(c.n_events AS DOUBLE) / CAST(t.total AS DOUBLE), 6)
       |         AS share
       |FROM c JOIN t USING (event_type)
       |WHERE CAST(c.n_events * t.n_users AS DOUBLE) >=
       |      $factor * CAST(t.total AS DOUBLE)
       |ORDER BY event_type, user_id""".stripMargin

  /** Mirrors [[Temporal.retention]]. */
  def retention(bucketNs: Long): String =
    s"""WITH e AS ($e),
       |f AS (SELECT user_id, min(tsn) AS ft FROM e GROUP BY user_id),
       |c AS (SELECT user_id, ft - ft % $bucketNs AS cohort_week FROM f)
       |SELECT c.cohort_week,
       |       (tsn - tsn % $bucketNs - c.cohort_week) // $bucketNs AS week_offset,
       |       count(DISTINCT e.user_id) AS n_users
       |FROM e JOIN c USING (user_id)
       |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin
}
