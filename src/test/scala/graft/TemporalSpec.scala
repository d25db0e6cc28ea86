package graft

import org.apache.spark.sql.functions._
import graft.pipeline.Temporal

/** Behavioral tests for the temporal/event-log operators on crafted
  * fixtures with known answers (the DuckDB oracle covers the events
  * table; these pin the semantics: gap boundaries, as-of tie-breaks,
  * funnel ordering/horizon, hopping multiplicity, retention offsets). */
class TemporalSpec extends SparkSpec {

  private val S = Temporal.NsPerSecond

  /** (event_id, user_id, ts, event_type, value) rows. */
  private def ev(rows: (Long, Long, Long, String, Double)*) = {
    import spark.implicits._
    rows.toDF("event_id", "user_id", "ts", "event_type", "value")
  }

  test("sessionize splits exactly at gap > threshold, not at gap == threshold") {
    val gap = 100 * S
    val e = ev(
      (0L, 1L, 1000 * S, "a", 1.0),
      (1L, 1L, 1100 * S, "a", 2.0),  // gap == 100s: SAME session
      (2L, 1L, 1201 * S, "a", 3.0),  // gap 101s: NEW session
      (3L, 2L, 5000 * S, "a", 4.0))  // other user: own session
    val s = Temporal.sessionize(e, gapNs = gap)
      .orderBy("user_id", "session_idx").collect()
    assert(s.length === 3)
    assert(s(0).getAs[Long]("user_id") === 1L)
    assert(s(0).getAs[Long]("n_events") === 2L)
    assert(s(0).getAs[Long]("session_start") === 1000 * S)
    assert(s(0).getAs[Long]("session_end") === 1100 * S)
    assert(s(0).getAs[Double]("sum_value") === 3.0)
    assert(s(1).getAs[Long]("n_events") === 1L)
    assert(s(1).getAs[Long]("session_idx") === 2L)
    assert(s(2).getAs[Long]("user_id") === 2L)
    assert(s(2).getAs[Long]("session_idx") === 1L)
  }

  test("interarrival: whole-second floor, single-event users absent, exact p50/p90") {
    val e = ev(
      (0L, 1L, 1000 * S, "a", 1.0),
      (1L, 1L, 1010 * S, "a", 1.0),          // gap 10 s
      (2L, 1L, 1030 * S, "a", 1.0),          // gap 20 s
      (3L, 1L, 1030 * S + S / 2, "a", 1.0),  // gap 0.5 s -> floors to 0
      (4L, 2L, 9999 * S, "a", 1.0))          // single event: no gaps
    val r = Temporal.interarrival(e).orderBy("user_id").collect()
    assert(r.length === 1)                    // user 2 absent
    assert(r(0).getAs[Long]("user_id") === 1L)
    assert(r(0).getAs[Long]("n_gaps") === 3L)
    assert(r(0).getAs[Double]("mean_gap_s") === 10.0)      // (10+20+0)/3
    assert(r(0).getAs[Double]("p50_gap_s") === 10.0)
    assert(r(0).getAs[Double]("p90_gap_s") === 18.0)       // interp 10..20 at .8
    assert(r(0).getAs[Long]("max_gap_s") === 20L)
  }

  test("sessionize is partitioning-invariant") {
    val e = ev((0L until 50L).map(i =>
      (i, i % 3, (1000 + 70 * i) * S, "a", 1.0)): _*)
    val a = Temporal.sessionize(e, 100 * S).orderBy("user_id", "session_idx")
      .collect().toSeq
    val b = Temporal.sessionize(e.repartition(7), 100 * S)
      .orderBy("user_id", "session_idx").collect().toSeq
    assert(a === b)
  }

  test("dauSketchTable rollup: weekly-from-daily ≈ direct weekly ≈ exact") {
    val e = graft.pipeline.Temporal.readEvents(spark, "/root/testdata/sf0.001")
    val daily = Temporal.dauSketchTable(e, bucketNs = Temporal.NsPerDay)
    val weekly = Temporal.dauFromSketches(daily, Temporal.NsPerWeek)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // exact weekly distincts
    val exact = e.groupBy((col("ts") - pmod(col("ts"), lit(Temporal.NsPerWeek)))
        .as("w"))
      .agg(countDistinct("user_id").as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(weekly.keySet === exact.keySet)
    // HLL at lgK=12 on hundreds of users: ≤ 5% relative error
    weekly.foreach { case (w, est) =>
      val ex = exact(w).toDouble
      assert(math.abs(est - ex) / ex <= 0.05, s"week $w: est $est vs exact $ex")
    }
    // the union-of-daily estimate agrees with the direct weekly sketch
    val direct = Temporal.dauSketchTable(e, bucketNs = Temporal.NsPerWeek)
    val directEst = Temporal.dauFromSketches(direct, Temporal.NsPerWeek)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    weekly.foreach { case (w, est) =>
      val d = directEst(w).toDouble
      assert(math.abs(est - d) / d <= 0.02,
        s"union-of-daily $est deviates from direct sketch $d at week $w")
    }
  }

  test("markovTransitions counts per-user consecutive pairs, row-normalizes") {
    val e = ev(
      (0L, 1L, 1000 * S, "a", 0.0),
      (1L, 1L, 2000 * S, "b", 0.0),
      (2L, 1L, 3000 * S, "a", 0.0),
      (3L, 1L, 4000 * S, "c", 0.0),
      (4L, 2L, 1000 * S, "a", 0.0),
      (5L, 2L, 2000 * S, "b", 0.0),
      (6L, 3L, 9000 * S, "z", 0.0)) // singleton user: no transition
    val r = Temporal.markovTransitions(e).collect()
      .map(x => (x.getAs[String]("from_type"), x.getAs[String]("to_type")) ->
        ((x.getAs[Long]("n"), x.getAs[Double]("prob")))).toMap
    // a -> b twice (users 1, 2), a -> c once; b -> a once
    assert(r(("a", "b")) === ((2L, 0.666667)))
    assert(r(("a", "c")) === ((1L, 0.333333)))
    assert(r(("b", "a")) === ((1L, 1.0)))
    assert(!r.keySet.exists(_._1 == "z")) // no cross-user transitions
    assert(r.size === 3)
  }

  test("asofJoin matches most recent right row at-or-before, max tie wins at equal ts") {
    val left = ev(
      (10L, 1L, 1000 * S, "l", 0.0),   // right rows at exactly 1000s: tie → included, max event_id wins
      (11L, 1L, 999 * S, "l", 0.0),    // before every right row → no match
      (12L, 2L, 5000 * S, "l", 0.0))   // matches user 2's latest earlier row
      .select("event_id", "user_id", "ts")
    val right = ev(
      (1L, 1L, 1000 * S, "r", 0.0),
      (2L, 1L, 1000 * S, "r", 0.0),    // same (user, ts): event_id 2 must win
      (3L, 2L, 4000 * S, "r", 0.0),
      (4L, 2L, 4500 * S, "r", 0.0),
      (5L, 2L, 6000 * S, "r", 0.0))    // after left ts → excluded
      .select("user_id", "ts", "event_id")
    val out = Temporal.asofJoin(left, right, "user_id", "ts", "event_id",
        Seq("event_id", "ts"))
      .orderBy("event_id").collect()
    val byId = out.map(r => r.getAs[Long]("event_id") ->
      Option(r.getAs[java.lang.Long]("matched_event_id")).map(_.toLong)).toMap
    assert(byId(10L) === Some(2L))
    assert(byId(11L) === None)
    assert(byId(12L) === Some(4L))
  }

  test("tumbling + hopping: hopping multiplicity = width/slide, tumbling bucket floors") {
    val e = ev(
      (0L, 1L, 3600 * S + 5, "a", 1.0),
      (1L, 1L, 2 * 3600 * S - 1, "a", 2.0),
      (2L, 1L, 2 * 3600 * S, "b", 3.0))
    val t = Temporal.tumblingAgg(e, Temporal.NsPerHour)
      .orderBy("window_start", "event_type").collect()
    assert(t.map(r => (r.getAs[Long]("window_start"), r.getAs[String]("event_type"),
      r.getAs[Long]("n_events"))).toSeq ===
      Seq((3600 * S, "a", 2L), (2 * 3600 * S, "b", 1L)))
    val h = Temporal.hoppingAgg(e, Temporal.NsPerHour, 15 * Temporal.NsPerMinute)
    // each event appears in exactly width/slide = 4 windows
    assert(h.agg(sum("n_events")).head.getLong(0) === 3L * 4)
    // the event at exactly 2h lands in starts {75,90,105,120}min
    val starts = h.where(col("event_type") === "b").select("window_start")
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(starts === Seq(75, 90, 105, 120).map(_ * Temporal.NsPerMinute))
  }

  test("funnel: order matters, horizon enforced, strictly-after steps") {
    val e = ev(
      // user 1: full ordered funnel
      (0L, 1L, 1000 * S, "s1", 0.0), (1L, 1L, 2000 * S, "s2", 0.0),
      (2L, 1L, 3000 * S, "s3", 0.0),
      // user 2: s2 BEFORE s1 — second step must not count
      (3L, 2L, 1000 * S, "s2", 0.0), (4L, 2L, 2000 * S, "s1", 0.0),
      // user 3: s2 beyond horizon of s1
      (5L, 3L, 1000 * S, "s1", 0.0),
      (6L, 3L, 1000 * S + 8 * Temporal.NsPerDay, "s2", 0.0),
      // user 4: s1 and s2 at the SAME ts — "strictly after" excludes it
      (7L, 4L, 1000 * S, "s1", 0.0), (8L, 4L, 1000 * S, "s2", 0.0))
    val f = Temporal.funnel(e, Seq("s1", "s2", "s3"), 7 * Temporal.NsPerDay)
      .orderBy("step").collect()
    assert(f.map(r => (r.getAs[Long]("step"), r.getAs[String]("event_type"),
      r.getAs[Long]("n_users"))).toSeq ===
      Seq((1L, "s1", 4L), (2L, "s2", 1L), (3L, "s3", 1L)))
  }

  test("funnelTiming: hand-computed whole-second deltas, median/p90/mean") {
    val e = ev(
      // user 1: s1 -> s2 in 100 s, s2 -> s3 in 50 s
      (0L, 1L, 1000 * S, "s1", 0.0), (1L, 1L, 1100 * S, "s2", 0.0),
      (2L, 1L, 1150 * S, "s3", 0.0),
      // user 2: s1 -> s2 in 300 s, never s3
      (3L, 2L, 1000 * S, "s1", 0.0), (4L, 2L, 1300 * S, "s2", 0.0),
      // user 3: s1 -> s2 in 200 s
      (5L, 3L, 1000 * S, "s1", 0.0), (6L, 3L, 1200 * S, "s2", 0.0),
      // user 4: s1 only — contributes to no transition
      (7L, 4L, 1000 * S, "s1", 0.0))
    val t = Temporal.funnelTiming(e, Seq("s1", "s2", "s3"),
        7 * Temporal.NsPerDay)
      .orderBy("step_from").collect()
    assert(t.length === 2)
    val t12 = t(0)
    assert(t12.getAs[Long]("step_from") === 1L &&
      t12.getAs[Long]("step_to") === 2L &&
      t12.getAs[Long]("n_users") === 3L)
    // deltas {100, 200, 300}: median 200, p90 interpolated 280, mean 200
    assert(t12.getAs[Double]("median_s") === 200.0)
    assert(t12.getAs[Double]("p90_s") === 280.0)
    assert(t12.getAs[Double]("mean_s") === 200.0)
    val t23 = t(1)
    assert(t23.getAs[Long]("n_users") === 1L &&
      t23.getAs[Double]("median_s") === 50.0)
  }

  test("funnel skew cap: exact when within cap, bounded and conservative when hot") {
    val e = ev(
      (0L, 1L, 1000 * S, "s1", 0.0), (1L, 1L, 2000 * S, "s2", 0.0),
      (2L, 1L, 3000 * S, "s3", 0.0),
      (3L, 2L, 1000 * S, "s2", 0.0), (4L, 2L, 2000 * S, "s1", 0.0),
      (5L, 3L, 1000 * S, "s1", 0.0),
      (6L, 3L, 1000 * S + 8 * Temporal.NsPerDay, "s2", 0.0),
      (7L, 4L, 1000 * S, "s1", 0.0), (8L, 4L, 1000 * S, "s2", 0.0))
    val exact = Temporal.funnel(e, Seq("s1", "s2", "s3"), 7 * Temporal.NsPerDay)
      .orderBy("step").collect().toSeq
    // cap >= per-(user, type) activity: identical to the exact path
    val capped = Temporal.funnel(e, Seq("s1", "s2", "s3"), 7 * Temporal.NsPerDay,
      maxEventsPerUser = 8).orderBy("step").collect().toSeq
    assert(capped === exact)
    // a hot user whose qualifying s2 is BEYOND the cap's earliest-N of
    // its type under-completes (conservative direction): 64 early s2
    // events before its s1, the only qualifying s2 after them
    val hot = ev(((0L until 64L).map(i => (100L + i, 9L, (10 + i) * S, "s2", 0.0)) ++
      Seq((200L, 9L, 5000 * S, "s1", 0.0), (201L, 9L, 6000 * S, "s2", 0.0))): _*)
    val hotExact = Temporal.funnel(hot, Seq("s1", "s2"), 7 * Temporal.NsPerDay)
      .orderBy("step").collect().map(_.getAs[Long]("n_users")).toSeq
    assert(hotExact === Seq(1L, 1L))
    val hotCapped = Temporal.funnel(hot, Seq("s1", "s2"), 7 * Temporal.NsPerDay,
      maxEventsPerUser = 16).orderBy("step").collect()
      .map(_.getAs[Long]("n_users")).toSeq
    assert(hotCapped === Seq(1L, 0L)) // dropped, never invented
  }

  test("retention: cohort = first-event week, offsets count distinct users") {
    val W = Temporal.NsPerWeek
    val e = ev(
      (0L, 1L, 1 * W + 5, "a", 0.0),  // cohort week 1
      (1L, 1L, 2 * W + 5, "a", 0.0),  // offset 1
      (2L, 1L, 2 * W + 9, "a", 0.0),  // same user+offset: counted once
      (3L, 2L, 1 * W + 7, "a", 0.0),  // cohort week 1, never returns
      (4L, 3L, 3 * W + 1, "a", 0.0))  // cohort week 3
    val r = Temporal.retention(e, W).orderBy("cohort_week", "week_offset")
      .collect().map(x => (x.getAs[Long]("cohort_week") / W,
        x.getAs[Long]("week_offset"), x.getAs[Long]("n_users"))).toSeq
    assert(r === Seq((1L, 0L, 2L), (1L, 1L, 1L), (3L, 0L, 1L)))
  }

  test("rangeJoin: boundary-inclusive, cross-bucket, exactly-once, per-key") {
    val W = 100 * S
    val left = ev(
      (1L, 1L, 150 * S, "c", 0.0),
      (2L, 2L, 150 * S, "c", 0.0)).select("user_id", "ts", "event_id")
    val right = ev(
      (10L, 1L, 250 * S, "p", 0.0),  // Δ = exactly W, crosses bucket → include
      (11L, 1L, 251 * S, "p", 0.0),  // Δ = W+1s → exclude
      (12L, 1L, 150 * S, "p", 0.0),  // Δ = 0, same bucket → include once
      (13L, 2L, 160 * S, "p", 0.0),  // other user's window
      (14L, 3L, 150 * S, "p", 0.0))  // user with no left rows
      .select("user_id", "ts", "event_id")
    val out = Temporal.rangeJoin(left, right, "user_id", "ts", W,
        Seq("event_id"), Seq("event_id"))
      .collect().map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("l_event_id"),
        r.getAs[Long]("r_event_id"), r.getAs[Long]("delta_ns"))).toSeq
    assert(out.distinct.size === out.size, "each pair exactly once")
    assert(out.toSet === Set(
      (1L, 1L, 10L, 100 * S), (1L, 1L, 12L, 0L), (2L, 2L, 13L, 10 * S)))
  }

  test("anomalies: spike over a varying baseline is flagged; empty/constant frames dropped") {
    val H = Temporal.NsPerHour
    // type 'a': alternating 4/6 counts for 12 hours, then a 50-count spike
    val rows = (0 until 12).flatMap { h =>
      val n = if (h % 2 == 0) 4 else 6
      (0 until n).map(j => (h.toLong * 100 + j, 1L, h * H + j * S, "a", 1.0))
    } ++ (0 until 50).map(j => (1200L + j, 1L, 12 * H + j * S, "a", 1.0))
    val out = Temporal.anomalies(ev(rows: _*), widthNs = H, lookback = 24,
      zThreshold = 3.0).orderBy("window_start").collect()
    // first bucket has an empty trailing frame (no row); second has a
    // single-element frame (sd null) — both dropped
    assert(out.head.getAs[Long]("window_start") === 2 * H)
    val spike = out.last
    assert(spike.getAs[Long]("n_events") === 50L)
    assert(spike.getAs[Boolean]("is_anomaly"))
    assert(spike.getAs[Double]("z") > 10.0)
    // the in-pattern buckets are not anomalous
    assert(out.init.forall(!_.getAs[Boolean]("is_anomaly")))
  }

  test("rollupReport: detail + per-type subtotal + grand total rows") {
    val D = Temporal.NsPerDay
    val e = ev(
      (0L, 1L, 0 * D + 5, "a", 1.0), (1L, 1L, 0 * D + 6, "a", 2.0),
      (2L, 1L, 1 * D + 5, "a", 4.0), (3L, 1L, 0 * D + 7, "b", 8.0))
    val out = Temporal.rollupReport(e)
      .collect().map(r => (r.getAs[String]("event_type"), r.getAs[String]("day"),
        r.getAs[Long]("n_events"), r.getAs[Double]("sum_value"))).toSet
    assert(out === Set(
      ("a", "0", 2L, 3.0), ("a", (1 * D).toString, 1L, 4.0),
      ("b", "0", 1L, 8.0),
      ("a", "ALL", 3L, 7.0), ("b", "ALL", 1L, 8.0),
      ("ALL", "ALL", 4L, 15.0)))
  }

  test("topUsers: exact counts, deterministic user_id tie-break, k cutoff") {
    val e = ev(
      (0L, 1L, 1 * S, "a", 0.0), (1L, 1L, 2 * S, "a", 0.0),
      (2L, 2L, 3 * S, "a", 0.0), (3L, 2L, 4 * S, "a", 0.0), // tie with user 1
      (4L, 3L, 5 * S, "a", 0.0),                            // count 1 → cut at k=2
      (5L, 9L, 6 * S, "b", 0.0))
    val out = Temporal.topUsers(e, k = 2).orderBy("event_type", "rk")
      .collect().map(r => (r.getAs[String]("event_type"),
        r.getAs[Long]("user_id"), r.getAs[Long]("n_events"),
        r.getAs[Long]("rk"))).toSeq
    assert(out === Seq(("a", 1L, 2L, 1L), ("a", 2L, 2L, 2L), ("b", 9L, 1L, 1L)))
  }

  test("activeUsersApprox tracks exact DAU within rsd on the sf0.001 events") {
    val e = Temporal.readEvents(spark, "/root/testdata/sf0.001")
    val exact = Temporal.activeUsers(e).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val approx = Temporal.activeUsersApprox(e, rsd = 0.02).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(approx.keySet === exact.keySet)
    exact.foreach { case (day, n) =>
      assert(math.abs(approx(day) - n) <= math.max(2.0, 0.1 * n),
        s"day=$day exact=$n approx=${approx(day)}")
    }
  }

  test("heavyHitters: scale-free factor threshold; CMS sketch brackets exact counts") {
    // user 1 fires 6 of type a's 10 events (mean 10/3); user 9 is type
    // b's only user (trivially ≥ factor × mean? no: n·u = 1·1 = total —
    // below 1.5× — so b yields nothing)
    val rows = (0 until 6).map(i => (i.toLong, 1L, (i * 10 + 1) * S, "a", 0.0)) ++
      Seq((6L, 2L, 700 * S, "a", 0.0), (7L, 2L, 710 * S, "a", 0.0),
        (8L, 3L, 720 * S, "a", 0.0), (9L, 3L, 730 * S, "a", 0.0),
        (10L, 9L, 800 * S, "b", 0.0))
    val e = ev(rows: _*)
    val hh = Temporal.heavyHitters(e, factor = 1.5).collect()
      .map(r => (r.getAs[String]("event_type"), r.getAs[Long]("user_id"),
        r.getAs[Long]("n_events"), r.getAs[Double]("share"))).toSeq
    assert(hh === Seq(("a", 1L, 6L, 0.6)))

    val sk = Temporal.userCountSketch(e, eps = 0.01).collect()
      .map(r => r.getAs[String]("event_type") ->
        (org.apache.spark.util.sketch.CountMinSketch.readFrom(
          new java.io.ByteArrayInputStream(r.getAs[Array[Byte]]("cms"))),
         r.getAs[Long]("total"))).toMap
    val (cmsA, totalA) = sk("a")
    // CMS never undercounts; overshoot bounded by eps·total
    Seq(1L -> 6L, 2L -> 2L, 3L -> 2L).foreach { case (u, exact) =>
      val est = cmsA.estimateCount(u)
      assert(est >= exact && est <= exact + math.ceil(0.01 * totalA).toLong,
        s"user $u exact=$exact est=$est")
    }
    assert(sk("b")._1.estimateCount(9L) >= 1L)
  }

  test("ohlc: open/close by (ts, event_id) tie-break, low/high/mean exact") {
    val H = Temporal.NsPerHour
    val e = ev(
      (5L, 1L, 0 * H + 100, "a", 2.0),  // earliest ts → open
      (1L, 1L, 0 * H + 100, "a", 4.0),  // same ts, lower event_id... no: id 1 < 5
      (2L, 1L, 0 * H + 900, "a", 8.0),  // latest ts → close
      (3L, 1L, 1 * H + 5, "a", 1.0),    // next bucket
      (4L, 1L, 0 * H + 7, "b", 6.0))
    val out = Temporal.ohlc(e, bucketNs = H).orderBy("event_type", "bucket")
      .collect().map(r => (r.getAs[String]("event_type"), r.getAs[Long]("bucket"),
        r.getAs[Double]("open"), r.getAs[Double]("close"), r.getAs[Double]("low"),
        r.getAs[Double]("high"), r.getAs[Long]("n_events"),
        r.getAs[Double]("mean_value"))).toSeq
    // tie at ts=100: event_id 1 wins the open (struct tie-break)
    assert(out === Seq(
      ("a", 0L, 4.0, 8.0, 2.0, 8.0, 3L, round6(14.0 / 3)),
      ("a", H, 1.0, 1.0, 1.0, 1.0, 1L, 1.0),
      ("b", 0L, 6.0, 6.0, 6.0, 6.0, 1L, 6.0)))
  }

  test("cumulative: running count/sum per user, (ts, event_id) order, users isolated") {
    val e = ev(
      (2L, 1L, 100L, "a", 1.5),
      (1L, 1L, 100L, "a", 2.0), // same ts: event_id 1 orders first
      (3L, 1L, 300L, "b", 0.25),
      (4L, 2L, 50L, "a", 7.0))
    val out = Temporal.cumulative(e).orderBy("user_id", "ts", "event_id")
      .collect().map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("event_id"),
        r.getAs[Long]("n_events_so_far"), r.getAs[Double]("cum_value"))).toSeq
    assert(out === Seq(
      (1L, 1L, 1L, 2.0), (1L, 2L, 2L, 3.5), (1L, 3L, 3L, 3.75),
      (2L, 4L, 1L, 7.0)))
  }

  test("readEvents: ts is µs-truncated epoch-ns long, (type, ts) collision-free") {
    val e = Temporal.readEvents(spark, "/root/testdata/sf0.001")
    assert(e.schema("ts").dataType.typeName === "long")
    assert(e.where(pmod(col("ts"), lit(1000L)) =!= 0L).count() === 0L)
    assert(e.count() === 1000L)
    // the ohlc oracle's scalar arg_min/arg_max mirror relies on this
    assert(e.groupBy("event_type", "ts").count()
      .where(col("count") > 1).count() === 0L)
  }

  test("resample: dense bucket spine, zero-filled gaps, agg values intact") {
    val W = 100 * S
    val e = ev(
      (0L, 1L, 1000 * S, "a", 2.0),
      (1L, 1L, 1450 * S, "a", 3.0),   // bucket 1400, leaves 1100-1300 empty
      (2L, 2L, 1210 * S, "b", 5.0))
    val out = Temporal.resample(e, bucketNs = W).collect()
      .map(r => (r.getLong(0), r.getString(1)) ->
        ((r.getLong(2), r.getDouble(3)))).toMap
    // spine: buckets 1000..1400 (5) x types {a, b} = 10 rows
    assert(out.size === 10)
    assert(out((1000 * S, "a")) === ((1L, 2.0)))
    assert(out((1400 * S, "a")) === ((1L, 3.0)))
    assert(out((1200 * S, "b")) === ((1L, 5.0)))
    assert(out((1100 * S, "a")) === ((0L, 0.0)))   // gap zero-filled
    assert(out((1400 * S, "b")) === ((0L, 0.0)))   // type hole zero-filled
  }

  test("readEvents is machine/session-timezone-independent and restores the tz conf") {
    // The current testdata encodes ts as timestamp[us] (naive). readEvents
    // must interpret the wall clock as UTC regardless of the ambient
    // session timezone — a tz-dependent read would shift every epoch-ns
    // long and diverge from the DuckDB oracle's epoch_ns(ts).
    val tzKey = "spark.sql.session.timeZone"
    val prev = spark.conf.get(tzKey)
    try {
      spark.conf.set(tzKey, "America/New_York")
      val ny = Temporal.readEvents(spark, "/root/testdata/sf0.001")
        .agg(min("ts")).head.getLong(0)
      assert(spark.conf.get(tzKey) === "America/New_York",
        "readEvents must restore the session tz it pinned")
      spark.conf.set(tzKey, "UTC")
      val utc = Temporal.readEvents(spark, "/root/testdata/sf0.001")
        .agg(min("ts")).head.getLong(0)
      assert(ny === utc)
      // 2024-01-01 00:09:58.778549 UTC, as DuckDB's epoch_ns(min(ts)) sees it
      assert(utc === 1704067798778549000L)
    } finally spark.conf.set(tzKey, prev)
  }

  private def round6(x: Double): Double = math.rint(x * 1e6) / 1e6
}
