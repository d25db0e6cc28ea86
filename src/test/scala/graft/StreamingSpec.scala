package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.core.{Doc, TokenEntry, Txn}
import graft.operators._
import graft.sources.{Corpus, SyntheticCollection}
import graft.streaming.{StreamingOnlineFit, StreamingPipeline}

/** Structured Streaming extensions: online fit over micro-batches and the
  * streaming clean/dedup pipeline, driven through MemoryStream. */
class StreamingSpec extends SparkSpec {

  test("streaming online fit converges over micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val docs = SyntheticCollection.dataset(spark, numPartitions = 1).cache()
    val dict = DictionaryOps.gather(docs)
    val pwt0 = PhiOps.initializeModel(dict, numTopics = 10, seed = -1)

    val fitter = new StreamingOnlineFit(pwt0,
      Fit.Config(numTopics = 10, estep = EStepConfig(numDocumentPasses = 10)),
      tau0 = 1.0, kappa = 0.5)

    val stream = MemoryStream[Doc]
    val query = fitter.writer(stream.toDS()).start()
    try {
      (0 until 4).foreach { _ =>
        stream.addData(docs.collect().toSeq)
        query.processAllAvailable()
      }
    } finally query.stop()

    assert(fitter.scores.length == 4)
    val perps = fitter.scores.map(_.perplexity)
    info(s"streaming perplexities: ${perps.map(p => f"$p%.2f").mkString(", ")}")
    assert(perps.last < perps.head * 0.7, s"no convergence: $perps")
    // final model is a proper stochastic phi
    val colSums = fitter.currentPwt
      .agg(graft.functions.VectorOps.vectorSum(col("weights"))).head().getSeq[Float](0)
    colSums.foreach(s => assert(math.abs(s - 1.0f) < 1e-3))
  }

  test("streaming fit_online matches batch fit_online bit-exactly, chunk for chunk") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    // shuffle.partitions = 1 + single-partition chunks make every float
    // aggregation order deterministic, so the two paths — which share the
    // same E-step, decay merge, and normalize — must agree to the BIT
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "1")
    try {
      val docsTable = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .filter(col("doc_id") < 60)
      val corpus = Corpus.fromDocumentsTable(docsTable).cache()
      val dict = DictionaryOps.gather(corpus)
      val pwt0 = PhiOps.initializeModel(dict, 4, seed = 7)
      val cfg = Fit.Config(numTopics = 4, estep = EStepConfig(numDocumentPasses = 2))
      val all = corpus.collect().toSeq.sortBy(_.doc_id)
      val chunkSeqs = all.grouped(20).toSeq // 3 chunks, same split on both paths
      val chunks = chunkSeqs.map(c => spark.createDataset(c).coalesce(1))
      val batch = Fit.fitOnline(chunks, pwt0, cfg, tau0 = 64.0, kappa = 0.7)

      val fitter = new StreamingOnlineFit(pwt0, cfg, tau0 = 64.0, kappa = 0.7)
      val stream = MemoryStream[Doc]
      val query = fitter.writer(stream.toDS()).start()
      try {
        // one addData + drain per chunk = one micro-batch per chunk — the
        // same chunking (and so the same rho_i schedule) as the batch run
        chunkSeqs.foreach { c => stream.addData(c); query.processAllAvailable() }
      } finally query.stop()

      val a = batch.pwt.select(col("class_id"), col("token"),
        posexplode(col("weights")).as(Seq("topic", "wa")))
      val b = fitter.currentPwt.select(col("class_id"), col("token"),
        posexplode(col("weights")).as(Seq("topic", "wb")))
      val row = a.join(b, Seq("class_id", "token", "topic"), "full")
        .agg(max(abs(col("wa") - col("wb"))), count(lit(1)),
          sum(when(col("wa").isNull || col("wb").isNull, 1).otherwise(0))).head()
      info(s"${row.getLong(1)} phi cells, max |stream - batch| = ${row.get(0)}")
      assert(row.getLong(2) === 0L, "same (class, token, topic) support")
      assert(row.getLong(1) > 0L)
      assert(!row.isNullAt(0) && row.getFloat(0) === 0.0f,
        "streaming decay-merge must equal batch fit_online bit-for-bit")
    } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
  }

  test("streaming fit_online resumes from an exported model on the rho schedule") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "1")
    try {
      val docsTable = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .filter(col("doc_id") < 40)
      val corpus = Corpus.fromDocumentsTable(docsTable).cache()
      val dict = DictionaryOps.gather(corpus)
      val pwt0 = PhiOps.initializeModel(dict, 4, seed = 7)
      val cfg = Fit.Config(numTopics = 4, estep = EStepConfig(numDocumentPasses = 2))
      val chunkSeqs = corpus.collect().toSeq.sortBy(_.doc_id).grouped(20).toSeq

      def drive(f: StreamingOnlineFit, cs: Seq[Seq[Doc]]): Unit = {
        val stream = MemoryStream[Doc]
        val q = f.writer(stream.toDS()).start()
        try cs.foreach { c => stream.addData(c); q.processAllAvailable() }
        finally q.stop()
      }
      // continuous: both chunks through one fitter
      val cont = new StreamingOnlineFit(pwt0, cfg, tau0 = 64.0, kappa = 0.7)
      drive(cont, chunkSeqs)
      // interrupted: chunk 0, export/import the phi (ModelIO round-trip),
      // resume a NEW fitter at processedChunks — chunk 1's rho matches.
      // The resumed merge seeds from the imported phi's mass, not the
      // carried n_wt, so parity is on the rho SCHEDULE + support (the
      // warm-start contract), pinned by score equality on chunk 1's pass.
      val first = new StreamingOnlineFit(pwt0, cfg, tau0 = 64.0, kappa = 0.7)
      drive(first, chunkSeqs.take(1))
      val dirp = java.nio.file.Files.createTempDirectory("resume_fit").toString
      graft.sources.ModelIO.exportModel(first.currentPwt,
        (0 until 4).map(i => s"topic_$i"), dirp)
      first.close()
      val resumed = new StreamingOnlineFit(
        graft.sources.ModelIO.importModel(spark, dirp)._1, cfg,
        tau0 = 64.0, kappa = 0.7, startChunkIndex = first.processedChunks)
      drive(resumed, chunkSeqs.drop(1))
      resumed.close()
      assert(resumed.processedChunks === 2)
      // the resumed pass scored chunk 1 with the SAME broadcast phi the
      // continuous run used for its second chunk (phi after chunk 0 is a
      // pure function of phi+chunk, and export/import is bit-exact), so
      // the per-pass scores must agree exactly
      assert(resumed.scores.map(_.perplexity) ===
        Seq(cont.scores(1).perplexity))
      cont.close()
    } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
  }

  test("streaming transform matches batch transform exactly") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val docsTable = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .filter(col("doc_id") < 50)
    val corpus = Corpus.fromDocumentsTable(docsTable).cache()
    val dict = DictionaryOps.gather(corpus)
    val pwt = Fit.fitOffline(corpus, PhiOps.initializeModel(dict, 4, seed = 3),
      Fit.Config(numTopics = 4, numCollectionPasses = 2,
        estep = EStepConfig(numDocumentPasses = 2))).pwt.cache()

    val stream = MemoryStream[Doc]
    val theta = StreamingPipeline.transformStream(stream.toDS(), pwt, 4,
      EStepConfig(numDocumentPasses = 2))
    val query = theta.writeStream.format("memory").queryName("stream_theta")
      .outputMode("append").start()
    try {
      stream.addData(corpus.collect().toSeq)
      query.processAllAvailable()
    } finally query.stop()

    val streamed = spark.table("stream_theta")
      .select(col("doc_id"), posexplode(col("weights")).as(Seq("topic", "w")))
    val batch = Fit.transform(corpus, pwt, 4, EStepConfig(numDocumentPasses = 2))
      .select(col("doc_id"), posexplode(col("weights")).as(Seq("topic", "wb")))
    val joined = streamed.join(batch, Seq("doc_id", "topic"), "full")
    val row = joined.agg(max(abs(col("w") - col("wb"))), count(lit(1))).head()
    info(s"${row.getLong(1)} theta cells, max |stream - batch| = ${row.get(0)}")
    assert(row.getLong(1) === 50L * 4)
    assert(!row.isNullAt(0) && row.getFloat(0) === 0.0f) // same kernel, same phi
  }

  test("watermarked window counts and stateful sessionization over events") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    def ts(min: Int) = new java.sql.Timestamp(1700000000000L + min * 60000L)
    val stream = MemoryStream[(Long, java.sql.Timestamp, Long, String, Double)]
    val df = stream.toDS().toDF("event_id", "ts", "user_id", "event_type", "value")

    val windowed = StreamingPipeline.eventWindowCounts(df, "10 minutes", "5 minutes")
    val q1 = windowed.writeStream.format("memory").queryName("win_counts")
      .outputMode("append").start()
    val sessions = StreamingPipeline.sessionize(df, gapSeconds = 600, watermark = "5 minutes")
    val q2 = sessions.writeStream.format("memory").queryName("sessions")
      .outputMode("append").start()
    try {
      stream.addData(
        (1L, ts(0), 7L, "click", 1.0), (2L, ts(1), 7L, "click", 2.0),
        (3L, ts(2), 9L, "view", 5.0))
      q1.processAllAvailable(); q2.processAllAvailable()
      // advance event time far beyond watermark + session gap → windows
      // close, sessions time out
      stream.addData((4L, ts(60), 11L, "click", 1.0))
      q1.processAllAvailable(); q2.processAllAvailable()
      stream.addData((5L, ts(120), 11L, "click", 1.0))
      q1.processAllAvailable(); q2.processAllAvailable()
    } finally { q1.stop(); q2.stop() }

    val wins = spark.sql("SELECT event_type, events, total_value FROM win_counts")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    assert(wins.contains(("click", 2L, 3.0)), s"windowed counts wrong: $wins")
    assert(wins.exists(_._1 == "view"))

    val sess = spark.sql("SELECT user_id, events, total_value FROM sessions")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(sess.get(7L).contains((2L, 3.0)), s"session for user 7 wrong: $sess")
    assert(sess.get(9L).contains((1L, 5.0)))
  }

  test("streaming DAU sketch == batch approx_count_distinct on the same rows") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val base = 1700000000000L // ms
    val rows = (0 until 300).map { i =>
      (i.toLong, new java.sql.Timestamp(base + (i % 40) * 3600000L),
        (i % 23).toLong, "e", 1.0)
    }
    val stream = MemoryStream[(Long, java.sql.Timestamp, Long, String, Double)]
    val df = stream.toDS().toDF("event_id", "ts", "user_id", "event_type", "value")
    val q = StreamingPipeline.activeUsersStream(df, "1 day", "1 day")
      .writeStream.format("memory").queryName("dau").outputMode("append").start()
    try {
      // feed in event-time order: the 1-day watermark admits any
      // within-chunk disorder but a full day-0 replay in chunk 2 would
      // be (correctly) dropped as late — that's watermark semantics,
      // not a parity failure
      rows.sortBy(_._2.getTime).grouped(100).foreach { c =>
        stream.addData(c: _*); q.processAllAvailable()
      }
      stream.addData((999L, new java.sql.Timestamp(base + 30L * 86400000L), 999L, "e", 0.0))
      q.processAllAvailable()
      stream.addData((998L, new java.sql.Timestamp(base + 31L * 86400000L), 998L, "e", 0.0))
      q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.sql("SELECT day, n_users FROM dau").collect()
      .map(r => r.getTimestamp(0).getTime -> r.getLong(1)).toMap
    val batch = rows.toDF("event_id", "ts", "user_id", "event_type", "value")
      .groupBy(window(col("ts"), "1 day"))
      .agg(approx_count_distinct(col("user_id"), 0.02).as("n_users"))
      .collect().map(r => (r.getStruct(0).getTimestamp(0).getTime, r.getLong(1))).toMap
    assert(batch.nonEmpty)
    batch.foreach { case (day, n) =>
      assert(streamed.get(day).contains(n), s"day=$day batch=$n stream=${streamed.get(day)}")
    }
  }

  test("streaming cumulative == batch cumulative across micro-batch boundaries") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    var t = 1700000000000000000L // epoch ns
    val events = (0 until 120).map { i =>
      t += rnd.nextInt(400000) * 1000000L
      (i.toLong, t, 1L + rnd.nextInt(4), s"e${rnd.nextInt(3)}",
        rnd.nextInt(1000) / 8.0)
    }
    val stream = MemoryStream[(Long, Long, Long, String, Double)]
    val df = stream.toDS().toDF("event_id", "ts_ns", "user_id", "event_type", "value")
    val q = StreamingPipeline.cumulativeStream(df)
      .writeStream.format("memory").queryName("cum_parity")
      .outputMode("append").start()
    try {
      // chunk boundaries fall mid-user-history; state must carry across
      events.grouped(25).foreach { chunk =>
        stream.addData(chunk: _*); q.processAllAvailable()
      }
    } finally q.stop()
    val streamed = spark.sql(
      "SELECT user_id, ts_ns, event_id, event_type, n_events_so_far, cum_micro FROM cum_parity")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3),
        r.getLong(4), r.getLong(5) / 1e6)).toSet
    val batchIn = events.map { case (id, ts, u, et, v) => (id, u, ts, et, v) }
      .toDF("event_id", "user_id", "ts", "event_type", "value")
    val batch = graft.pipeline.Temporal.cumulative(batchIn).collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("ts"),
        r.getAs[Long]("event_id"), r.getAs[String]("event_type"),
        r.getAs[Long]("n_events_so_far"), r.getAs[Double]("cum_value"))).toSet
    assert(batch.exists(_._5 > 10), "fixture exercises deep running state")
    assert(streamed === batch,
      s"stream-only: ${streamed -- batch}; batch-only: ${batch -- streamed}")
  }

  test("streaming interarrival gaps == batch lag window across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val rnd = new scala.util.Random(13)
    var t = 1700000000000000000L // epoch ns
    val events = (0 until 120).map { i =>
      t += rnd.nextInt(400000) * 1000000L
      (i.toLong, t, 1L + rnd.nextInt(4), s"e${rnd.nextInt(3)}",
        rnd.nextInt(1000) / 8.0)
    }
    val stream = MemoryStream[(Long, Long, Long, String, Double)]
    val df = stream.toDS().toDF("event_id", "ts_ns", "user_id", "event_type", "value")
    val q = StreamingPipeline.interarrivalStream(df)
      .writeStream.format("memory").queryName("gap_parity")
      .outputMode("append").start()
    try {
      // chunk boundaries fall mid-user-history; last-ts state must carry
      events.grouped(25).foreach { chunk =>
        stream.addData(chunk: _*); q.processAllAvailable()
      }
    } finally q.stop()
    val streamedGaps = spark.sql("SELECT user_id, gap_s FROM gap_parity")
    val streamed = graft.pipeline.Temporal.interarrivalFromGaps(streamedGaps)
      .collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("n_gaps"),
        r.getAs[Double]("mean_gap_s"), r.getAs[Double]("p50_gap_s"),
        r.getAs[Double]("p90_gap_s"), r.getAs[Long]("max_gap_s"))).toSet
    val batchIn = events.map { case (id, ts, u, et, v) => (id, u, ts, et, v) }
      .toDF("event_id", "user_id", "ts", "event_type", "value")
    val batch = graft.pipeline.Temporal.interarrival(batchIn).collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("n_gaps"),
        r.getAs[Double]("mean_gap_s"), r.getAs[Double]("p50_gap_s"),
        r.getAs[Double]("p90_gap_s"), r.getAs[Long]("max_gap_s"))).toSet
    assert(batch.exists(_._2 > 10), "fixture exercises deep per-user gap chains")
    assert(streamed === batch,
      s"stream-only: ${streamed -- batch}; batch-only: ${batch -- streamed}")
  }

  test("streaming asof == batch asof: cross-batch state, equal-ts tie rule") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val S = 1000000000L
    // (event_id, ts_ns, user_id, event_type): view state must carry
    // across the chunk boundary; equal-ts views tie-break by max id;
    // a purchase before any view matches -1
    val events = Seq(
      (0L, 1000 * S, 1L, "purchase"),  // no prior view -> -1
      (1L, 1100 * S, 1L, "view"),
      (2L, 1100 * S, 1L, "view"),      // same ts: id 2 must win
      (3L, 1100 * S, 1L, "purchase"),  // equal-ts view eligible -> 2
      // --- chunk boundary falls here ---
      (4L, 1500 * S, 1L, "purchase"),  // matches view 2 across batches
      (5L, 1600 * S, 2L, "view"),
      (6L, 1700 * S, 2L, "purchase")) // matches 5
    val stream = MemoryStream[(Long, Long, Long, String)]
    val df = stream.toDS().toDF("event_id", "ts_ns", "user_id", "event_type")
    val q = StreamingPipeline.asofStream(df, "purchase", "view")
      .writeStream.format("memory").queryName("asof_parity")
      .outputMode("append").start()
    try {
      events.grouped(4).foreach { chunk =>
        stream.addData(chunk: _*); q.processAllAvailable()
      }
    } finally q.stop()
    val got = spark.sql(
      "SELECT event_id, matched_event_id, gap_ns FROM asof_parity")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got === Map(
      0L -> ((-1L, -1L)),
      3L -> ((2L, 0L)),
      4L -> ((2L, 400 * S)),
      6L -> ((5L, 100 * S))))
  }

  test("streaming funnel == batch funnel: greedy step times across chunks, horizon") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val S = 1000000000L
    val steps = Seq("a", "b", "c")
    // user 1 completes in order; user 2's step b precedes its a (never
    // advances); user 3's c falls outside the horizon of its a
    val events = Seq(
      (0L, 1000 * S, 1L, "a"), (1L, 1100 * S, 1L, "b"),
      (2L, 1200 * S, 1L, "c"),
      (3L, 1000 * S, 2L, "b"), (4L, 1100 * S, 2L, "a"),
      (5L, 1000 * S, 3L, "a"), (6L, 1050 * S, 3L, "b"),
      (7L, 9000 * S, 3L, "c")) // > horizon from t0
    val horizon = 500 * S
    val stream = MemoryStream[(Long, Long, Long, String)]
    val df = stream.toDS().toDF("event_id", "ts_ns", "user_id", "event_type")
    val q = StreamingPipeline.funnelStream(df, steps, horizon)
      .writeStream.format("memory").queryName("fun_parity")
      .outputMode("append").start()
    try {
      events.grouped(3).foreach { chunk =>
        stream.addData(chunk: _*); q.processAllAvailable()
      }
    } finally q.stop()
    val got = spark.sql("SELECT user_id, step FROM fun_parity")
      .collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    assert(got === Set((1L, 0), (1L, 1), (1L, 2),
      (2L, 0), (3L, 0), (3L, 1)))
    // per-step distinct-user counts == batch funnel
    val batchIn = events.map { case (id, ts, u, et) => (id, u, ts, et, 0.0) }
      .toDF("event_id", "user_id", "ts", "event_type", "value")
    val batch = graft.pipeline.Temporal.funnel(batchIn, steps, horizon)
      .collect().map(r => r.getAs[Long]("step") -> r.getAs[Long]("n_users")).toMap
    val streamCounts = got.groupBy(_._2).map { case (k, v) => (k + 1L) -> v.size.toLong }
    assert(steps.indices.forall(i =>
      batch(i + 1L) === streamCounts.getOrElse(i + 1L, 0L)))
  }

  test("funnelStream handles a repeated step type == batch funnel") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val S = 1000000000L
    val steps = Seq("view", "click", "view") // view is step 0 AND step 2
    val events = Seq(
      (0L, 1000 * S, 1L, "view"),
      (1L, 1100 * S, 1L, "click"),
      (2L, 1200 * S, 1L, "view"),  // completes step 2
      (3L, 1000 * S, 2L, "view"),
      (4L, 1100 * S, 2L, "view"))  // no click yet: step 2 unreachable
    val stream = MemoryStream[(Long, Long, Long, String)]
    val df = stream.toDS().toDF("event_id", "ts_ns", "user_id", "event_type")
    val q = StreamingPipeline.funnelStream(df, steps, 900 * S)
      .writeStream.format("memory").queryName("fun_dup")
      .outputMode("append").start()
    try { stream.addData(events: _*); q.processAllAvailable() } finally q.stop()
    val got = spark.sql("SELECT user_id, step FROM fun_dup")
      .collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    assert(got === Set((1L, 0), (1L, 1), (1L, 2), (2L, 0)))
    val batchIn = events.map { case (id, ts, u, et) => (id, u, ts, et, 0.0) }
      .toDF("event_id", "user_id", "ts", "event_type", "value")
    val batch = graft.pipeline.Temporal.funnel(batchIn, steps, 900 * S)
      .collect().map(r => r.getAs[Long]("step") -> r.getAs[Long]("n_users")).toMap
    val sc = got.groupBy(_._2).map { case (k, v) => (k + 1L) -> v.size.toLong }
    assert(steps.indices.forall(i => batch(i + 1L) === sc.getOrElse(i + 1L, 0L)))
  }

  test("classifyStream: single-class model emits null margins, does not crash") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val docs = Seq((0L, "alpha beta", "only"), (1L, "gamma", "only"))
      .toDF("doc_id", "text", "source")
    val model = graft.pipeline.Classify.trainNbModel(docs)
    assert(model.classes.size === 1)
    val stream = MemoryStream[(Long, String, String)]
    val df = stream.toDS().toDF("doc_id", "text", "source")
    val q = StreamingPipeline.classifyStream(df, model)
      .writeStream.format("memory").queryName("nb_single")
      .outputMode("append").start()
    try {
      stream.addData((5L, "alpha", "only")); q.processAllAvailable()
    } finally q.stop()
    val rows = spark.sql("SELECT doc_id, pred, margin FROM nb_single").collect()
    assert(rows.length === 1)
    assert(rows(0).getString(1) === "only")
    assert(rows(0).isNullAt(2), "single-class margin must be null, not a crash")
  }

  test("streaming markov pairs == batch window pairs across micro-batch boundaries") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val rnd = new scala.util.Random(23)
    var t = 1700000000000000000L
    val events = (0 until 90).map { i =>
      t += 1000000000L
      (i.toLong, t, 1L + rnd.nextInt(3), s"t${rnd.nextInt(4)}")
    }
    val stream = MemoryStream[(Long, Long, Long, String)]
    val df = stream.toDS().toDF("event_id", "ts_ns", "user_id", "event_type")
    val q = StreamingPipeline.markovStream(df)
      .writeStream.format("memory").queryName("mkv_parity")
      .outputMode("append").start()
    try {
      events.grouped(20).foreach { chunk =>
        stream.addData(chunk: _*); q.processAllAvailable()
      }
    } finally q.stop()
    val streamed = spark.sql(
      "SELECT user_id, from_type, to_type, ts_ns, event_id FROM mkv_parity")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getLong(3), r.getLong(4))).toSet
    // batch twin: lead over (ts, event_id) per user, keyed by the
    // DESTINATION event (the arrival that observed the transition)
    val batchIn = events.map { case (id, ts, u, et) => (id, u, ts, et) }
      .toDF("event_id", "user_id", "ts", "event_type")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy("ts", "event_id")
    val batch = batchIn
      .withColumn("from_type", lag(col("event_type"), 1).over(w))
      .where(col("from_type").isNotNull)
      .select(col("user_id"), col("from_type"), col("event_type"),
        col("ts"), col("event_id"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getLong(3), r.getLong(4))).toSet
    assert(batch.size > 50)
    assert(streamed === batch)
  }

  test("streaming sessionize == batch sessionize on a chunk-fed in-order fixture") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val base = 1700000000000L
    val rnd = new scala.util.Random(7)
    var t = base
    // in-order event stream over 4 users; inter-event steps up to 400 s,
    // so per-user gaps routinely cross the 600 s session boundary
    val events = (0 until 150).map { i =>
      t += rnd.nextInt(400000)
      (i.toLong, new java.sql.Timestamp(t), 1L + rnd.nextInt(4), "e",
        rnd.nextInt(100) / 4.0)
    }
    val stream = MemoryStream[(Long, java.sql.Timestamp, Long, String, Double)]
    val df = stream.toDS().toDF("event_id", "ts", "user_id", "event_type", "value")
    val q = StreamingPipeline.sessionize(df, gapSeconds = 600, watermark = "10 minutes")
      .writeStream.format("memory").queryName("sess_parity")
      .outputMode("append").start()
    try {
      // feed in 5 chunks — micro-batch boundaries fall mid-session
      events.grouped(30).foreach { chunk =>
        stream.addData(chunk: _*); q.processAllAvailable()
      }
      // sentinel user advances the watermark past every real timeout,
      // then one more batch lets the timeouts fire
      stream.addData((900L, new java.sql.Timestamp(t + 86400000L), 999L, "e", 0.0))
      q.processAllAvailable()
      stream.addData((901L, new java.sql.Timestamp(t + 86500000L), 999L, "e", 0.0))
      q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.sql(
      "SELECT user_id, session_start, session_end, events, total_value FROM sess_parity")
      .where(col("user_id") =!= 999L).collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).getTime, r.getTimestamp(2).getTime,
        r.getLong(3), math.rint(r.getDouble(4) * 1e6) / 1e6)).toSet

    val batchIn = events.map { case (id, ts, u, et, v) =>
      (id, u, ts.getTime * 1000000L, et, v) }
      .toDF("event_id", "user_id", "ts", "event_type", "value")
    val batch = graft.pipeline.Temporal.sessionize(batchIn, gapNs = 600L * 1000000000L)
      .collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("session_start") / 1000000L,
        r.getAs[Long]("session_end") / 1000000L, r.getAs[Long]("n_events"),
        r.getAs[Double]("sum_value"))).toSet
    assert(batch.nonEmpty && batch.exists(_._4 > 1))
    assert(streamed === batch,
      s"stream-only: ${streamed -- batch}; batch-only: ${batch -- streamed}")
  }

  test("streaming clean+dedup drops low-quality docs and duplicates") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val stream = MemoryStream[(Long, String)]
    val df = stream.toDS().toDF("doc_id", "text")
    val cleaned = StreamingPipeline.cleanDocuments(df, minQuality = 0.5)
    val query = cleaned.select("doc_id", "text", "fingerprint")
      .writeStream.format("memory").queryName("cleaned_docs")
      .outputMode("append").start()
    try {
      stream.addData(
        (1L, "the quick brown fox jumps over the lazy dog near the river bank"),
        (2L, "the quick brown fox jumps over the lazy dog near the river bank"), // dup
        (3L, "!!! ??? !!!"), // punctuation garbage
        (4L, "a a a a a a a a a a a a a a")) // repetition
      query.processAllAvailable()
      stream.addData(
        (5L, "THE  quick brown fox jumps over the lazy dog near the river bank"), // dup modulo case/ws
        (6L, "completely different sentence with many ordinary interesting words inside"))
      query.processAllAvailable()
    } finally query.stop()
    val got = spark.sql("SELECT doc_id FROM cleaned_docs").collect().map(_.getLong(0)).sorted
    assert(got.toSeq == Seq(1L, 6L), s"expected docs 1 and 6, got ${got.mkString(",")}")
  }

  test("streaming composed curation: clean -> hash sample -> token counts in one stream") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val stream = MemoryStream[(Long, String)]
    val df = stream.toDS().toDF("doc_id", "text")
    // every stage is a narrow transform, so the whole curation chain runs
    // unchanged inside one streaming query (no extra state beyond dedup's)
    val curated = graft.pipeline.TextAnalysis.tokenCounts(
      graft.pipeline.Sampling.sampleHash(
        StreamingPipeline.cleanDocuments(df, minQuality = 0.5),
        "doc_id", rate = 1.0))
    val query = curated.select("doc_id", "ws_tokens")
      .writeStream.format("memory").queryName("curated_docs")
      .outputMode("append").start()
    try {
      stream.addData(
        (1L, "the quick brown fox jumps over the lazy dog near the river bank"),
        (2L, "the quick brown fox jumps over the lazy dog near the river bank"), // dup
        (3L, "!!! ??? !!!")) // garbage
      query.processAllAvailable()
    } finally query.stop()
    val got = spark.sql("SELECT doc_id, ws_tokens FROM curated_docs").collect()
      .map(r => (r.getLong(0), r.getInt(1))).toMap
    assert(got.keySet === Set(1L))
    assert(got(1L) === 13)
    // batch equivalence: the same chain over the same rows as a static DF
    val static = graft.pipeline.TextAnalysis.tokenCounts(
      graft.pipeline.Sampling.sampleHash(
        graft.pipeline.TextAnalysis.qualityScore(
          Seq((1L, "the quick brown fox jumps over the lazy dog near the river bank"))
            .toDF("doc_id", "text")).filter(col("quality") >= 0.5),
        "doc_id", rate = 1.0))
      .select("doc_id", "ws_tokens").collect()
      .map(r => (r.getLong(0), r.getInt(1))).toMap
    assert(static === got)
  }

  test("streaming minhash near-dup claims match batch LSH candidates") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    def ts(min: Int) = new java.sql.Timestamp(1700000000000L + min * 60000L)
    val base = "the quick brown fox jumps over the lazy dog near the river bank today"
    // differs in the last token only: shares 2 of 4 band keys with `base`
    // (verified against the md5 minhash math — deterministic, not a
    // probabilistic recall roll)
    val nearDup = "the quick brown fox jumps over the lazy dog near the river bank soon"
    val unrelated = "completely different text about spark structured streaming state stores"

    val stream = MemoryStream[(Long, java.sql.Timestamp, String)]
    val claims = StreamingPipeline.nearDupStream(
      stream.toDS().toDF("doc_id", "ts", "text"),
      numHashes = 12, bands = 4, watermark = "10 minutes")
    val query = claims.writeStream.format("memory").queryName("dup_claims")
      .outputMode("append").start()
    try {
      stream.addData((1L, ts(0), base), (4L, ts(1), unrelated))
      query.processAllAvailable()
      // same batch: identical doc claims against the in-batch earlier doc
      stream.addData((7L, ts(2), base), (9L, ts(3), base))
      query.processAllAvailable()
      // later batch: near-identical doc claims against the ORIGINAL claimer
      stream.addData((12L, ts(4), nearDup))
      query.processAllAvailable()
    } finally query.stop()

    val got = spark.sql("SELECT doc_id, dup_of FROM dup_claims").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // identical docs claim 1 on every band; near-dup claims 1 on >= 1 band
    assert(got.contains((7L, 1L)), s"got $got")
    assert(got.contains((9L, 1L)), s"got $got")
    assert(got.contains((12L, 1L)), s"got $got")
    // the unrelated doc never appears on either side of a claim
    assert(!got.exists(p => p._1 == 4L || p._2 == 4L), s"got $got")

    // batch agreement: every streamed claim pair is a batch-LSH candidate
    // pair under the SAME banding (threshold 0 = candidates)
    val corpus = Seq((1L, base), (4L, unrelated), (7L, base), (9L, base),
      (12L, nearDup)).toDF("doc_id", "text")
    val batchPairs = graft.pipeline.Dedup.minhashLsh(corpus,
      numHashes = 12, bands = 4, threshold = 0.0)
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    got.foreach { case (d, of) =>
      val p = (math.min(d, of), math.max(d, of))
      assert(batchPairs.contains(p), s"stream claim $p not a batch candidate")
    }
  }

  test("minhashIndexStream == batch minhashIndex rows across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val texts = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "completely different text about structured streaming state"),
      (3L, "the quick brown fox jumps over the lazy cat"),
      (4L, "x")) // shingle-less: must emit nothing, like the batch index
    val stream = MemoryStream[(Long, String)]
    val q = StreamingPipeline.minhashIndexStream(
        stream.toDS().toDF("doc_id", "text"),
        shingleSize = 3, numHashes = 8, bands = 4)
      .writeStream.format("memory").queryName("mh_idx_delta")
      .outputMode("append").start()
    try {
      stream.addData(texts.take(2): _*); q.processAllAvailable()
      stream.addData(texts.drop(2): _*); q.processAllAvailable()
    } finally q.stop()
    val got = spark.sql("SELECT id, sig, band, bucket FROM mh_idx_delta")
      .collect()
      .map(r => (r.getLong(0), r.getSeq[String](1), r.getInt(2), r.getString(3)))
      .toSet
    val batch = graft.pipeline.Dedup.minhashIndex(
        texts.toDF("doc_id", "text"),
        shingleSize = 3, numHashes = 8, bands = 4)
      .collect()
      .map(r => (r.getLong(0), r.getSeq[String](1), r.getInt(2), r.getString(3)))
      .toSet
    assert(got === batch, "streamed index delta must equal the batch index")
    assert(!got.exists(_._1 == 4L), "shingle-less docs emit no index rows")
  }

  test("streaming embedding near-dup claims match batch hyperplane buckets") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    def ts(min: Int) = new java.sql.Timestamp(1700000000000L + min * 60000L)
    val dim = 8
    def vec(seed: Int): Array[Float] =
      Array.tabulate(dim)(i => math.sin(seed * 31 + i * 1.7).toFloat)
    val base = vec(1)
    val scaled = base.map(_ * 2.0f) // same hyperplane signs exactly
    val other = vec(9)

    val stream = MemoryStream[(Long, java.sql.Timestamp, Array[Float])]
    val claims = StreamingPipeline.embeddingNearDupStream(
      stream.toDS().toDF("vec_id", "ts", "embedding"), dim = dim,
      planes = 6, tables = 2, watermark = "10 minutes")
    val query = claims.writeStream.format("memory").queryName("emb_claims")
      .outputMode("append").start()
    try {
      stream.addData((1L, ts(0), base), (4L, ts(1), other))
      query.processAllAvailable()
      stream.addData((7L, ts(2), scaled)) // later batch: claims against 1
      query.processAllAvailable()
    } finally query.stop()

    val got = spark.sql("SELECT doc_id, dup_of FROM emb_claims").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // the x2-scaled copy shares EVERY (table, bucket) with its original
    // (power-of-two scaling preserves all sign bits), so it must claim 1
    assert(got.contains((7L, 1L)), s"got $got")

    // batch agreement: every streamed claim shares a batch (table, bucket)
    val corpus = Seq((1L, base), (4L, other), (7L, scaled))
      .toDF("vec_id", "embedding")
    val sig = graft.pipeline.Ann.hyperplaneSignatures(corpus, "vec_id",
      "embedding", planes = 6, seed = 42, tables = 2)
    val batchPairs = sig.as("a").join(sig.as("b"),
        col("a.table") === col("b.table") && col("a.bucket") === col("b.bucket") &&
        col("a.id") < col("b.id"))
      .select(col("a.id"), col("b.id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    got.foreach { case (d, of) =>
      val p = (math.min(d, of), math.max(d, of))
      assert(batchPairs.contains(p), s"stream claim $p not a batch bucket pair")
    }
  }

  test("classifyStream == batch naiveBayes predictions (stateless fold == grouped sum)") {
    import spark.implicits._
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val model = graft.pipeline.Classify.trainNbModel(docs)
    // the scoring stage is stateless, so running it on the batch frame
    // IS the per-row stream semantics (same plan the memory-sink replay
    // executes micro-batch by micro-batch)
    val stream = StreamingPipeline.classifyStream(docs, model)
      .collect().map(r => r.getLong(0) -> ((r.getString(2), r.getDouble(3)))).toMap
    // the RELATIONAL reference form — production naiveBayes now serves
    // through classifyStream itself (r14), so the pin compares the two
    // genuinely distinct computations
    val batch = graft.pipeline.Classify.naiveBayesRelational(docs)
      .collect().map(r => r.getLong(0) -> ((r.getString(2), r.getDouble(3)))).toMap
    assert(stream.keySet === batch.keySet)
    stream.foreach { case (id, (pred, margin)) =>
      assert(batch(id)._1 === pred, s"doc $id pred drifted")
      assert(math.abs(batch(id)._2 - margin) <= 0.001, s"doc $id margin drifted")
    }
  }
}
