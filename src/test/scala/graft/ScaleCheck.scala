package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators._
import graft.sources.Corpus

/** Scaling-linearity harness: replicates the sf0.1 documents corpus
  * 1× / 4× / 16× (ids offset per replica; a per-replica token appended
  * to the text so exact/near-dup structure does NOT grow with the
  * replication factor) and measures per-row wall time of the heavy
  * operator families. Near-constant rows/sec across factors is the
  * local[32] proxy for "the plan has no accumulation point" — no
  * single-task window, no driver loop, no all-pairs blowup — which is
  * what survives the jump to a real cluster. Run:
  * `sbt "Test/runMain graft.ScaleCheck"`; measured numbers live in
  * PLANS.md §10.
  */
object ScaleCheck {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      // shuffle files are only deleted when the driver GCs their RDD
      // references (ContextCleaner); with a large heap the JVM never
      // GCs on its own and a 256×-replication sweep fills the local
      // disk with dead shuffle from earlier blocks (observed: 79 GB
      // exhausted in the r=256 block). Default periodicGC is 30min.
      .config("spark.cleaner.periodicGC.interval", "1min")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val base = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    base.count() // warm scan machinery
    val embBase = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")

    def time[A](f: => A): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    // lazily-evaluated, name-filterable measurement row
    var only: Option[Seq[String]] = None
    def entry(name: String)(f: => Any): Option[(String, Double)] =
      if (only.forall(_.exists(name.contains))) Some(name -> time(f)) else None

    // `sbt "Test/runMain graft.ScaleCheck bpe-only"` runs just the BPE
    // merge-count scaling block (the replication suite is ~15 min)
    val bpeOnly = args.contains("bpe-only")
    // `only=<substr>[,<substr>...]` runs just the matching replication
    // rows — the fast loop when re-measuring a family subset's fixtures
    only = args.collectFirst { case a if a.startsWith("only=") =>
      a.stripPrefix("only=").split(',').toSeq }
    // `reps=16,64,256` overrides the replication ladder — the 64×–256×
    // certification runs (1.28M docs / 25.6M events at 256×) pair this
    // with only= so one sweep measures the headline families, not the
    // whole 60-entry suite; bump SPARK_DRIVER_MEM for 256×
    val reps = args.collectFirst { case a if a.startsWith("reps=") =>
      a.stripPrefix("reps=").split(',').toSeq.map(_.trim.toInt) }
      .getOrElse(Seq(1, 4, 16))
    for (r <- reps if !bpeOnly) {
      val docsR = (0 until r).map { i =>
        base
          .withColumn("doc_id", col("doc_id") + lit(i.toLong * 10000000L))
          .withColumn("text", concat(col("text"), lit(s" rep$i")))
      }.reduce(_ unionAll _)
        .repartition(32)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val n = docsR.count()

      // replicated embeddings: ids offset per replica, vectors perturbed by
      // a deterministic per-(replica, position) cosine ripple so
      // cross-replica cosines fall well below dedup thresholds — identical
      // replicas would make semantic-dedup pair OUTPUT grow quadratically
      // by construction (fixture, not plan; same reasoning as simhash)
      val embR = (0 until r).map { i =>
        embBase.select(
          (col("vec_id") + lit(i.toLong * 10000000L)).as("vec_id"),
          transform(col("embedding"), (x, j) =>
            (x + lit(0.71f * i) *
              cos(j.cast("double") * lit(1.7) + lit(i.toDouble)).cast("float"))
              .cast("float")).as("embedding"))
      }.reduce(_ unionAll _)
        .repartition(32)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val nEmb = embR.count()

      // replicated events: user_id + event_id offset per replica, so each
      // replica adds fresh users (sessions/funnels/cohorts grow linearly,
      // never merge across replicas); timestamps stay — denser windows
      val evBase = graft.pipeline.Temporal.readEvents(spark, "/root/testdata/sf0.1")
      val evR = (0 until r).map { i =>
        evBase
          .withColumn("user_id", col("user_id") + lit(i.toLong * 10000000L))
          .withColumn("event_id", col("event_id") + lit(i.toLong * 100000000L))
      }.reduce(_ unionAll _)
        .repartition(32)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      evR.count()

      val results = Seq(
        entry("text_quality (columnar)") {
          graft.pipeline.TextAnalysis.qualityScore(docsR).count()
        },
        entry("dedup_exact (hash groupBy)") {
          graft.pipeline.Dedup.exact(docsR).count()
        },
        entry("dedup_minhash (banded LSH)") {
          // decorrelated replicas (the containment/simhash reasoning):
          // raw replication differs only by a trailing rep$i token, so
          // replica copies share ~98% of shingles and every doc
          // near-dup-pairs with ALL r−1 replicas — r² pair OUTPUT by
          // data construction (the 256× run's disk blowout), measuring
          // the fixture, not the plan. Per-replica token suffixes keep
          // within-replica natural dups (pairs ∝ r) and nothing else.
          val decorrelated = docsR.withColumn("text",
            regexp_replace(col("text"), lit("(\\S+)"),
              concat(lit("$1r"),
                (col("doc_id") / 10000000L).cast("long").cast("string"))))
          graft.pipeline.Dedup.minhashLsh(decorrelated, shingleSize = 3,
            numHashes = 8, bands = 4, threshold = 0.25).count()
        },
        entry("dedup_incremental_minhash (index resolve)") {
          // decorrelated replicas (the containment reasoning): the index
          // is the even-id half, the batch the odd-id half — corpus and
          // batch both grow with r, pairs stay bucket-bounded
          val decorrelated = docsR.withColumn("text",
            regexp_replace(col("text"), lit("(\\S+)"),
              concat(lit("$1r"),
                (col("doc_id") / 10000000L).cast("long").cast("string"))))
          val idx = graft.pipeline.Dedup.minhashIndex(
            decorrelated.where(pmod(col("doc_id"), lit(2)) === 0),
            shingleSize = 3, numHashes = 8, bands = 4)
          graft.pipeline.Dedup.incrementalMinhash(idx,
            decorrelated.where(pmod(col("doc_id"), lit(2)) === 1),
            shingleSize = 3, numHashes = 8, bands = 4,
            threshold = 0.25).count()
        },
        entry("events_dedup (exactly-once agg)") {
          graft.pipeline.Temporal.dedupEvents(evR.unionByName(evR)).count()
        },
        entry("sample_token_budget (keyed prefix)") {
          val kept = graft.pipeline.Sampling.tokenBudget(
            docsR.select(col("doc_id"), col("source"),
              size(split(trim(lower(col("text"))), "\\s+")).cast("long")
                .as("n_tokens")),
            "source", "n_tokens",
            (0 until 20).map(i => s"src$i" -> 600L).toMap)
          kept.count()
          graft.pipeline.Sampling.unpersistPacked(kept)
        },
        entry("ml_logreg (3-iter GD)") {
          graft.pipeline.Regression.logisticGd(
            docsR.select(
              when(col("source") === "src0", 1.0).otherwise(0.0).as("y"),
              size(split(trim(lower(col("text"))), "\\s+")).cast("double").as("x1"),
              length(col("text")).cast("double").as("x2")),
            "y", Seq("x1", "x2"), iters = 3, lr = 1e-5).count()
        },
        // routed knn graph: cells scale with the corpus (16·r) so the
        // per-cell candidate count stays FLAT — the knob the 100 TB
        // deployment turns; fixed cells would be n²/16 by construction.
        // iters=3 Lloyd (the production codebook): iters=0's random-pick
        // Voronoi cells are SKEWED, and hot cells inflate the candidate
        // join superlinearly (measured 9010 -> 3453 rows/s at 16x;
        // balanced cells are part of the plan, not a tuning nicety)
        entry("graph_knn_routed (IVF-PQ cell join)") {
          // trainDistributed: with cells ∝ corpus, a FIXED driver
          // sample leaves ~10 points per centroid and assignment skews
          // (hot cells made the candidate join superlinear — measured
          // 5396 -> 1513 rows/s, 16x -> 64x); full-corpus Lloyd keeps
          // cells balanced at one native-expression pass per iteration
          graft.pipeline.Ann.knnGraphRouted(embR, k = 3,
            numCentroids = 16 * r, nprobe = 4, m = 4, pqCentroids = 16,
            iters = 3, refine = 4, trainDistributed = true,
            hierarchicalRouting = true).count()
        },
        entry("graph_knn_routed_tree (2-level IMI router)") {
          // the log-depth rung (PLANS §22b): same build as
          // graph_knn_routed but routed through the grandparent tree
          // (TreeProbes) — assignment cost per vector ~c^(1/4)·dim·const
          // instead of √c·dim, the shape for cells past ~10M
          // vectors/executor where even the parent scan dominates
          graft.pipeline.Ann.knnGraphRouted(embR, k = 3,
            numCentroids = 16 * r, nprobe = 4, m = 4, pqCentroids = 16,
            iters = 3, refine = 4, trainDistributed = true,
            hierarchicalRouting = true, routerLevels = 2).count()
        },
        entry("pack_sequences (prefix sum)") {
          val packed = graft.pipeline.Sampling.packSequences(
            graft.pipeline.TextAnalysis.tokenCounts(docsR)
              .select(col("doc_id"), col("ws_tokens")), "ws_tokens", 512L)
          packed.count()
          graft.pipeline.Sampling.unpersistPacked(packed)
        },
        entry("pack_bestfit (per-group greedy)") {
          graft.pipeline.Sampling.packBestFit(
            graft.pipeline.TextAnalysis.tokenCounts(docsR)
              .select(col("doc_id"), col("ws_tokens")), "ws_tokens", 512L).count()
        },
        entry("text_decontaminate (bcast pool)") {
          // bench fixture shape: eval set = a slice of the corpus
          graft.pipeline.Dedup.decontaminate(
            docsR.filter(col("doc_id") % 10000000L >= 50),
            docsR.filter(col("doc_id") % 10000000L < 50), n = 5).count()
        },
        entry("text_boilerplate (+scrub)") {
          val bl = graft.pipeline.Dedup.boilerplateNgrams(docsR, n = 3, minDocs = 5)
          graft.pipeline.Dedup.boilerplateScrub(docsR, bl, n = 3).count()
        },
        entry("dedup_simhash_pairs (pigeonhole)") {
          // the shared one-token replica mutation leaves replicas
          // Hamming-NEAR, so cross-replica pair OUTPUT would grow
          // quadratically by data construction — measuring the fixture,
          // not the operator (same reasoning as dedup_clusters below).
          // A 16-token replica-salted tail flips enough fingerprint bits
          // to decorrelate replicas while keeping within-replica
          // unrelated docs far apart.
          val decorrelated = docsR.withColumn("text",
            concat(col("text"), lit(" "), concat_ws(" ",
              (0 until 16).map(j => concat(lit("r"),
                (col("doc_id") / 10000000L).cast("long").cast("string"),
                lit("x" + j))): _*)))
          graft.pipeline.Dedup.simhashPairs(decorrelated, maxHamming = 3).count()
        },
        entry("dedup_clusters (pointer jump)") {
          // synthetic 64-node chain segments, edges ∝ corpus rows:
          // replica minhash pairs would grow quadratically BY DATA
          // CONSTRUCTION (every doc pairs with its replicas), which
          // would measure the fixture, not the operator; fixed-depth
          // segments isolate the label-propagation rounds themselves
          val pairs = spark.range(n)
            .filter(col("id") % 64 =!= 63)
            .select(col("id").as("id_a"), (col("id") + 1).as("id_b"))
          graft.pipeline.Dedup.duplicateClusters(pairs).count()
        },
        entry("bpe_train 8 rounds (vocab argmax)") {
          // corpus-proportional work = the word-count shuffle; rounds run
          // on the Zipf-bounded vocab table (grows ~r via rep/salt tokens)
          graft.pipeline.Bpe.train(docsR, numMerges = 8).count()
        },
        entry("dedup_semantic (cells ∝ corpus)") {
          // SemDeDup's scaling contract: cell count grows with the corpus
          // so per-cell candidate sets stay bounded — numCells = 16r here
          graft.pipeline.Dedup.semanticDedup(embR, numCells = 16 * r,
            threshold = 0.9, iters = 1).count()
        },
        entry("ann_pq (ADC code scan)") {
          graft.pipeline.Ann.pqTopK(embR,
            embBase.filter(col("vec_id") < 5), k = 10,
            m = 4, numCentroids = 16, iters = 1).count()
        },
        entry("text_tfidf (tf/df + vocab join)") {
          graft.pipeline.TextAnalysis.tfidfTerms(docsR, topK = 5).count()
        },
        entry("text_lm_perplexity (bigram LM)") {
          graft.pipeline.TextAnalysis.lmPerplexity(docsR).count()
        },
        entry("events_sessionize (user window)") {
          graft.pipeline.Temporal.sessionize(evR).count()
        },
        entry("events_asof (union trick)") {
          graft.pipeline.Temporal.asofJoin(
            evR.where(col("event_type") === "purchase")
              .select("event_id", "user_id", "ts"),
            evR.where(col("event_type") === "view")
              .select("user_id", "ts", "event_id"),
            "user_id", "ts", "event_id", Seq("event_id", "ts")).count()
        },
        entry("events_retention (cohorts)") {
          graft.pipeline.Temporal.retention(evR).count()
        },
        entry("events_funnel (per-user fold)") {
          graft.pipeline.Temporal.funnel(evR,
            Seq("view", "click", "purchase"),
            horizonNs = 60L * graft.pipeline.Temporal.NsPerMinute).count()
        },
        entry("events_topk (WindowGroupLimit)") {
          // 5 event types total — a naive per-type window would funnel the
          // whole log through 5 tasks; WindowGroupLimit's per-map-partition
          // top-k pre-truncation is what this row proves out
          graft.pipeline.Temporal.topUsers(evR, k = 5).count()
        },
        entry("text_bm25 (bcast query side)") {
          import spark.implicits._
          val queries = Seq((1L, "hash join merge"),
            (2L, "window agg sort stream"),
            (3L, "fast scan filter column table")).toDF("query_id", "query_text")
          graft.pipeline.TextAnalysis.bm25Search(docsR, queries).count()
        },
        entry("classify_nb (NB train+predict)") {
          graft.pipeline.Classify.naiveBayes(docsR).count()
        },
        entry("text_chunk (narrow slide-window)") {
          graft.pipeline.TextAnalysis.chunkDocuments(docsR).count()
        },
        entry("graph_triangles (deg-oriented)") {
          // replica tokens (rep$i) keep cross-replica cooc edges from
          // merging, so the graph grows linearly in r
          val corpus = graft.sources.Corpus.fromDocumentsTablePositional(docsR)
          val sym = graft.operators.Cooc.symmetrize(
            graft.operators.Cooc.gather(corpus, windowWidth = 3))
          graft.pipeline.Graph.triangles(sym.select(
            col("token_a").as("src"), col("token_b").as("dst"))).count()
        },
        entry("embed_kmeans (dataflow Lloyd)") {
          graft.pipeline.Ann.kmeansReport(embR, k = 8, iters = 2).count()
        },
        entry("embed_pca (Gram + power iter)") {
          graft.pipeline.Pca.topComponent(embR, iters = 5).count()
        },
        entry("dedup_containment (inv. index)") {
          // replica shingle spaces must be DISJOINT (suffix every token
          // with its replica id): the shared one-token-tail replication
          // leaves replicas shingle-identical, so cross-replica pair
          // OUTPUT grows r² by data construction — the simhash/clusters
          // fixture reasoning. maxDocFreq stays an absolute cap over the
          // now-decorrelated shingles (per-replica df is r-independent).
          val decorrelated = docsR.withColumn("text",
            regexp_replace(col("text"), lit("(\\S+)"),
              concat(lit("$1r"),
                (col("doc_id") / 10000000L).cast("long").cast("string"))))
          graft.pipeline.Dedup.containment(decorrelated, shingleSize = 3,
            threshold = 0.5, maxDocFreq = 100L).count()
        },
        entry("events_cumulative (running agg)") {
          graft.pipeline.Temporal.cumulative(evR).count()
        },
        entry("events_markov (transition matrix)") {
          graft.pipeline.Temporal.markovTransitions(evR).count()
        },
        entry("events_interarrival (lag + shared-Exchange agg)") {
          graft.pipeline.Temporal.interarrival(evR).count()
        },
        entry("layout_zorder (key + range write order)") {
          // the key projection + the range shuffle the write path pays
          graft.sources.ZOrder.zorderKey(evR, "user_id", "ts", bits = 8)
            .repartitionByRange(32, col("zkey"))
            .sortWithinPartitions(col("zkey")).count()
        },
        entry("report_profile (single-pass profiler)") {
          graft.pipeline.Diagnostics.profile(docsR).count()
        },
        entry("wordpiece_encode (greedy HOF walk)") {
          // fixed 60-piece vocab: measures the per-corpus half (word
          // count shuffle + vocab-bounded greedy), the serving shape
          val vocab = (('a' to 'z').map(_.toString) ++
            ('a' to 'z').map(c => s"##$c") ++
            Seq("the", "##he", "##er", "##ing", "an", "##nd", "re", "##es"))
          graft.pipeline.WordPiece.encodeCounts(docsR, vocab).count()
        },
        entry("text_line_dedup (first-occurrence)") {
          // single-line docs: the line table == the doc table; the
          // first-occurrence groupBy and decision join still carry
          // corpus-proportional rows, which is what's measured
          graft.pipeline.Dedup.lineDedup(docsR).count()
        },
        entry("text_winnowing (per-row windows)") {
          graft.pipeline.TextAnalysis.winnowing(docsR).count()
        },
        entry("dedup_winnow_pairs (fp join)") {
          // token-suffixed per replica (the containment reasoning):
          // replicas differ by one trailing token, so raw replication
          // leaves the long shared runs fingerprint-identical and pair
          // OUTPUT would grow r² by data construction
          val decorrelated = docsR.withColumn("text",
            regexp_replace(col("text"), lit("(\\S+)"),
              concat(lit("$1r"),
                (col("doc_id") / 10000000L).cast("long").cast("string"))))
          graft.pipeline.Dedup.winnowingPairs(decorrelated,
            minShared = 2, maxDocFreq = 100).count()
        },
        entry("embed_quantize (SQ stats+codes)") {
          graft.pipeline.Ann.scalarQuantize(embR).count()
        },
        entry("dedup_substring (span coalesce)") {
          // replica-decorrelated grams (the containment/winnow fixture
          // reasoning): raw replication leaves replicas gram-identical
          // and span-pair OUTPUT grows r² by data construction
          val decorrelated = docsR.withColumn("text",
            regexp_replace(col("text"), lit("(\\S+)"),
              concat(lit("$1r"),
                (col("doc_id") / 10000000L).cast("long").cast("string"))))
          graft.pipeline.Dedup.duplicatedSpans(decorrelated, k = 4,
            minSpanTokens = 6, maxDocFreq = 8).count()
        },
        entry("dedup_substring_scrub (interval-array join)") {
          // same decorrelated fixture as the detection row; the scrub
          // adds the per-doc interval-array join + one-token-pass
          // coverage, which must stay corpus-proportional
          val decorrelated = docsR.withColumn("text",
            regexp_replace(col("text"), lit("(\\S+)"),
              concat(lit("$1r"),
                (col("doc_id") / 10000000L).cast("long").cast("string"))))
          graft.pipeline.Dedup.duplicatedSpanScrub(decorrelated, k = 4,
            minSpanTokens = 6, maxDocFreq = 8).count()
        },
        entry("text_lm_trigram (held-out backoff)") {
          graft.pipeline.TextAnalysis.lmPerplexityTrigram(docsR).count()
        },
        entry("embed_silhouette (centroid pass)") {
          graft.pipeline.Ann.silhouetteReport(embR, k = 8, iters = 1).count()
        },
        entry("ml_auc (distinct-score window)") {
          graft.pipeline.Regression.auc(
            docsR.select(
              when(col("source") === "src0", 1L).otherwise(0L).as("y"),
              col("n_chars").cast("long").as("n_chars"),
              size(split(trim(lower(col("text"))), "\\s+")).cast("long")
                .as("n_tokens")),
            "y", Seq("n_chars", "n_tokens")).count()
        },
        entry("unigram_train (hard-EM Viterbi)") {
          // corpus-proportional work = the one word-count shuffle; EM
          // rounds run on the Zipf-bounded word table (grows ~r via the
          // rep$i replica tokens)
          graft.pipeline.Unigram.train(docsR, seedSize = 100, rounds = 2,
            maxWordLen = 12, maxPieceLen = 4, reportK = 20).count()
        },
        entry("report_skew (count + top-k)") {
          graft.pipeline.Diagnostics.keySkew(docsR, "source", topK = 10)
            .count()
        },
        entry("graph_label_prop (4 sync rounds)") {
          // synthetic 64-node chain segments, edges ∝ corpus rows (the
          // dedup_clusters fixture): isolates the per-round shuffles
          val edges = spark.range(n)
            .filter(col("id") % 64 =!= 63)
            .select(col("id").as("src"), (col("id") + 1).as("dst"))
          graft.pipeline.Graph.labelPropagation(edges, rounds = 4).count()
        },
        entry("sample_shard (per-shard windows)") {
          graft.pipeline.Sampling.shardShuffle(docsR, "doc_id", 64).count()
        },
        entry("corpus_diff (hash full-outer)") {
          graft.pipeline.Snapshot.diff(docsR,
            docsR.withColumn("text",
              when(col("doc_id") % 10 === 1, concat(col("text"), lit(" e")))
                .otherwise(col("text")))).count()
        },
        entry("graph_bfs (frontier rounds)") {
          // fixed-degree chain segments ∝ corpus rows with one seed per
          // segment (the dedup_clusters fixture reasoning: a knn graph
          // over replicated embeddings would change shape with r);
          // frontier work stays ∝ segment count per hop
          val pairs = spark.range(n)
            .filter(col("id") % 64 =!= 63)
            .select(col("id").as("src"), (col("id") + 1).as("dst"))
          val seeds = spark.range(n).filter(col("id") % 64 === 0)
            .select(col("id").as("vertex"))
          graft.pipeline.Graph.bfsDistances(pairs, seeds, maxHops = 4).count()
        },
        entry("multimodal_phash (decode + band pairs)") {
          // md5 payloads keyed by the replica-offset doc_id, so replica
          // rasters are independent — pair output stays bucket-bounded
          val hexs = concat((0 to 11).map(i =>
            md5(concat(lit(s"phash$i"), col("doc_id").cast("string")))): _*)
          val media = docsR.select(col("doc_id").cast("long").as("media_id"),
            concat(encode(lit("P6\n8 8\n255\n"), "UTF-8"), unhex(hexs))
              .as("payload"))
          graft.pipeline.Multimodal.phashPairs(
            graft.pipeline.Multimodal.imagePhash(media), maxHamming = 4).count()
        },
        entry("graph_hits (bipartite L1 iters)") {
          // rep$i tokens keep replica vocabularies overlapping but doc
          // sets disjoint: edges ∝ corpus rows, 5 L1 iterations
          val edges = docsR.filter(trim(col("text")) =!= "")
            .select(col("doc_id").cast("string").as("src"),
              explode(graft.pipeline.TextAnalysis.tokensCol(col("text")))
                .as("dst"))
            .groupBy(col("src"), col("dst")).agg(count(lit(1)).as("weight"))
          graft.pipeline.Graph.hits(edges, iters = 5).count()
        },
        entry("sample_importance (two-LM ratio)") {
          graft.pipeline.Sampling.importanceSample(docsR,
            col("lang") === "en", topK = 100).count()
        },
        entry("text_collocation (PMI top-k)") {
          graft.pipeline.TextAnalysis.collocations(docsR).count()
        },
        entry("ml_knn (bcast train scan)") {
          // train side FIXED (the curated-seed contract); the query
          // corpus grows with r — one corpus-linear scan + bounded top-k
          graft.pipeline.Ann.knnClassify(
            embBase.filter(col("vec_id") < 500),
            embR.withColumn("label",
              pmod(col("vec_id"), lit(8)).cast("long")), k = 5).count()
        },
        entry("embed_mmr (k greedy passes)") {
          val qv = embBase.filter(col("vec_id") === 0)
            .select(col("embedding")).head().getSeq[Float](0).toArray
          graft.pipeline.Ann.mmrSelect(embR.filter(col("vec_id") =!= 0),
            qv, k = 8).count()
        },
        entry("embed_source_sim (centroid pass)") {
          // groups = replicas (grow with r); points ∝ corpus rows
          graft.pipeline.Ann.groupCentroidSim(
            embR.withColumn("g", (col("vec_id") / 10000000L).cast("long")),
            "g").count()
        },
        entry("text_gopher_rules (narrow rule battery)") {
          graft.pipeline.TextAnalysis.gopherRules(docsR).count()
        },
        entry("ml_abtest (per-user agg + pivot)") {
          graft.pipeline.Regression.abTest(
            evR.withColumnRenamed("value", "v"), "user_id",
            col("event_type") === "purchase" && col("v") > 99.0).count()
        },
        entry("graph_modularity (per-community audit)") {
          // chain-segment communities over the dedup_clusters fixture:
          // edges and communities both ∝ corpus rows
          val und = spark.range(n).filter(col("id") % 64 =!= 63)
            .select(col("id").as("src"), (col("id") + 1).as("dst"))
          val sym = und.unionByName(
              und.select(col("dst").as("src"), col("src").as("dst")))
            .withColumn("weight", lit(1L))
          val comm = spark.range(n)
            .select(col("id").as("vertex"),
              (col("id") - pmod(col("id"), lit(64))).as("community"))
          graft.pipeline.Graph.modularity(sym, comm).count()
        },
        entry("dedup_incremental_phash (index resolve)") {
          // per-replica md5 rasters (ids offset) — index = even ids,
          // batch = odd ids; both grow with r, matches stay bounded
          val hexs = concat((0 to 11).map(i =>
            md5(concat(lit(s"phash$i"), col("doc_id").cast("string")))): _*)
          val media = docsR.select(col("doc_id").cast("long").as("media_id"),
            concat(encode(lit("P6\n8 8\n255\n"), "UTF-8"), unhex(hexs))
              .as("payload"))
          val idx = graft.pipeline.Multimodal.imagePhash(
            media.where(pmod(col("media_id"), lit(2)) === 0))
          graft.pipeline.Multimodal.incrementalPhash(idx,
            media.where(pmod(col("media_id"), lit(2)) === 1)).count()
        },
        entry("dedup_url_incremental (canonical-key resolve)") {
          // index = even ids' clean URLs, batch = odd ids: half messy
          // twins of indexed URLs, half fresh — all sides grow with r
          def clean(id: org.apache.spark.sql.Column) =
            concat(lit("https://www.s"), pmod(id, lit(50)),
              lit(".com/i/"), id, lit("?a=1&b=2"))
          def messy(id: org.apache.spark.sql.Column) =
            concat(lit("HTTPS://S"), pmod(id, lit(50)),
              lit(".COM:443/i/"), id, lit("/?b=2&utm_source=x&a=1#f"))
          val idx = graft.pipeline.Dedup.urlExact(
            docsR.where(pmod(col("doc_id"), lit(2)) === 0)
              .select(col("doc_id"), clean(col("doc_id")).as("url")))
            .select(col("canonical_url"), col("canonical_id"))
          val batch = docsR.where(pmod(col("doc_id"), lit(2)) === 1)
            .select((col("doc_id") + 100000000L).as("doc_id"),
              when(pmod(col("doc_id"), lit(4)) === 1,
                  messy(col("doc_id") - 1))
                .otherwise(clean(col("doc_id") + 7)).as("url"))
          graft.pipeline.Dedup.incrementalUrl(idx, batch).count()
        },
        entry("dedup_exact_nfc (codegen unicode + groupBy)") {
          graft.pipeline.Dedup.exact(docsR,
            unicodeForm = Some("NFC")).count()
        },
        entry("multimodal_audio_pairs (integer-energy fp + bands)") {
          // per-replica md5 WAVs; twins = every 8th doc with the last
          // window silenced — pairs stay bounded, decode grows with r
          val header = // RIFF(556)/WAVE fmt(PCM,1ch,8k,8b) data(520)
            "524946462c02000057415645666d7420100000000100010040" +
            "1f0000401f000001000800" + "6461746108020000"
          val hexs = concat((0 to 64).map(w =>
            substring(md5(concat(lit(s"afp$w"),
              col("doc_id").cast("string"))), 1, 16)): _*)
          val base = docsR.select(col("doc_id").cast("long").as("media_id"),
            concat(unhex(lit(header)), unhex(hexs)).as("payload"))
          val twins = docsR.where(pmod(col("doc_id"), lit(8)) === 0)
            .select((col("doc_id") + 500000000L).as("media_id"),
              concat(unhex(lit(header)),
                unhex(concat(substring(hexs, 1, 64 * 16),
                  lit("80" * 8)))).as("payload"))
          graft.pipeline.Multimodal.phashPairs(
            graft.pipeline.Multimodal.audioFingerprint(
              base.unionByName(twins)), maxHamming = 4).count()
        },
        entry("dedup_incremental_embedding (sig index resolve)") {
          // index = even ids, batch = odd ids' scaled twins of even
          // neighbors + fresh directions — both sides grow with r
          val idx = graft.pipeline.Dedup.embeddingIndex(
            embR.where(pmod(col("vec_id"), lit(2)) === 0))
          val batch = embR.where(pmod(col("vec_id"), lit(2)) === 1)
            .select((col("vec_id") + 500000000L).as("vec_id"),
              transform(col("embedding"), x => x * lit(2.0f))
                .as("embedding"))
          graft.pipeline.Dedup.incrementalEmbedding(idx, batch,
            threshold = 0.9).count()
        },
        entry("wordpiece_train 8 rounds (likelihood argmax)") {
          // same scaling contract as bpe_train: ONE corpus-proportional
          // word-count shuffle, rounds on the Zipf-bounded word table
          graft.pipeline.WordPiece.train(docsR, numMerges = 8).count()
        },
        entry("ann_ivfpq_serve (fixed queries, growing index)") {
          // the serving shape: index BUILD grows with the corpus, the
          // query fan-out is fixed — per-query work must stay bounded
          // because cells scale with the corpus (16·r keeps cell size
          // flat, the graph_knn_routed contract)
          graft.pipeline.Ann.ivfPqTopK(embR,
            embBase.filter(col("vec_id") < 50), k = 10,
            numCentroids = 16 * r, nprobe = 4, m = 4, pqCentroids = 16,
            iters = 3, trainDistributed = true,
            hierarchicalRouting = true).count()
        },
        entry("curation_ingest (composed gate)") {
          // the curation_ingest entry's chain on the replicated corpus:
          // gopher rules -> corpus-trained LM ppl -> per-lang CCNet
          // terciles -> deterministic bucket-rate keep; every stage is
          // one narrow projection or one map-side-combined shuffle
          import graft.pipeline.{Sampling, TextAnalysis}
          val passing = TextAnalysis.gopherRules(docsR, minWords = 5,
              maxWords = 200, minStopwords = 1)
            .filter(col("keep"))
          val ppl = TextAnalysis.lmPerplexity(docsR)
            .join(docsR.select(col("doc_id"), col("lang")), "doc_id")
            .join(passing.select(col("doc_id")), Seq("doc_id"), "left_semi")
          val th = TextAnalysis.ccnetThresholdsFromPpl(ppl)
          val bucketed = TextAnalysis.bucketWithThresholds(
            ppl.select(col("doc_id"), col("lang"), col("ppl")), th)
          val rate = Seq("head" -> 0.9, "middle" -> 0.5, "tail" -> 0.1)
            .foldLeft(lit(0.0)) { case (acc, (b, rr)) =>
              when(col("bucket") === b, lit(rr)).otherwise(acc)
            }
          Sampling.sampleByRate(bucketed, rate, "doc_id", "scale").count()
        },
        entry("text_entropy (narrow HOF fold)") {
          graft.pipeline.TextAnalysis.charEntropy(docsR).count()
        },
        entry("text_fertility (vocab-bound merges)") {
          // 8 merges: corpus work = the (source, word) count shuffle;
          // the merge chain runs on the distinct-vocab table only
          val merges = graft.pipeline.Bpe.train(docsR, numMerges = 8)
            .orderBy("merge_rank").collect()
            .map(r => (r.getString(1), r.getString(2))).toSeq
          graft.pipeline.Bpe.fertilityBySource(docsR, merges).count()
        },
        entry("dedup_fuzzy_edit (banded leven)") {
          // per-TOKEN replica salt (the minhash decorrelation): replicas
          // of one doc differ in every token, so cross-replica edit
          // distance blows past maxDist and pair output stays ∝ r —
          // tail-only salting would leave the 256-char PREFIXES
          // identical and every doc would pair with its r−1 replicas
          // (quadratic by fixture, not plan)
          val decorrelated = docsR.withColumn("text",
            regexp_replace(col("text"), lit("(\\S+)"),
              concat(lit("$1r"),
                (col("doc_id") / 10000000L).cast("long").cast("string"))))
          graft.pipeline.Dedup.fuzzyEditPairs(decorrelated).count()
        },
        entry("dedup_incremental_fuzzy (prefix-index resolve)") {
          // per-token replica salt (the fuzzy_edit reasoning): index =
          // even half, batch = odd half, both grow with r, cross-replica
          // prefixes diverge past maxDist so candidates stay ∝ r
          val decorrelated = docsR.withColumn("text",
            regexp_replace(col("text"), lit("(\\S+)"),
              concat(lit("$1r"),
                (col("doc_id") / 10000000L).cast("long").cast("string"))))
          val idx = graft.pipeline.Dedup.fuzzyEditIndex(
            decorrelated.where(pmod(col("doc_id"), lit(2)) === 0))
          graft.pipeline.Dedup.incrementalFuzzyEdit(idx,
            decorrelated.where(pmod(col("doc_id"), lit(2)) === 1)).count()
        },
        entry("corpus_overlap (digest distinct + KMV)") {
          // sources stay 20 at every r: the pair frame is constant and
          // the measured work is the corpus-proportional distinct
          // (source, digest) shuffle + the digest-keyed intersection
          graft.pipeline.Dedup.sourceOverlap(docsR).count()
        },
        entry("text_c4_clean (split + filter HOF)") {
          // pure projection over a planted multi-line body — scan speed
          val planted = docsR.withColumn("text",
            concat_ws("\n", concat(col("text").substr(1, 40), lit(" end.")),
              col("text").substr(41, 30), lit("trailing words here!")))
          graft.pipeline.TextAnalysis.c4Clean(planted).count()
        },
        entry("sample_domain_cap (hot-domain WindowGroupLimit)") {
          // ONE domain holds half the corpus — the skew case the
          // WindowGroupLimit partial top-k must keep bounded: map
          // partitions each ship at most k rows for the hot key
          val planted = docsR.withColumn("domain",
            when(pmod(col("doc_id"), lit(2)) === 0, lit("hot.example.org"))
              .otherwise(concat(lit("site"),
                pmod(col("doc_id"), lit(977)).cast("string"))))
          graft.pipeline.Sampling.domainCap(planted, "domain", "n_chars",
            5).count()
        },
        entry("sample_epochs (explode + hash filter)") {
          graft.pipeline.Sampling.epochMix(docsR, "source",
            Map("src0" -> 2.5, "src1" -> 1.0, "src2" -> 0.25,
              "src5" -> 3.0), "doc_id", "scale").count()
        },
        entry("embed_dim_stats (d-keyed combine)") {
          graft.pipeline.Diagnostics.embedDimStats(embR).count()
        },
        entry("dedup_keep_best (cluster election)") {
          // decorrelated replicas (the dedup_minhash reasoning) so pair
          // output stays ∝ r; election adds one cluster-keyed max_by
          // over the duplicate-sized member table
          val decorrelated = docsR.withColumn("text",
            regexp_replace(col("text"), lit("(\\S+)"),
              concat(lit("$1r"),
                (col("doc_id") / 10000000L).cast("long").cast("string"))))
          val pairs = graft.pipeline.Dedup.minhashLsh(decorrelated,
            shingleSize = 3, numHashes = 8, bands = 4, threshold = 0.25)
          graft.pipeline.Dedup.keepBest(decorrelated, pairs,
            length(col("text"))).count()
        },
        entry("ann_sq8 (encode + int-dot top-k)") {
          // stats pass (d-keyed combine) + narrow encode + broadcast-
          // query linear scan: per-row work is constant in the corpus
          val codes = graft.pipeline.Ann.sq8Encode(embR)
          graft.pipeline.Ann.sq8TopK(codes,
            codes.filter(col("id") < 8), k = 10).count()
        },
        entry("graph_adamic_adar (capped wedges)") {
          // wedge join over the ROUTED kNN graph. OUT-degree is k but
          // symmetrization leaves IN-degree unbounded — hub vectors fan
          // the per-z wedge table deg² (measured 6,012 → 2,444 rows/s,
          // 64× → 256×, uncapped). maxDegree=64 is the standard
          // frequent-neighbor pruning: a hub wedge adds 1/ln(deg) ≈
          // nothing to its pair while costing deg² to enumerate.
          val edges = graft.pipeline.Ann.knnGraphRouted(embR, k = 3,
            numCentroids = 16 * r, nprobe = 4, m = 4, pqCentroids = 16,
            iters = 3, refine = 4, trainDistributed = true,
            hierarchicalRouting = true)
          graft.pipeline.Graph.adamicAdar(edges, maxDegree = 64).count()
        },
        entry("corpus_zipf (top-N WindowGroupLimit)") {
          graft.pipeline.TextAnalysis.zipfSlope(docsR, topN = 200).count()
        },
        entry("export_manifest (shard digest rollup)") {
          graft.pipeline.Sampling.shardManifest(docsR, "doc_id", "text",
            nShards = 32 * r, salt = "scale").count()
        },
        entry("ann_incremental (frozen-centroid add + serve)") {
          // the daily-ingest ANN lifecycle: index trains on the even-id
          // half, the odd-id "arriving" half pays ONLY the narrow encode
          // (no retraining, no corpus rescan); serve = plain cell-keyed
          // probe over the union. Cells ∝ corpus keeps cell size flat.
          val idx = graft.pipeline.Ann.buildIvfPq(
            embR.where(pmod(col("vec_id"), lit(2)) === 0),
            numCentroids = 16 * r, m = 4, pqCentroids = 16,
            iters = 3, sampleSize = 10000, trainDistributed = true,
            hierarchicalRouting = true)
          val grown = graft.pipeline.Ann.addToIvfPq(idx,
            embR.where(pmod(col("vec_id"), lit(2)) === 1))
          graft.pipeline.Ann.queryIvfPq(grown,
            embBase.filter(col("vec_id") < 50), k = 10, nprobe = 4).count()
        },
        entry("ann_ivfpq_rerank (ADC shortlist + exact refine)") {
          // two-stage serving: the exact-cosine stage touches ONLY the
          // overfetch·|queries| shortlist ids — its cost must stay flat
          // while the candidate-generation stage scales like ivfpq_serve
          val idx = graft.pipeline.Ann.buildIvfPq(embR,
            numCentroids = 16 * r, m = 4, pqCentroids = 16,
            iters = 3, sampleSize = 10000, trainDistributed = true,
            hierarchicalRouting = true)
          graft.pipeline.Ann.queryIvfPqRerank(idx, embR,
            embBase.filter(col("vec_id") < 50), k = 10, overfetch = 30,
            nprobe = 4).count()
        },
        entry("graph_jaccard (capped wedges)") {
          // the adamic_adar wedge shape with integer counts; same
          // frequent-neighbor cap bounds the hub deg² fan
          val edges = graft.pipeline.Ann.knnGraphRouted(embR, k = 3,
            numCentroids = 16 * r, nprobe = 4, m = 4, pqCentroids = 16,
            iters = 3, refine = 4, trainDistributed = true,
            hierarchicalRouting = true)
          graft.pipeline.Graph.jaccardSimilarity(edges, maxDegree = 64).count()
        },
        entry("text_hash_embed (narrow hash + keyed rollup)") {
          graft.pipeline.TextAnalysis.hashEmbed(docsR, dims = 16).count()
        },
        entry("graph_assortativity (degree moments)") {
          val edges = graft.pipeline.Ann.knnGraphRouted(embR, k = 3,
            numCentroids = 16 * r, nprobe = 4, m = 4, pqCentroids = 16,
            iters = 3, refine = 4, trainDistributed = true,
            hierarchicalRouting = true)
          graft.pipeline.Graph.assortativity(edges).count()
        },
        entry("ml_ks_psi (distribution drift pair)") {
          // two value rollups + distinct-value CDF/bin tables — the
          // corpus only pays the narrow length projection
          val d = docsR.where(length(trim(col("text"))) > 0)
            .select(col("source"), size(split(trim(lower(col("text"))),
              "\\s+")).cast("long").as("n_tokens"))
          val a = d.where(col("source") === "src0").select(col("n_tokens"))
          val b = d.where(col("source") === "src1").select(col("n_tokens"))
          graft.pipeline.Regression.ksTest(a, b, "n_tokens").count()
          graft.pipeline.Regression.psi(a, b, "n_tokens", 10L).count()
        },
        entry("text_lm_kn (count-table joins)") {
          // train-split bigram counts + two count-table rollups; the
          // scoring join is keyed on the bigram, never corpus x vocab
          graft.pipeline.TextAnalysis.lmPerplexityKneserNey(docsR).count()
        },
        entry("sample_doremi (LM + source rollup)") {
          // per-doc LM pass dominates; everything after is a
          // |sources|-sized aggregate with broadcast scalars
          graft.pipeline.Sampling.doremiWeights(docsR).count()
        },
        entry("kernel_fit 2 passes (E/M-step)") {
          val corpus = Corpus.fromDocumentsTable(docsR)
          val dict = DictionaryOps.gather(corpus)
          val pwt0 = PhiOps.initializeModel(dict, numTopics = 8, seed = 42)
          Fit.fitOffline(corpus, pwt0,
            Fit.Config(numTopics = 8, numCollectionPasses = 2,
              estep = EStepConfig(numDocumentPasses = 1))).pwt.count()
        },
        entry("kernel_fit joinphi (dist. Phi)") {
          // maxBroadcastRows = 0 forces the distributed-Phi E-step — the
          // path a 100 TB vocab actually takes
          val corpus = Corpus.fromDocumentsTable(docsR)
          val dict = DictionaryOps.gather(corpus)
          val pwt0 = PhiOps.initializeModel(dict, numTopics = 8, seed = 42)
          Fit.fitOffline(corpus, pwt0,
            Fit.Config(numTopics = 8, numCollectionPasses = 2,
              estep = EStepConfig(numDocumentPasses = 1),
              maxBroadcastRows = 0L)).pwt.count()
        },
        entry("kernel_fit joinphi ORDERED fold") {
          // round 12: the deterministic doc-keyed tree fold + hash-ranged
          // normalizer on the same join-phi fit — the ladder certifies
          // the determinism premium stays a bounded constant factor as
          // the corpus (and so the fold-key span) grows
          val corpus = Corpus.fromDocumentsTable(docsR)
          val dict = DictionaryOps.gather(corpus)
          val pwt0 = PhiOps.initializeModel(dict, numTopics = 8, seed = 42)
          Fit.fitOffline(corpus, pwt0,
            Fit.Config(numTopics = 8, numCollectionPasses = 2,
              estep = EStepConfig(numDocumentPasses = 1),
              maxBroadcastRows = 0L, orderedJoinPhi = true)).pwt.count()
        }
      ).flatten
      results.foreach { case (name, sec) =>
        println(f"SCALE r=$r%2d rows=$n%7d  $name%-32s ${sec}%8.2f s  ${n / sec}%10.0f rows/s")
      }
      docsR.unpersist()
      embR.unpersist()
      evR.unpersist()
      spark.catalog.clearCache()
    }

    // Funnel hot-key fixture: ONE bot user with 10^6 funnel-step events
    // on top of 10^5 human rows. The exact path collects the bot's
    // every event into one task's buffer; the capped path's EarliestN
    // pre-aggregation bounds buffer state at O(cap) per (user, type) —
    // the row proves the hot key doesn't serialize the stage (run via
    // only=funnel_hotkey or in the default sweep).
    if (!bpeOnly && only.forall(_.exists("funnel_hotkey".contains(_)))) {
      import spark.implicits._
      val S = graft.pipeline.Temporal.NsPerSecond
      val human = spark.range(100000).select(
        col("id").as("event_id"), (col("id") % 5000L).as("user_id"),
        (lit(1000L) * S + col("id") * S).as("ts"),
        element_at(array(lit("view"), lit("click"), lit("purchase")),
          (col("id") % 3 + 1).cast("int")).as("event_type"),
        lit(1.0).as("value"))
      val bot = spark.range(1000000).select(
        (col("id") + 10000000L).as("event_id"), lit(999999L).as("user_id"),
        (lit(1000L) * S + col("id") * 1000L).as("ts"),
        element_at(array(lit("view"), lit("click"), lit("purchase")),
          (col("id") % 3 + 1).cast("int")).as("event_type"),
        lit(1.0).as("value"))
      val hot = human.unionByName(bot).repartition(32)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val n = hot.count()
      val steps = Seq("view", "click", "purchase")
      val tExact = time { graft.pipeline.Temporal.funnel(hot, steps,
        horizonNs = 60L * graft.pipeline.Temporal.NsPerMinute).count() }
      val tCapped = time { graft.pipeline.Temporal.funnel(hot, steps,
        horizonNs = 60L * graft.pipeline.Temporal.NsPerMinute,
        maxEventsPerUser = 1024).count() }
      println(f"SCALE funnel_hotkey rows=$n%8d  exact ${tExact}%8.2f s  capped(1024) ${tCapped}%8.2f s")
      hot.unpersist()
      spark.catalog.clearCache()
    }

    // Ordered-fold partition ladder (round 12): the n_wt determinism
    // contract buffers one partial per E-step partition per (class,
    // token) group; past FoldWidth the fold runs as a TREE
    // (EStep.orderedTreeFold), so the per-group buffer must stay <=
    // FoldWidth — FLAT — as the partition count grows, and wall time
    // near-linear in total partials. Synthesizes kind-0-shaped partials
    // (vocab tokens x 2 partials/partition) at rising p; the probe in
    // VectorOps records the largest buffer any fold level held.
    if (!bpeOnly && only.forall(_.exists("nwt_fold".contains(_)))) {
      val vocab = 100L
      val T = 8
      for (p <- Seq(64L, 512L, 4096L, 32768L)) {
        val span = 2L * p
        val partials = spark.range(0L, vocab * span).select(
          lit("@default_class").as("class_id"),
          concat(lit("tok"), (col("id") % vocab).cast("string")).as("token"),
          (col("id") / vocab).cast("long").as("fk"),
          transform(sequence(lit(0), lit(T - 1)),
            t => ((pmod(col("id") * 31 + t, lit(97))).cast("float") / lit(7f))
              .cast("float")).as("vec"))
        graft.functions.VectorOps.bufferProbeEnabled = true
        graft.functions.VectorOps.maxOrderedBuffer.set(0)
        // consume the folded vectors (a bare count() would let Catalyst
        // prune the aggregate expression away)
        val sec = time {
          graft.operators.EStep.orderedTreeFold(partials, span)
            .select(sum(element_at(col("weights"), 1))).head
        }
        val buf = graft.functions.VectorOps.maxOrderedBuffer.get()
        graft.functions.VectorOps.bufferProbeEnabled = false
        val rows = vocab * span
        println(f"SCALE nwt_fold parts=$p%6d rows=$rows%9d  ${sec}%8.2f s  ${rows / sec}%11.0f rows/s  maxGroupBuffer=$buf%4d")
        spark.catalog.clearCache()
      }
    }

    // BPE merge-count scaling at FIXED corpus: exact BPE is sequential in
    // the merge count, so the per-merge cost must stay FLAT as numMerges
    // grows (the replace stack is cut every `checkpointEvery` rounds —
    // without that cut, round k re-runs k replaces and sec/merge grows
    // linearly, the O(M²) trend the round-5 verdict flagged).
    if (bpeOnly || only.forall(_.exists("bpe_merges".contains(_))))
      for (m <- Seq(8, 16, 32)) {
        val sec = time { graft.pipeline.Bpe.train(base, numMerges = m).count() }
        println(f"SCALE bpe_train merges=$m%3d  total ${sec}%8.2f s  ${sec / m}%8.3f s/merge")
        spark.catalog.clearCache()
      }
    spark.stop()
  }
}
