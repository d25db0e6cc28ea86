package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Approximate nearest-neighbor search over an embedding column
  * (array<float>).
  *
  * Two strategies:
  * - `bruteForceTopK` — exact: broadcast the (small) query set against the
  *   corpus, one narrow pass + a per-query top-k window. The right
  *   baseline and the correctness oracle.
  * - `lshTopK` — scale path: random-hyperplane signatures bucket the
  *   corpus (narrow), queries probe their bucket(s) and rerank exactly
  *   within them. Recall grows with probes/planes; at 100 TB the bucket
  *   join replaces the quadratic crossJoin with a key-partitioned join.
  *   (An IVF variant would k-means the corpus first; the bucketing seam
  *   is the same — `bucket` is just the partition key.)
  */
object Ann {

  /** cosine(a, b) computed in double, sequential array order (matches the
    * DuckDB oracle's list_cosine_similarity bit-for-bit in practice).
    * A native codegen'd expression ([[graft.functions.CosineSimilarity]]):
    * one primitive loop per pair instead of three boxed HOF walks — the
    * rerank inner loop of every ANN/embedding-dedup path. */
  def cosine(a: Column, b: Column): Column = {
    import org.apache.spark.sql.GraftColumnBridge
    GraftColumnBridge.column(graft.functions.CosineSimilarity(
      GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))
  }

  /** Exact top-k neighbors for each query id. `queries` must be small
    * enough to broadcast (the usual online-serving shape); the corpus side
    * streams. Returns [query_id, rank, id, cosine]. */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, k: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val c = corpus.select(col(idCol).cast("long").as("id"), col(vecCol).as("vec"))
    val q = queries.select(col(idCol).cast("long").as("query_id"), col(vecCol).as("qvec"))
    val scored = c.crossJoin(broadcast(q))
      .filter(col("id") =!= col("query_id"))
      .withColumn("cosine", cosine(col("vec"), col("qvec")))
    val w = Window.partitionBy(col("query_id")).orderBy(col("cosine").desc, col("id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("id"), col("cosine"))
  }

  /** FILTERED vector search — top-k under a metadata predicate (the
    * vector-DB serving pattern: "nearest docs WHERE lang = 'en' AND
    * source IN (...)"). Post-filtering a plain top-k under-fills k when
    * the predicate is selective; the correct form filters the corpus
    * FIRST and ranks inside the slice — which in Spark is exactly a
    * predicate ahead of [[bruteForceTopK]], and Catalyst pushes it to
    * the parquet scan (PushedFilters — the slice never leaves storage;
    * asserted in PlanAssertSpec). The routed twin is the same
    * composition over [[queryIvfPqCandidates]] with the filter applied
    * to the candidate join's corpus side. Returns
    * [query_id, rank, id, cosine]. */
  def filteredTopK(corpus: DataFrame, queries: DataFrame, k: Int,
      predicate: Column, idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame =
    bruteForceTopK(corpus.filter(predicate), queries, k, idCol, vecCol)

  /** Hard-negative mining for contrastive training — per query, the k
    * MOST similar corpus vectors strictly below a near-duplicate
    * ceiling: similar enough to be informative negatives, not so
    * similar they are unlabeled positives (the embedding-model training
    * recipe; the ceiling is typically the corpus's near-dup threshold).
    * Same plan as [[bruteForceTopK]] (broadcast queries, one
    * corpus-linear scan, bounded top-k window) with the ceiling applied
    * before ranking so k always fills from true negatives. The
    * cosine expression is the shared native [[cosine]] — bit-identical
    * across engines, so the raw-value ceiling compare is deterministic.
    * Returns [query_id, rank, id, cosine]. */
  def hardNegatives(corpus: DataFrame, queries: DataFrame, k: Int,
      maxCosine: Double, idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    val c = corpus.select(col(idCol).cast("long").as("id"), col(vecCol).as("vec"))
    val q = queries.select(col(idCol).cast("long").as("query_id"),
      col(vecCol).as("qvec"))
    val scored = c.crossJoin(broadcast(q))
      .filter(col("id") =!= col("query_id"))
      .withColumn("cosine", cosine(col("vec"), col("qvec")))
      .filter(col("cosine") < maxCosine)
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("id"), col("cosine"))
  }

  /** Truncation-recall audit — how much retrieval quality survives
    * keeping only the first d' dimensions of each embedding (the
    * matryoshka / dimension-budget question: can the index store d'=16
    * instead of 64?). For each d' in `dims`: brute-force top-k under
    * truncated cosine vs the full-dimension top-k, recall aggregated
    * over the query set. Hits and totals are integers, so the mean
    * recall is one exact division. Returns
    * [dim_kept, n_queries, n_hits, mean_recall].
    *
    * Shape at scale: |dims| independent broadcast-query scans (each the
    * bruteForceTopK plan over a NARROWER projection — the truncation
    * happens before the scan, so memory bandwidth drops with d');
    * swap the exact scans for routed ones past audit scale. */
  def truncateRecall(emb: DataFrame, dims: Seq[Int], numQueries: Int,
      k: Int, idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    require(dims.nonEmpty && dims.forall(_ >= 1),
      s"truncateRecall: dims must be positive, got $dims")
    val full = bruteForceTopK(emb, emb.filter(col(idCol) < numQueries), k,
      idCol, vecCol).select(col("query_id"), col("id"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val truth = full.groupBy()
      .agg(count_distinct(col("query_id")).as("n_queries"))
    dims.map { d =>
      val tr = emb.select(col(idCol), slice(col(vecCol), 1, d).as(vecCol))
      val topT = bruteForceTopK(tr, tr.filter(col(idCol) < numQueries), k,
        idCol, vecCol).select(col("query_id"), col("id"))
      full.join(topT, Seq("query_id", "id"))
        .groupBy().agg(count(lit(1)).as("n_hits"))
        .crossJoin(truth)
        .select(lit(d).cast("long").as("dim_kept"), col("n_queries"),
          col("n_hits"),
          round(col("n_hits").cast("double") /
            (col("n_queries") * lit(k.toLong)).cast("double"), 6)
            .as("mean_recall"))
    }.reduce(_ unionAll _)
  }

  /** kNN majority-vote classifier over a labeled vector table — the
    * classic embedding-space classifier (label propagation from a
    * curated seed set: quality tiers, topical buckets, safety labels).
    * For each query, the k nearest train vectors by cosine vote with
    * equal weight; ties break by (votes DESC, label ASC) — the
    * labelPropagation min_by tie rule. Train and query sets must be
    * disjoint on id (the caller's split contract).
    *
    * Shape at scale: rides [[bruteForceTopK]] (query side broadcast,
    * one corpus-linear scan, per-query bounded top-k) for the exact
    * baseline; swap in [[queryIvfPq]] for the routed path when the
    * query set is corpus-sized — the vote is the same two
    * map-side-combined aggregations either way.
    *
    * Returns [query_id, predicted, votes, actual]. */
  def knnClassify(train: DataFrame, queries: DataFrame, k: Int,
      idCol: String = "vec_id", vecCol: String = "embedding",
      labelCol: String = "label", broadcastTrain: Boolean = true): DataFrame =
    knnVote(knnScore(train, queries, idCol, vecCol, labelCol,
      broadcastTrain), k)

  /** The scoring half of [[knnClassify]] — one row per (query, train)
    * pair, the query's own label carried through. The caller declares
    * which side is the BOUNDED one via `broadcastTrain`:
    *   - `true` (default): the labeled train side is the curated seed
    *     set, broadcast, and the query side streams through a
    *     stateless narrow join — the shape that lets [[knnClassify]]
    *     serve on a Structured Streaming query stream unchanged
    *     (StreamReplay.knnServe, where the stream IS the query side).
    *   - `false`: the QUERY side is the bounded one (a small held-out
    *     evaluation set against a corpus-sized labeled table) — the
    *     queries broadcast and the corpus does one linear scan, never
    *     materializing corpus-sized state on any executor.
    * Either way the output is one (query, train) row with identical
    * columns; downstream knnVote is order-insensitive. */
  private[graft] def knnScore(train: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, labelCol: String,
      broadcastTrain: Boolean = true): DataFrame = {
    val t = train.select(col(idCol).cast("long").as("id"),
      col(vecCol).as("vec"), col(labelCol).cast("long").as("lbl"))
    val q = queries.select(col(idCol).cast("long").as("query_id"),
      col(vecCol).as("qvec"), col(labelCol).cast("long").as("actual"))
    val joined =
      if (broadcastTrain) q.crossJoin(broadcast(t))
      else t.crossJoin(broadcast(q))
    joined
      .select(col("query_id"), col("actual"), col("id"), col("lbl"),
        cosine(col("vec"), col("qvec")).as("cosine"))
  }

  /** The vote half of [[knnClassify]]: per-query top-k by
    * (cosine DESC, id) — the window is bounded by the train-set size
    * per query — then the equal-weight majority vote. */
  private[graft] def knnVote(scored: DataFrame, k: Int): DataFrame = {
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("id"))
    val votes = scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .groupBy(col("query_id"), col("actual"), col("lbl"))
      .agg(count(lit(1)).as("votes"))
    votes.groupBy(col("query_id"), col("actual"))
      .agg(min_by(struct(col("lbl"), col("votes")),
        struct((-col("votes")).as("nv"), col("lbl"))).as("p"))
      .select(col("query_id"), col("p.lbl").as("predicted"),
        col("p.votes").as("votes"), col("actual"))
  }

  /** Maximal-Marginal-Relevance diversified top-k (Carbonell &
    * Goldstein 1998) — the RAG retrieval step that trades relevance
    * against redundancy: greedily pick
    *   argmax_d  λ·rel(d) − (1−λ)·max_{s ∈ selected} sim(d, s),
    * where rel/sim are the float-kernel cosine (bit-identical to the
    * DuckDB mirror — the annBruteForce gate). `maxsim` starts at −1
    * (below any cosine), so round 1 is pure relevance; each selection
    * folds into the per-candidate running max with one narrow pass —
    * the O(k·n) published algorithm, never the k×n×n rescore. The
    * argmax ranks on the ROUNDED score (ties by id); candidate lineage
    * is cut per round (k bounded driver actions, the pointer-jumping
    * loop shape). Returns [rank, id, score] for the k selected. */
  def mmrSelect(emb: DataFrame, queryVec: Array[Float], k: Int,
      lambda: Double = 0.7, idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    require(k >= 1 && lambda >= 0.0 && lambda <= 1.0, s"bad args: $k/$lambda")
    val spark = emb.sparkSession
    import spark.implicits._
    var cand = emb.select(col(idCol).cast("long").as("id"), col(vecCol).as("v"))
      .withColumn("rel", cosine(col("v"), typedlit(queryVec)))
      .withColumn("maxsim", lit(-1.0))
      .localCheckpoint(true)
    val picked = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Double)]
    for (t <- 1 to k) {
      val top = cand.withColumn("score", round(
          lit(lambda) * col("rel") - lit(1.0 - lambda) * col("maxsim"), 6))
        .orderBy(col("score").desc, col("id")).limit(1).collect()
      require(top.nonEmpty, s"mmrSelect exhausted candidates at round $t")
      val r = top.head
      picked += ((t.toLong, r.getLong(0), r.getAs[Double]("score")))
      val sv = r.getSeq[Float](1).toArray
      cand = cand.filter(col("id") =!= r.getLong(0))
        .withColumn("maxsim",
          greatest(col("maxsim"), cosine(col("v"), typedlit(sv))))
        .localCheckpoint(true)
    }
    picked.toSeq.toDF("rank", "id", "score")
  }

  /** Farthest-point (k-center / Gonzalez 1985) DIVERSITY SELECTION —
    * the coreset sampler: greedily pick the vector FARTHEST (lowest max
    * cosine) from everything already selected, so k picks cover the
    * embedding space's extremes instead of its density modes. The
    * training-data use is diversity sampling — seed a labeling budget,
    * pick prompts for eval sets, thin a redundant crawl. Round 1 is the
    * md5-ordered pick (the IVF codebook discipline — deterministic, no
    * RNG); each later round is one narrow running-max fold + a rounded
    * argmin (ties by id), the [[mmrSelect]] O(k·n) loop with relevance
    * dropped. Candidate lineage is cut per round. Returns
    * [rank, id, score] (score = max cosine to the prior picks; −1
    * sentinel for the seed row).
    *
    * Shape at scale: k bounded driver actions, each a narrow pass over
    * the candidates plus a global top-1 (TakeOrdered, never a sort). */
  def kcenterSelect(emb: DataFrame, k: Int, idCol: String = "vec_id",
      vecCol: String = "embedding", salt: String = "kc"): DataFrame = {
    require(k >= 1, s"kcenterSelect: k must be >= 1, got $k")
    val spark = emb.sparkSession
    import spark.implicits._
    var cand = emb.select(col(idCol).cast("long").as("id"), col(vecCol).as("v"))
      .withColumn("maxsim", lit(-1.0))
      .localCheckpoint(true)
    val picked = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Double)]
    for (t <- 1 to k) {
      val top =
        if (t == 1)
          cand.orderBy(md5(concat(lit(s"$salt "), col("id").cast("string"))),
            col("id")).limit(1)
            .withColumn("score", lit(-1.0)).collect()
        else
          cand.withColumn("score", round(col("maxsim"), 6))
            .orderBy(col("score").asc, col("id")).limit(1).collect()
      require(top.nonEmpty, s"kcenterSelect exhausted candidates at round $t")
      val r = top.head
      picked += ((t.toLong, r.getLong(0), r.getAs[Double]("score")))
      val sv = r.getSeq[Float](1).toArray
      cand = cand.filter(col("id") =!= r.getLong(0))
        .withColumn("maxsim",
          greatest(col("maxsim"), cosine(col("v"), typedlit(sv))))
        .localCheckpoint(true)
    }
    picked.toSeq.toDF("rank", "id", "score")
  }

  /** Per-group centroid cosine map — "which sources are
    * embedding-redundant": the source-similarity diagnostic a mixture
    * designer reads before setting sampling rates (two sources with
    * near-1 centroid cosine are candidates for merging or
    * down-weighting). Centroids are positional DECIMAL(18,6)-sum means
    * (the [[kmeansDataflow]] order-proof mean — bit-identical across
    * engines and partitionings); the pairwise matrix is the bounded
    * groups×groups broadcast self-join (group count is tens, never
    * data-sized). Returns [g_a, g_b, cosine], g_a < g_b, unrounded. */
  def groupCentroidSim(emb: DataFrame, groupCol: String,
      vecCol: String = "embedding"): DataFrame =
    centroidSimFromPoints(groupPoints(emb, groupCol, vecCol))

  /** The narrow per-row half of [[groupCentroidSim]]: one (g, pos, x)
    * row per vector component — a stateless projection, so the stream
    * twin runs it at ingest (StreamReplay.sourceCentroidSim) and feeds
    * the SAME [[centroidSimFromPoints]] aggregation at the sink. */
  private[graft] def groupPoints(emb: DataFrame, groupCol: String,
      vecCol: String = "embedding"): DataFrame =
    emb.select(col(groupCol).cast("string").as("g"),
      posexplode(transform(col(vecCol), x => x.cast("double")))
        .as(Seq("pos", "x")))

  /** The aggregation half of [[groupCentroidSim]]: DECIMAL-sum means
    * (order-insensitive — micro-batch arrival order can't move them),
    * position-ordered centroid assembly, bounded pairwise cosine. */
  private[graft] def centroidSimFromPoints(points: DataFrame): DataFrame = {
    val cents = points
      .groupBy(col("g"), col("pos"))
      .agg((sum(col("x").cast("decimal(18,6)")).cast("double") /
        count(lit(1))).as("m"))
      .groupBy(col("g"))
      .agg(array_sort(collect_list(struct(col("pos"), col("m")))).as("pm"))
      .select(col("g"), transform(col("pm"), p => p.getField("m")).as("cv"))
    val a = cents.select(col("g").as("g_a"), col("cv").as("va"))
    val b = cents.select(col("g").as("g_b"), col("cv").as("vb"))
    a.join(broadcast(b), col("g_a") < col("g_b"))
      .select(col("g_a"), col("g_b"),
        cosineDouble(col("va"), col("vb")).as("cosine"))
  }

  /** Per-group embedding drift between two snapshots — the
    * release-gate sibling of [[graft.pipeline.Snapshot.drift]] in
    * embedding space: for each group (source), the cosine between its
    * v1 and v2 centroids. A cosine well below 1 means the source's
    * semantic center MOVED between crawls (new topics, template churn,
    * a scraper change) — the signal a mixture designer re-weights on.
    * Centroids are positional DECIMAL-sum means (order-proof,
    * engine-exact — the [[groupCentroidSim]] mean); the final cosine is
    * the full-double [[cosineDouble]] fold. Groups present in only one
    * snapshot report null. Shape at scale: two narrow (g, pos, x)
    * projections + two map-side-combined mean aggregations + a
    * groups-sized join — no corpus-wide shuffle beyond the means.
    * Returns [g, cosine]. */
  def groupCentroidDrift(embA: DataFrame, embB: DataFrame,
      groupCol: String, vecCol: String = "embedding"): DataFrame =
    driftFromCentroids(
      centroidsOf(groupPoints(embA, groupCol, vecCol)),
      centroidsOf(groupPoints(embB, groupCol, vecCol)))

  /** DECIMAL-mean centroid assembly over a (g, pos, x) points table —
    * the aggregation half shared by [[groupCentroidDrift]] and the
    * streamed twin (StreamReplay.embedDriftServe, which runs the
    * narrow [[groupPoints]] projection at ingest and this at the
    * sink). Returns [g, cv]. */
  private[graft] def centroidsOf(points: DataFrame): DataFrame =
    points
      .groupBy(col("g"), col("pos"))
      .agg((sum(col("x").cast("decimal(18,6)")).cast("double") /
        count(lit(1))).as("m"))
      .groupBy(col("g"))
      .agg(array_sort(collect_list(struct(col("pos"), col("m")))).as("pm"))
      .select(col("g"), transform(col("pm"), p => p.getField("m")).as("cv"))

  /** The compare half of [[groupCentroidDrift]]: full-outer on the
    * group key, full-double cosine, null for one-sided groups. */
  private[graft] def driftFromCentroids(ca: DataFrame,
      cb: DataFrame): DataFrame =
    ca.withColumnRenamed("cv", "va")
      .join(cb.withColumnRenamed("cv", "vb"), Seq("g"), "full_outer")
      .select(col("g"),
        when(col("va").isNotNull && col("vb").isNotNull,
          cosineDouble(col("va"), col("vb"))).as("cosine"))

  /** Hybrid retrieval: BM25 candidate generation + vector-PRF rerank —
    * the production RAG serving pattern where lexical recall feeds a
    * semantic reorder. No external query vector is needed: the query's
    * pseudo-relevance centroid is the positional DECIMAL-sum mean of
    * its top-`prfM` BM25 candidates' embeddings (the ColBERT-PRF /
    * vector-PRF idea — engine-exact, order-proof), and every candidate
    * reranks by
    *   blend = λ·(bm25 / per-query max bm25) + (1−λ)·cosine(v, prf).
    * Rank runs on the ROUNDED blend (ties by doc id) so a last-ulp
    * libm difference cannot flip an order between engines.
    *
    * Shape at scale: BM25 candidates are queries×topK rows (tiny) —
    * every join below broadcasts against the corpus-sized embedding
    * table's key lookup; the PRF centroid and the max-normalizer are
    * per-query bounded aggregations. One postings-keyed candidate pass
    * (the bm25Query shape), one embedding key-join, no corpus-wide
    * window. Returns [query_id, rank, doc_id, score, cosine]. */
  def hybridSearch(docsDf: DataFrame, emb: DataFrame, queries: DataFrame,
      topK: Int = 10, prfM: Int = 3, lambda: Double = 0.5,
      k1: Double = 1.2, b: Double = 0.75, idCol: String = "doc_id",
      textCol: String = "text", vecIdCol: String = "vec_id",
      vecCol: String = "embedding",
      bm25Df: Option[DataFrame] = None): DataFrame = {
    require(prfM >= 1 && prfM <= topK && lambda >= 0.0 && lambda <= 1.0,
      s"hybridSearch: bad prfM/lambda ($prfM/$lambda)")
    // candidates persist: they feed the PRF centroid, the normalizer
    // and the rerank (≤ queries×topK rows — bounded by contract).
    // bm25Df hands in an already-computed candidate table (the shinglesDf
    // pattern) so a caller running bm25/hybrid/rrf over the SAME corpus
    // and queries builds the postings index once, not three times.
    val bm = bm25Df.getOrElse(
      TextAnalysis.bm25Search(docsDf, queries, topK, k1, b, textCol, idCol)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    val e = emb.select(col(vecIdCol).cast("long").as(idCol),
      transform(col(vecCol), x => x.cast("double")).as("v"))
    val cent = bm.filter(col("rank") <= prfM)
      .join(e, idCol)
      .select(col("query_id"), posexplode(col("v")).as(Seq("pos", "x")))
      .groupBy(col("query_id"), col("pos"))
      .agg((sum(col("x").cast("decimal(18,6)")).cast("double") /
        count(lit(1))).as("m"))
      .groupBy(col("query_id"))
      .agg(array_sort(collect_list(struct(col("pos"), col("m")))).as("pm"))
      .select(col("query_id"), transform(col("pm"), p => p.getField("m")).as("cv"))
    val mx = bm.groupBy(col("query_id")).agg(max(col("score")).as("ms"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("blend").desc, col(idCol))
    bm.join(e, idCol)
      .join(broadcast(cent), "query_id")
      .join(broadcast(mx), "query_id")
      .withColumn("cos", round(cosineDouble(col("v"), col("cv")), 6))
      .withColumn("blend", round(lit(lambda) * col("score") / col("ms")
        + lit(1.0 - lambda) * col("cos"), 6))
      .withColumn("hrank", row_number().over(w).cast("long"))
      .select(col("query_id"), col("hrank").as("rank"), col(idCol),
        col("blend").as("score"), col("cos").as("cosine"))
  }

  /** Reciprocal-rank fusion over the hybrid candidate set — the OTHER
    * standard lexical+semantic fusion beside [[hybridSearch]]'s score
    * blend: rrf = 1/(k+rank_bm25) + 1/(k+rank_cosine), k = 60 by
    * convention (Cormack et al. 2009). Rank-based fusion needs NO score
    * normalization (BM25 and cosine live on incomparable scales — the
    * blend's λ·score/max step is exactly the normalization RRF
    * sidesteps), which is why serving stacks default to it when the
    * two retrievers evolve independently. The fused value is a sum of
    * two exact rationals of small integers — bit-identical in any
    * engine, so the final rank rides the UNROUNDED rrf (id tiebreak).
    * Candidates, PRF centroid and per-query ranks are all
    * queries×topK-bounded, same scale shape as hybridSearch. Returns
    * [query_id, rank, <idCol>, rrf, bm25_rank, cos_rank]. */
  def rrfSearch(docsDf: DataFrame, emb: DataFrame, queries: DataFrame,
      topK: Int = 10, kRrf: Int = 60, prfM: Int = 3,
      k1: Double = 1.2, b: Double = 0.75, idCol: String = "doc_id",
      textCol: String = "text", vecIdCol: String = "vec_id",
      vecCol: String = "embedding",
      bm25Df: Option[DataFrame] = None): DataFrame = {
    require(prfM >= 1 && prfM <= topK && kRrf >= 1,
      s"rrfSearch: bad prfM/kRrf ($prfM/$kRrf)")
    // bm25Df: pre-computed candidates (the hybridSearch share seam)
    val bm = bm25Df.getOrElse(
        TextAnalysis.bm25Search(docsDf, queries, topK, k1, b, textCol, idCol)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
      .withColumnRenamed("rank", "bm25_rank")
    val e = emb.select(col(vecIdCol).cast("long").as(idCol),
      transform(col(vecCol), x => x.cast("double")).as("v"))
    val cent = bm.filter(col("bm25_rank") <= prfM)
      .join(e, idCol)
      .select(col("query_id"), posexplode(col("v")).as(Seq("pos", "x")))
      .groupBy(col("query_id"), col("pos"))
      .agg((sum(col("x").cast("decimal(18,6)")).cast("double") /
        count(lit(1))).as("m"))
      .groupBy(col("query_id"))
      .agg(array_sort(collect_list(struct(col("pos"), col("m")))).as("pm"))
      .select(col("query_id"), transform(col("pm"), p => p.getField("m")).as("cv"))
    val wc = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col(idCol))
    val cand = bm.join(e, idCol)
      .join(broadcast(cent), "query_id")
      .withColumn("cos", round(cosineDouble(col("v"), col("cv")), 6))
      .withColumn("cos_rank", row_number().over(wc).cast("long"))
      .withColumn("rrf",
        lit(1.0) / (lit(kRrf.toDouble) + col("bm25_rank"))
          + lit(1.0) / (lit(kRrf.toDouble) + col("cos_rank")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("rrf").desc, col(idCol))
    cand.withColumn("frank", row_number().over(w).cast("long"))
      .select(col("query_id"), col("frank").as("rank"), col(idCol),
        round(col("rrf"), 6).as("rrf"),
        col("bm25_rank").cast("long").as("bm25_rank"), col("cos_rank"))
  }

  /** Full-double cosine for DOUBLE-array columns (centroids) — the
    * float32 [[cosine]] kernel would truncate the DECIMAL-mean inputs.
    * Left-to-right HOF folds match DuckDB's sequential
    * list_cosine_similarity on the same doubles. */
  private[graft] def cosineDouble(a: Column, b: Column): Column = {
    val dot = aggregate(zip_with(a, b, (x, y) => x * y),
      lit(0.0), (acc, x) => acc + x)
    def n2(v: Column) =
      sqrt(aggregate(v, lit(0.0), (acc, x) => acc + x * x))
    dot / (n2(a) * n2(b))
  }

  /** Random-hyperplane signature: `planes` sign bits of dot(v, r_i) packed
    * into a long bucket key. Hyperplanes are seeded-deterministic
    * (hash-derived, reproducible across runs/partitionings). */
  def hyperplaneSignature(emb: DataFrame, idCol: String, vecCol: String,
      planes: Int, seed: Int): DataFrame =
    hyperplaneSignatures(emb, idCol, vecCol, planes, seed, tables = 1)
      .drop("table")

  /** md5-derived hyperplane component: uniform [-0.5, 0.5) double from
    * the first 8 hex chars of md5("plane <seed+table> <plane> <i>") — the
    * initPhi determinism trick (RelationalEm.scala): a pure function of
    * the coordinates, so bucket assignment is replicable in ANY engine
    * with md5. This is what puts the whole LSH top-k under the DuckDB
    * oracle (PipelineSql.annLsh):
    * `('0x' || substr(md5(...), 1, 8))::UBIGINT / 2^32 - 0.5`. */
  private[graft] def planeComponent(seedT: Int, p: Int, i: Int): Double = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val d = md.digest(s"plane $seedT $p $i".getBytes(java.nio.charset.StandardCharsets.UTF_8))
    var u = 0L
    var b = 0
    while (b < 4) { u = (u << 8) | (d(b) & 0xffL); b += 1 }
    u / 4294967296.0 - 0.5
  }

  /** Multi-table variant: `tables` independent signatures per vector
    * (table 0 uses the same hyperplanes as [[hyperplaneSignature]]),
    * emitted as one row per (vector, table) from a SINGLE narrow pass —
    * the classic OR-construction of LSH: each table stays selective
    * (2^planes buckets) while the union of tables drives recall, since a
    * neighbor is missed only if it hashes away in EVERY table.
    * Dot products accumulate in DOUBLE, sequential array order — the
    * same fold the SQL oracle's list_sum performs, so the sign bits (and
    * hence every bucket) agree across engines.
    *
    * The signature is a native codegen'd Catalyst expression
    * ([[graft.functions.HyperplaneSignature]]), not a ScalaUDF: the scan
    * → signature → posexplode pipeline stays inside one
    * WholeStageCodegen span, with the plane matrix embedded as a codegen
    * reference object (constant-sized: tables × planes × dim doubles).
    * Returns [id, vec, table, bucket]. */
  def hyperplaneSignatures(emb: DataFrame, idCol: String, vecCol: String,
      planes: Int, seed: Int, tables: Int): DataFrame = {
    val first = emb.select(col(vecCol)).limit(1).collect()
    require(first.nonEmpty, "empty embedding table")
    val dim = first(0).getSeq[Float](0).length
    emb.select(col(idCol).cast("long").as("id"), col(vecCol).as("vec"),
      posexplode(signaturesCol(col(vecCol), dim, planes, seed, tables))
        .as(Seq("table", "bucket")))
  }

  /** The per-table bucket-signature array column (native codegen
    * expression over md5-derived hyperplanes) for a KNOWN dimension —
    * the streaming path uses this directly because a streaming Dataset
    * cannot be probed for `dim` with a collect. */
  def signaturesCol(vec: Column, dim: Int, planes: Int, seed: Int,
      tables: Int): Column = {
    // deterministic uniform[-0.5, 0.5) md5-derived hyperplanes; table t
    // shifts the seed so tables are independent
    val planeVecs: Array[Array[Array[Double]]] = Array.tabulate(tables, planes) { (t, p) =>
      Array.tabulate(dim)(i => planeComponent(seed + t, p, i))
    }
    import org.apache.spark.sql.GraftColumnBridge
    GraftColumnBridge.column(graft.functions.HyperplaneSignature(
      GraftColumnBridge.expression(vec), planeVecs))
  }

  /** Multi-probe perturbation masks by increasing Hamming distance:
    * exact bucket, all 1-bit flips, then 2-bit flips — `probes` masks
    * total. Shared with the SQL oracle generator (PipelineSql.annLsh) so
    * the probed bucket set cannot drift between engines. */
  def probeMasks(planes: Int, probes: Int): Seq[Long] = {
    val singles = (0 until planes).map(p => 1L << p)
    val pairs = for {
      a <- 0 until planes; b <- (a + 1) until planes
    } yield (1L << a) | (1L << b)
    (Seq(0L) ++ singles ++ pairs).take(math.max(1, probes))
  }

  /** Deterministic k-means centroids from a bounded sample (Lloyd driver-
    * side on ≤ sampleSize vectors — the standard IVF training shape: the
    * codebook is tiny and global, the assignment pass is distributed).
    * The initial codebook is the first `numCentroids` sample vectors in
    * (md5("ivf " + id), id) order — a deterministic uniform pick that any
    * engine with md5 reproduces, so the iters = 0 codebook (and with it
    * the whole IVF top-k) is SQL-expressible (PipelineSql.annIvf). */
  def trainCentroids(emb: DataFrame, vecCol: String, numCentroids: Int,
      iters: Int = 5, sampleSize: Int = 10000, seed: Int = 42,
      idCol: String = "vec_id"): Array[Array[Float]] = {
    val sample = emb.orderBy(col(idCol)).limit(sampleSize)
      .select(col(idCol).cast("long"), col(vecCol)).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    require(sample.nonEmpty, "empty embedding table")
    val k = math.min(numCentroids, sample.length)
    // md5-ordered initial pick, then Lloyd iterations (L2)
    val cents = sample
      .map { case (id, v) => (md5Hex(s"ivf $id"), id, v) }
      .sortBy(t => (t._1, t._2))
      .take(k).map(_._3.clone())
    var it = 0
    while (it < iters) {
      val sums = Array.fill(k)(new Array[Double](sample(0)._2.length))
      val counts = new Array[Long](k)
      sample.foreach { case (_, v) =>
        val c = nearestCentroid(v, cents)
        counts(c) += 1
        var i = 0
        while (i < v.length) { sums(c)(i) += v(i); i += 1 }
      }
      var c = 0
      while (c < k) {
        if (counts(c) > 0) {
          var i = 0
          while (i < cents(c).length) {
            cents(c)(i) = (sums(c)(i) / counts(c)).toFloat; i += 1
          }
        }
        c += 1
      }
      it += 1
    }
    cents
  }

  /** Distributed Lloyd: the 100 TB codebook-training path. Same
    * deterministic md5-ordered initial pick as [[trainCentroids]] (k
    * codebook vectors collected to the driver — the codebook is tiny by
    * contract), but each Lloyd iteration runs ON the cluster over the
    * WHOLE corpus: broadcast codebook → one narrow assignment pass (the
    * same double-widened sequential L2, ties to the lower centroid
    * index) → map-side-combined groupBy(cell) double-vector sums — the
    * shuffle carries k·dim partial sums per partition, never vectors.
    * With `sampleSize >= corpus` the result matches [[trainCentroids]]
    * up to partial-sum addition order (~1e-12 relative — asserted by
    * PipelineSpec), so the bounded-sample and full-corpus trainers are
    * interchangeable knobs on one contract. */
  def trainCentroidsDistributed(emb: DataFrame, vecCol: String,
      numCentroids: Int, iters: Int = 5, seed: Int = 42,
      idCol: String = "vec_id",
      /** route each Lloyd assignment through the ⌈√c⌉-parent coarse
        * router (rebuilt per iteration from the moving centroids —
        * driver-side over c points, trivial): approximate Lloyd, the
        * standard big-c recipe, turning the n·c·dim iteration cost
        * into ~n·√c·dim. Off = exact assignment. */
      hierarchical: Boolean = false,
      /** router depth when `hierarchical` (2 = IMI parent tree). */
      routerLevels: Int = 1): Array[Array[Float]] = {
    val spark = emb.sparkSession
    val initRows = emb
      .select(col(idCol).cast("long").as("id"), col(vecCol).as("v"))
      .withColumn("h", md5(concat(lit("ivf "), col("id").cast("string"))))
      .orderBy(col("h"), col("id"))
      .limit(numCentroids) // TakeOrderedAndProject: k rows, no global sort
      .select(col("v")).collect()
    require(initRows.nonEmpty, "empty embedding table")
    var cents = initRows.map(_.getSeq[Float](0).toArray)
    var it = 0
    while (it < iters) {
      val assignCol =
        if (hierarchical)
          element_at(hierProbes(col(vecCol), cents, 1, levels = routerLevels), 1)
        else nearestCell(col(vecCol), cents)
      val agg = emb
        .select(assignCol.as("cell"),
          transform(col(vecCol), x => x.cast("double")).as("dv"))
        .groupBy(col("cell"))
        .agg(graft.functions.VectorOps.doubleVectorSum(col("dv")).as("s"),
          count(lit(1)).as("n"))
        .collect() // ≤ k rows
      val next = cents.map(_.clone())
      agg.foreach { r =>
        val cell = r.getInt(0)
        val s = r.getSeq[Double](1)
        val n = r.getLong(2)
        var i = 0
        while (i < next(cell).length && i < s.length) {
          next(cell)(i) = (s(i) / n).toFloat; i += 1
        }
      }
      cents = next
      it += 1
    }
    cents
  }

  /** Spherical variant of [[trainCentroids]]: same md5-ordered seed pick,
    * but Lloyd assignment by COSINE argmax (ties to the lower index) —
    * the clustering SemDeDup needs, because cosine assignment is
    * scale-invariant (a ×2-scaled duplicate provably lands in its
    * original's cell; see Dedup.semanticDedup). The mean update is left
    * unnormalized: cosine(v, c) is invariant under positive scaling of
    * c, so normalizing the centroid would not change any assignment. */
  def trainCentroidsSpherical(emb: DataFrame, vecCol: String, numCentroids: Int,
      iters: Int = 0, sampleSize: Int = 10000, idCol: String = "vec_id"): Array[Array[Float]] = {
    val sample = emb.orderBy(col(idCol)).limit(sampleSize)
      .select(col(idCol).cast("long"), col(vecCol)).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    require(sample.nonEmpty, "empty embedding table")
    val k = math.min(numCentroids, sample.length)
    val cents = sample
      .map { case (id, v) => (md5Hex(s"ivf $id"), id, v) }
      .sortBy(t => (t._1, t._2))
      .take(k).map(_._3.clone())
    var it = 0
    while (it < iters) {
      val sums = Array.fill(k)(new Array[Double](sample(0)._2.length))
      val counts = new Array[Long](k)
      sample.foreach { case (_, v) =>
        val c = nearestCentroidCosine(v, cents)
        counts(c) += 1
        var i = 0
        while (i < v.length) { sums(c)(i) += v(i); i += 1 }
      }
      var c = 0
      while (c < k) {
        if (counts(c) > 0) {
          var i = 0
          while (i < cents(c).length) {
            cents(c)(i) = (sums(c)(i) / counts(c)).toFloat; i += 1
          }
        }
        c += 1
      }
      it += 1
    }
    cents
  }

  // cosine accumulated in DOUBLE over double-widened floats, sequential
  // order — the fold DuckDB's list_cosine_similarity performs, so argmax
  // cell assignment agrees across engines (ties to the lower index)
  private[graft] def nearestCentroidCosine(v: Array[Float], cents: Array[Array[Float]]): Int = {
    var best = 0
    var bestS = Double.NegativeInfinity
    var c = 0
    while (c < cents.length) {
      var dot = 0.0
      var na = 0.0
      var nb = 0.0
      var i = 0
      val cc = cents(c)
      while (i < v.length && i < cc.length) {
        val a = v(i).toDouble
        val b = cc(i).toDouble
        dot += a * b; na += a * a; nb += b * b; i += 1
      }
      val s = if (na == 0.0 || nb == 0.0) -2.0 else dot / (math.sqrt(na) * math.sqrt(nb))
      if (s > bestS) { bestS = s; best = c }
      c += 1
    }
    best
  }

  /** Product-quantization codebooks `cb(s)(c)(j)`: `numCentroids` seed
    * vectors picked once in (md5("pq " + id), id) order from a bounded
    * sample — the same determinism contract as [[trainCentroids]], so the
    * iters = 0 codebook is SQL-expressible (PipelineSql.annPq) — and the
    * codebook for subspace `s` is the s-th slice of each seed, optionally
    * refined per-subspace by independent Lloyd iterations over the
    * sample's slices (classic PQ training: the m quantizers are
    * independent k-means problems). */
  def trainPqCodebooks(emb: DataFrame, vecCol: String, m: Int, numCentroids: Int,
      iters: Int = 0, sampleSize: Int = 10000,
      idCol: String = "vec_id"): Array[Array[Array[Float]]] = {
    val sample = emb.orderBy(col(idCol)).limit(sampleSize)
      .select(col(idCol).cast("long"), col(vecCol)).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    require(sample.nonEmpty, "empty embedding table")
    val dim = sample(0)._2.length
    require(dim % m == 0, s"dim $dim not divisible by m = $m subspaces")
    val sub = dim / m
    val k = math.min(numCentroids, sample.length)
    val seeds = sample
      .map { case (id, v) => (md5Hex(s"pq $id"), id, v) }
      .sortBy(t => (t._1, t._2))
      .take(k).map(_._3)
    val cbs = Array.tabulate(m, k)((s, c) => seeds(c).slice(s * sub, (s + 1) * sub))
    var it = 0
    while (it < iters) {
      var s = 0
      while (s < m) {
        val cb = cbs(s)
        val sums = Array.fill(k)(new Array[Double](sub))
        val counts = new Array[Long](k)
        sample.foreach { case (_, v) =>
          val slice = v.slice(s * sub, (s + 1) * sub)
          val c = nearestCentroid(slice, cb)
          counts(c) += 1
          var j = 0
          while (j < sub) { sums(c)(j) += slice(j); j += 1 }
        }
        var c = 0
        while (c < k) {
          if (counts(c) > 0) {
            var j = 0
            while (j < sub) { cb(c)(j) = (sums(c)(j) / counts(c)).toFloat; j += 1 }
          }
          c += 1
        }
        s += 1
      }
      it += 1
    }
    cbs
  }

  /** PQ top-k by asymmetric distance (ADC): the corpus is encoded once
    * into m code bytes per vector (argmin L2 per subspace — a narrow pass
    * over a broadcast codebook), then queries scan codes, not vectors —
    * at 100 TB this is the whole point: a dim-64 float corpus (256 B/vec)
    * becomes m = 4 codes (4 B/vec), a 64× smaller scan, with distances
    * reconstructed per (query, code) against the broadcast codebook.
    * ADC accumulates per-subspace partial distances in double and then
    * sums the m partials left-to-right — the same associativity as the
    * SQL oracle's `list_sum(sub0) + ... + list_sum(sub_{m-1})`, so ranks
    * (ties broken by id; PQ ties are real, any two vectors sharing all m
    * codes have equal ADC) agree across engines. At real scale PQ
    * composes with IVF cells (IVF-PQ: route by cell, scan codes within)
    * — the routing seam is [[ivfTopK]]'s; this operator is the
    * code-scan stage. Returns [query_id, rank, id, adc]. */
  def pqTopK(corpus: DataFrame, queries: DataFrame, k: Int,
      idCol: String = "vec_id", vecCol: String = "embedding",
      m: Int = 4, numCentroids: Int = 16, iters: Int = 0,
      sampleSize: Int = 10000): DataFrame = {
    val cbs = trainPqCodebooks(corpus, vecCol, m, numCentroids, iters, sampleSize, idCol)
    val c = corpus.select(col(idCol).cast("long").as("id"),
      pqEncode(col(vecCol), cbs).as("codes"))
    val q = queries.select(col(idCol).cast("long").as("query_id"), col(vecCol).as("qvec"))
    val scored = c.crossJoin(broadcast(q))
      .filter(col("id") =!= col("query_id"))
      .withColumn("adc", adc(col("codes"), col("qvec"), cbs))
    val w = Window.partitionBy(col("query_id")).orderBy(col("adc").asc, col("id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("id"), col("adc"))
  }

  /** A built IVF-PQ index — the persistent serving artifact: the (tiny)
    * routing centroids + PQ codebooks, and the encoded corpus as a
    * DataFrame of (id, cell, m code bytes). Raw vectors appear nowhere:
    * once built (or loaded — [[graft.sources.AnnIO]]), queries touch
    * only this. */
  final case class IvfPqIndex(cells: Array[Array[Float]],
      codebooks: Array[Array[Array[Float]]], codes: DataFrame,
      /** true = the index was built with hierarchically-routed
        * assignment ([[graft.functions.HierarchicalProbes]]) and
        * queries MUST route the same way — router state is rebuilt
        * deterministically from `cells`, so it needs no persistence
        * (AnnIO round-trips exact-routing indexes; a hierarchical
        * caller re-flags after load). */
      hierarchical: Boolean = false,
      /** router depth when `hierarchical`: 1 = the √c parent layer
        * ([[graft.functions.HierarchicalProbes]]), 2 = the IMI parent
        * TREE ([[graft.functions.TreeProbes]] — grandparents over
        * parents, the rung past ~10M vectors/executor where even the
        * √c scan dominates). Persisted by AnnIO like `hierarchical`:
        * serving must route exactly as the build assigned. */
      routerLevels: Int = 1)

  /** Deterministic coarse router over a cell codebook: ⌈√c⌉ parent
    * centroids from a driver-side Lloyd over the c cell vectors (md5
    * seed order, the trainCentroids contract — c points, trivially
    * driver-sized), plus each cell's parent assignment. Rebuilt from
    * the cells on demand; never persisted. */
  private[graft] def buildRouter(
      cents: Array[Array[Float]]): (Array[Array[Float]], Array[Int]) = {
    val g = math.max(1, math.ceil(math.sqrt(cents.length.toDouble)).toInt)
    var parents = cents.zipWithIndex
      .map { case (v, i) => (md5Hex(s"router $i"), i, v) }
      .sortBy(t => (t._1, t._2))
      .take(g).map(_._3.clone())
    var it = 0
    while (it < 3) {
      val sums = Array.fill(parents.length)(new Array[Double](cents(0).length))
      val counts = new Array[Long](parents.length)
      cents.foreach { v =>
        val p = nearestCentroid(v, parents)
        counts(p) += 1
        var i = 0
        while (i < v.length) { sums(p)(i) += v(i); i += 1 }
      }
      parents = Array.tabulate(parents.length) { p =>
        if (counts(p) == 0) parents(p)
        else Array.tabulate(sums(p).length)(i => (sums(p)(i) / counts(p)).toFloat)
      }
      it += 1
    }
    val parentOf = cents.map(v => nearestCentroid(v, parents))
    (parents, parentOf)
  }

  /** Hierarchically-routed probe selection as a native expression —
    * see [[graft.functions.HierarchicalProbes]] (levels = 1) and
    * [[graft.functions.TreeProbes]] (levels = 2, the IMI parent tree).
    * `nprobe = 1` is cell assignment. */
  private[graft] def hierProbes(vec: Column, cents: Array[Array[Float]],
      nprobe: Int, parentProbes: Int = 2, levels: Int = 1): Column = {
    import org.apache.spark.sql.GraftColumnBridge
    val (parents, parentOf) = buildRouter(cents)
    // parentProbes is a FLOOR: to have a chance of covering the true
    // nprobe nearest cells, probe enough parents that their expected
    // child count is ~2× nprobe (at production shape c=4096/g=64/
    // nprobe=4 this stays at the floor 2; at degenerate small-c shapes
    // where nprobe is a large fraction of c it expands toward all
    // parents, converging to exact routing)
    val g = parents.length
    val pp = math.min(g, math.max(parentProbes,
      math.ceil(2.0 * nprobe * g / cents.length).toInt))
    if (levels >= 2) {
      // the parent layer gets its own coarse layer (same Lloyd, same
      // md5 seed order); the grand-probe floor follows the same
      // expected-coverage rule one level up
      val (grands, grandOf) = buildRouter(parents)
      val g2 = grands.length
      val gp = math.min(g2, math.max(2,
        math.ceil(2.0 * pp * g2 / g).toInt))
      GraftColumnBridge.column(graft.functions.TreeProbes(
        GraftColumnBridge.expression(vec), cents, parents, parentOf,
        grands, grandOf, nprobe, pp, gp))
    } else
      GraftColumnBridge.column(graft.functions.HierarchicalProbes(
        GraftColumnBridge.expression(vec), cents, parents, parentOf,
        nprobe, pp))
  }

  /** Build the IVF-PQ index: train both codebooks, then ONE narrow
    * encode pass over the corpus (assign cell + m sub-quantizer codes
    * per vector). */
  def buildIvfPq(corpus: DataFrame,
      idCol: String = "vec_id", vecCol: String = "embedding",
      numCentroids: Int = 16, m: Int = 4,
      pqCentroids: Int = 16, iters: Int = 0, pqIters: Int = 0,
      sampleSize: Int = 10000,
      trainDistributed: Boolean = false,
      hierarchicalRouting: Boolean = false,
      routerLevels: Int = 1): IvfPqIndex = {
    // CELL BALANCE IS A SCALE CONTRACT: routing cells grow with the
    // corpus (the flat-cell-size knob), so the training sample must
    // keep >= ~40 points per centroid or Lloyd leaves most cells
    // ill-fit and assignment SKEWS — hot cells inflate every
    // cell-keyed candidate join superlinearly (ScaleCheck measured the
    // routed knn build falling 5396 -> 1513 rows/s between 16x and 64x
    // with 1024 cells on a fixed 10k driver sample). Past the point
    // where the driver sample can grow, train distributed: each Lloyd
    // iteration is one narrow native-expression assignment pass + a
    // k-row shuffle over the WHOLE corpus.
    val spark = corpus.sparkSession
    val cents =
      if (trainDistributed)
        trainCentroidsDistributed(corpus, vecCol, numCentroids, iters,
          idCol = idCol, hierarchical = hierarchicalRouting,
          routerLevels = routerLevels)
      else
        trainCentroids(corpus, vecCol, numCentroids, iters, sampleSize,
          idCol = idCol)
    val cbs = trainPqCodebooks(corpus, vecCol, m, pqCentroids, pqIters,
      sampleSize, idCol)
    // cell assignment + PQ encode as native codegen expressions — the
    // build pass runs both once per corpus vector, and with cells ∝
    // corpus (the flat-cell-size contract) the n·numCentroids·dim
    // assignment is the build's dominant term; the boxed-Seq UDFs these
    // replaced multiplied its constant ~6× (the AdcDistance lesson,
    // re-measured on graph_knn_routed at 64×). Same arithmetic, ties to
    // the lower index — every ann_* oracle row is unchanged.
    // hierarchicalRouting removes even the linear-in-c assignment cost:
    // route via ⌈√c⌉ coarse parents, compute distances only for the
    // probed parents' children (graft.functions.HierarchicalProbes) —
    // the 100 TB shape where c itself is corpus-proportional and the
    // exact n·c pass is the build's superlinear leg (ScaleCheck: the
    // 256× ann rows' Lloyd+assignment dominated at 4096 cells).
    val assignCol =
      if (hierarchicalRouting)
        element_at(hierProbes(col(vecCol), cents, 1, levels = routerLevels), 1)
      else nearestCell(col(vecCol), cents)
    IvfPqIndex(cents, cbs,
      corpus.select(col(idCol).cast("long").as("id"),
        assignCol.as("cell"),
        pqEncode(col(vecCol), cbs).as("codes")),
      hierarchical = hierarchicalRouting,
      routerLevels = if (hierarchicalRouting) routerLevels else 1)
  }

  /** Query a built/loaded [[IvfPqIndex]]: route each query to `nprobe`
    * cells, ADC-score the candidates\' codes against the broadcast
    * codebook. The corpus side of the join is the CODES table — raw
    * vectors appear in no query-time join. */
  def queryIvfPq(index: IvfPqIndex, queries: DataFrame, k: Int,
      nprobe: Int = 4, idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    val scored = queryIvfPqCandidates(index, queries, nprobe, idCol, vecCol)
    val w = Window.partitionBy(col("query_id")).orderBy(col("adc").asc, col("id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("id"), col("adc"))
  }

  /** The candidate-scoring stage of [[queryIvfPq]] WITHOUT the top-k
    * window: route each query to its `nprobe` cells and ADC-score the
    * cell's codes. Split out because it is streamable — the cell join is
    * a stream-static equi-join (stateless), so online ANN SERVING runs
    * this in the stream and ranks per query at the sink (windows don't
    * stream). Returns [query_id, id, adc]. */
  def queryIvfPqCandidates(index: IvfPqIndex, queries: DataFrame,
      nprobe: Int = 4, idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    val probesCol =
      if (index.hierarchical)
        hierProbes(col("qvec"), index.cells, nprobe, levels = index.routerLevels)
      else centroidProbes(col("qvec"), index.cells, nprobe)
    val q = queries.select(col(idCol).cast("long").as("query_id"),
        col(vecCol).as("qvec"))
      .withColumn("cell", explode(probesCol))
    q.join(index.codes, Seq("cell"))
      .filter(col("id") =!= col("query_id"))
      .withColumn("adc", adc(col("codes"), col("qvec"), index.codebooks))
      .select(col("query_id"), col("id"), col("adc"))
  }

  /** ADC distance as a native codegen'd expression
    * ([[graft.functions.AdcDistance]]) — the per-candidate hot loop of
    * every PQ scan; a UDF here pays boxing once per (query, candidate)
    * pair, which dominated the routed knn-graph build (measured ~18 s of
    * 20 s at 32k vectors). Same arithmetic as the UDF it replaced. */
  private def adc(codes: Column, qvec: Column,
      codebooks: Array[Array[Array[Float]]]): Column = {
    import org.apache.spark.sql.GraftColumnBridge
    GraftColumnBridge.column(graft.functions.AdcDistance(
      GraftColumnBridge.expression(codes),
      GraftColumnBridge.expression(qvec), codebooks))
  }

  /** IVF cell assignment as a native codegen expression
    * ([[graft.functions.NearestCell]]) — the n·numCentroids·dim pass
    * every IVF build/Lloyd iteration runs per corpus vector; the
    * boxed-Seq UDF it replaced multiplied the constant ~6× and made the
    * routed knn-graph build SUBLINEAR in throughput at 64× replication.
    * Same double-widened sequential L2, ties to the lower index. */
  private[graft] def nearestCell(vec: Column,
      cents: Array[Array[Float]]): Column = {
    import org.apache.spark.sql.GraftColumnBridge
    GraftColumnBridge.column(graft.functions.NearestCell(
      GraftColumnBridge.expression(vec), cents))
  }

  /** Multi-probe routing as a native codegen expression
    * ([[graft.functions.CentroidProbes]]): the query's nprobe nearest
    * cells ordered by (distance, index) — exactly the stable
    * [[centroidsByDistance]] order. */
  private[graft] def centroidProbes(vec: Column, cents: Array[Array[Float]],
      nprobe: Int): Column = {
    import org.apache.spark.sql.GraftColumnBridge
    GraftColumnBridge.column(graft.functions.CentroidProbes(
      GraftColumnBridge.expression(vec), cents, nprobe))
  }

  /** PQ corpus encode as a native codegen expression
    * ([[graft.functions.PqEncode]]): per-subspace L2 argmin with the
    * exact slice semantics of the UDF it replaced. */
  private[graft] def pqEncode(vec: Column,
      codebooks: Array[Array[Array[Float]]]): Column = {
    import org.apache.spark.sql.GraftColumnBridge
    GraftColumnBridge.column(graft.functions.PqEncode(
      GraftColumnBridge.expression(vec), codebooks))
  }

  /** FILTERED routed search — [[filteredTopK]]'s 100 TB twin over the
    * IVF-PQ index: candidates come from the nprobe cell join
    * ([[queryIvfPqCandidates]], never a corpus scan), the metadata
    * predicate lands as a SEMI-JOIN on candidate ids BEFORE ranking
    * (rank inside the filtered slice — the filteredTopK contract), and
    * k fills from the probed cells' filtered survivors. A selective
    * predicate thins each probed cell, so callers raise `nprobe` to
    * hold recall — the over-fetch rule every filtered-ANN serving
    * stack documents (this entry probes 6 cells where plain ann_ivfpq
    * probes 4). The filter side is an id projection of the predicate
    * rows — broadcastable when the slice is small, a key-partitioned
    * semi-join otherwise; the planner picks. */
  def filteredIvfPqTopK(corpus: DataFrame, queries: DataFrame, k: Int,
      predicate: org.apache.spark.sql.Column, idCol: String = "vec_id",
      vecCol: String = "embedding", numCentroids: Int = 16, nprobe: Int = 6,
      m: Int = 4, pqCentroids: Int = 16, iters: Int = 0, pqIters: Int = 0,
      sampleSize: Int = 10000,
      /** pre-built index with the same parameters (the shinglesDf
        * seam) — callers sharing one IVF-PQ build across entries pass
        * it here. */
      indexOpt: Option[IvfPqIndex] = None): DataFrame = {
    val idx = indexOpt.getOrElse(buildIvfPq(corpus, idCol, vecCol,
      numCentroids, m, pqCentroids, iters, pqIters, sampleSize))
    val keep = corpus.filter(predicate)
      .select(col(idCol).cast("long").as("id"))
    val scored = queryIvfPqCandidates(idx, queries, nprobe, idCol, vecCol)
      .join(keep, Seq("id"), "left_semi")
    val w = Window.partitionBy(col("query_id")).orderBy(col("adc").asc, col("id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("id"), col("adc"))
  }

  /** IVF-PQ: the production 100 TB ANN architecture as one call —
    * [[buildIvfPq]] then [[queryIvfPq]]. See those for the plan shape. */
  def ivfPqTopK(corpus: DataFrame, queries: DataFrame, k: Int,
      idCol: String = "vec_id", vecCol: String = "embedding",
      numCentroids: Int = 16, nprobe: Int = 4, m: Int = 4,
      pqCentroids: Int = 16, iters: Int = 0, pqIters: Int = 0,
      sampleSize: Int = 10000, trainDistributed: Boolean = false,
      hierarchicalRouting: Boolean = false, routerLevels: Int = 1): DataFrame =
    queryIvfPq(
      buildIvfPq(corpus, idCol, vecCol, numCentroids, m, pqCentroids,
        iters, pqIters, sampleSize, trainDistributed, hierarchicalRouting,
        routerLevels),
      queries, k, nprobe, idCol, vecCol)

  /** INCREMENTAL index add — the daily-ingest ANN lifecycle (the
    * dedup_incremental_* pattern for vectors): a new batch is encoded
    * against the FROZEN centroids and codebooks (one narrow native-
    * expression pass over the batch — cell assignment + PQ encode, no
    * retraining, no rescan of the existing corpus) and its code rows are
    * unioned into the index's codes table. At 100 TB this is the only
    * shape that works: the standing index is a parquet codes table
    * (AnnIO), the arriving batch is the only thing that pays compute,
    * and serving sees old + new uniformly because ADC scoring depends
    * only on (cell, codes). Centroid drift is the operator's documented
    * trade — callers re-train when the batch distribution shifts, as
    * every production IVF deployment does. */
  def addToIvfPq(index: IvfPqIndex, batch: DataFrame,
      idCol: String = "vec_id", vecCol: String = "embedding"): IvfPqIndex =
    index.copy(codes = index.codes.unionByName(
      encodeIntoIndex(index, batch, idCol, vecCol)))

  /** The encode projection of [[addToIvfPq]] alone — (id, cell, codes)
    * for a batch against FROZEN centroids/codebooks. A pure stateless
    * narrow map (two native codegen expressions over broadcast
    * artifacts), so it also runs INSIDE a stream: index maintenance at
    * ingest is this projection writing to the codes store. */
  def encodeIntoIndex(index: IvfPqIndex, batch: DataFrame,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val assignCol =
      if (index.hierarchical)
        element_at(hierProbes(col(vecCol), index.cells, 1), 1)
      else nearestCell(col(vecCol), index.cells)
    batch.select(col(idCol).cast("long").as("id"),
      assignCol.as("cell"),
      pqEncode(col(vecCol), index.codebooks).as("codes"))
  }

  /** RERANK refine — the production two-stage serving pattern: IVF-PQ
    * candidate generation (cheap, compressed-domain ADC over the probed
    * cells) over-fetches `overfetch` candidates per query, then ONLY
    * those ids pay a raw-vector lookup + exact cosine, and the final
    * top-k ranks by the exact score. ADC error moves items a few
    * positions, so an R = a-few-times-k refine recovers brute-force
    * ordering at (R / corpus) of the exact cost; the raw-vector join is
    * an id-keyed equi-join against the candidate set — the corpus
    * vector table is never scanned at query time. Returns
    * [query_id, rank, id, cosine]. */
  def ivfPqRerank(corpus: DataFrame, queries: DataFrame, k: Int,
      overfetch: Int, idCol: String = "vec_id", vecCol: String = "embedding",
      numCentroids: Int = 16, nprobe: Int = 4, m: Int = 4,
      pqCentroids: Int = 16, iters: Int = 0, pqIters: Int = 0,
      sampleSize: Int = 10000): DataFrame = {
    require(overfetch >= k, s"overfetch $overfetch must be >= k $k")
    val idx = buildIvfPq(corpus, idCol, vecCol, numCentroids, m,
      pqCentroids, iters, pqIters, sampleSize)
    queryIvfPqRerank(idx, corpus, queries, k, overfetch, nprobe, idCol, vecCol)
  }

  /** The serve half of [[ivfPqRerank]] over a built/loaded index —
    * split out so persistence round-trips and incremental adds compose
    * with the refine stage. `vectors` supplies the raw embeddings for
    * the exact stage (id-keyed join on candidate ids only). */
  def queryIvfPqRerank(index: IvfPqIndex, vectors: DataFrame,
      queries: DataFrame, k: Int, overfetch: Int, nprobe: Int = 4,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val cand = queryIvfPqCandidates(index, queries, nprobe, idCol, vecCol)
    val wAdc = Window.partitionBy(col("query_id")).orderBy(col("adc").asc, col("id"))
    val shortlist = cand.withColumn("arank", row_number().over(wAdc))
      .filter(col("arank") <= overfetch)
      .select(col("query_id"), col("id"))
    val raw = vectors.select(col(idCol).cast("long").as("id"), col(vecCol).as("vec"))
    val q = queries.select(col(idCol).cast("long").as("query_id"), col(vecCol).as("qvec"))
    val exact = shortlist.join(raw, Seq("id")).join(q, Seq("query_id"))
      .withColumn("cosine", cosine(col("vec"), col("qvec")))
    val w = Window.partitionBy(col("query_id")).orderBy(col("cosine").desc, col("id"))
    exact.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("id"), col("cosine"))
  }

  private def md5Hex(s: String): String = {
    val md = java.security.MessageDigest.getInstance("MD5")
    md.digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      .map(b => f"${b & 0xff}%02x").mkString
  }

  // L2 distances accumulate in DOUBLE over double-widened floats,
  // sequential order — the same arithmetic the SQL oracle's
  // `(v::DOUBLE[] - c)²` list_sum performs, so argmin cell assignment
  // agrees across engines (ties broken by centroid index in both)
  private def nearestCentroid(v: Array[Float], cents: Array[Array[Float]]): Int = {
    var best = 0
    var bestD = Double.MaxValue
    var c = 0
    while (c < cents.length) {
      var d = 0.0
      var i = 0
      val cc = cents(c)
      while (i < v.length && i < cc.length) {
        val x = v(i).toDouble - cc(i).toDouble; d += x * x; i += 1
      }
      if (d < bestD) { bestD = d; best = c }
      c += 1
    }
    best
  }

  private def centroidsByDistance(v: Array[Float], cents: Array[Array[Float]], n: Int): Seq[Int] =
    cents.indices.map { c =>
      var d = 0.0
      var i = 0
      while (i < v.length && i < cents(c).length) {
        val x = v(i).toDouble - cents(c)(i).toDouble; d += x * x; i += 1
      }
      (c, d)
    }.sortBy(_._2).take(n).map(_._1)

  /** IVF top-k: corpus vectors are assigned to their nearest centroid cell
    * (one narrow pass over a broadcast codebook); each query probes its
    * `nprobe` nearest cells and reranks exactly inside them. The cell id
    * is the partition key — at 100 TB the join touches nprobe/numCentroids
    * of the corpus instead of all of it. Returns [query_id, rank, id,
    * cosine]. */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, k: Int,
      idCol: String = "vec_id", vecCol: String = "embedding",
      numCentroids: Int = 16, nprobe: Int = 4, iters: Int = 5,
      seed: Int = 42, trainDistributed: Boolean = false): DataFrame = {
    val spark = corpus.sparkSession
    val cents =
      if (trainDistributed)
        trainCentroidsDistributed(corpus, vecCol, numCentroids, iters, seed, idCol)
      else
        trainCentroids(corpus, vecCol, numCentroids, iters, idCol = idCol, seed = seed)
    val c = corpus.select(col(idCol).cast("long").as("id"), col(vecCol).as("vec"))
      .withColumn("cell", nearestCell(col("vec"), cents))
    val q = queries.select(col(idCol).cast("long").as("query_id"), col(vecCol).as("qvec"))
      .withColumn("cell", explode(centroidProbes(col("qvec"), cents, nprobe)))

    val scored = c.join(q, Seq("cell"))
      .filter(col("id") =!= col("query_id"))
      .withColumn("cosine", cosine(col("vec"), col("qvec")))
    val w = Window.partitionBy(col("query_id")).orderBy(col("cosine").desc, col("id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("id"), col("cosine"))
  }

  /** LSH top-k: bucket corpus and queries by hyperplane signature; rerank
    * exactly within the shared (table, bucket). Recall knobs, both
    * candidate-multiplying:
    *  - `tables` — independent hyperplane sets OR-ed together (a neighbor
    *    is missed only if it separates from the query in EVERY table);
    *    the scale-path knob, since each table stays 2^planes-selective;
    *  - `probes` — multi-probe perturbations per table by increasing
    *    Hamming distance (exact bucket, 1-bit flips, then 2-bit flips).
    * Returns [query_id, rank, id, cosine]. */
  def lshTopK(corpus: DataFrame, queries: DataFrame, k: Int,
      idCol: String = "vec_id", vecCol: String = "embedding",
      planes: Int = 12, probes: Int = 4, seed: Int = 42,
      tables: Int = 1): DataFrame = {
    val c = hyperplaneSignatures(corpus, idCol, vecCol, planes, seed, tables)
    val q0 = hyperplaneSignatures(queries, idCol, vecCol, planes, seed, tables)
      .select(col("id").as("query_id"), col("vec").as("qvec"), col("table"), col("bucket"))
    val masks = probeMasks(planes, probes)
    val q = q0.select(col("query_id"), col("qvec"), col("table"),
      explode(array(masks.map(m => col("bucket").bitwiseXOR(lit(m))): _*)).as("bucket"))

    val scored = c.join(q, Seq("table", "bucket"))
      .filter(col("id") =!= col("query_id"))
      .dropDuplicates("query_id", "id")
      .withColumn("cosine", cosine(col("vec"), col("qvec")))
    val w = Window.partitionBy(col("query_id")).orderBy(col("cosine").desc, col("id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("id"), col("cosine"))
  }

  /** Recall@k report — ANN quality measurement as a first-class
    * operator: the fraction of the exact top-k (per query) that an
    * approximate index recovered. Both inputs are [query_id, …, id]
    * top-k tables (e.g. [[bruteForceTopK]] as truth vs [[lshTopK]] /
    * [[ivfTopK]] / [[pqTopK]]); the join is on (query_id, id), sized by
    * queries × k — never corpus-sized, so the report is as cheap as the
    * indexes it grades. Queries the approximate index missed entirely
    * still report (n_hits = 0). Returns [query_id, n_hits, recall]. */
  def recallReport(exact: DataFrame, approx: DataFrame): DataFrame = {
    val t = exact.select(col("query_id"), col("id"))
    val a = approx.select(col("query_id"), col("id"))
    val hits = t.join(a, Seq("query_id", "id"))
      .groupBy(col("query_id")).agg(count(lit(1)).as("n_hits"))
    t.groupBy(col("query_id")).agg(count(lit(1)).as("n_true"))
      .join(hits, Seq("query_id"), "left")
      .select(col("query_id"),
        coalesce(col("n_hits"), lit(0L)).as("n_hits"),
        round(coalesce(col("n_hits"), lit(0L)).cast("double") /
          col("n_true"), 6).as("recall"))
  }

  /** Reciprocal rank of the FIRST relevant hit per query (relevant =
    * present in the exact top-k) — the third standard retrieval audit
    * next to [[recallReport]] and [[ndcgReport]], the one that matters
    * when only the top result is consumed (RAG context slot 1). No
    * transcendentals: first_rank is an integer min, rr one double
    * division. Queries with no hit report (0, 0.0). Returns
    * [query_id, first_rank, rr]. */
  def mrrReport(exact: DataFrame, approx: DataFrame): DataFrame = {
    val hits = approx.select(col("query_id"), col("id"), col("rank"))
      .join(exact.select(col("query_id"), col("id")), Seq("query_id", "id"))
      .groupBy(col("query_id")).agg(min(col("rank")).as("first_rank"))
    exact.select(col("query_id")).distinct()
      .join(hits, Seq("query_id"), "left")
      .select(col("query_id"),
        coalesce(col("first_rank").cast("long"), lit(0L)).as("first_rank"),
        round(when(col("first_rank").isNotNull,
          lit(1.0) / col("first_rank").cast("double"))
          .otherwise(lit(0.0)), 6).as("rr"))
  }

  /** nDCG@k of an approximate result list against the exact top-k
    * (binary relevance: a returned id is relevant iff it appears in the
    * exact list) — [[recallReport]]'s position-aware sibling: recall
    * counts hits, nDCG also penalizes putting them LOW. Discount is the
    * standard 1/log2(rank+1), written as ln(2)/ln(rank+1) so both
    * engines compose the same two ln calls (a native log2 may round
    * differently); per-query sums run in DECIMAL(28,12) — the
    * adamicAdar order-proof-sum discipline. IDCG is the exact list's
    * own DCG, so ndcg = 1.0 means brute-force ordering was recovered.
    * Returns [query_id, dcg, ndcg]. */
  def ndcgReport(exact: DataFrame, approx: DataFrame): DataFrame = {
    def disc(rank: Column): Column =
      (lit(math.log(2.0)) / log(rank.cast("double") + lit(1.0)))
        .cast("decimal(28,12)")
    val hits = approx.select(col("query_id"), col("id"), col("rank"))
      .join(exact.select(col("query_id"), col("id")), Seq("query_id", "id"))
    val dcg = hits.groupBy(col("query_id"))
      .agg(sum(disc(col("rank"))).as("dcg_d"))
    exact.groupBy(col("query_id")).agg(sum(disc(col("rank"))).as("idcg_d"))
      .join(dcg, Seq("query_id"), "left")
      .select(col("query_id"),
        round(coalesce(col("dcg_d"), lit(0)).cast("double"), 6).as("dcg"),
        round(coalesce(col("dcg_d"), lit(0)).cast("double") /
          col("idcg_d").cast("double"), 6).as("ndcg"))
  }

  /** One L2 assignment pass of `base` [id, v: array<double>] against a
    * centroid table `cents` [cell: long, cv: array<double>] — the
    * centroid side is broadcast by construction (k rows), the corpus
    * side streams: a narrow broadcast-nested-loop over k candidates per
    * vector, then a map-side-combined argmin. Distance is the
    * sequential double fold (zip_with + aggregate) the DuckDB mirror's
    * list_sum comprehension performs, ties to the lower cell index.
    * Returns [id, v, cell]. */
  private def assignCells(base: DataFrame, cents: DataFrame): DataFrame =
    base.crossJoin(broadcast(cents))
      .withColumn("d", aggregate(
        zip_with(col("v"), col("cv"), (a, b) => (a - b) * (a - b)),
        lit(0.0), (acc, x) => acc + x))
      .groupBy(col("id"))
      .agg(min_by(col("cell"), struct(col("d"), col("cell"))).as("cell"),
        first(col("v")).as("v"))
      .select(col("id"), col("v"), col("cell"))

  /** Pure-dataflow Lloyd k-means: unlike [[trainCentroids]] (bounded
    * driver sample) and [[trainCentroidsDistributed]] (distributed
    * passes but a driver-resident codebook), here the centroid table
    * NEVER leaves the cluster — each iteration is one broadcast
    * assignment pass plus one map-side-combined (cell, pos) mean, so
    * the same code runs whether k is 8 or 10^5 (where a driver codebook
    * array would be the bottleneck). The initial codebook is the
    * md5-ordered pick of [[trainCentroids]] (a k-row
    * TakeOrderedAndProject, no global sort); empty cells keep their
    * previous centroid (standard Lloyd).
    *
    * Centroid means use the events_ohlc determinism trick: an exact
    * DECIMAL(18,6) component sum (order-insensitive where a double sum
    * is last-ulp order-sensitive) followed by ONE double division —
    * bit-identical across engines and partitionings, which is what puts
    * a REAL multi-iteration k-means (not just the iters = 0 seed pick)
    * under the DuckDB oracle (PipelineSql.embedKmeans).
    *
    * Returns the final centroid table [cell, cv: array<double>]. */
  def kmeansDataflow(emb: DataFrame, k: Int, iters: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    require(k > 0 && iters >= 0)
    val base = emb.select(col(idCol).cast("long").as("id"),
        transform(col(vecCol), x => x.cast("double")).as("v"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    var cents = base
      .withColumn("h", md5(concat(lit("ivf "), col("id").cast("string"))))
      .orderBy(col("h"), col("id")).limit(k)
      .withColumn("cell",
        row_number().over(Window.orderBy(col("h"), col("id"))).cast("long") - 1)
      .select(col("cell"), col("v").as("cv"))
      .localCheckpoint(true) // k rows; cut lineage so iterations don't stack
    for (_ <- 1 to iters) {
      val means = assignCells(base, cents)
        .select(col("cell"), posexplode(col("v")).as(Seq("pos", "x")))
        .groupBy(col("cell"), col("pos"))
        .agg((sum(col("x").cast("decimal(18,6)")).cast("double") /
          count(lit(1))).as("m"))
        .groupBy(col("cell"))
        .agg(array_sort(collect_list(struct(col("pos"), col("m")))).as("pm"))
        .select(col("cell"), transform(col("pm"), p => p.getField("m")).as("cv"))
      cents = cents.select(col("cell"), col("cv").as("prev"))
        .join(means, Seq("cell"), "left")
        .select(col("cell"), coalesce(col("cv"), col("prev")).as("cv"))
        .localCheckpoint(true)
    }
    base.unpersist(false)
    cents
  }

  /** Symmetric k-NN edge table over the embedding corpus — the semantic
    * graph that graph-based curation runs on (NN-descent-style dedup,
    * label propagation, cluster discovery, [[Graph.bfsDistances]]
    * seed-expansion). Directed top-k edges [src, dst]; symmetrize at the
    * consumer (Graph ops do).
    *
    * This exact form is the QUADRATIC baseline (every vector scores
    * every other — fine at audit scale, and the codegen'd cosine keeps
    * it compute-bound); the 100 TB path is the same edge contract
    * produced by routing each vector through the IVF-PQ index
    * ([[queryIvfPq]] with the corpus as the query side): n·(n/cells)
    * candidate pairs instead of n². */
  def knnGraph(emb: DataFrame, k: Int, idCol: String = "vec_id",
      vecCol: String = "embedding",
      maxBruteForceRows: Long = 1 << 16): DataFrame = {
    // Hard size gate: the quadratic form broadcasts the WHOLE corpus as
    // the query side, so past audit scale it is an executor-OOM + O(n²)
    // trap. The limit-count below short-circuits (LocalLimit) instead of
    // scanning the corpus; callers with a bigger corpus must go through
    // [[knnGraphRouted]].
    val cap = math.min(maxBruteForceRows, Int.MaxValue - 1L)
    val n = emb.limit((cap + 1).toInt).count()
    require(n <= cap,
      s"knnGraph is the quadratic broadcast baseline and refuses corpora " +
        s"over $cap vectors (got >= $n); use Ann.knnGraphRouted, which " +
        s"routes the corpus through the IVF-PQ cell join instead")
    bruteForceTopK(emb, emb, k, idCol, vecCol)
      .select(col("query_id").as("src"), col("id").as("dst"))
  }

  /** The 100 TB k-NN graph: [[buildIvfPq]] over the corpus, then
    * [[queryIvfPq]] with the corpus itself as the query stream — a
    * cell-keyed shuffle join over the (id, cell, codes) table, so
    * candidate work is n · (nprobe/numCentroids · n/cell) instead of n²
    * and nothing corpus-sized is ever broadcast (the only broadcasts are
    * the centroid table and the PQ codebooks, both O(numCentroids · d)).
    * Same edge contract as [[knnGraph]]: directed top-k [src, dst],
    * symmetrize at the consumer. Approximate by construction — recall
    * grows with nprobe (AnnSpec pins recall@k ≥ 0.9 on the fixture). */
  def knnGraphRouted(emb: DataFrame, k: Int,
      idCol: String = "vec_id", vecCol: String = "embedding",
      numCentroids: Int = 16, nprobe: Int = 4, m: Int = 4,
      pqCentroids: Int = 16, iters: Int = 0, pqIters: Int = 0,
      sampleSize: Int = 10000, refine: Int = 4,
      trainDistributed: Boolean = false,
      hierarchicalRouting: Boolean = false,
      routerLevels: Int = 1,
      /** pre-built index with the same parameters (the shinglesDf
        * seam). */
      indexOpt: Option[IvfPqIndex] = None): DataFrame = {
    val shortlist = queryIvfPq(
      indexOpt.getOrElse(buildIvfPq(emb, idCol, vecCol, numCentroids, m,
        pqCentroids, iters, pqIters, sampleSize, trainDistributed,
        hierarchicalRouting, routerLevels)),
      emb, k * refine, nprobe, idCol, vecCol)
      .select(col("query_id"), col("id"))
    // Exact-refine (the FAISS "refine" stage): re-rank the ADC shortlist
    // by true cosine. Raw vectors are fetched for the SHORTLIST only —
    // two id-keyed equi-joins sized n·k·refine, never n² — so the
    // quantization error that blurs ADC ranks (large on near-isotropic
    // corpora where neighbor gaps are tiny) cannot cost edges the
    // shortlist already contains.
    val vecs = emb.select(col(idCol).cast("long").as("id"), col(vecCol).as("vec"))
    val reranked = shortlist
      .join(vecs, Seq("id"))
      .join(vecs.select(col("id").as("query_id"), col("vec").as("qvec")),
        Seq("query_id"))
      .withColumn("cosine", cosine(col("vec"), col("qvec")))
    val w = Window.partitionBy(col("query_id")).orderBy(col("cosine").desc, col("id"))
    reranked.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id").as("src"), col("id").as("dst"))
  }

  /** Per-dimension scalar quantization — the int8 "SQ" compression every
    * vector store ships (FAISS SQ8, Lucene/Elastic int8_hnsw, pgvector
    * halfvec cousins): one corpus pass learns per-dimension [lo, hi],
    * every vector is re-encoded as `levels`-ary codes
    * `floor((x-lo)/(hi-lo)·(levels-1))`, and the per-vector
    * reconstruction MSE is reported alongside (the quality audit that
    * decides whether SQ is safe for a corpus or PQ/float is needed).
    * Returns [id, code_md5, mse] — the md5 of the comma-joined code
    * array pins every code exactly; mse is a DECIMAL-summed (order-proof)
    * mean of squared errors rounded to 9 decimals. Degenerate dimensions
    * (hi == lo) encode 0 and reconstruct exactly.
    *
    * Shape at scale: the stats pass is one map-side-combined
    * groupBy(pos) min/max over exploded dims (d keys); the d-row result
    * rides back as broadcast literals (the driver only ever holds 2·d
    * doubles — the codebook-collect pattern), so per-dim encoding needs
    * no join. This reporting form then pays one id-keyed aggregation
    * (bounded at d rows per key) to assemble codes + the DECIMAL-exact
    * MSE; a production encode-only path is the same expressions as one
    * narrow array transform, no shuffle at all. */
  def scalarQuantize(emb: DataFrame, levels: Int = 256,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    require(levels >= 2, s"levels must be >= 2, got $levels")
    val base = emb.select(col(idCol).cast("long").as("id"),
      transform(col(vecCol), x => x.cast("double")).as("v"))
    val stats = base
      .select(posexplode(col("v")).as(Seq("pos", "x")))
      .groupBy(col("pos"))
      .agg(min(col("x")).as("lo"), max(col("x")).as("hi"))
      .orderBy(col("pos"))
      .collect() // d rows — bounded by the embedding dim, not the corpus
    val lo = typedLit(stats.map(_.getAs[Double]("lo")).toSeq)
    val hi = typedLit(stats.map(_.getAs[Double]("hi")).toSeq)
    val lmax = lit((levels - 1).toDouble)
    val ex = base.select(col("id"), posexplode(col("v")).as(Seq("pos", "x")))
      .withColumn("lo", element_at(lo, col("pos") + 1))
      .withColumn("hi", element_at(hi, col("pos") + 1))
      .withColumn("code",
        when(col("hi") === col("lo"), lit(0))
          .otherwise(least(lit(levels - 1),
            floor((col("x") - col("lo")) / (col("hi") - col("lo")) * lmax)
              .cast("int"))))
      // identical association order to the oracle: lo + code/lmax*(hi-lo)
      .withColumn("recon",
        col("lo") + col("code").cast("double") / lmax * (col("hi") - col("lo")))
      .withColumn("err2",
        (col("x") - col("recon")) * (col("x") - col("recon")))
    ex.groupBy(col("id"))
      .agg(
        md5(array_join(
          transform(array_sort(collect_list(struct(col("pos"), col("code")))),
            s => s.getField("code").cast("string")), ",")).as("code_md5"),
        round(sum(col("err2").cast("decimal(38,18)")).cast("double") /
          count(lit(1)), 9).as("mse"))
  }

  /** Encode-only form of [[scalarQuantize]]: the per-dim [lo, hi] stats
    * pass, then ONE narrow array transform producing the int code
    * vector — no explode, no shuffle (the production path
    * scalarQuantize's scaladoc promises). Returns [id, codes]. */
  def sq8Encode(emb: DataFrame, levels: Int = 256,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val (lo, hi) = sq8Stats(emb, vecCol)
    sq8EncodeWith(emb, lo, hi, levels, idCol, vecCol)
  }

  /** The SQ codebook artifact: per-dimension [lo, hi] of the corpus —
    * 2·d doubles, the entire serving state a quantized index needs
    * beyond the code table (ships as broadcast literals). */
  private[graft] def sq8Stats(emb: DataFrame,
      vecCol: String = "embedding"): (Seq[Double], Seq[Double]) = {
    val stats = emb
      .select(posexplode(transform(col(vecCol), x => x.cast("double")))
        .as(Seq("pos", "x")))
      .groupBy(col("pos"))
      .agg(min(col("x")).as("lo"), max(col("x")).as("hi"))
      .orderBy(col("pos"))
      .collect() // d rows — bounded by the embedding dim, not the corpus
    (stats.map(_.getAs[Double]("lo")).toSeq,
      stats.map(_.getAs[Double]("hi")).toSeq)
  }

  /** Encode against a FIXED codebook — one narrow array transform, no
    * shuffle, no state: the form that runs unchanged on an arriving
    * query stream (the at-ingest half of the quantized serving path). */
  private[graft] def sq8EncodeWith(df: DataFrame, loS: Seq[Double],
      hiS: Seq[Double], levels: Int = 256, idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    require(levels >= 2, s"levels must be >= 2, got $levels")
    val lo = typedLit(loS)
    val hi = typedLit(hiS)
    val lmax = lit((levels - 1).toDouble)
    df.select(col(idCol).cast("long").as("id"),
      transform(col(vecCol), (x0, i) => {
        val x = x0.cast("double")
        val l = element_at(lo, i + 1)
        val h = element_at(hi, i + 1)
        when(h === l, lit(0)).otherwise(least(lit(levels - 1),
          floor((x - l) / (h - l) * lmax).cast("int")))
      }).as("codes"))
  }

  /** Quantized brute-force top-k — search over [[sq8Encode]] int8 codes
    * by INTEGER dot product (the FAISS SQ8 / Lucene int8 serving form).
    * The ranking key is a sum of int products — BIGINT-exact on every
    * engine, so ranks carry no float tie risk at all (unlike cosine
    * ranks, which need round-then-rank care). Ties break by id.
    *
    * Shape at scale: codes are 4× smaller than float32 vectors, so the
    * corpus scan moves 4× less memory bandwidth — THE reason serving
    * fleets quantize; the plan is [[bruteForceTopK]]'s (broadcast
    * queries, one corpus-linear narrow scan, per-query bounded top-k
    * window), with the dot product a codegen'd zip_with/aggregate fold
    * over int arrays. Queries must be drawn from the same quantizer
    * (encode corpus and queries together, then split — the caller's
    * contract; mixed codebooks silently skew ranks).
    * Returns [query_id, rank, id, dot]. */
  def sq8TopK(codes: DataFrame, queries: DataFrame, k: Int): DataFrame =
    sq8Rank(sq8Score(codes, queries), k)

  /** The scoring half of [[sq8TopK]] — stateless, so it runs on an
    * arriving query stream against the static code table.
    * `broadcastQueries = false` puts the stream on the left and does
    * NOT force-broadcast the corpus-sized code side — a cross join has
    * no equi key, so the planner broadcasts the static side only at
    * the size it accepts (the dedup_url_stream rule: never force a
    * corpus-sized broadcast). */
  private[graft] def sq8Score(codes: DataFrame, queries: DataFrame,
      broadcastQueries: Boolean = true): DataFrame = {
    val c = codes.select(col("id"), col("codes"))
    val q = queries.select(col("id").as("query_id"), col("codes").as("qcodes"))
    val joined =
      if (broadcastQueries) c.crossJoin(broadcast(q))
      else q.crossJoin(c)
    joined
      .filter(col("id") =!= col("query_id"))
      .withColumn("dot",
        aggregate(zip_with(col("codes"), col("qcodes"),
            (a, b) => a.cast("long") * b.cast("long")),
          lit(0L), (acc, x) => acc + x))
      .select(col("query_id"), col("id"), col("dot"))
  }

  /** The rank half of [[sq8TopK]] — per-query bounded top-k window
    * (runs at the sink on the streamed path). */
  private[graft] def sq8Rank(scored: DataFrame, k: Int): DataFrame = {
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("dot").desc, col("id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("id"), col("dot"))
  }

  /** Reporting form of [[kmeansDataflow]] for the correctness gate: the
    * final centroids in long (cell, pos) layout with each cell's member
    * count under the FINAL codebook (one extra assignment pass; empty
    * cells report 0). Returns [cell, pos, c_val(6), n_vectors]. */
  def kmeansReport(emb: DataFrame, k: Int, iters: Int,
      idCol: String = "vec_id", vecCol: String = "embedding",
      centsDf: Option[DataFrame] = None): DataFrame = {
    // kmeansDataflow returns an eagerly localCheckpointed k-row frame —
    // re-use downstream is already free, and an extra persist() would
    // pin a cache entry nothing ever releases (cleaned by GC vs never).
    // centsDf: a pre-computed kmeansDataflow(emb, k, iters) table (the
    // shinglesDf seam) — callers running report + silhouette over the
    // same clustering train Lloyd once.
    val cents = centsDf.getOrElse(kmeansDataflow(emb, k, iters, idCol, vecCol))
    val base = emb.select(col(idCol).cast("long").as("id"),
      transform(col(vecCol), x => x.cast("double")).as("v"))
    val counts = assignCells(base, cents)
      .groupBy(col("cell")).agg(count(lit(1)).as("n_vectors"))
    cents
      .select(col("cell"), posexplode(col("cv")).as(Seq("pos", "cvv")))
      .join(counts, Seq("cell"), "left")
      .select(col("cell"), col("pos").cast("long").as("pos"),
        round(col("cvv"), 6).as("c_val"),
        coalesce(col("n_vectors"), lit(0L)).as("n_vectors"))
  }

  /** Centroid-based (simplified) silhouette of the [[kmeansDataflow]]
    * clustering — the scalable clustering-quality audit: the classic
    * silhouette's mean pairwise distances are O(n²), the centroid form
    * (a = distance to own centroid, b = distance to the nearest OTHER
    * centroid, s = (b−a)/max(a,b)) is one broadcast-centroid pass over
    * the corpus, and is the variant large-scale libraries ship for
    * exactly that reason.
    *
    * Determinism: per-point distances are the same sequential double
    * fold as the assignment step (sqrt is IEEE-exact), so s is a pure
    * deterministic per-row expression; the per-cell mean DECIMAL-sums
    * s (order-insensitive) and divides once — the kmeans recipe, so
    * the report is bit-identical across engines/partitionings. Empty
    * cells have no members and therefore no row. Returns
    * [cell, n_vectors, mean_silhouette(6)]. */
  def silhouetteReport(emb: DataFrame, k: Int, iters: Int,
      idCol: String = "vec_id", vecCol: String = "embedding",
      centsDf: Option[DataFrame] = None): DataFrame = {
    // no persist: the dataflow's k-row localCheckpoint is the barrier
    // (see kmeansReport — persist here leaked a pinned cache entry)
    val cents = centsDf.getOrElse(kmeansDataflow(emb, k, iters, idCol, vecCol))
    val base = emb.select(col(idCol).cast("long").as("id"),
      transform(col(vecCol), x => x.cast("double")).as("v"))
    val ab = assignCells(base, cents)
      .crossJoin(broadcast(cents.select(col("cell").as("c2"), col("cv"))))
      .withColumn("dist", sqrt(aggregate(
        zip_with(col("v"), col("cv"), (a, b) => (a - b) * (a - b)),
        lit(0.0), (acc, x) => acc + x)))
      .groupBy(col("id"), col("cell"))
      .agg(min(when(col("c2") === col("cell"), col("dist"))).as("a"),
        min(when(col("c2") =!= col("cell"), col("dist"))).as("b"))
    val s = when(greatest(col("a"), col("b")) === 0.0, lit(0.0))
      .otherwise((col("b") - col("a")) / greatest(col("a"), col("b")))
    ab.withColumn("s", s)
      .groupBy(col("cell"))
      .agg(count(lit(1)).as("n_vectors"),
        round(sum(col("s").cast("decimal(28,12)")).cast("double")
          / count(lit(1)), 6).as("mean_silhouette"))
      .select(col("cell"), col("n_vectors"), col("mean_silhouette"))
  }
}
