package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for large-scale training-data pipelines.
  *
  * All operators are pure DataFrame plans built for the 100 TB shape:
  * - exact: one hash-groupBy (the only full shuffle, on a short hash key)
  * - minhash-LSH: narrow per-row signature computation, then a shuffle on
  *   band keys whose fan-in is bounded by bucket size, then per-bucket
  *   pair generation — never an all-pairs join
  * - simhash: same banded-candidate shape over Hamming space
  * - n-gram Jaccard: exact verification over candidate pairs only
  * - embedding cosine: see Ann.scala for the ANN machinery it reuses
  */
object Dedup {

  /** Exact dedup: group identical `textCol` bodies (after whitespace
    * normalization) by md5; keep the smallest id as canonical. Returns
    * [fingerprint, canonical_id, dup_count, dup_ids]. */
  def exact(df: DataFrame, idCol: String = "doc_id", textCol: String = "text",
      unicodeForm: Option[String] = None): DataFrame = {
    // opt-in Unicode canonicalization BEFORE the byte-keyed hash — NFD
    // twins of the same sentence must land in one group on a real
    // multilingual crawl (TextAnalysis.unicodeNormCol; default off, so
    // the long-standing fingerprint contract is untouched)
    val base = TextAnalysis.maybeUnicodeNorm(col(textCol), unicodeForm)
    val norm = regexp_replace(trim(lower(base)), "\\s+", " ")
    df.select(col(idCol).cast("long").as("id"), md5(norm).as("fingerprint"))
      .groupBy(col("fingerprint"))
      .agg(min(col("id")).as("canonical_id"),
        count(lit(1)).as("dup_count"),
        sort_array(collect_list(col("id"))).as("dup_ids"))
  }

  /** URL-keyed exact dedup — the cheapest first-pass dedup signal a
    * crawl pipeline has, run BEFORE any content fetch/hash: group on
    * the canonical URL form ([[TextAnalysis.canonicalUrlCol]] — scheme/
    * host case, www, default ports, trailing slashes, tracking params
    * and param order all folded), keep the minimum id as canonical.
    * Same scale shape as [[exact]]: ONE hash-groupBy on a short key,
    * map-side combined. Returns
    * [canonical_url, canonical_id, dup_count, dup_ids]. */
  def urlExact(df: DataFrame, idCol: String = "doc_id",
      urlCol: String = "url"): DataFrame =
    df.select(col(idCol).cast("long").as("id"),
        TextAnalysis.canonicalUrlCol(col(urlCol)).as("canonical_url"))
      .groupBy(col("canonical_url"))
      .agg(min(col("id")).as("canonical_id"),
        count(lit(1)).as("dup_count"),
        sort_array(collect_list(col("id"))).as("dup_ids"))

  /** Word k-gram shingle set of a text column (distinct, lowercased,
    * whitespace-tokenized) — the input to minhash / jaccard. */
  def shingles(textCol: Column, k: Int): Column = {
    val toks = split(regexp_replace(trim(lower(textCol)), "\\s+", " "), " ")
    // zip_with-over-slices gram builder: constant tokenizer references
    // per row (TextAnalysis.positionalGramsCol scaladoc — the
    // transform/element_at shape re-evaluates the split per element)
    array_distinct(TextAnalysis.positionalGramsCol(toks, k))
  }

  /** MinHash signature: for hash function i, the lexicographic minimum of
    * md5(i || ' ' || shingle). String-min MD5 is deterministic across
    * engines and partitionings (and matches the DuckDB oracle); the min of
    * a uniformly-hashed set is the standard permutation approximation.
    *
    * Runs as the fused native kernel
    * ([[graft.functions.MinhashSignature]] — value-identical to the
    * previous `array(array_min(transform(…md5…)))` form, whose
    * numHashes interpreted HOF lambdas and per-(shingle, i) hex-string
    * allocations were the dominant task CPU of the minhash family). */
  def minhashSignature(shingleCol: Column, numHashes: Int): Column = {
    import org.apache.spark.sql.GraftColumnBridge
    GraftColumnBridge.column(graft.functions.MinhashSignature(
      GraftColumnBridge.expression(shingleCol), numHashes))
  }

  /** Persisted per-doc shingle table [id, sh] — the shared CPU-heavy input
    * of minhashLsh and ngramJaccard. Computing it once and passing it to
    * both (same k) shingles the corpus once instead of twice.
    *
    * repartition first: shingling (+ the downstream numHashes×md5 per
    * shingle) is the CPU hot spot; a single-file input would otherwise run
    * it in one task. Persisted because Catalyst's CollapseProject would
    * otherwise re-inline the shingle expression into every consumer
    * (measured 17 s instead of ~2 s at sf0.1). */
  def shingleTable(df: DataFrame, idCol: String = "doc_id", textCol: String = "text",
      k: Int = 3): DataFrame =
    df.repartition(df.sparkSession.sparkContext.defaultParallelism)
      .select(col(idCol).cast("long").as("id"), shingles(col(textCol), k).as("sh"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

  /** MinHash + LSH near-duplicate candidate pairs.
    *
    * signature → split into `bands` bands of numHashes/bands rows; docs
    * sharing a band hash land in one bucket (one shuffle on the band key);
    * pairs are generated per bucket and deduplicated, then scored by the
    * fraction of matching minhashes (the unbiased Jaccard estimate).
    * Returns [id_a, id_b, est_jaccard] with id_a < id_b,
    * est_jaccard >= `threshold`.
    *
    * Scale: bucket sizes are the skew risk — pathological buckets (e.g.
    * empty-text docs) are capped at `maxBucketSize` and dropped (logged
    * loudly in the plan as a filter, not silently sampled). */
  def minhashLsh(df: DataFrame, idCol: String = "doc_id", textCol: String = "text",
      shingleSize: Int = 3, numHashes: Int = 128, bands: Int = 32,
      threshold: Double = 0.5, maxBucketSize: Int = 10000,
      shinglesDf: Option[DataFrame] = None): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val rows = numHashes / bands
    // Materialization barriers matter here: without them Catalyst's
    // CollapseProject + filter pushdown inline the shingle expression into
    // every minhash transform (×numHashes) and the signature expression
    // into every band projection (×bands) — measured 17 s instead of ~2 s
    // at sf0.1. Both cached tables are small relative to the corpus
    // (shingle set / signature per doc), so the barrier is the right
    // trade at any scale.
    // The shingle-emptiness filter goes ABOVE the persist barrier — pushed
    // down it would re-evaluate shingles() on the pre-shuffle side.
    val sh = shinglesDf.getOrElse(shingleTable(df, idCol, textCol, shingleSize))
      .filter(size(col("sh")) > 0) // drop shingle-less (short/empty) docs
    val sig = sh
      .select(col("id"), minhashSignature(col("sh"), numHashes).as("sig"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    val banded = sig.select(col("id"), col("sig"),
      posexplode(array((0 until bands).map(b =>
        md5(array_join(slice(col("sig"), b * rows + 1, rows), "|"))): _*))
        .as(Seq("band", "bucket")))

    // bucket-size cap via a map-side-combined count + semi join, NOT a
    // count().over(Window.partitionBy(band, bucket)): a window would
    // materialize the pathological mega-bucket (the very thing the cap
    // drops) as one window task before filtering, and windows get no AQE
    // skew mitigation while joins do.
    val okBuckets = banded.groupBy(col("band"), col("bucket"))
      .agg(count(lit(1)).as("_bucket_n"))
      .filter(col("_bucket_n") <= maxBucketSize)
      .select(col("band"), col("bucket"))
    // persisted: feeds both sides of the candidate self-join
    val bounded = banded
      .join(okBuckets, Seq("band", "bucket"), "left_semi")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    val a = bounded.select(col("band"), col("bucket"), col("id").as("id_a"), col("sig").as("sig_a"))
    val b = bounded.select(col("band"), col("bucket"), col("id").as("id_b"), col("sig").as("sig_b"))
    val pairs = a.join(b, Seq("band", "bucket"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), col("sig_a"), col("sig_b"))
      .dropDuplicates("id_a", "id_b")

    pairs
      .withColumn("est_jaccard",
        aggregate(zip_with(col("sig_a"), col("sig_b"), (x, y) => when(x === y, 1).otherwise(0)),
          lit(0), (acc, v) => acc + v).cast("double") / numHashes)
      .filter(col("est_jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), col("est_jaccard"))
  }

  /** 64-bit SimHash over whitespace tokens: bit j of the fingerprint is
    * the sign of Σ_tokens count · (±1 per bit j of the token hash). The
    * token hash is the first 8 bytes of MD5 (big-endian uint64) — chosen
    * over murmur/xxhash because every engine computes MD5 identically, so
    * the fingerprint is DuckDB-checkable (the `dedup_simhash` oracle row:
    * `('0x' || substr(md5(token), 1, 16))::UBIGINT`). Ties (acc = 0) give
    * bit 0 on both sides. */
  def simhash(df: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    // native expression (graft.functions.SimhashBands — also the SQL
    // surface's graft_simhash): same 64-accumulator kernel the previous
    // typed map ran, minus the Dataset encoder boundary, so the scan →
    // fingerprint projection stays inside whole-stage codegen
    import org.apache.spark.sql.GraftColumnBridge
    df.select(col(idCol).cast("long").as("id"),
      GraftColumnBridge.column(graft.functions.SimhashBands(
        GraftColumnBridge.expression(col(textCol).cast("string")))).as("simhash"))
  }

  /** SimHash near-dup pairs: candidates share one of four 16-bit bands
    * (any pair within Hamming distance 3 shares a band by pigeonhole);
    * verified with an exact popcount <= `maxHamming`. */
  def simhashPairs(df: DataFrame, idCol: String = "doc_id", textCol: String = "text",
      maxHamming: Int = 3, maxBucketSize: Int = 10000): DataFrame = {
    val fp = simhash(df, idCol, textCol)
    val banded = fp.select(col("id"), col("simhash"),
      posexplode(array((0 until 4).map(b =>
        shiftrightunsigned(col("simhash"), b * 16).bitwiseAND(lit(0xffffL))): _*))
        .as(Seq("band", "bucket")))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // same skew guard as minhashLsh: a pathological band bucket (every
    // near-blank doc hashes to 0; templated corpora collapse onto few
    // fingerprints) would self-join quadratically — cap via a map-side-
    // combined count + semi join, never a window
    val okBuckets = banded.groupBy(col("band"), col("bucket"))
      .agg(count(lit(1)).as("_bucket_n"))
      .filter(col("_bucket_n") <= maxBucketSize)
      .select(col("band"), col("bucket"))
    val bounded = banded.join(okBuckets, Seq("band", "bucket"), "left_semi")
    val a = bounded.select(col("band"), col("bucket"), col("id").as("id_a"), col("simhash").as("f_a"))
    val b = bounded.select(col("band"), col("bucket"), col("id").as("id_b"), col("simhash").as("f_b"))
    a.join(b, Seq("band", "bucket"))
      .filter(col("id_a") < col("id_b"))
      .dropDuplicates("id_a", "id_b")
      .withColumn("hamming", bit_count(col("f_a").bitwiseXOR(col("f_b"))))
      .filter(col("hamming") <= maxHamming)
      .select(col("id_a"), col("id_b"), col("hamming"))
  }

  /** Edit-distance (Levenshtein) near-duplicate pairs — the
    * character-level verifier that catches what token-set measures
    * structurally miss (small in-place edits, OCR noise, version bumps:
    * Jaccard over shingles drops fast with scattered single-char edits
    * while edit distance counts exactly k).
    *
    * NEVER all-pairs: candidates come from the [[simhashPairs]]
    * pigeonhole blocking (docs sharing one of the four 16-bit SimHash
    * bands; low-edit-distance pairs perturb few token hashes, so their
    * fingerprints collide on a band), buckets are capped at
    * `maxBucketSize` (same skew guard), and a FREE length prefilter
    * (edit distance ≥ |len_a − len_b|) drops hopeless candidates before
    * any DP runs. Verification is the codegen'd builtin
    * `levenshtein(a, b, threshold)` — the thresholded form is
    * O(maxDist·len), not O(len²), and returns −1 past the bound.
    *
    * The 100 TB contract: distance is computed over the first
    * `prefixLen` chars of the normalized text — you do not Levenshtein
    * megabyte documents; cap the comparison window and let the shingle/
    * containment family own long-body near-dup. Two empty-prefix docs
    * pair at distance 0 / similarity 1. Returns
    * [id_a, id_b, edit_dist, edit_sim] with id_a < id_b,
    * edit_dist ≤ maxDist, edit_sim = 1 − dist/max(len). */
  def fuzzyEditPairs(df: DataFrame, idCol: String = "doc_id",
      textCol: String = "text", maxDist: Int = 32, prefixLen: Int = 256,
      maxBucketSize: Int = 10000): DataFrame = {
    require(maxDist >= 0 && prefixLen > 0, "maxDist >= 0, prefixLen > 0")
    // fingerprint AND comparison prefix in ONE corpus projection; the
    // prefix rides THROUGH the band self-join (the simhashPairs shape —
    // post-join id→text lookups would add two more corpus joins and
    // their exchanges, measured 8.5 s vs ~2 s warm at sf0.1)
    import org.apache.spark.sql.GraftColumnBridge
    val base = df.select(col(idCol).cast("long").as("id"),
      GraftColumnBridge.column(graft.functions.SimhashBands(
        GraftColumnBridge.expression(col(textCol).cast("string")))).as("simhash"),
      substring(TextAnalysis.normTextCol(col(textCol)), 1, prefixLen).as("p"))
    val banded = base.select(col("id"), col("p"), length(col("p")).as("l"),
        posexplode(array((0 until 4).map(b =>
          shiftrightunsigned(col("simhash"), b * 16).bitwiseAND(lit(0xffffL))): _*))
          .as(Seq("band", "bucket")))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val okBuckets = banded.groupBy(col("band"), col("bucket"))
      .agg(count(lit(1)).as("_bucket_n"))
      .filter(col("_bucket_n") <= maxBucketSize)
      .select(col("band"), col("bucket"))
    val bounded = banded.join(okBuckets, Seq("band", "bucket"), "left_semi")
    bounded.select(col("band"), col("bucket"), col("id").as("id_a"),
        col("p").as("p_a"), col("l").as("l_a"))
      .join(bounded.select(col("band"), col("bucket"), col("id").as("id_b"),
        col("p").as("p_b"), col("l").as("l_b")), Seq("band", "bucket"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), col("p_a"), col("p_b"),
        col("l_a"), col("l_b"))
      .dropDuplicates("id_a", "id_b")
      .filter(abs(col("l_a") - col("l_b")) <= maxDist)
      .withColumn("edit_dist",
        levenshtein(col("p_a"), col("p_b"), maxDist).cast("long"))
      .filter(col("edit_dist") >= 0L)
      .select(col("id_a"), col("id_b"), col("edit_dist"),
        when(greatest(col("l_a"), col("l_b")) === 0, lit(1.0))
          .otherwise(round(lit(1.0) - col("edit_dist").cast("double")
            / greatest(col("l_a"), col("l_b")).cast("double"), 6))
          .as("edit_sim"))
  }

  /** Cross-SOURCE shingle overlap — the mixture-planning audit run
    * before weighting corpora into a training mix ("how much of C4 is
    * already inside CommonCrawl?"): for every source pair, the exact
    * Jaccard overlap of their distinct word-3-gram shingle sets AND the
    * bottom-k sketch estimate of the same quantity, side by side — the
    * row self-certifies the sketch against the exact answer, which is
    * exactly how you validate the sketch before trusting it alone at
    * 100 TB (where only the sketch path is affordable).
    *
    * Scale shape: the ONLY corpus-proportional work is one distinct
    * (source, shingle-hash) shuffle (map-side combined). The exact
    * intersection is a key-partitioned self-join on the shingle hash —
    * per-key fanout is bounded by #sources² (sources are tens, not
    * millions), never corpus×corpus. The bottom-k sketch is a
    * rank-window per source (Spark plans row_number ≤ k as
    * WindowGroupLimit: each task keeps k rows before the shuffle), and
    * everything pairwise downstream is #sources²-sized. MD5 hex hashing
    * keeps the sketch engine-replayable. Returns
    * [src_a, src_b, n_inter, jaccard, sketch_jaccard] for all source
    * pairs (src_a < src_b). */
  def sourceOverlap(df: DataFrame, groupCol: String = "source",
      textCol: String = "text", shingleK: Int = 3,
      sketchK: Int = 64): DataFrame = {
    require(sketchK > 0, "sketchK must be positive")
    import org.apache.spark.sql.expressions.Window
    val h = df
      .select(col(groupCol).as("source"),
        // hash BEFORE the distinct: the one corpus-proportional shuffle
        // moves fixed-width digests, never raw shingle strings
        explode(transform(shingles(col(textCol), shingleK), s => md5(s)))
          .as("h"))
      .distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val sizes = h.groupBy(col("source")).agg(count(lit(1)).as("n"))
    val pairs = sizes.select(col("source").as("src_a"), col("n").as("n_a"))
      .join(sizes.select(col("source").as("src_b"), col("n").as("n_b")))
      .filter(col("src_a") < col("src_b"))
    val inter = h.select(col("source").as("src_a"), col("h"))
      .join(h.select(col("source").as("src_b"), col("h")), Seq("h"))
      .filter(col("src_a") < col("src_b"))
      .groupBy(col("src_a"), col("src_b")).agg(count(lit(1)).as("n_inter"))
    // bottom-k sketch per source (k smallest md5 values of the shingle
    // set); the pairwise estimate is the k-minimum-values form: of the
    // k smallest hashes in the UNION of the two sketches, the fraction
    // present in BOTH estimates J(A, B)
    val sk = h.withColumn("_rk",
        row_number().over(Window.partitionBy(col("source")).orderBy(col("h"))))
      .filter(col("_rk") <= sketchK)
      .select(col("source"), col("h"))
    val u = pairs.select(col("src_a"), col("src_b"))
      .join(sk.select(col("source").as("src_a"), col("h"), lit(1).as("in_a"),
        lit(0).as("in_b")), Seq("src_a"))
      .unionByName(pairs.select(col("src_a"), col("src_b"))
        .join(sk.select(col("source").as("src_b"), col("h"),
          lit(0).as("in_a"), lit(1).as("in_b")), Seq("src_b"))
        .select(col("src_a"), col("src_b"), col("h"), col("in_a"), col("in_b")))
      .groupBy(col("src_a"), col("src_b"), col("h"))
      .agg(max(col("in_a")).as("in_a"), max(col("in_b")).as("in_b"))
    val est = u.withColumn("_rk", row_number().over(
        Window.partitionBy(col("src_a"), col("src_b")).orderBy(col("h"))))
      .filter(col("_rk") <= sketchK)
      .groupBy(col("src_a"), col("src_b"))
      .agg((sum(col("in_a") * col("in_b")).cast("double")
        / count(lit(1)).cast("double")).as("_est"))
    pairs
      .join(inter, Seq("src_a", "src_b"), "left")
      .join(est, Seq("src_a", "src_b"), "left")
      .select(col("src_a"), col("src_b"),
        coalesce(col("n_inter"), lit(0L)).as("n_inter"),
        round(coalesce(col("n_inter"), lit(0L)).cast("double")
          / (col("n_a") + col("n_b")
            - coalesce(col("n_inter"), lit(0L))).cast("double"), 6)
          .as("jaccard"),
        round(coalesce(col("_est"), lit(0.0)), 6).as("sketch_jaccard"))
  }

  /** Exact n-gram Jaccard similarity for a given candidate-pair table
    * [id_a, id_b] (from LSH, blocking, or any generator). */
  def ngramJaccard(df: DataFrame, candidates: DataFrame,
      idCol: String = "doc_id", textCol: String = "text", n: Int = 3,
      shinglesDf: Option[DataFrame] = None): DataFrame = {
    // persisted + repartitioned: joined from both candidate endpoints and
    // CPU-heavy to compute (see shingleTable note); pass the same
    // shinglesDf used for LSH to shingle the corpus only once
    val sh = shinglesDf.getOrElse(shingleTable(df, idCol, textCol, n))
    candidates
      .join(sh.select(col("id").as("id_a"), col("sh").as("sh_a")), Seq("id_a"))
      .join(sh.select(col("id").as("id_b"), col("sh").as("sh_b")), Seq("id_b"))
      .withColumn("inter", size(array_intersect(col("sh_a"), col("sh_b"))))
      .withColumn("uni", size(array_union(col("sh_a"), col("sh_b"))))
      .select(col("id_a"), col("id_b"),
        when(col("uni") > 0, col("inter").cast("double") / col("uni"))
          .otherwise(lit(0.0)).as("jaccard"))
  }

  /** Shingle-containment near-duplicates: for an ORDERED pair (a → b),
    * C(a→b) = |S(a) ∩ S(b)| / |S(a)| — the asymmetric measure that
    * catches partial copies and quote inclusion, which symmetric Jaccard
    * structurally misses when sizes differ (a doc fully embedded in one
    * 10× longer has J ≈ 0.1 but C = 1.0). Returns every ordered pair
    * with C ≥ `threshold` as [id_a, id_b, n_common, containment].
    *
    * Candidate generation is the inverted-index self-join: explode
    * distinct shingles, join on the shingle key, count shared shingles
    * per ordered pair — each shingle is its own bucket, so the join is
    * key-partitioned and never all-pairs. The skew control: shingles in
    * more than `maxDocFreq` documents are dropped from candidate
    * generation AND from |S(a)| (a boilerplate 5-gram in 10^6 docs
    * would otherwise emit 10^12 pairs from one key — the minhashLsh
    * maxBucketSize rationale). Dropping them from both numerator and
    * denominator keeps C a true containment over the INFORMATIVE
    * shingle set; pairs sharing only ultra-common shingles are
    * sacrificed, which is the wanted behavior (those are boilerplate
    * matches, not copies). The same cut is mirrored literally in the
    * DuckDB oracle (PipelineSql.dedupContainment). */
  def containment(df: DataFrame, idCol: String = "doc_id",
      textCol: String = "text", shingleSize: Int = 3,
      threshold: Double = 0.8, maxDocFreq: Long = 1000,
      shinglesDf: Option[DataFrame] = None): DataFrame = {
    val sh = shinglesDf.getOrElse(shingleTable(df, idCol, textCol, shingleSize))
      .filter(size(col("sh")) > 0)
    val ex = sh.select(col("id"), explode(col("sh")).as("s"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val keep = ex.groupBy(col("s"))
      .agg(count(lit(1)).as("_df")) // shingles are distinct per doc
      .filter(col("_df") <= maxDocFreq)
      .select(col("s"))
    // exr re-derives from the cached explode on each use (two uses);
    // the join itself is the cheap step, the explode is the CPU one
    val exr = ex.join(keep, Seq("s"))
    val sizes = exr.groupBy(col("id")).agg(count(lit(1)).as("n_sh"))
    val common = exr.select(col("s"), col("id").as("id_a"))
      .join(exr.select(col("s"), col("id").as("id_b")), Seq("s"))
      .filter(col("id_a") =!= col("id_b"))
      .groupBy(col("id_a"), col("id_b"))
      .agg(count(lit(1)).as("n_common"))
    val out = common
      .join(sizes.select(col("id").as("id_a"), col("n_sh")), Seq("id_a"))
      .withColumn("containment", col("n_common").cast("double") / col("n_sh"))
      .filter(col("containment") >= threshold)
      .select(col("id_a"), col("id_b"), col("n_common"),
        round(col("containment"), 6).as("containment"))
    out
  }

  /** Benchmark decontamination: per corpus document, the number of
    * distinct word n-grams it shares with a benchmark/eval set's n-gram
    * pool (the standard pre-training screen against test-set leakage;
    * docs with hits ≥ some threshold are dropped or audited). Returns
    * [id, n_hits] for documents with at least one hit.
    *
    * Shape at scale: both sides shingle in one narrow HOF pass; the join
    * is keyed on the n-gram with the benchmark side aggregated to a
    * distinct set and BROADCAST by hint — benchmarks are tiny relative
    * to a 100 TB corpus by definition, and the static hint matters:
    * without it the planner picks sort-merge from (unknowable) static
    * stats, and even though AQE converts to broadcast at runtime, the
    * corpus side's exploded n-gram stream has already been WRITTEN as a
    * shuffle map stage by then — the single most expensive byte-moving
    * step the query could take. With the hint the corpus streams through
    * the join with no shuffle at all; per-doc hit counts then map-side
    * combine on id. */
  def decontaminate(corpus: DataFrame, benchmark: DataFrame, n: Int = 5,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    // repartition before shingling (the shingleTable rationale): n-gram
    // extraction is the CPU hot spot, and a few-file input would run it
    // on a few tasks regardless of core count
    val corpusSh = corpus
      .repartition(corpus.sparkSession.sparkContext.defaultParallelism)
      .select(col(idCol).cast("long").as("id"),
        explode(shingles(col(textCol), n)).as("g"))
    val benchSh = benchmark.select(explode(shingles(col(textCol), n)).as("g")).distinct()
    corpusSh.join(broadcast(benchSh), Seq("g"))
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_hits")) // shingles are distinct per doc
  }

  /** Per-document n-gram NOVELTY score against a benchmark/reference
    * pool — the scored generalization of [[decontaminate]]: instead of
    * a binary hit list, every corpus document reports what fraction of
    * its distinct word n-grams is UNSEEN in the pool
    * (novelty = 1 − hits/grams). Used two ways in a training pipeline:
    * pool = eval benchmarks → a contamination SEVERITY ranking (0.4 is
    * a different decision than 0.999); pool = the existing training
    * corpus → a redundancy score for prioritizing genuinely new
    * content from a fresh crawl.
    *
    * Same scale shape as [[decontaminate]] (one narrow shingle pass per
    * side, pool aggregated distinct and BROADCAST by hint, per-doc
    * counts map-side combined) plus one narrow per-row distinct-gram
    * count — the corpus never shuffles. Docs with no n-grams (< n
    * tokens) report zeros and a −1.0 sentinel. Returns
    * [id, n_grams, n_hits, novelty]. */
  def noveltyScore(corpus: DataFrame, benchmark: DataFrame, n: Int = 5,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val corpusSh = corpus
      .repartition(corpus.sparkSession.sparkContext.defaultParallelism)
      .select(col(idCol).cast("long").as("id"),
        explode(shingles(col(textCol), n)).as("g"))
    val benchSh = benchmark
      .select(explode(shingles(col(textCol), n)).as("g")).distinct()
    val hits = corpusSh.join(broadcast(benchSh), Seq("g"))
      .groupBy(col("id")).agg(count(lit(1)).as("n_hits"))
    corpus
      .select(col(idCol).cast("long").as("id"),
        size(shingles(col(textCol), n)).cast("long").as("n_grams"))
      .join(hits, Seq("id"), "left")
      .select(col("id"), col("n_grams"),
        coalesce(col("n_hits"), lit(0L)).as("n_hits"),
        when(col("n_grams") === 0L, lit(-1.0))
          .otherwise(round(lit(1.0)
            - coalesce(col("n_hits"), lit(0L)).cast("double")
            / col("n_grams").cast("double"), 6)).as("novelty"))
  }

  /** The benchmark pool as a driver-held gram set — the broadcast
    * artifact of the [[noveltyScore]] serve (benchmark pools are
    * eval-suite-sized by contract, orders below the corpus). */
  def collectGramPool(benchmark: DataFrame, n: Int,
      textCol: String = "text"): Set[String] =
    benchmark.select(explode(shingles(col(textCol), n)).as("g")).distinct()
      .collect().map(_.getString(0)).toSet

  /** [[noveltyScore]] SERVED — arriving docs score statelessly against
    * the broadcast gram pool: the gram array comes from the SAME
    * [[shingles]] column expression as the batch plan (zero
    * tokenization-parity risk), only the pool membership count moves
    * into a broadcast-HashSet fold (the classify_nb_stream lesson — a
    * typedlit pool would scan linearly per lookup). Rounding replays
    * the batch round(1 − hits/grams, 6); gram-less docs keep the −1.0
    * sentinel. Returns [id, n_grams, n_hits, novelty]. */
  def noveltyScoreStream(stream: DataFrame, pool: Set[String], n: Int = 5,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val spark = stream.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(pool)
    stream.select(col(idCol).cast("long"), shingles(col(textCol), n).as("gs"))
      .as[(Long, Seq[String])]
      .mapPartitions { it =>
        val p = bc.value
        it.map { case (id, gs) =>
          val nG = gs.length.toLong
          val nH = gs.count(p.contains).toLong
          val nov =
            if (nG == 0L) -1.0
            else java.math.BigDecimal
              .valueOf(1.0 - nH.toDouble / nG.toDouble)
              .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
          (id, nG, nH, nov)
        }
      }
      .toDF("id", "n_grams", "n_hits", "novelty")
  }

  /** Incremental exact dedup — the daily-ingest primitive: dedup a NEW
    * batch against the historical fingerprint INDEX (one row per known
    * content hash with its canonical doc) without rescanning the
    * corpus, and within itself. Each batch doc is labeled
    * `dup_of_corpus` (content already indexed — `dup_of` = the index's
    * canonical id), `dup_in_batch` (first seen earlier IN THIS BATCH —
    * `dup_of` = the batch-min id for the hash), or `new` (`dup_of` =
    * −1; its fingerprint is what the caller appends to the index).
    * Returns [id, fingerprint, status, dup_of].
    *
    * Shape at scale: the batch is a day's ingest — orders of magnitude
    * smaller than the corpus — so the index join is the batch streamed
    * against the (bucketed-by-fingerprint, ideally — see
    * [[graft.sources.Bucketing]]) index table on the hash key; the
    * within-batch resolution is one batch-sized groupBy-min. The corpus
    * is never read, only its index. */
  def incrementalExact(index: DataFrame, batch: DataFrame,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val norm = regexp_replace(trim(lower(col(textCol))), "\\s+", " ")
    incrementalByKey(index.select(col("fingerprint"), col("canonical_id")),
      batch.select(col(idCol).cast("long").as("id"),
        md5(norm).as("fingerprint")),
      "fingerprint")
  }

  /** Incremental URL-keyed dedup — [[incrementalExact]] on the
    * canonical URL form ([[TextAnalysis.canonicalUrlCol]]): a day's
    * crawl frontier resolves against the historical canonical-URL
    * index (built by [[urlExact]]) BEFORE any content is fetched — the
    * cheapest possible skip. Same statuses/sentinels as the content
    * form. Returns [id, canonical_url, status, dup_of]. */
  def incrementalUrl(index: DataFrame, batch: DataFrame,
      idCol: String = "doc_id", urlCol: String = "url"): DataFrame =
    incrementalByKey(
      index.select(col("canonical_url"), col("canonical_id")),
      batch.select(col(idCol).cast("long").as("id"),
        TextAnalysis.canonicalUrlCol(col(urlCol)).as("canonical_url")),
      "canonical_url")

  /** The shared keyed resolution of the incremental-exact family:
    * `index` = [key, canonical_id], `batch` = [id, key]. The batch is
    * a day's ingest — orders of magnitude smaller than the corpus — so
    * the index join streams the batch against the key-bucketed index
    * and the within-batch half is one batch-sized groupBy-min. */
  private[graft] def incrementalByKey(index: DataFrame, batch: DataFrame,
      keyName: String): DataFrame = {
    val firsts = batch.groupBy(col(keyName))
      .agg(min(col("id")).as("__batch_first"))
    resolveIncrementalJoined(
      batch.join(index.select(col(keyName),
          col("canonical_id").as("__corpus_canon")), Seq(keyName), "left")
        .join(firsts, Seq(keyName)), keyName)
  }

  /** The status half of [[incrementalByKey]] over a pre-joined
    * [id, key, __corpus_canon, __batch_first] frame — split out so the
    * streamed URL twin can run the corpus join AT INGEST and this
    * resolution at the sink. */
  private[graft] def resolveIncrementalJoined(joined: DataFrame,
      keyName: String): DataFrame =
    joined.select(col("id"), col(keyName),
      when(col("__corpus_canon").isNotNull, "dup_of_corpus")
        .when(col("__batch_first") < col("id"), "dup_in_batch")
        .otherwise("new").as("status"),
      when(col("__corpus_canon").isNotNull, col("__corpus_canon"))
        .when(col("__batch_first") < col("id"), col("__batch_first"))
        .otherwise(lit(-1L)).as("dup_of"))

  /** The persisted-index half of incremental NEAR-dup: banded minhash
    * signatures of the historical corpus — one row per (doc, band) with
    * the band's bucket key and the doc's full signature:
    * [id, sig, band, bucket]. Written once (ideally bucketed on
    * `bucket` — [[graft.sources.Bucketing]]) and appended to as batches
    * resolve; [[incrementalMinhash]] joins a new batch's band keys
    * against it. Shares [[shingleTable]]/[[minhashSignature]] with
    * [[minhashLsh]], so index and one-shot band keys cannot drift. */
  def minhashIndex(df: DataFrame, idCol: String = "doc_id",
      textCol: String = "text", shingleSize: Int = 3, numHashes: Int = 128,
      bands: Int = 32): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val rows = numHashes / bands
    // same materialization barrier as minhashLsh: without it the
    // signature expression inlines into every band projection (×bands)
    val sig = shingleTable(df, idCol, textCol, shingleSize)
      .filter(size(col("sh")) > 0)
      .select(col("id"), minhashSignature(col("sh"), numHashes).as("sig"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    sig.select(col("id"), col("sig"),
      posexplode(array((0 until bands).map(b =>
        md5(array_join(slice(col("sig"), b * rows + 1, rows), "|"))): _*))
        .as(Seq("band", "bucket")))
  }

  /** Incremental NEAR-dup — [[incrementalExact]]'s minhash twin, the
    * daily-ingest primitive for non-verbatim copies: resolve a NEW
    * batch's band keys against the persisted signature index
    * ([[minhashIndex]]) and against itself, without rescanning the
    * corpus. Each batch doc is labeled `dup_of_corpus` (shares a band
    * bucket with an indexed doc and estimated Jaccard >= `threshold` —
    * `dup_of` = the smallest matching corpus id), `dup_in_batch` (no
    * corpus match, but a SMALLER-id batch doc matches — `dup_of` = the
    * smallest such id), or `new` (`dup_of` = −1, `est_jaccard` = −1
    * sentinel; its index rows are what the caller appends). Returns
    * [id, status, dup_of, est_jaccard].
    *
    * Shape at scale: the batch is a day's ingest, so the corpus-side
    * work is the batch's band keys streamed against the bucketed index
    * on (band, bucket) — the corpus itself is never read. Both joins
    * carry the [[minhashLsh]] degenerate-bucket cap (applied to the
    * index side and to the batch self-join). */
  def incrementalMinhash(index: DataFrame, batch: DataFrame,
      idCol: String = "doc_id", textCol: String = "text",
      shingleSize: Int = 3, numHashes: Int = 128, bands: Int = 32,
      threshold: Double = 0.5, maxBucketSize: Int = 10000): DataFrame = {
    val bIdx = minhashIndex(batch, idCol, textCol, shingleSize, numHashes,
        bands)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val cCand = corpusNearDupCandidates(bIdx,
      cappedIndexSide(index, maxBucketSize), numHashes, threshold)
    resolveIncrementalMinhash(batch.select(col(idCol).cast("long").as("id")),
      cCand, bIdx, numHashes, threshold, maxBucketSize)
  }

  /** Estimated Jaccard between two equal-length minhash signatures —
    * the matching-position fraction (shared by the batch operator and
    * the streamed serve, so the verify arithmetic cannot drift). */
  def estJaccard(a: Column, b: Column, numHashes: Int): Column =
    aggregate(zip_with(a, b, (x, y) => when(x === y, 1).otherwise(0)),
      lit(0), (acc, v) => acc + v).cast("double") / numHashes

  /** The static join side of the incremental corpus probe: the
    * signature index with over-populated (band, bucket) keys dropped —
    * the corpus is where degenerate buckets accumulate over time, and
    * capping the STATIC side keeps the stream-static join's per-key
    * fan-out bounded too. */
  def cappedIndexSide(index: DataFrame, maxBucketSize: Int): DataFrame = {
    val okIdx = index.groupBy(col("band"), col("bucket"))
      .agg(count(lit(1)).as("_n")).filter(col("_n") <= maxBucketSize)
      .select(col("band"), col("bucket"))
    index.join(okIdx, Seq("band", "bucket"), "left_semi")
      .select(col("band"), col("bucket"), col("id").as("cid"),
        col("sig").as("csig"))
  }

  /** Corpus-match candidates of a batch's banded signatures against the
    * (already capped) index side: band-key equi-join, per-(bid, cid)
    * dedup, estimated-Jaccard verify. Stateless — the same projection
    * runs as a stream-static join in the streamed serve. Returns
    * [bid, cid, est]. */
  def corpusNearDupCandidates(bIdx: DataFrame, cappedIndex: DataFrame,
      numHashes: Int, threshold: Double): DataFrame =
    bIdx
      .select(col("band"), col("bucket"), col("id").as("bid"),
        col("sig").as("bsig"))
      .join(cappedIndex, Seq("band", "bucket"))
      .dropDuplicates("bid", "cid")
      .withColumn("est", estJaccard(col("bsig"), col("csig"), numHashes))
      .filter(col("est") >= threshold)
      .select(col("bid"), col("cid"), col("est"))

  /** Resolution stage shared by [[incrementalMinhash]] and the streamed
    * serve: within-batch banded self-join (capped) + the status rules —
    * corpus match (min cid) wins, then min smaller-id batch match, else
    * 'new' with −1 sentinels. `ids` = one row per batch doc (docs with
    * no shingles resolve to 'new' via the left joins). */
  def resolveIncrementalMinhash(ids: DataFrame, cCand: DataFrame,
      bIdx: DataFrame, numHashes: Int, threshold: Double,
      maxBucketSize: Int): DataFrame = {
    val cRes = cCand.groupBy(col("bid"))
      .agg(min_by(struct(col("cid"), col("est")), col("cid")).as("m"))
      .select(col("bid"), col("m.cid").as("corpus_of"), col("m.est").as("corpus_est"))
    val okB = bIdx.groupBy(col("band"), col("bucket"))
      .agg(count(lit(1)).as("_n")).filter(col("_n") <= maxBucketSize)
      .select(col("band"), col("bucket"))
    val bounded = bIdx.join(okB, Seq("band", "bucket"), "left_semi")
    val bCand = bounded
      .select(col("band"), col("bucket"), col("id").as("id_a"), col("sig").as("sig_a"))
      .join(bounded.select(col("band"), col("bucket"), col("id").as("id_b"),
        col("sig").as("sig_b")), Seq("band", "bucket"))
      .filter(col("id_a") < col("id_b"))
      .dropDuplicates("id_a", "id_b")
      .withColumn("est", estJaccard(col("sig_a"), col("sig_b"), numHashes))
      .filter(col("est") >= threshold)
    val bRes = bCand.groupBy(col("id_b").as("bid"))
      .agg(min_by(struct(col("id_a"), col("est")), col("id_a")).as("m"))
      .select(col("bid"), col("m.id_a").as("batch_of"), col("m.est").as("batch_est"))
    ids
      .join(cRes, col("id") === cRes("bid"), "left").drop("bid")
      .join(bRes, col("id") === bRes("bid"), "left").drop("bid")
      .select(col("id"),
        when(col("corpus_of").isNotNull, "dup_of_corpus")
          .when(col("batch_of").isNotNull, "dup_in_batch")
          .otherwise("new").as("status"),
        coalesce(col("corpus_of"), col("batch_of"), lit(-1L)).as("dup_of"),
        round(coalesce(col("corpus_est"), col("batch_est"), lit(-1.0)), 6)
          .as("est_jaccard"))
  }

  /** The persisted-index half of incremental EDIT-DISTANCE near-dup —
    * [[fuzzyEditPairs]]'s daily-ingest form: one row per (doc, SimHash
    * 16-bit band) carrying the doc's comparison prefix, so a new
    * batch's band keys can probe it without touching the corpus text.
    * Pure narrow projection (works unchanged on an unbounded stream).
    * Returns [id, p, l, band, bucket]. */
  def fuzzyEditIndex(df: DataFrame, idCol: String = "doc_id",
      textCol: String = "text", prefixLen: Int = 256): DataFrame = {
    import org.apache.spark.sql.GraftColumnBridge
    df.select(col(idCol).cast("long").as("id"),
        GraftColumnBridge.column(graft.functions.SimhashBands(
          GraftColumnBridge.expression(col(textCol).cast("string"))))
          .as("simhash"),
        substring(TextAnalysis.normTextCol(col(textCol)), 1, prefixLen).as("p"))
      .select(col("id"), col("p"), length(col("p")).as("l"),
        posexplode(array((0 until 4).map(b =>
          shiftrightunsigned(col("simhash"), b * 16).bitwiseAND(lit(0xffffL))): _*))
          .as(Seq("band", "bucket")))
  }

  /** The static side of the incremental fuzzy probe: the prefix index
    * with over-populated (band, bucket) keys dropped (the
    * [[cappedIndexSide]] rationale — degenerate buckets accumulate on
    * the corpus side over time). */
  def cappedFuzzyIndexSide(index: DataFrame, maxBucketSize: Int): DataFrame = {
    val ok = index.groupBy(col("band"), col("bucket"))
      .agg(count(lit(1)).as("_n")).filter(col("_n") <= maxBucketSize)
      .select(col("band"), col("bucket"))
    index.join(ok, Seq("band", "bucket"), "left_semi")
      .select(col("band"), col("bucket"), col("id").as("cid"),
        col("p").as("cp"), col("l").as("cl"))
  }

  /** Corpus-match candidates of a batch's banded prefixes against the
    * (already capped) index side: band equi-join, per-(bid, cid) dedup,
    * length prefilter, thresholded-Levenshtein verify. Stateless — runs
    * as a stream-static join in the streamed serve. Returns
    * [bid, cid, d]. */
  def corpusFuzzyCandidates(bIdx: DataFrame, cappedIndex: DataFrame,
      maxDist: Int): DataFrame =
    bIdx.select(col("band"), col("bucket"), col("id").as("bid"),
        col("p").as("bp"), col("l").as("bl"))
      .join(cappedIndex, Seq("band", "bucket"))
      .dropDuplicates("bid", "cid")
      .filter(abs(col("bl") - col("cl")) <= maxDist)
      .withColumn("d", levenshtein(col("bp"), col("cp"), maxDist).cast("long"))
      .filter(col("d") >= 0L)
      .select(col("bid"), col("cid"), col("d"))

  /** Incremental EDIT-DISTANCE near-dup — the [[incrementalMinhash]]
    * twin at the character level (the crawl-frontier dedup for OCR
    * noise / version bumps): resolve a NEW batch against the persisted
    * prefix index ([[fuzzyEditIndex]]) and against itself, without
    * rescanning the corpus. Status rules and sentinels mirror
    * incrementalMinhash (`dup_of_corpus` → min matching corpus id,
    * `dup_in_batch` → min smaller batch id, else `new` with −1s).
    * Returns [id, status, dup_of, edit_dist]. */
  def incrementalFuzzyEdit(index: DataFrame, batch: DataFrame,
      idCol: String = "doc_id", textCol: String = "text", maxDist: Int = 32,
      prefixLen: Int = 256, maxBucketSize: Int = 10000): DataFrame = {
    val bIdx = fuzzyEditIndex(batch, idCol, textCol, prefixLen)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val cCand = corpusFuzzyCandidates(bIdx,
      cappedFuzzyIndexSide(index, maxBucketSize), maxDist)
    resolveIncrementalFuzzy(batch.select(col(idCol).cast("long").as("id")),
      cCand, bIdx, maxDist, maxBucketSize)
  }

  /** Resolution stage shared by [[incrementalFuzzyEdit]] and the
    * streamed serve — the [[resolveIncrementalMinhash]] rules over
    * edit distance. */
  def resolveIncrementalFuzzy(ids: DataFrame, cCand: DataFrame,
      bIdx: DataFrame, maxDist: Int, maxBucketSize: Int): DataFrame = {
    val cRes = cCand.groupBy(col("bid"))
      .agg(min_by(struct(col("cid"), col("d")), col("cid")).as("m"))
      .select(col("bid"), col("m.cid").as("corpus_of"), col("m.d").as("corpus_d"))
    val okB = bIdx.groupBy(col("band"), col("bucket"))
      .agg(count(lit(1)).as("_n")).filter(col("_n") <= maxBucketSize)
      .select(col("band"), col("bucket"))
    val bounded = bIdx.join(okB, Seq("band", "bucket"), "left_semi")
    val bCand = bounded
      .select(col("band"), col("bucket"), col("id").as("id_a"),
        col("p").as("p_a"), col("l").as("l_a"))
      .join(bounded.select(col("band"), col("bucket"), col("id").as("id_b"),
        col("p").as("p_b"), col("l").as("l_b")), Seq("band", "bucket"))
      .filter(col("id_a") < col("id_b"))
      .dropDuplicates("id_a", "id_b")
      .filter(abs(col("l_a") - col("l_b")) <= maxDist)
      .withColumn("d", levenshtein(col("p_a"), col("p_b"), maxDist).cast("long"))
      .filter(col("d") >= 0L)
    val bRes = bCand.groupBy(col("id_b").as("bid"))
      .agg(min_by(struct(col("id_a"), col("d")), col("id_a")).as("m"))
      .select(col("bid"), col("m.id_a").as("batch_of"), col("m.d").as("batch_d"))
    ids
      .join(cRes, col("id") === cRes("bid"), "left").drop("bid")
      .join(bRes, col("id") === bRes("bid"), "left").drop("bid")
      .select(col("id"),
        when(col("corpus_of").isNotNull, "dup_of_corpus")
          .when(col("batch_of").isNotNull, "dup_in_batch")
          .otherwise("new").as("status"),
        coalesce(col("corpus_of"), col("batch_of"), lit(-1L)).as("dup_of"),
        coalesce(col("corpus_d"), col("batch_d"), lit(-1L)).as("edit_dist"))
  }

  /** [[decontaminate]]'s 100 TB-benchmark shape: the benchmark n-gram
    * pool rides as a BLOOM FILTER instead of a broadcast set — ~10 bits
    * per n-gram at fpp=1% versus tens of bytes for the string set, so a
    * 10⁸–10⁹-n-gram eval suite still fits executor memory where the
    * exact set would not. The corpus stream takes a NARROW might-contain
    * pre-filter (Spark's own runtime-filter machinery:
    * `BloomFilterAggregate` builds the filter distributed + mergeable,
    * `BloomFilterMightContain` probes it codegen'd over xxhash64 — the
    * exact expressions AQE injects for runtime join pruning, wired
    * through the same bridge as the native cosine kernel; zero UDFs),
    * and only the surviving sliver pays the EXACT g-keyed verify join
    * that removes bloom false positives. Output is IDENTICAL to
    * [[decontaminate]] — same [id, n_hits] contract, same oracle SQL —
    * only the plan shape differs. */
  def decontaminateBloom(corpus: DataFrame, benchmark: DataFrame, n: Int = 5,
      fpp: Double = 0.01, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    import org.apache.spark.sql.GraftColumnBridge
    import org.apache.spark.sql.catalyst.expressions.Literal
    val benchSh = benchmark
      .select(explode(shingles(col(textCol), n)).as("g")).distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nBench = math.max(benchSh.count(), 1L) // also materializes the persist
    // size the filter from fpp explicitly — the (child, estimatedItems)
    // constructor would silently use Spark's default 3% and leave the
    // fpp knob dead
    val numBits = org.apache.spark.util.sketch.BloomFilter
      .optimalNumOfBits(nBench, fpp)
    val bloomBytes = benchSh
      .agg(GraftColumnBridge.column(
        new org.apache.spark.sql.catalyst.expressions.aggregate
          .BloomFilterAggregate(
            GraftColumnBridge.expression(xxhash64(col("g"))),
            org.apache.spark.sql.catalyst.expressions.Literal(nBench),
            org.apache.spark.sql.catalyst.expressions.Literal(numBits))
          .toAggregateExpression()).as("bf"))
      .head.getAs[Array[Byte]](0)
    val mightContain = GraftColumnBridge.column(
      new org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(
        Literal(bloomBytes),
        GraftColumnBridge.expression(xxhash64(col("g")))))
    val candidates = corpus
      .repartition(corpus.sparkSession.sparkContext.defaultParallelism)
      .select(col(idCol).cast("long").as("id"),
        explode(shingles(col(textCol), n)).as("g"))
      .filter(mightContain)
    val out = candidates.join(benchSh, Seq("g")) // exact verify: kills FPs
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_hits")) // shingles are distinct per doc
    out
  }

  /** Corpus-self boilerplate n-grams: word n-grams appearing in at least
    * `minDocs` distinct documents (headers, footers, license blurbs,
    * navigation chrome — the removal list a curation pipeline builds
    * before span-level cleaning). Returns [g, n_docs].
    *
    * Shape at scale: same as decontaminate's corpus side — repartition,
    * narrow HOF shingling, then ONE map-side-combined distinct-doc count
    * per n-gram; the ≥ minDocs filter keeps the result boilerplate-sized
    * (broadcastable back for span removal). */
  def boilerplateNgrams(corpus: DataFrame, n: Int = 5, minDocs: Long = 10,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    corpus
      .repartition(corpus.sparkSession.sparkContext.defaultParallelism)
      .select(col(idCol).cast("long").as("id"),
        explode(shingles(col(textCol), n)).as("g"))
      .groupBy(col("g"))
      .agg(count(lit(1)).as("n_docs")) // shingles are distinct per doc
      .filter(col("n_docs") >= minDocs)

  /** Apply a boilerplate removal list (the [[boilerplateNgrams]] output)
    * to text: excise every span covered by a listed word n-gram — the
    * curation step the list exists for. A token is removed iff some
    * listed n-gram starts at a position p with p <= pos < p + n; spans
    * union (overlapping boilerplate removes once). Returns
    * [id, scrubbed, n_removed] over the normalized (lowercased,
    * whitespace-collapsed) text.
    *
    * Shape at scale — no UDF, no driver collect:
    *  1. positional n-grams via the same narrow HOF as [[shingles]]
    *     (repartition first: the CPU hot spot);
    *  2. hit positions = gram join against the BROADCAST removal list
    *     (boilerplate-sized by construction — the >= minDocs filter);
    *  3. covered positions per doc: explode each hit's n-token span,
    *     collect_set per doc — hit-docs-sized, not corpus-sized;
    *  4. one doc-keyed left join back, then a narrow indexed-HOF filter
    *     + array_join rebuilds the text. */
  def boilerplateScrub(corpus: DataFrame, ngrams: DataFrame, n: Int = 5,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val toksCol = split(regexp_replace(trim(lower(col(textCol))), "\\s+", " "), " ")
    val grams = corpus
      .repartition(corpus.sparkSession.sparkContext.defaultParallelism)
      .select(col(idCol).cast("long").as("id"),
        posexplode(TextAnalysis.positionalGramsCol(toksCol, n))
          .as(Seq("p", "g")))
    val covered = grams
      .join(broadcast(ngrams.select(col("g"))), Seq("g"))
      .select(col("id"), explode(sequence(col("p"), col("p") + lit(n - 1))).as("j"))
      .groupBy(col("id"))
      .agg(collect_set(col("j")).as("cov"))
    corpus
      .select(col(idCol).cast("long").as("id"), toksCol.as("toks"))
      .join(covered, Seq("id"), "left")
      .select(col("id"),
        coalesce(col("cov"), typedLit(Array.empty[Int])).as("cov"),
        col("toks"))
      .select(col("id"),
        array_join(filter(col("toks"), (_, i) => !array_contains(col("cov"), i)), " ")
          .as("scrubbed"),
        size(col("cov")).cast("long").as("n_removed"))
  }

  /** CCNet-style line-level corpus dedup: every line whose normalized
    * form (lowercased, whitespace-collapsed) already occurred earlier in
    * the corpus — in (doc_id, line_idx) order, across documents AND
    * within one — is excised; the globally-first occurrence survives.
    * This is the shard-level line dedup CCNet/RefinedWeb run before
    * document-level near-dup: navigation chrome, cookie banners and
    * repeated headers vanish without touching unique prose. Blank lines
    * are structural and always kept. Returns [id, scrubbed, n_removed].
    *
    * Shape at scale: lines explode in a narrow pass (repartition first —
    * the CPU hot spot); the first-occurrence table is ONE
    * map-side-combined min(struct) per line-hash; the decision join is
    * keyed on the line hash (both sides hash-partition, no broadcast
    * needed — the key table is corpus-sized); reassembly is one doc-keyed
    * collect_list. Three shuffles total, all map-side combined, skew
    * bounded by the hottest line's occurrence count (a groupBy-min, not
    * a join explosion). */
  def lineDedup(corpus: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val lines = corpus
      .repartition(corpus.sparkSession.sparkContext.defaultParallelism)
      .select(col(idCol).cast("long").as("id"),
        posexplode(split(col(textCol), "\n")).as(Seq("idx", "line")))
      .withColumn("norm",
        regexp_replace(trim(lower(col("line"))), "\\s+", " "))
      .withColumn("blank", length(col("norm")) === 0)
      .withColumn("key", md5(col("norm")))
    val firsts = lines.where(!col("blank"))
      .groupBy(col("key"))
      .agg(min(struct(col("id"), col("idx"))).as("first"))
    lines
      .join(firsts, Seq("key"), "left")
      .withColumn("keep", col("blank") ||
        (col("first").getField("id") === col("id") &&
          col("first").getField("idx") === col("idx")))
      .groupBy(col("id"))
      .agg(
        sum(when(col("keep"), 0L).otherwise(1L)).as("n_removed"),
        collect_list(struct(col("idx"), col("keep"), col("line"))).as("ls"))
      .select(col("id"),
        array_join(
          transform(filter(array_sort(col("ls")), s => s.getField("keep")),
            s => s.getField("line")), "\n").as("scrubbed"),
        col("n_removed"))
  }

  /** Winnowing-based near-dup candidate pairs: documents sharing at
    * least `minShared` distinct winnowing fingerprint VALUES
    * ([[TextAnalysis.winnowing]]) — the LOCAL-overlap detector the
    * minhash/simhash family misses (global Jaccard dilutes a copied
    * paragraph inside a long document; winnowing's density guarantee
    * fires on any shared run of ≥ w+k−1 tokens). Returns
    * [id_a, id_b, n_shared], id_a < id_b.
    *
    * Shape at scale: identical to the minhash band join — the
    * fingerprint table is fp-keyed; fingerprints in more than
    * `maxDocFreq` docs are dropped BEFORE the self-join (the df cap
    * that keeps a boilerplate fingerprint from exploding into a
    * quadratic bucket), then one map-side-combined pair count. */
  def winnowingPairs(corpus: DataFrame, k: Int = 3, w: Int = 4,
      minShared: Int = 2, maxDocFreq: Int = 50,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val fps = TextAnalysis.winnowing(corpus, k, w, idCol, textCol)
      .select(col("id"), col("fp")).distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val keep = fps.groupBy(col("fp"))
      .agg(count(lit(1)).as("__df"))
      .where(col("__df") <= maxDocFreq)
      .select(col("fp"))
    val kf = fps.join(keep, Seq("fp"))
    val out = kf.as("a")
      .join(kf.as("b"),
        col("a.fp") === col("b.fp") && col("a.id") < col("b.id"))
      .groupBy(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .agg(count(lit(1)).as("n_shared"))
      .where(col("n_shared") >= minShared)
    out
  }

  /** Resolve near-duplicate PAIRS into duplicate CLUSTERS — the step
    * between LSH pair output and actual removal (keep one doc per
    * component of the pair graph). Distributed min-label propagation
    * with POINTER JUMPING: every node starts labeled with its own id;
    * each round a node takes the min of (its label, its neighbors'
    * labels, its label's label). The third term is the pointer-doubling
    * step — the label forest's paths halve every round, so convergence
    * is O(log n) rounds even on a long chain (templated docs with
    * sliding edits — realistic at 100 TB), where plain neighbor
    * propagation needs diameter rounds. At fixpoint the label is the
    * component's minimum id — which doubles as the canonical survivor.
    * Returns [id, cluster_id].
    *
    * Scale: each round is two node-sized joins + one edge-sized
    * groupBy(min) — map-side combined, AQE-skew-mitigated, no
    * driver-side union-find over the node set. ONE Spark action per
    * round: the changed-count is folded into the label table and read
    * off the same job that materializes the round's lazy localCheckpoint
    * (lineage cut, so the plan never stacks `maxRounds` joins).
    *
    * Never silently truncates: if labels are still moving after
    * `maxRounds` rounds, throws IllegalStateException rather than
    * emitting non-converged cluster ids (pointer jumping makes the
    * default 30 rounds ≈ 2^30-node components — unreachable in
    * practice, so a raise means a bug, not a tuning problem). */
  def duplicateClusters(pairs: DataFrame, idA: String = "id_a",
      idB: String = "id_b", maxRounds: Int = 30): DataFrame =
    // the generic pointer-jumping engine lives in Graph.connectedComponents
    // (same loop, arbitrary vertex type); this wrapper fixes the long-id
    // contract and the [id, cluster_id] output shape
    Graph.connectedComponents(
        pairs.select(col(idA).cast("long").as("src"),
          col(idB).cast("long").as("dst")),
        maxRounds = maxRounds)
      .select(col("vertex").as("id"), col("component").as("cluster_id"))

  /** Quality-aware survivor selection over near-dup clusters: instead of
    * the min-id canonical [[duplicateClusters]] keeps, each cluster
    * elects the member maximizing `scoreCol` (ties → smallest id) — the
    * curation practice of keeping the LONGEST / highest-quality copy of
    * a duplicated page rather than an arbitrary one (boilerplate-stripped
    * mirrors often carry more body text than the canonical URL). Input:
    * the near-dup pair table; output one row per clustered doc
    * [id, cluster_id, keep_id, kept] — docs outside any cluster are
    * implicitly their own survivors and don't appear.
    *
    * Shape at scale: pointer-jumping CC (O(log n) rounds) + ONE
    * cluster-keyed max_by aggregation over the duplicate-sized member
    * table (never corpus-sized) joined back to members — no windows.
    * `scoreCol` must be integer-typed for engine-exact election
    * (lengths, token counts); float scores should be pre-rounded. */
  def keepBest(docs: DataFrame, pairs: DataFrame, scoreCol: Column,
      idCol: String = "doc_id", idA: String = "id_a",
      idB: String = "id_b"): DataFrame = {
    val clusters = duplicateClusters(pairs, idA, idB)
    val scored = docs.select(col(idCol).cast("long").as("id"),
      scoreCol.cast("long").as("__score"))
    val members = clusters.join(scored, "id")
    val winners = members.groupBy(col("cluster_id"))
      .agg(max_by(col("id"), struct(col("__score"), -col("id")))
        .as("keep_id"))
    members.join(winners, "cluster_id")
      .select(col("id"), col("cluster_id"), col("keep_id"),
        (col("id") === col("keep_id")).as("kept"))
  }

  /** Embedding near-duplicates: pairs with cosine >= threshold, using the
    * ANN LSH bucketing (random-hyperplane) to avoid all-pairs at scale.
    *
    * Skew guard (same as [[minhashLsh]]/[[simhashPairs]]): a degenerate
    * bucket — near-zero vectors sign-tie onto one signature, templated
    * embeddings collapse onto few — would self-join quadratically, so
    * buckets over `maxBucketSize` are dropped via a map-side-combined
    * count + semi join (never a window: a window would materialize the
    * mega-bucket as one task before filtering). */
  def embeddingNearDup(emb: DataFrame, idCol: String = "vec_id", vecCol: String = "embedding",
      threshold: Double = 0.95, planes: Int = 16, seed: Int = 42,
      maxBucketSize: Int = 10000): DataFrame = {
    val sig = Ann.hyperplaneSignature(emb, idCol, vecCol, planes, seed)
    val okBuckets = sig.groupBy(col("bucket"))
      .agg(count(lit(1)).as("_bucket_n"))
      .filter(col("_bucket_n") <= maxBucketSize)
      .select(col("bucket"))
    val bounded = sig.join(okBuckets, Seq("bucket"), "left_semi")
    val a = bounded.select(col("bucket"), col("id").as("id_a"), col("vec").as("v_a"))
    val b = bounded.select(col("bucket"), col("id").as("id_b"), col("vec").as("v_b"))
    a.join(b, Seq("bucket"))
      .filter(col("id_a") < col("id_b"))
      .dropDuplicates("id_a", "id_b")
      .withColumn("cosine", Ann.cosine(col("v_a"), col("v_b")))
      .filter(col("cosine") >= threshold)
      .select(col("id_a"), col("id_b"), col("cosine"))
  }

  /** The persisted-index artifact of [[incrementalEmbedding]]: one
    * (id, bucket, vec) row per corpus vector — the random-hyperplane
    * signature table ([[Ann.hyperplaneSignature]], deterministic md5
    * planes so any engine/day recomputes the same buckets). Store it
    * bucketed on `bucket` for an exchange-light daily probe. */
  def embeddingIndex(emb: DataFrame, planes: Int = 16, seed: Int = 42,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame =
    Ann.hyperplaneSignature(emb, idCol, vecCol, planes, seed)

  /** Persisted-index incremental EMBEDDING near-dup — the daily ingest
    * loop on the semantic fingerprint (the [[incrementalMinhash]] twin
    * for vectors): every batch vector signatures with the SAME planes
    * as the index, resolves its nearest corpus match (bucket-keyed
    * candidates, exact-cosine verify ≥ `threshold`, best by rounded
    * cosine DESC then id — the rank-on-rounded recipe), then the
    * within-batch (id_a < id_b) pass; statuses dup_of_corpus /
    * dup_in_batch / new with −1 sentinels and the matched cosine.
    * Bucket caps apply on BOTH sides (degenerate buckets accumulate in
    * the static index over time — the cappedIndexSide reasoning).
    * The corpus is never rescanned; the signature index is the only
    * historical state. Returns [vec_id, status, dup_of, cosine]. */
  def incrementalEmbedding(index: DataFrame, batch: DataFrame,
      threshold: Double = 0.9, planes: Int = 16, seed: Int = 42,
      maxBucketSize: Int = 10000, idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    // persisted: the signature pass feeds its cap count plus every join
    // side (the incrementalPhash lifetime contract — released by the
    // caller's clearCache)
    val bSig = Ann.hyperplaneSignature(batch, idCol, vecCol, planes, seed)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val okIdx = index.groupBy(col("bucket")).agg(count(lit(1)).as("_n"))
      .filter(col("_n") <= maxBucketSize).select(col("bucket"))
    val iB = index.join(okIdx, Seq("bucket"), "left_semi")
      .select(col("bucket"), col("id").as("cid"), col("vec").as("cv"))
    val scored = bSig.select(col("bucket"), col("id"), col("vec"))
      .join(iB, Seq("bucket"))
      .withColumn("cos", round(Ann.cosine(col("vec"), col("cv")), 6))
      .select(col("id"), col("cid"), col("cos"))
    resolveIncrementalEmbedding(bSig, scored, threshold, maxBucketSize)
  }

  /** The resolution half of [[incrementalEmbedding]] over a
    * pre-computed signature table (`bSig` = [id, bucket, vec]) and
    * scored corpus candidates (`corpusScored` = [id, cid, cos], one
    * row per bucket-keyed candidate, cos ROUNDED 6) — split out so the
    * streamed twin (StreamReplay.embeddingDedupServe) can run the
    * signature + broadcast-index probe + cosine AT INGEST and this
    * batch-bounded resolution at the sink. */
  private[graft] def resolveIncrementalEmbedding(bSig: DataFrame,
      corpusScored: DataFrame, threshold: Double,
      maxBucketSize: Int): DataFrame = {
    val cRes = corpusScored
      .dropDuplicates("id", "cid")
      .filter(col("cos") >= threshold)
      .groupBy(col("id"))
      .agg(min_by(struct(col("cid"), col("cos")),
        struct((-col("cos")).as("nc"), col("cid"))).as("m"))
      .select(col("id"), col("m.cid").as("corpus_of"),
        col("m.cos").as("corpus_cos"))
    val okB = bSig.groupBy(col("bucket")).agg(count(lit(1)).as("_n"))
      .filter(col("_n") <= maxBucketSize).select(col("bucket"))
    val bounded = bSig.join(okB, Seq("bucket"), "left_semi")
    val bRes = bounded
      .select(col("bucket"), col("id").as("id_a"), col("vec").as("va"))
      .join(bounded.select(col("bucket"), col("id").as("id_b"),
        col("vec").as("vb")), Seq("bucket"))
      .filter(col("id_a") < col("id_b"))
      .dropDuplicates("id_a", "id_b")
      .withColumn("cos", round(Ann.cosine(col("va"), col("vb")), 6))
      .filter(col("cos") >= threshold)
      .groupBy(col("id_b").as("id"))
      .agg(min_by(struct(col("id_a"), col("cos")),
        struct((-col("cos")).as("nc"), col("id_a"))).as("m"))
      .select(col("id"), col("m.id_a").as("batch_of"),
        col("m.cos").as("batch_cos"))
    bSig.select(col("id")).distinct()
      .join(cRes, Seq("id"), "left")
      .join(bRes, Seq("id"), "left")
      .select(col("id").as("vec_id"),
        when(col("corpus_of").isNotNull, "dup_of_corpus")
          .when(col("batch_of").isNotNull, "dup_in_batch")
          .otherwise("new").as("status"),
        coalesce(col("corpus_of"), col("batch_of"), lit(-1L)).as("dup_of"),
        when(col("corpus_of").isNotNull, col("corpus_cos"))
          .when(col("batch_of").isNotNull, col("batch_cos"))
          .otherwise(lit(-1.0)).as("cosine"))
  }

  /** SemDeDup (Abbas et al. 2023, "SemDeDup: Data-efficient learning at
    * web-scale through semantic deduplication"): cluster the embedding
    * space into `numCells` spherical cells (cosine argmax against a
    * deterministic md5-seeded codebook — Ann.trainCentroidsSpherical),
    * then prune within each cell: a vector is REMOVED when a lower-id
    * vector in its cell sits above the cosine threshold; its kept
    * representative is the smallest such id.
    *
    * Scale shape: the codebook is tiny and broadcast; assignment is one
    * narrow pass; the candidate join is keyed on `cell`, so the quadratic
    * blowup is bounded per cell (numCells is the knob — at 100 TB you run
    * 10k–100k cells so each cell holds ~corpus/numCells vectors, and the
    * cell key partitions the join; this is exactly the published
    * formulation, k-means cells then intra-cell pairwise). Cosine cell
    * assignment is scale-invariant, which is what makes the planted
    * ×2-scaled duplicates of the dedup_semantic entry provably co-cell
    * with their originals (power-of-two float scaling commutes exactly
    * with the double cosine).
    *
    * Returns [removed_id, kept_id, cell, cosine(kept, removed)]. */
  def semanticDedup(emb: DataFrame, idCol: String = "vec_id",
      vecCol: String = "embedding", numCells: Int = 16,
      threshold: Double = 0.9, iters: Int = 0, sampleSize: Int = 10000,
      seed: Int = 42): DataFrame = {
    val cents = Ann.trainCentroidsSpherical(emb, vecCol, numCells, iters, sampleSize, idCol)
    // native codegen argmax (graft.functions.CosineArgmax) — the cell
    // assignment is once-per-corpus-vector, the exact shape where the
    // boxed-Seq UDF this replaced dominated (the AdcDistance precedent);
    // same double-fold loop as Ann.nearestCentroidCosine, so cells
    // cannot drift from the trainer's own assignments
    import org.apache.spark.sql.GraftColumnBridge
    val assigned = emb
      .select(col(idCol).cast("long").as("id"), col(vecCol).as("vec"))
      .withColumn("cell", GraftColumnBridge.column(
        graft.functions.CosineArgmax(
          GraftColumnBridge.expression(col("vec")), cents)))
    val a = assigned.select(col("cell"), col("id").as("id_a"), col("vec").as("v_a"))
    val b = assigned.select(col("cell"), col("id").as("id_b"), col("vec").as("v_b"))
    val dup = a.join(b, Seq("cell"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("cosine", Ann.cosine(col("v_a"), col("v_b")))
      .filter(col("cosine") >= threshold)
      .select(col("cell"), col("id_a"), col("id_b"), col("cosine"))
    val rem = dup.groupBy(col("id_b").as("removed_id"))
      .agg(min(col("id_a")).as("kept_id"))
    rem.join(dup,
        rem("removed_id") === dup("id_b") && rem("kept_id") === dup("id_a"))
      .select(col("removed_id"), col("kept_id"), col("cell"), col("cosine"))
  }

  /** Maximal duplicated token SPANS between document pairs — the
    * distributed stand-in for suffix-array exact-substring dedup (Lee
    * et al. 2022 deduplicate long verbatim copies, not whole docs):
    * where [[containment]] scores a pair and [[winnowingPairs]] counts
    * shared fingerprints, this returns the actual copied regions
    * (start offsets + length per side), i.e. what a span-level scrub
    * would cut. Exact for spans ≥ `k` tokens whose every k-gram anchor
    * survives the `maxDocFreq` cap: a shared span of S tokens
    * contributes S−k+1 consecutive k-gram anchors on one alignment
    * diagonal (posA − posB constant), so coalescing consecutive anchors
    * per (pair, diagonal) reconstructs the maximal span. Spans shorter
    * than `k` are invisible by construction, and a span containing a
    * corpus-wide-boilerplate k-gram in its interior (df > maxDocFreq)
    * splits at the capped anchor into shorter runs that may fall under
    * `minSpanTokens` — the df cap trades that recall for not seeding
    * candidates from boilerplate.
    *
    * Shape at scale: one positional-k-gram pass (narrow), a
    * document-frequency cap that bars corpus-wide boilerplate grams
    * from seeding candidates (the [[containment]] df cut), a
    * hash-keyed inverted-index self-join (bucketed by gram hash, never
    * all-pairs), and a run-coalescing window partitioned by
    * (pair, diagonal) — span-local, no global sort. Gram keys travel
    * as 16-hex md5 prefixes (64-bit), not gram text. Within-doc gram
    * repetition multiplies anchors inside a bucket; upstream
    * [[boilerplateNgrams]]/repetition gating bounds that in a curation
    * chain. Returns [doc_a, doc_b, start_a, start_b, span_tokens]
    * (0-based token offsets, doc_a < doc_b). */
  def duplicatedSpans(df: DataFrame, k: Int = 8, minSpanTokens: Int = 12,
      maxDocFreq: Int = 8, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    require(minSpanTokens >= k, s"minSpanTokens ($minSpanTokens) must be >= k ($k)")
    val toks = TextAnalysis.tokensCol(col(textCol))
    val grams = df.filter(length(trim(col(textCol))) > 0)
      .select(col(idCol).cast("long").as("id"),
        posexplode(TextAnalysis.positionalGramsCol(toks, k)).as(Seq("pos", "g")))
      .select(col("id"), col("pos").cast("long").as("pos"),
        substring(md5(col("g")), 1, 16).as("h"))
    val keep = grams.groupBy(col("h"))
      .agg(countDistinct(col("id")).as("df_h"))
      .filter(col("df_h") <= maxDocFreq).select(col("h"))
    val kg = grams.join(keep, Seq("h"))
    val cand = kg.as("a").join(kg.as("b"),
        col("a.h") === col("b.h") && col("a.id") < col("b.id"))
      .select(col("a.id").as("doc_a"), col("b.id").as("doc_b"),
        col("a.pos").as("pos_a"), col("b.pos").as("pos_b"))
      .withColumn("diag", col("pos_a") - col("pos_b"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_a"), col("doc_b"), col("diag"))
      .orderBy(col("pos_a"))
    cand.withColumn("run", col("pos_a") - row_number().over(w))
      .groupBy(col("doc_a"), col("doc_b"), col("diag"), col("run"))
      .agg(min(col("pos_a")).as("start_a"), min(col("pos_b")).as("start_b"),
        (count(lit(1)) + lit(k - 1).cast("long")).as("span_tokens"))
      .filter(col("span_tokens") >= minSpanTokens)
      .select(col("doc_a"), col("doc_b"), col("start_a"), col("start_b"),
        col("span_tokens"))
  }

  /** Span-level dedup ACTION over [[duplicatedSpans]] — the Lee et al.
    * remove-the-copy step: the lower-id doc of every span pair keeps
    * its text, the higher-id doc excises the copied region. Per doc,
    * overlapping/adjacent intervals from different pairs merge first
    * (running-max-end window — span-local, partitioned by doc), then
    * the token positions inside any merged interval drop and the
    * survivor text is digested in token order. Only docs that lose at
    * least one span appear. Returns
    * [doc_id, n_spans, n_removed, scrubbed_md5] (n_spans counts MERGED
    * intervals; the md5 hash-checks every kept token and its order —
    * the boilerplate-scrub contract).
    *
    * Shape at scale: intervals are pair-count sized (tiny next to the
    * corpus) and ride as ONE array row per affected doc, joined once
    * against the doc's token array — coverage is a per-token `exists`
    * over that array, so a doc's tokens are scanned exactly once no
    * matter how many intervals hit it (never tokens × intervals). */
  def duplicatedSpanScrub(df: DataFrame, k: Int = 8, minSpanTokens: Int = 12,
      maxDocFreq: Int = 8, idCol: String = "doc_id",
      textCol: String = "text",
      spansDf: Option[DataFrame] = None): DataFrame = {
    // spansDf: a pre-computed [[duplicatedSpans]] table (the shinglesDf
    // pattern) — the scrub's interval math is identical either way; a
    // caller running spans + scrub over the same corpus builds the
    // inverted index once instead of twice
    val spans = spansDf.getOrElse(duplicatedSpans(df, k, minSpanTokens,
      maxDocFreq, idCol, textCol))
    val iv = spans.select(col("doc_b").as("id"), col("start_b").as("s"),
      (col("start_b") + col("span_tokens") - lit(1L)).as("e"))
    val wOrd = org.apache.spark.sql.expressions.Window
      .partitionBy(col("id")).orderBy(col("s"), col("e"))
    val pm = max(col("e")).over(wOrd.rowsBetween(
      org.apache.spark.sql.expressions.Window.unboundedPreceding, -1))
    val merged = iv
      .withColumn("ng", when(pm.isNull || col("s") > pm, 1L).otherwise(0L))
      .withColumn("gid", sum(col("ng")).over(wOrd.rowsBetween(
        org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)))
      .groupBy(col("id"), col("gid"))
      .agg(min(col("s")).as("s"), max(col("e")).as("e"))
    // one interval-ARRAY row per affected doc (interval counts are
    // pair-bounded — tiny), joined ONCE against the unexploded token
    // array; coverage is a narrow per-token exists() over the broadcast-
    // sized array. The former shape (positional-token explode × interval
    // rows) replayed a heavily-copied doc's whole token stream once per
    // merged interval.
    val ivArr = merged.groupBy(col("id"))
      .agg(count(lit(1)).as("n_spans"),
        collect_list(struct(col("s"), col("e"))).as("ivs"))
    val docs = df.filter(length(trim(col(textCol))) > 0)
      .select(col(idCol).cast("long").as("id"),
        TextAnalysis.tokensCol(col(textCol)).as("toks"))
    docs.join(ivArr, Seq("id"))
      .withColumn("kept", filter(col("toks"), (t, p) =>
        !exists(col("ivs"), iv =>
          p.cast("long") >= iv.getField("s") &&
            p.cast("long") <= iv.getField("e"))))
      .select(col("id").as(idCol), col("n_spans"),
        (size(col("toks")) - size(col("kept"))).cast("long").as("n_removed"),
        md5(array_join(col("kept"), " ")).as("scrubbed_md5"))
  }
}
