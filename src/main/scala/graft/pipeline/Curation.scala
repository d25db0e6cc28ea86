package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** One-call training-data curation — the pipeline analogue of the
  * `graft.Artm` facade: quality/language gating, PII and boilerplate
  * scrubbing, exact + near-duplicate removal, deterministic source
  * mixing, and sequence packing, composed from the individually
  * oracle-verified operators in [[TextAnalysis]] / [[Dedup]] /
  * [[Sampling]].
  *
  * Composition choices that matter at 100 TB:
  *  - the narrow per-row gates (quality, language, PII) run FIRST, at
  *    scan speed, so every shuffle downstream sees only survivors;
  *  - the shingle table is computed ONCE and shared between minhash
  *    LSH and any Jaccard verification (the CPU hot spot —
  *    [[Dedup.shingleTable]]);
  *  - near-dup removal keeps each cluster's canonical (minimum-id)
  *    member via [[Dedup.duplicateClusters]] — pointer-jumping, raises
  *    on non-convergence rather than emitting wrong survivors;
  *  - mixing/packing are deterministic functions of the row keys
  *    ([[Sampling]]), so the same config reproduces the same corpus on
  *    any cluster.
  *
  * Each stage is optional through [[Curation.Config]]; disabled stages
  * cost nothing (no plan nodes emitted). */
object Curation {

  /** Stage knobs; defaults give a reasonable mid-strictness pipeline.
    *  - `languages`: empty = no language gate;
    *  - `boilerplateMinDocs`: 0 = skip boilerplate scrubbing;
    *  - `entropyMax`: 0 = skip the char-entropy band gate;
    *  - `lmPerplexityMax`: 0 = skip the model-based LM gate;
    *  - `nearDupThreshold`: ≥ 1.0 = exact dedup only;
    *  - `mixRates`: empty = keep all sources;
    *  - `packBudget`: 0 = no packing. */
  case class Config(
      /** Unicode normalization form ("NFC"/"NFKC"/…) applied to the
        * text column BEFORE any gate or hash — the canonical-form pass
        * a multilingual crawl needs so composed/decomposed twins of
        * the same sentence collapse under exact/near dedup
        * ([[TextAnalysis.unicodeNormCol]]). None = off (default;
        * existing hash contracts unchanged). */
      unicodeForm: Option[String] = None,
      /** C4 line-level cleaning ([[TextAnalysis.c4CleanGate]]): each
        * line must carry `c4MinWordsPerLine` tokens, end in terminal
        * punctuation, and not mention "javascript"; pages containing
        * "lorem ipsum" or a code brace drop, as do pages with fewer
        * than `c4MinKeptLines` surviving lines. The text column is
        * REWRITTEN to the survivors. 0 = off (default). Runs before
        * the quality score (a narrow per-row stage) so downstream
        * gates see the cleaned body. */
      c4MinWordsPerLine: Int = 0,
      c4MinKeptLines: Int = 2,
      minQuality: Double = 0.3,
      /** Character-entropy band gate ([[TextAnalysis.charEntropy]]):
        * docs whose char Shannon entropy falls OUTSIDE
        * [entropyMin, entropyMax] drop — low tail = template/repeat
        * spam, high tail = base64/encrypted blobs. Both 0 = off
        * (default). A narrow per-row gate, so it runs in stage 1 at
        * scan speed with the quality score. */
      entropyMin: Double = 0.0,
      entropyMax: Double = 0.0,
      languages: Set[String] = Set.empty,
      piiRedact: Boolean = true,
      boilerplateN: Int = 5,
      boilerplateMinDocs: Long = 0L,
      lmPerplexityMax: Double = 0.0,
      lmAddK: Double = 0.1,
      shingleK: Int = 3,
      numHashes: Int = 128,
      bands: Int = 32,
      nearDupThreshold: Double = 0.8,
      mixRates: Map[String, Double] = Map.empty,
      /** Per-source TOKEN budgets ([[Sampling.tokenBudget]]) — the way
        * training mixtures are actually specced; applied after
        * `mixRates` (use one or the other, or rates as a coarse gate
        * then budgets as the exact floor). ALLOWLIST semantics, exactly
        * like `mixRates`: sources absent from the map are DROPPED — to
        * cap one source and keep the rest, list every source (unbounded
        * ones with Long.MaxValue). Empty = off. NOTE this stage
        * pins a persist of the ranged survivor corpus (the two-pass
        * prefix-sum layout); release it with
        * [[Sampling.unpersistPacked]] on the curated output once
        * materialized — the same contract as `packBudget`. */
      tokenBudgets: Map[String, Long] = Map.empty,
      salt: String = "curation",
      packBudget: Long = 0L,
      packWholeDocs: Boolean = false)

  /** Run the configured pipeline. Returns the curated documents —
    * original columns plus `quality` (and `lang_pred` when the language
    * gate is on, `bin`/`cum_before` when chunk packing is on, `group`/`bin`/`bin_fill`/`oversize` for whole-doc packing), with `textCol`
    * rewritten by the enabled scrub stages. */
  def curate(docs: DataFrame, cfg: Config = Config(),
      idCol: String = "doc_id", textCol: String = "text",
      sourceCol: String = "source"): DataFrame = {

    // ---- 0. opt-in Unicode canonical form (narrow, codegen'd) — runs
    //         before every gate/hash so NFD twins collapse downstream ----
    val input = cfg.unicodeForm.fold(docs)(f =>
      docs.withColumn(textCol, TextAnalysis.unicodeNormCol(col(textCol), f)))

    // ---- 0b. opt-in C4 line-level clean (narrow, zero-shuffle) — the
    //          text column is rewritten to the surviving lines so every
    //          downstream gate/hash sees the cleaned body ----
    val cleaned = if (cfg.c4MinWordsPerLine > 0)
      TextAnalysis.c4CleanGate(input, textCol, cfg.c4MinWordsPerLine,
        cfg.c4MinKeptLines)
    else input

    // ---- 1. narrow per-row gates + scrubs (scan-speed, no shuffle) ----
    var d = TextAnalysis.qualityScore(cleaned, textCol)
      .filter(col("quality") >= cfg.minQuality)
      .drop("n_chars_q", "n_tokens_q", "punct_ratio", "stopword_ratio",
        "mean_token_len", "repetition_ratio")
    if (cfg.entropyMax > 0.0)
      d = TextAnalysis.charEntropyGate(d, textCol, cfg.entropyMin,
        cfg.entropyMax)
    if (cfg.languages.nonEmpty)
      d = d.withColumn("lang_pred", TextAnalysis.langPredCol(col(textCol)))
        .filter(col("lang_pred").isin(cfg.languages.toSeq: _*))
    if (cfg.piiRedact)
      d = d.withColumn(textCol, TextAnalysis.piiScrubCol(col(textCol)))

    // ---- 2. corpus-self boilerplate excision (optional) ----
    if (cfg.boilerplateMinDocs > 0L) {
      val bl = Dedup.boilerplateNgrams(d, cfg.boilerplateN,
        cfg.boilerplateMinDocs, idCol, textCol)
      val scrubbed = Dedup.boilerplateScrub(d, bl, cfg.boilerplateN, idCol, textCol)
        .select(col("id"), col("scrubbed"))
      d = d.join(scrubbed, d(idCol) === scrubbed("id"))
        .drop("id").withColumn(textCol, col("scrubbed")).drop("scrubbed")
    }

    // The gated/scrubbed corpus feeds several downstream branches (the
    // canonical-survivor join consumes it twice; the near-dup stage
    // shingles it and joins back) — persist once so the narrow gate
    // lineage is not re-scanned per branch. Deliberately not unpersisted
    // here: the returned plan still reads it lazily; callers drop it via
    // clearCache()/unpersist when the curated output is materialized.
    d = d.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    // ---- 2b. model-based LM gate (optional): drop docs whose bigrams
    //          are rare under the gated corpus's own distribution —
    //          corpus-trained, so it runs on the persisted survivor set
    //          (TextAnalysis.lmPerplexity scaladoc for the shapes) ----
    if (cfg.lmPerplexityMax > 0.0) {
      val drop = TextAnalysis.lmPerplexity(d, cfg.lmAddK, textCol, idCol)
        .filter(col("ppl") > cfg.lmPerplexityMax)
        .select(col(idCol).as("_lm_drop"))
      d = d.join(drop, d(idCol) === col("_lm_drop"), "left_anti")
    }

    // ---- 3. exact dedup: keep each fingerprint group's canonical ----
    val canon = Dedup.exact(d, idCol, textCol).select(col("canonical_id"))
    d = d.join(canon, d(idCol) === canon("canonical_id"), "left_semi")

    // ---- 4. near-dup removal (optional): LSH pairs -> clusters ->
    //         keep the canonical (minimum-id) member of each cluster ----
    if (cfg.nearDupThreshold < 1.0) {
      val sh = Dedup.shingleTable(d, idCol, textCol, cfg.shingleK)
      val pairs = Dedup.minhashLsh(d, idCol, textCol, cfg.shingleK,
        cfg.numHashes, cfg.bands, cfg.nearDupThreshold, shinglesDf = Some(sh))
      val drop = Dedup.duplicateClusters(pairs)
        .filter(col("id") =!= col("cluster_id")) // non-canonical members
        .select(col("id"))
      d = d.join(drop, d(idCol) === drop("id"), "left_anti")
      sh.unpersist(false)
    }

    // ---- 5. deterministic source mixing (optional) ----
    if (cfg.mixRates.nonEmpty)
      d = Sampling.mixSources(d, sourceCol, cfg.mixRates, idCol, cfg.salt)

    // ---- 5b. per-source token budgets (optional): the exact-floor
    //          mixture spec; keyed two-phase prefix sum, never a
    //          per-source window ----
    if (cfg.tokenBudgets.nonEmpty) {
      val counted = d.withColumn("_tb_tokens",
        size(split(trim(lower(col(textCol))), "\\s+")).cast("long"))
      d = Sampling.tokenBudget(counted, sourceCol, "_tb_tokens",
          cfg.tokenBudgets, idCol, cfg.salt)
        .drop("_tb_tokens", "cum_before")
    }

    // ---- 6. sequence packing (optional): concat-and-chunk by default,
    //         whole-document best-fit when attention boundaries must not
    //         cross documents ----
    if (cfg.packBudget > 0L) {
      val counted = TextAnalysis.tokenCounts(d, textCol).drop("bpeish_tokens")
      d = if (cfg.packWholeDocs)
        Sampling.packBestFit(counted, "ws_tokens", cfg.packBudget,
          idCol = idCol, salt = cfg.salt)
      else
        Sampling.packSequences(counted, "ws_tokens", cfg.packBudget,
          orderCol = idCol)
    }
    d
  }

  /** Write the curated corpus with an explicit file layout — the knobs
    * that decide whether a 100 TB output is readable: `partitionBy`
    * yields partition-pruned directories (a downstream mixture job
    * reading one source touches one directory), `maxRecordsPerFile`
    * bounds file size so no task writes a multi-GB file (Spark splits
    * writer tasks at the limit — the standard guard against few-huge-
    * file outputs that destroy downstream scan parallelism). Rows are
    * clustered by `idCol` within each file, so range predicates on the
    * id prune row groups via parquet min/max stats. */
  def writeCurated(df: DataFrame, path: String,
      partitionBy: Seq[String] = Seq("source"),
      maxRecordsPerFile: Long = 0L, idCol: String = "doc_id"): Unit = {
    val cols = partitionBy.filter(df.columns.contains)
    var w = df.sortWithinPartitions(idCol).write.mode("overwrite")
    if (maxRecordsPerFile > 0L)
      w = w.option("maxRecordsPerFile", maxRecordsPerFile)
    if (cols.nonEmpty) w = w.partitionBy(cols: _*)
    w.parquet(path)
  }
}
