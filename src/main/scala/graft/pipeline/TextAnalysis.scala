package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Text-analysis operators for training-data pipelines: language ID,
  * quality scoring, token counting, fingerprinting. All narrow per-row
  * columnar transforms (whole-stage codegen, zero shuffles) — at 100 TB
  * these run at scan speed with filters/projections pushed to parquet. */
object TextAnalysis {

  /** Tiny per-language function-word lists for the n-gram/stopword
    * heuristic. Real pipelines plug their own lists; the operator shape
    * (per-language hit counting + argmax) is what matters. */
  val defaultStopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is", "that", "it", "for"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "ein", "zu", "mit", "von"),
    "fr" -> Seq("le", "la", "les", "et", "est", "un", "une", "des", "du", "que"),
    "es" -> Seq("el", "la", "los", "las", "es", "un", "una", "de", "que", "y"))

  // ---- scalar Column builders ----------------------------------------
  // The per-row kernels, exposed both to the DataFrame operators below
  // and to the SQL surface (GraftFunctions registers each as a graft_*
  // SQL function) — one definition, two APIs, so the two surfaces cannot
  // drift.

  /** Whitespace-normalized lowercased text — the shared normal form. */
  def normTextCol(text: Column): Column =
    regexp_replace(trim(lower(text)), "\\s+", " ")

  /** Unicode normalization (NFC / NFD / NFKC / NFKD) — the opt-in
    * canonical-form pass a multilingual crawl runs AHEAD of every
    * hash-keyed operator (exact dedup, fingerprints, minhash shingles,
    * line dedup): the same sentence arrives composed and decomposed
    * ("é" = U+00E9 vs e + U+0301) and byte-keyed hashing treats them as
    * distinct unless this pass folds them. Native codegen expression
    * ([[graft.functions.UnicodeNormalize]] — quick-check fast path, no
    * UDF); default OFF everywhere so existing hash contracts are
    * untouched. NFC for byte-canonical equivalence (lossless); NFKC
    * additionally folds compatibility forms (ﬁ→fi, full-width→ASCII). */
  def unicodeNormCol(text: Column, form: String): Column = {
    import org.apache.spark.sql.GraftColumnBridge
    GraftColumnBridge.column(graft.functions.UnicodeNormalize(
      GraftColumnBridge.expression(text.cast("string")), form))
  }

  /** All code-point n-grams of a string column in one pass
    * ([[graft.functions.CharNgrams]]) — same output as the
    * `transform(sequence(1, length−(n−1)), i => substr(i, n))` HOF shape
    * but O(len) instead of O(len²) byte traversals per row (each
    * positional substr re-scans from the string start to locate its
    * code point). Strings shorter than n code points yield an empty
    * array; callers pin their own empty-text edge. */
  def charNgramsCol(text: Column, n: Int): Column = {
    import org.apache.spark.sql.GraftColumnBridge
    GraftColumnBridge.column(graft.functions.CharNgrams(
      GraftColumnBridge.expression(text.cast("string")), n))
  }

  /** `text` normalized through `unicodeForm` when set — the shared
    * opt-in seam ([[unicodeNormCol]] scaladoc). */
  def maybeUnicodeNorm(text: Column, unicodeForm: Option[String]): Column =
    unicodeForm.fold(text)(f => unicodeNormCol(text, f))

  /** Whitespace token array over the normal form — the shared tokenizer. */
  def tokensCol(text: Column): Column = split(normTextCol(text), " ")

  /** The positional word k-gram array of a token-array column, built as
    * k−1 zip_with folds over shifted slices — a CONSTANT number of
    * references to the token expression per row. The natural
    * transform/element_at formulation re-inlines the tokenizer split
    * into every element access (HOF lambdas evaluate their captured
    * trees per invocation — no subexpression elimination), making gram
    * extraction quadratic in document length; switching the bigram path
    * to this shape measured 10× at sf0.1. Gram i starts at token i, so
    * posexplode positions equal token indices; documents shorter than k
    * tokens yield an empty array. */
  def positionalGramsCol(toks: Column, k: Int): Column = {
    val n = greatest(size(toks) - (k - 1), lit(0))
    (1 until k).foldLeft(slice(toks, lit(1), n)) { (acc, j) =>
      zip_with(acc, slice(toks, lit(1 + j), n),
        (a, b) => concat(a, lit(" "), b))
    }
  }

  private def tokens(textCol: Column): Column = tokensCol(textCol)

  /** Whitespace token count (0 for blank text). */
  def wsTokensCol(text: Column): Column =
    when(length(trim(text)) === 0, 0).otherwise(size(tokensCol(text)))

  /** BPE-ish pre-tokenizer segment count (letter runs / digit runs /
    * single other symbols). */
  def bpeishTokensCol(text: Column): Column =
    size(regexp_extract_all(lower(text), lit("[\\p{L}]+|[0-9]+|[^\\p{L}0-9\\s]"), lit(0)))

  /** Share of non-letter/digit/space characters. */
  def punctRatioCol(text: Column): Column =
    when(length(text) > 0,
      (length(text) - length(regexp_replace(text, "[^\\p{L}\\p{N}\\s]", "")))
        .cast("double") / length(text)).otherwise(0.0)

  /** Share of tokens found in the stopword list. */
  def stopwordRatioCol(text: Column, stopwords: Seq[String]): Column = {
    val toks = tokensCol(text)
    val sw = array(stopwords.distinct.map(lit): _*)
    when(size(toks) > 0,
      size(filter(toks, t => array_contains(sw, t))).cast("double") / size(toks))
      .otherwise(0.0)
  }

  /** Mean token length in characters. */
  def meanTokenLenCol(text: Column): Column = {
    val toks = tokensCol(text)
    when(size(toks) > 0, aggregate(transform(toks, t => length(t)), lit(0),
      (a, x) => a + x).cast("double") / size(toks)).otherwise(0.0)
  }

  /** 1 - distinct/total tokens — high values flag repeated chatter. */
  def repetitionRatioCol(text: Column): Column = {
    val toks = tokensCol(text)
    when(size(toks) > 0, lit(1.0) - size(array_distinct(toks)).cast("double") / size(toks))
      .otherwise(0.0)
  }

  /** Composite quality heuristic in [0,1] — the same formula
    * [[qualityScore]] materializes, inlined for scalar (SQL-surface) use. */
  def qualityCol(text: Column): Column = {
    val nTok = wsTokensCol(text)
    val mtl = meanTokenLenCol(text)
    greatest(lit(0.0), least(lit(1.0),
      lit(1.0)
        - punctRatioCol(text) * 2.0
        - when(mtl < 2.0 || mtl > 12.0, 0.3).otherwise(0.0)
        - when(nTok < 5, 0.4).otherwise(0.0)
        - repetitionRatioCol(text) * 0.5))
  }

  /** Predicted language: argmax of per-language stopword hits, ties to
    * the lexicographically first language, `und` when nothing hits.
    * Same decision as [[languageId]]'s `lang_pred` (the fold there and
    * the struct-min here pick the same winner), in one scalar
    * expression: min over (-hits, lang) structs. */
  def langPredCol(text: Column,
      stopwords: Map[String, Seq[String]] = defaultStopwords): Column = {
    val toks = tokensCol(text)
    val entries = stopwords.keys.toSeq.sorted.map { l =>
      val sw = array(stopwords(l).map(lit): _*)
      struct((-size(filter(toks, t => array_contains(sw, t)))).as("neg"),
        lit(l).as("lang"))
    }
    val best = array_min(array(entries: _*))
    when(best.getField("neg") < 0, best.getField("lang")).otherwise(lit("und"))
  }

  /** Language ID: per language, hits = tokens found in its stopword list;
    * prediction = argmax hits (ties broken by language name; `und` =
    * undetermined when nothing hits). Returns the input plus
    * [lang_pred, lang_hits]. */
  def languageId(df: DataFrame, textCol: String = "text",
      stopwords: Map[String, Seq[String]] = defaultStopwords): DataFrame = {
    val toks = tokens(col(textCol))
    val langs = stopwords.keys.toSeq.sorted
    val hitCols = langs.map { l =>
      val sw = array(stopwords(l).map(lit): _*)
      size(filter(toks, t => array_contains(sw, t))).as(s"hits_$l")
    }
    val withHits = df.select(col("*") +: hitCols: _*)
    val best = langs.foldLeft((lit("und"), lit(0))) { case ((bl, bh), l) =>
      val h = col(s"hits_$l")
      (when(h > bh, lit(l)).otherwise(bl), when(h > bh, h).otherwise(bh))
    }
    withHits
      .withColumn("lang_pred", best._1)
      .withColumn("lang_hits", best._2)
      .drop(langs.map(l => s"hits_$l"): _*)
  }

  /** Char-n-gram language ID — the supervised n-gram-profile form (the
    * other classic langid besides the stopword heuristic above): per-
    * language character n-gram profiles are TRAINED from the corpus's
    * own `labelCol` and every document is scored by smoothed multinomial
    * log-likelihood — i.e. Naive Bayes over char n-grams, delegating to
    * [[Classify.nbFromDocTok]] (same sparse log-count trick, same
    * rounded-argmax determinism). Char n-grams beat word features on
    * short/no-space text and need no stopword lists.
    *
    * The normalized text is MATERIALIZED (persist) before the
    * position-sequence HOF — referencing the normalization expression
    * inside the lambda would re-evaluate it per position (the §11
    * HOF-lambda trap: O(len²) per row). Docs shorter than n normalized
    * chars are excluded (they have no n-gram evidence). Returns
    * [idCol, labelCol, pred, margin]. */
  def languageIdNgram(df: DataFrame, n: Int = 3, labelCol: String = "lang",
      textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    // r14: train-then-serve (the Classify.naiveBayes rationale — the
    // relational rank-window form re-aggregated the gram table through
    // ~6 shuffle stages per query). The broadcast n-gram model scores
    // each doc in one stateless pass; output is row-for-row the
    // relational form's (classifyNgramStream's certified contract — the
    // text_lang_ngram_stream entry already hash-matches the SAME oracle
    // SQL as the batch row). The relational reference survives as
    // [[languageIdNgramRelational]] for the parity specs.
    ngramServe(df, Classify.trainNbModelNgram(df, n, labelCol, textCol, idCol),
      n, labelCol, textCol, idCol)
  }

  /** Serving half of [[languageIdNgram]] over a pre-trained char-n-gram
    * [[Classify.NbModel]] (the nbServe twin). */
  def ngramServe(df: DataFrame, model: Classify.NbModel, n: Int,
      labelCol: String = "lang", textCol: String = "text",
      idCol: String = "doc_id"): DataFrame =
    graft.streaming.StreamingPipeline.classifyNgramStream(
        df.select(col(idCol).cast("long").as("doc_id"),
          col(labelCol).as(labelCol), col(textCol).as("text")),
        model, n, labelCol)
      .select(col("doc_id").as(idCol), col(labelCol), col("pred"), col("margin"))

  /** Pre-r14 relational char-n-gram language ID — the REFERENCE form the
    * serving path above is pinned against (ClassifySpec). */
  private[graft] def languageIdNgramRelational(df: DataFrame, n: Int = 3,
      labelCol: String = "lang", textCol: String = "text",
      idCol: String = "doc_id"): DataFrame = {
    val norm = regexp_replace(trim(lower(col(textCol))), "\\s+", " ")
    val base = df
      .select(col(idCol), col(labelCol).as("__lbl"), norm.as("nt"))
      .filter(length(col("nt")) >= n)
      .repartition(df.sparkSession.sparkContext.defaultParallelism)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val grams = base.select(col(idCol), col("__lbl"),
      explode(charNgramsCol(col("nt"), n)).as("t"))
    val docTok = grams.groupBy(col(idCol), col("__lbl"), col("t"))
      .agg(count(lit(1)).as("n"))
    Classify.nbFromDocTok(docTok, idCol)
      .select(col(idCol), col("__lbl").as(labelCol), col("pred"), col("margin"))
  }

  /** Flesch-style readability per document — the classic
    * reading-ease heuristic a curation pass gates on alongside the
    * Gopher rules: sentences = maximal [.!?]+ runs (min 1 so
    * fragment-only docs don't divide by zero), words = the shared
    * whitespace tokens, syllables approximated as VOWEL GROUPS
    * (maximal [aeiouy]+ runs, min 1 per word — the standard
    * dictionary-free approximation), and
    *   flesch = 206.835 − 1.015·(words/sentences) − 84.6·(syll/words).
    * All three counts are exact integers from regexp matches (narrow,
    * codegen'd, engine-replayable); the score is one fixed-order
    * double expression rounded to 6. Blank docs report zeros and a
    * null score. Returns
    * df + [n_sentences, n_words, n_syllables, flesch]. */
  def readability(df: DataFrame, textCol: String = "text"): DataFrame = {
    val text = col(textCol)
    val toks = tokensCol(text)
    val nWords = when(length(trim(text)) === 0, lit(0L))
      .otherwise(size(toks).cast("long"))
    val nSent = greatest(
      size(regexp_extract_all(text, lit("[.!?]+"), lit(0))).cast("long"),
      lit(1L))
    // vowel groups per word, min 1 — summed via one corpus-wide extract
    val syl = when(nWords === 0L, lit(0L)).otherwise(
      aggregate(toks, lit(0L), (acc, w) =>
        acc + greatest(
          size(regexp_extract_all(w, lit("[aeiouy]+"), lit(0))).cast("long"),
          lit(1L))))
    df
      .withColumn("n_sentences", when(nWords === 0L, lit(0L)).otherwise(nSent))
      .withColumn("n_words", nWords)
      .withColumn("n_syllables", syl)
      .withColumn("flesch",
        when(col("n_words") === 0L, lit(null).cast("double"))
          .otherwise(round(
            lit(206.835)
              - lit(1.015) * (col("n_words").cast("double")
                / col("n_sentences").cast("double"))
              - lit(84.6) * (col("n_syllables").cast("double")
                / col("n_words").cast("double")), 6)))
  }

  /** Character-level Shannon entropy per document — the cheap
    * gibberish/boilerplate screen a curation pass runs beside the Gopher
    * rules: encrypted blobs and base64 runs score HIGH (near-uniform
    * characters), template/repeat spam scores LOW, and natural language
    * sits in a narrow band (~2.4-3.2 nats for English), so both tails
    * gate.  H = ln N − (Σ_c n_c ln n_c)/N over the characters of the
    * shared normal form ([[normTextCol]]).
    *
    * Spark-first shape: a PURE per-row projection — the char array is
    * materialized once as its own projected column (CollapseProject
    * keeps multi-referenced non-trivial projections, so the O(len)
    * build is not re-inlined per lambda reference), then the count of
    * each distinct char is an O(d·len) nested-HOF fold (d = distinct
    * chars, ≤ alphabet size). Zero shuffles, streams statelessly, runs
    * at scan speed at any corpus size. Summation order of the double
    * fold differs from a SQL GROUP BY mirror only in last-ulp terms —
    * round(6) absorbs it (the repo-wide libm convention). Blank docs
    * report zeros and a −1.0 sentinel. Returns
    * [idCol, n_chars_norm, n_distinct_chars, entropy]. */
  def charEntropy(df: DataFrame, textCol: String = "text",
      idCol: String = "doc_id"): DataFrame = {
    val nt = col("__nt")
    val n = length(nt).cast("double")
    val folded = col("__fold")
    df.withColumn("__nt", normTextCol(col(textCol)))
      // empty-text rows pin to one harmless '' element (the sequence()
      // edge the HOF form guarded with greatest()); non-empty rows take
      // the one-pass native char split
      .withColumn("__cs",
        when(length(nt) === 0, array(lit("")))
          .otherwise(charNgramsCol(nt, 1)))
      .withColumn("__fold", charRunsFold(col("__cs")))
      .select(col(idCol),
        length(nt).cast("long").as("n_chars_norm"),
        when(length(nt) === 0, lit(0L))
          .otherwise(folded.getField("d")).as("n_distinct_chars"),
        when(length(nt) === 0, lit(-1.0))
          .otherwise(round(log(n) - folded.getField("s") / n, 6)).as("entropy"))
  }

  /** The single-pass entropy fold over a char array: sort, then one
    * run-detecting aggregate accumulating (prev char, run length,
    * Σ n_c·ln n_c, distinct count) — O(len log len) per row instead of
    * one full-array filter scan PER DISTINCT CHAR (O(d·len); HOFs are
    * interpreted, so the constant matters: the nested form measured
    * ~5× slower on the single-task streamed replay). Returns a struct
    * [s: Σ n ln n, d: distinct count]. */
  private def charRunsFold(cs: Column): Column = {
    def runTerm(r: Column): Column =
      when(r > 0.0, r * log(r)).otherwise(lit(0.0))
    aggregate(array_sort(cs),
      struct(lit("").as("p"), lit(0.0).as("r"), lit(0.0).as("s"),
        lit(0L).as("d")),
      (acc, c) => {
        val same = acc.getField("p") === c
        struct(c.as("p"),
          when(same, acc.getField("r") + 1.0).otherwise(lit(1.0)).as("r"),
          when(same, acc.getField("s"))
            .otherwise(acc.getField("s") + runTerm(acc.getField("r"))).as("s"),
          when(same, acc.getField("d"))
            .otherwise(acc.getField("d") + 1L).as("d"))
      },
      acc => struct(
        (acc.getField("s") + runTerm(acc.getField("r"))).as("s"),
        acc.getField("d").as("d")))
  }

  /** The GATE form of [[charEntropy]]: keep rows whose character
    * entropy lies in [lo, hi] (blank docs drop — their sentinel −1.0 is
    * below any real lo). Same two-projection shape (the char array
    * materializes once — rebuilding it per distinct-char lookup would
    * be O(d·len²) per row) and the same round(6) value, so a gate
    * decision here always agrees with the text_entropy report. Adds no
    * output columns. */
  def charEntropyGate(df: DataFrame, textCol: String,
      lo: Double, hi: Double): DataFrame = {
    require(hi > lo, s"entropy gate needs hi > lo: [$lo, $hi]")
    val nt = col("__entnt")
    val n = length(nt).cast("double")
    df.withColumn("__entnt", normTextCol(col(textCol)))
      // one-pass native split; empty text yields an empty array, whose
      // fold is never consumed (the length===0 branch pins −1.0 below)
      .withColumn("__entcs", charNgramsCol(nt, 1))
      .withColumn("__ent",
        when(length(nt) === 0, lit(-1.0))
          .otherwise(round(log(n)
            - charRunsFold(col("__entcs")).getField("s") / n, 6)))
      .filter(col("__ent") >= lo && col("__ent") <= hi)
      .drop("__entnt", "__entcs", "__ent")
  }

  /** C4-style line-level cleaning report — the per-line rule battery of
    * the C4 corpus build (Raffel et al. 2020, §2.2; reference
    * counterpart: the curation gates around
    * `python/artm/batches_utils.py`-era corpus prep live OUTSIDE the
    * reference engine, so this is a beyond-reference pipeline operator):
    * a line survives iff it (1) has at least `minWordsPerLine`
    * whitespace tokens, (2) ends in a terminal punctuation mark
    * (`. ! ? "` after right-trim), and (3) does not mention
    * "javascript" (the cookie/JS-warning boilerplate marker); the PAGE
    * drops wholesale if it contains "lorem ipsum" (placeholder text) or
    * a `{` (code), or if fewer than `minKeptLines` lines survive.
    *
    * Spark-first shape: ONE narrow projection — `split` on newline,
    * one `filter` HOF whose per-line predicate is regexp/contains
    * expressions (all codegen'd), page-level flags as plain `contains`
    * on the raw text. Zero shuffles; streams statelessly at ingest;
    * at 100 TB this runs at parquet scan speed. The cleaned text is
    * reported as an md5 digest (`clean_digest`, '' for dropped pages)
    * so a gate decision AND the exact surviving byte content are both
    * certified by the oracle hash without shipping full text twice.
    * Returns [idCol, n_lines, n_kept, has_lorem, has_brace, kept,
    * clean_digest]. [[c4CleanGate]] is the filtering form. */
  def c4Clean(df: DataFrame, textCol: String = "text",
      idCol: String = "doc_id", minWordsPerLine: Int = 3,
      minKeptLines: Int = 2): DataFrame = {
    require(minWordsPerLine >= 1 && minKeptLines >= 1,
      s"c4Clean: thresholds must be >= 1 " +
        s"(minWordsPerLine=$minWordsPerLine, minKeptLines=$minKeptLines)")
    val text = col(textCol)
    val kept = filter(split(text, "\n"), l => c4LineKeep(l, minWordsPerLine))
    df
      .withColumn("n_lines", size(split(text, "\n")).cast("long"))
      .withColumn("__keptls", kept)
      .withColumn("n_kept", size(col("__keptls")).cast("long"))
      .withColumn("has_lorem", contains(lower(text), lit("lorem ipsum")))
      .withColumn("has_brace", contains(text, lit("{")))
      .withColumn("kept",
        !col("has_lorem") && !col("has_brace")
          && col("n_kept") >= minKeptLines)
      // '' (not NULL) for dropped pages: a digest column mixing NULL and
      // strings cannot be row-sorted by the driver compare (the
      // corpus_drift -1-sentinel rule, string edition)
      .withColumn("clean_digest",
        when(col("kept"), md5(array_join(col("__keptls"), "\n")))
          .otherwise(lit("")))
      .select(col(idCol), col("n_lines"), col("n_kept"),
        col("has_lorem"), col("has_brace"), col("kept"),
        col("clean_digest"))
  }

  /** The GATE form of [[c4Clean]]: surviving pages only, with `textCol`
    * REWRITTEN to the surviving lines (newline-joined) — what a
    * curation pass feeds downstream. Same predicate expressions as the
    * report, so gate and report never disagree. Schema-preserving. */
  def c4CleanGate(df: DataFrame, textCol: String = "text",
      minWordsPerLine: Int = 3, minKeptLines: Int = 2): DataFrame = {
    val text = col(textCol)
    val kept = filter(split(text, "\n"), l => c4LineKeep(l, minWordsPerLine))
    df
      .withColumn("__c4kept", kept)
      .filter(!contains(lower(text), lit("lorem ipsum"))
        && !contains(text, lit("{"))
        && size(col("__c4kept")) >= minKeptLines)
      .withColumn(textCol, array_join(col("__c4kept"), "\n"))
      .drop("__c4kept")
  }

  /** The per-line C4 keep predicate shared by report and gate. */
  private def c4LineKeep(l: Column, minWords: Int): Column =
    size(regexp_extract_all(l, lit("\\S+"), lit(0))) >= minWords &&
      rtrim(l).rlike("[.!?\"]$") &&
      !contains(lower(l), lit("javascript"))

  /** Quality scoring: length, punctuation ratio, stopword ratio, mean
    * token length, repetition ratio (1 - distinct/total tokens); composite
    * `quality` in [0,1] combining the standard heuristics. */
  def qualityScore(df: DataFrame, textCol: String = "text",
      stopwords: Seq[String] = defaultStopwords.values.flatten.toSeq): DataFrame = {
    val text = col(textCol)
    df
      .withColumn("n_chars_q", length(text))
      .withColumn("n_tokens_q", size(tokens(text)))
      .withColumn("punct_ratio", punctRatioCol(text))
      .withColumn("stopword_ratio", stopwordRatioCol(text, stopwords))
      .withColumn("mean_token_len", meanTokenLenCol(text))
      .withColumn("repetition_ratio", repetitionRatioCol(text))
      .withColumn("quality",
        greatest(lit(0.0), least(lit(1.0),
          lit(1.0)
            - col("punct_ratio") * 2.0
            - when(col("mean_token_len") < 2.0 || col("mean_token_len") > 12.0, 0.3).otherwise(0.0)
            - when(col("n_tokens_q") < 5, 0.4).otherwise(0.0)
            - col("repetition_ratio") * 0.5)))
  }

  /** Gopher-style rule filter (Rae et al. 2021, the published
    * quality-rule battery a crawl is gated with before any learned
    * filter): per-doc word count bounds, mean-word-length bounds,
    * symbol-to-word ratio ('#' chars + '...' runs), alphabetic-word
    * ratio, and the distinct-stopword requirement — each surfaced as
    * its own rule boolean plus the conjunctive `keep`, so the report
    * doubles as a per-rule rejection audit. One narrow HOF projection,
    * no shuffle — runs at scan speed (and unchanged on a stream).
    * Blank docs report n_words = 0, zero ratios, keep = false. */
  def gopherRules(df: DataFrame, minWords: Long = 50,
      maxWords: Long = 100000, minMeanWordLen: Double = 3.0,
      maxMeanWordLen: Double = 10.0, maxSymbolRatio: Double = 0.1,
      minAlphaRatio: Double = 0.8, minStopwords: Int = 2,
      textCol: String = "text",
      stopwords: Seq[String] = defaultStopwords("en")): DataFrame = {
    val text = col(textCol)
    val toks = filter(tokensCol(text), t => t =!= "")
    val n = size(toks).cast("long")
    val nD = n.cast("double")
    val meanLen = when(n > 0, round(
      aggregate(transform(toks, t => length(t).cast("long")),
        lit(0L), (acc, x) => acc + x).cast("double") / nD, 6))
      .otherwise(lit(0.0))
    val hashes = length(text) - length(regexp_replace(text, "#", ""))
    val ellipses = (length(text) -
      length(regexp_replace(text, "\\.\\.\\.", ""))) / 3
    val symbolRatio = when(n > 0,
      round((hashes + ellipses).cast("double") / nD, 6)).otherwise(lit(0.0))
    val alphaRatio = when(n > 0, round(
      size(filter(toks, t => t.rlike("[a-z]"))).cast("double") / nD, 6))
      .otherwise(lit(0.0))
    val nStop = size(array_intersect(toks,
      typedlit(stopwords))).cast("long")
    df
      .withColumn("n_words", n)
      .withColumn("mean_word_len", meanLen)
      .withColumn("symbol_ratio", symbolRatio)
      .withColumn("alpha_ratio", alphaRatio)
      .withColumn("n_stop", nStop)
      .withColumn("rule_words",
        col("n_words") >= minWords && col("n_words") <= maxWords)
      .withColumn("rule_word_len",
        col("mean_word_len") >= minMeanWordLen &&
        col("mean_word_len") <= maxMeanWordLen)
      .withColumn("rule_symbol", col("symbol_ratio") <= maxSymbolRatio)
      .withColumn("rule_alpha", col("alpha_ratio") >= minAlphaRatio)
      .withColumn("rule_stop", col("n_stop") >= minStopwords)
      .withColumn("keep",
        col("rule_words") && col("rule_word_len") && col("rule_symbol") &&
        col("rule_alpha") && col("rule_stop"))
  }

  /** Gopher-style n-gram repetition signals: for each n in `ns`, the
    * share of all n-grams taken by the single most frequent one
    * (`top_{n}gram_share` — high values flag boilerplate / repeated
    * chatter; the standard "top n-gram fraction" quality filter). Docs
    * with fewer than n tokens score 0.
    *
    * Shape at scale: n-grams come from ONE narrow HOF pass over the
    * token array (no positional self-join), then a (doc, ngram) count
    * and a per-doc max/total — two map-side-combined shuffles keyed by
    * doc, corpus-linear, no skew beyond document length. */
  def ngramRepetition(df: DataFrame, textCol: String = "text",
      ns: Seq[Int] = Seq(2, 3)): DataFrame =
    ns.foldLeft(df) { (acc, n) =>
      acc.withColumn(s"top_${n}gram_share", topNgramShareCol(col(textCol), n))
    }

  /** Share of a document's word n-grams taken by its single most
    * frequent n-gram — computed PER ROW: positional n-grams via one
    * narrow HOF, then `array_sort` + a run-length fold (the mode of a
    * sorted array is its longest equal run). Replaces the original
    * groupBy(doc, gram) → groupBy(doc) formulation: identical values
    * (asserted in FringeSpec), but zero shuffles — the repetition
    * filter runs at scan speed like the other quality signals, instead
    * of paying two corpus-wide exchanges per n. Docs with fewer than n
    * tokens (or blank) score 0. */
  def topNgramShareCol(text: Column, n: Int): Column = {
    val toks0 = tokensCol(text)
    val toks = when(length(trim(text)) === 0, array().cast("array<string>"))
      .otherwise(toks0)
    val grams = when(size(toks) >= n, positionalGramsCol(toks, n))
      .otherwise(array().cast("array<string>"))
    val sorted = array_sort(grams)
    val best = aggregate(sorted,
      struct(lit("").as("prev"), lit(0L).as("run"), lit(0L).as("best")),
      (acc, g) => {
        val run = when(g === acc.getField("prev"), acc.getField("run") + 1L)
          .otherwise(lit(1L))
        struct(g.as("prev"), run.as("run"),
          greatest(acc.getField("best"), run).as("best"))
      },
      acc => acc.getField("best"))
    when(size(sorted) > 0, best.cast("double") / size(sorted)).otherwise(0.0)
  }

  /** PII patterns kept deliberately lookaround-free so Java (Spark) and
    * RE2 (DuckDB, the oracle) regex engines agree character for
    * character. */
  val EmailRe = "[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}"
  val UrlRe = "https?://[^\\s]+"

  /** PII scrubbing: count and redact emails / URLs (URLs first — they can
    * embed '@'). Adds [n_emails, n_urls, scrubbed]. A narrow codegen'd
    * projection — scan-speed at 100 TB; real pipelines extend the pattern
    * list (phones, IPs, id numbers) the same way. */
  def piiScrub(df: DataFrame, textCol: String = "text"): DataFrame = {
    val text = col(textCol)
    df
      .withColumn("n_urls", nUrlsCol(text))
      .withColumn("n_emails", nEmailsCol(text))
      .withColumn("scrubbed", piiScrubCol(text))
  }

  /** URL match count. */
  def nUrlsCol(text: Column): Column =
    size(regexp_extract_all(text, lit(UrlRe), lit(0))).cast("long")

  /** Host part of a URL match — scheme and leading `www.` stripped,
    * lowercased, path/port/query cut at the first `/ : ? #`. Kept
    * lookaround-free (same Java/RE2 contract as the PII patterns). */
  val UrlHostRe = "https?://([^/\\s:?#]+)"

  /** Tracking-parameter prefixes dropped by [[canonicalUrlCol]] — the
    * standard click-identifier noise (utm_* campaign tags, Facebook/
    * Google/Microsoft click ids) that makes byte-keyed URL dedup miss
    * the same page arriving via different referral paths. */
  val TrackingParamRe = "^(utm_[^=]*|fbclid|gclid|msclkid)="

  /** Canonical URL form — the cheapest first-pass dedup signal a crawl
    * pipeline has: the same page arrives as `HTTPS://WWW.Shop.COM:443/
    * item/7/?b=2&utm_source=feed&a=1#frag` and
    * `https://shop.com/item/7?a=1&b=2`, and byte-keyed hashing treats
    * them as distinct. Folds, in order: fragment dropped; scheme and
    * host lowercased (path/query case is significant per RFC 3986 and
    * kept); leading `www.` stripped; default port stripped (`:80` for
    * http, `:443` for https); trailing path slashes trimmed; tracking
    * params ([[TrackingParamRe]]) dropped; surviving query params
    * SORTED byte-wise and rejoined. Pure regexp/array expressions —
    * narrow, codegen'd, replayed verbatim by the DuckDB mirror.
    * Strings without a `scheme://` pass through as lower(trim). */
  def canonicalUrlCol(url: Column): Column = {
    val u = regexp_replace(trim(url), "#.*$", "")
    val scheme = lower(regexp_extract(u, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    val rest = regexp_replace(u, "^[A-Za-z][A-Za-z0-9+.-]*://", "")
    val hostport = regexp_replace(
      lower(regexp_extract(rest, "^([^/?]+)", 1)), "^www\\.", "")
    val host = when(scheme === "http", regexp_replace(hostport, ":80$", ""))
      .when(scheme === "https", regexp_replace(hostport, ":443$", ""))
      .otherwise(hostport)
    val pq = regexp_replace(rest, "^[^/?]+", "")
    val path = regexp_replace(regexp_extract(pq, "^([^?]*)", 1), "/+$", "")
    val query = regexp_extract(pq, "\\?(.*)$", 1)
    val params = filter(split(query, "&"),
      p => p =!= lit("") && !p.rlike(TrackingParamRe))
    val qcanon = array_join(array_sort(params), "&")
    when(u.rlike("^[A-Za-z][A-Za-z0-9+.-]*://"),
        concat(scheme, lit("://"), host, path,
          when(qcanon === "", lit("")).otherwise(concat(lit("?"), qcanon))))
      .otherwise(lower(u))
  }

  /** Per-domain corpus statistics over URLs found in document text —
    * the table a web-corpus curation pass joins its domain allow/block
    * lists against: [domain, n_docs (distinct docs mentioning it),
    * n_urls (total mentions)]. One extract-explode (narrow, rows ∝ URL
    * mentions) + one map-side-combined aggregate; nothing here is
    * corpus-row-bound except the scan. */
  def domainStats(df: DataFrame, textCol: String = "text",
      idCol: String = "doc_id"): DataFrame = {
    val host = lower(regexp_extract(col("__url"), UrlHostRe, 1))
    df
      .select(col(idCol),
        explode(regexp_extract_all(col(textCol), lit(UrlRe), lit(0))).as("__url"))
      .withColumn("domain", regexp_replace(host, "^www\\.", ""))
      .where(length(col("domain")) > 0)
      .groupBy("domain")
      .agg(countDistinct(col(idCol)).as("n_docs"),
        count(lit(1)).as("n_urls"))
  }

  /** Email match count (URLs masked first — they can embed '@'). */
  def nEmailsCol(text: Column): Column =
    size(regexp_extract_all(regexp_replace(text, UrlRe, "<URL>"),
      lit(EmailRe), lit(0))).cast("long")

  /** Text with URLs then emails redacted. */
  def piiScrubCol(text: Column): Column =
    regexp_replace(regexp_replace(text, UrlRe, "<URL>"), EmailRe, "<EMAIL>")

  /** Token counting: whitespace tokens and a BPE-ish segmentation count
    * (letter runs / digit runs / single other symbols — the standard
    * pre-tokenizer regex), both codegen'd regex ops. */
  def tokenCounts(df: DataFrame, textCol: String = "text"): DataFrame = {
    val text = col(textCol)
    df
      .withColumn("ws_tokens", wsTokensCol(text))
      .withColumn("bpeish_tokens", bpeishTokensCol(text))
  }

  /** RAG/training-style sliding-window chunking: each document is split
    * into token windows of `chunkTokens` starting every `strideTokens`
    * (overlap = chunk − stride), the shape retrieval indexes and
    * fixed-context training pipelines both consume. Chunk starts are
    * every stride multiple below the token count, so every token is
    * covered and consecutive chunks share the overlap; a trailing chunk
    * shorter than `minTokens` is dropped UNLESS it is the document's
    * only chunk (its content would otherwise be entirely inside the
    * previous chunk's window or the doc is just short). Blank documents
    * produce no chunks.
    *
    * Scale shape: tokenize → bounded `sequence` explode (chunks per doc
    * = ⌈tokens/stride⌉) → per-row `slice`+`array_join` — a NARROW map
    * with no shuffle at all; output rows ∝ corpus tokens / stride. The
    * token array is referenced a constant number of times per chunk row
    * (slice on the exploded row), not per token — the HOF-lambda
    * re-evaluation trap does not arise.
    * Returns [<id>, chunk_idx, chunk_text, n_tokens]. */
  def chunkDocuments(df: DataFrame, chunkTokens: Int = 64,
      strideTokens: Int = 48, minTokens: Int = 8,
      textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    require(chunkTokens > 0 && strideTokens > 0 && strideTokens <= chunkTokens,
      "need 0 < stride <= chunk")
    val nonBlank = df.filter(length(trim(col(textCol))) > 0)
    nonBlank
      .select(col(idCol), tokensCol(col(textCol)).as("__toks"))
      .withColumn("__n", size(col("__toks")))
      .select(col(idCol), col("__toks"), col("__n"),
        // floor-div: Column./ is true division even on ints
        explode(sequence(lit(0L),
          floor((col("__n") - 1) / lit(strideTokens)))).as("chunk_idx"))
      .withColumn("__start", col("chunk_idx") * strideTokens)
      .withColumn("n_tokens",
        least(lit(chunkTokens), col("__n") - col("__start")).cast("long"))
      .where(col("n_tokens") >= minTokens || col("chunk_idx") === 0)
      .select(col(idCol), col("chunk_idx").cast("long").as("chunk_idx"),
        array_join(slice(col("__toks"), col("__start") + 1, lit(chunkTokens)), " ")
          .as("chunk_text"),
        col("n_tokens"))
  }

  /** PMI-ranked adjacent-bigram collocations (Church & Hanks 1990) —
    * the phrase-extraction pass of a tokenizer/vocab pipeline ("new
    * york"-style units worth a single token) and a corpus-forensics
    * report (template phrases rank by construction):
    *   pmi(w1, w2) = ln( (c12/N2) / ((c1/N1) · (c2/N1)) ),
    * over ADJACENT pairs (contrast cooc_window/cooc_ppmi: unordered
    * window pairs), kept when c12 ≥ `minCount` (PMI is unstable on
    * hapax pairs), ranked by (ROUNDED pmi DESC, w1, w2).
    *
    * Shape at scale: two map-side-combined count shuffles (bigrams +
    * unigrams); the unigram table joins on its key from both endpoints;
    * the two corpus totals ride as broadcast 1-row aggregates; the
    * top-k is a TakeOrderedAndProject, never a global window. Returns
    * [w1, w2, n, c1, c2, pmi]. */
  def collocations(df: DataFrame, minCount: Long = 5, topK: Int = 50,
      textCol: String = "text"): DataFrame =
    collocationsFromGrams(collocGrams(df, textCol), minCount, topK)

  /** The narrow per-doc half of [[collocations]]: one row per adjacent
    * bigram (a, b) plus one row per unigram (a, null) — a stateless
    * projection, so the stream twin runs it at ingest and feeds the
    * SAME [[collocationsFromGrams]] aggregation at the sink. */
  private[graft] def collocGrams(df: DataFrame,
      textCol: String = "text"): DataFrame = {
    val nonBlank = df.filter(length(trim(col(textCol))) > 0)
    val toks = tokensCol(col(textCol))
    val bi = nonBlank.filter(size(toks) >= 2)
      .select(explode(zip_with(
        slice(toks, lit(1), size(toks) - 1),
        slice(toks, lit(2), size(toks) - 1),
        (a, b) => struct(a.as("w1"), b.as("w2")))).as("p"))
      .select(col("p.w1").as("a"), col("p.w2").as("b"))
    val uni = nonBlank.select(explode(toks).as("a"),
      lit(null).cast("string").as("b"))
    bi.unionByName(uni)
  }

  /** Per-DOC packed gram arrays — the bpe_encode_stream sink-traffic
    * trick for the streamed twin: the memory-sink replay pays per-ROW
    * overhead, and [[collocGrams]] emits tokens×2 rows per doc; this
    * form emits ONE row per doc (bigram-struct array + unigram array)
    * and [[gramsFromPacked]] re-explodes at the sink into the exact
    * [[collocGrams]] layout. */
  private[graft] def collocGramsPacked(df: DataFrame,
      textCol: String = "text"): DataFrame = {
    val toks = tokensCol(col(textCol))
    df.filter(length(trim(col(textCol))) > 0)
      .select(
        when(size(toks) >= 2, zip_with(
            slice(toks, lit(1), size(toks) - 1),
            slice(toks, lit(2), size(toks) - 1),
            (a, b) => struct(a.as("a"), b.as("b"))))
          .otherwise(array().cast("array<struct<a:string,b:string>>"))
          .as("bis"),
        toks.as("unis"))
  }

  /** Sink half of the packed form: re-explode to the [[collocGrams]]
    * row layout so [[collocationsFromGrams]] runs unchanged. */
  private[graft] def gramsFromPacked(packed: DataFrame): DataFrame =
    packed.select(explode(col("bis")).as("p"))
      .select(col("p.a").as("a"), col("p.b").as("b"))
      .unionByName(packed.select(explode(col("unis")).as("a"),
        lit(null).cast("string").as("b")))

  /** The aggregation half of [[collocations]] (sink side of the stream
    * twin): pure counts of the gram rows, so micro-batch arrival order
    * can't move the report. */
  private[graft] def collocationsFromGrams(grams: DataFrame,
      minCount: Long, topK: Int): DataFrame = {
    require(minCount >= 1 && topK >= 1, s"bad args: $minCount/$topK")
    val bi = grams.filter(col("b").isNotNull)
      .select(col("a").as("w1"), col("b").as("w2"))
    val uni = grams.filter(col("b").isNull).select(col("a").as("t"))
    val cu = uni.groupBy(col("t")).agg(count(lit(1)).as("cu"))
    val n1 = uni.agg(count(lit(1)).cast("double").as("n1"))
    val n2 = bi.agg(count(lit(1)).cast("double").as("n2"))
    bi.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("n"))
      .filter(col("n") >= minCount)
      .join(cu.select(col("t").as("w1"), col("cu").as("c1")), Seq("w1"))
      .join(cu.select(col("t").as("w2"), col("cu").as("c2")), Seq("w2"))
      .crossJoin(broadcast(n1)).crossJoin(broadcast(n2))
      .withColumn("pmi", round(log(
        (col("n").cast("double") / col("n2")) /
        ((col("c1").cast("double") / col("n1")) *
          (col("c2").cast("double") / col("n1")))), 6))
      .orderBy(col("pmi").desc, col("w1"), col("w2"))
      .limit(topK)
      .select(col("w1"), col("w2"), col("n"), col("c1"), col("c2"), col("pmi"))
  }

  /** Per-source corpus statistics (the data-card report a training
    * mixture is audited with): doc count, total/mean whitespace tokens,
    * and token-count percentiles per source.
    *
    * `exact = false` (the 100 TB path) uses `approx_percentile`
    * (one-pass mergeable sketch, map-side combined — same shuffle shape
    * as the count/sum); `exact = true` uses the exact interpolating
    * `percentile` aggregate (sorts each group's values — fine at
    * dictionary/report scale, and what the DuckDB oracle replays via
    * `quantile_cont`). Expects a `ws_tokens` column ([[tokenCounts]]). */
  def corpusStats(df: DataFrame, sourceCol: String = "source",
      exact: Boolean = false): DataFrame = {
    def pct(q: Double): Column =
      if (exact) percentile_approx(col("ws_tokens"), lit(q), lit(Int.MaxValue))
      else percentile_approx(col("ws_tokens"), lit(q), lit(10000))
    val p50 = if (exact) expr("percentile(ws_tokens, 0.5)") else pct(0.5)
    val p90 = if (exact) expr("percentile(ws_tokens, 0.9)") else pct(0.9)
    df.groupBy(col(sourceCol))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("ws_tokens")).cast("long").as("total_tokens"),
        round(avg(col("ws_tokens")), 6).as("mean_tokens"),
        round(p50.cast("double"), 6).as("p50_tokens"),
        round(p90.cast("double"), 6).as("p90_tokens"))
  }

  /** Per-source vocabulary statistics: distinct whitespace tokens and
    * total token occurrences — the vocabulary-size line of the data-card
    * report ([[corpusStats]]).
    *
    * `exact = false` (the 100 TB path) estimates distinct tokens with
    * `approx_count_distinct` (HyperLogLog++, one-pass mergeable sketch —
    * the same map-side-combined shuffle shape as the count);
    * `exact = true` runs the exact two-phase distinct (what the DuckDB
    * oracle replays via count(DISTINCT)). PipelineSpec pins the sketch
    * within 2% of exact. */
  def vocabStats(df: DataFrame, sourceCol: String = "source",
      textCol: String = "text", exact: Boolean = false): DataFrame = {
    val toks = df
      .select(col(sourceCol), explode(tokensCol(col(textCol))).as("tok"))
      .filter(col("tok") =!= "") // blank docs tokenize to [""]
    val distinctCol =
      if (exact) count_distinct(col("tok"))
      else approx_count_distinct(col("tok"), 0.01)
    toks.groupBy(col(sourceCol))
      .agg(distinctCol.cast("long").as("distinct_tokens"),
        count(lit(1)).as("total_tokens"))
  }

  /** Per-source Zipf slope — the rank-frequency power-law fit
    * (Zipf 1949: freq ∝ rank^s with s ≈ −1 for natural language). OLS
    * over (ln rank, ln freq) on each source's `topN` most frequent
    * tokens; the slope is the data-card line that flags synthetic or
    * template-heavy sources (|s| far from 1 = unnatural token
    * distribution — the corpus-level cousin of the per-doc entropy
    * gate). Ranks break frequency ties by token (engine-exact), and the
    * four OLS moments are DECIMAL-summed so the fit is
    * summation-order-proof; ln last-ulp noise dies in round(6) (the
    * PPMI precedent). Returns [source, n_ranks, slope, intercept].
    *
    * Shape at scale: one map-side-combined (source, token) count (the
    * vocabStats shuffle), a per-source top-N that compiles to Spark 4's
    * WindowGroupLimit (each map partition ships at most N rows per
    * source — never the vocabulary), then a sources-sized moment
    * aggregation. */
  def zipfSlope(df: DataFrame, topN: Int = 200,
      sourceCol: String = "source", textCol: String = "text"): DataFrame = {
    require(topN >= 2, s"zipfSlope: topN must be >= 2, got $topN")
    val counts = df
      .select(col(sourceCol), explode(tokensCol(col(textCol))).as("tok"))
      .filter(col("tok") =!= "")
      .groupBy(col(sourceCol), col("tok"))
      .agg(count(lit(1)).as("freq"))
    val w = Window.partitionBy(col(sourceCol))
      .orderBy(col("freq").desc, col("tok"))
    val ranked = counts.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= topN)
      .withColumn("x", log(col("rank").cast("double")))
      .withColumn("y", log(col("freq").cast("double")))
    // moments are DECIMAL-summed (order-proof), then cast to double and
    // the OLS runs entirely in IEEE doubles — both engines see identical
    // inputs and identical operation order, so no decimal-promotion
    // rules are in play
    val moments = ranked.groupBy(col(sourceCol))
      .agg(count(lit(1)).as("n_ranks"),
        sum(col("x").cast("decimal(28,12)")).cast("double").as("sx"),
        sum(col("y").cast("decimal(28,12)")).cast("double").as("sy"),
        sum((col("x") * col("x")).cast("decimal(28,12)"))
          .cast("double").as("sxx"),
        sum((col("x") * col("y")).cast("decimal(28,12)"))
          .cast("double").as("sxy"))
    val n = col("n_ranks").cast("double")
    val slope = (n * col("sxy") - col("sx") * col("sy")) /
      (n * col("sxx") - col("sx") * col("sx"))
    moments.select(col(sourceCol), col("n_ranks"),
      round(slope, 6).as("slope"),
      round((col("sy") - slope * col("sx")) / n, 6).as("intercept"))
  }

  /** Cross-source token BURSTINESS — the variance-to-mean ratio (index
    * of dispersion) of each frequent token's per-source counts. A token
    * spread evenly across sources disperses ≈ its mean's Poisson rate;
    * a templated/boilerplate token concentrated in one source disperses
    * far above it — the corpus-analysis signal for "this n-gram is a
    * site template, not language". Counts stay integers through both
    * moment sums (Σn, Σn²), so the only doubles are the final fixed-
    * order mean/variance/ratio composition — engine-exact with no
    * DECIMAL machinery. Sources with zero occurrences of a token count
    * toward S (the mean is over ALL sources).
    *
    * Shape at scale: one (token, source) count shuffle, a token-keyed
    * rollup of that count table, then a global top-N by total — a
    * TakeOrdered over the vocabulary-sized moment table, never a sort
    * of the corpus. Returns [token, total, n_sources, dispersion],
    * top `topN` tokens by (total, token). */
  def burstiness(df: DataFrame, topN: Int = 100,
      sourceCol: String = "source", textCol: String = "text"): DataFrame = {
    require(topN >= 1, s"burstiness: topN must be >= 1, got $topN")
    val s = df.agg(countDistinct(col(sourceCol)).cast("double").as("s"))
    val c = df.filter(length(trim(col(textCol))) > 0)
      .select(col(sourceCol), explode(tokensCol(col(textCol))).as("tok"))
      .filter(col("tok") =!= "")
      .groupBy(col(sourceCol), col("tok"))
      .agg(count(lit(1)).as("n"))
    val m = c.groupBy(col("tok"))
      .agg(sum(col("n")).as("total"),
        sum(col("n") * col("n")).as("sumsq"),
        count(lit(1)).as("n_sources"))
      .orderBy(col("total").desc, col("tok")).limit(topN)
    val mean = col("total").cast("double") / col("s")
    m.crossJoin(broadcast(s))
      .select(col("tok").as("token"), col("total"), col("n_sources"),
        round((col("sumsq").cast("double") / col("s") - mean * mean) / mean,
          6).as("dispersion"))
  }

  /** Feature-hashing document embedding (the hashing trick — Weinberger
    * et al. 2009): every token hashes to one of `dims` buckets with a
    * ±1 sign from a second hash bit, per-doc bucket sums are
    * L2-normalized — a model-free, vocabulary-free dense vector that
    * feeds clustering/ANN/dedup when no learned encoder exists, and
    * the standard baseline those encoders are audited against. Bucket
    * index and sign come from md5 (engine-replayable, no JVM hash);
    * sums and the squared norm stay INTEGERS, so the only doubles are
    * one sqrt and one division per emitted component. All-cancelled
    * docs (zero norm) are excluded like blank docs. Long format
    * [<id>, pos, val] — only occupied buckets emit.
    *
    * Shape at scale: one (doc, bucket) count shuffle + a doc-keyed
    * norm rollup of that table; narrow hashing, no vocabulary state. */
  def hashEmbed(df: DataFrame, dims: Int = 16, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    require(dims >= 2, s"hashEmbed: dims must be >= 2, got $dims")
    val t = df.filter(length(trim(col(textCol))) > 0)
      .select(col(idCol).cast("long").as(idCol),
        explode(tokensCol(col(textCol))).as("t"))
      .filter(col("t") =!= "")
      .withColumn("h", md5(col("t")))
    val signed = t.select(col(idCol),
      pmod(conv(substring(col("h"), 1, 8), 16, 10).cast("long"),
        lit(dims.toLong)).cast("int").as("pos"),
      when(pmod(conv(substring(col("h"), 9, 1), 16, 10).cast("long"),
        lit(2L)) === 0L, 1L).otherwise(-1L).as("sgn"))
    val v = signed.groupBy(col(idCol), col("pos"))
      .agg(sum(col("sgn")).as("v"))
    val nm = v.groupBy(col(idCol)).agg(sum(col("v") * col("v")).as("ss"))
      .filter(col("ss") > 0L)
      .select(col(idCol), sqrt(col("ss").cast("double")).as("norm"))
    v.join(nm, Seq(idCol))
      .select(col(idCol), col("pos"),
        round(col("v").cast("double") / col("norm"), 6).as("val"))
  }

  /** Per-source DATA CARD — the one-row-per-source release report
    * composing the verified aggregate family: corpus stats (doc/token
    * counts, mean + exact percentiles), vocabulary size, mean quality
    * (DECIMAL sum over the 6-dec-rounded per-doc quality —
    * order-insensitive), and the dominant predicted language (argmax
    * count, name tie-break). Four map-side-combined aggregations joined
    * on the handful of source keys — the seams between the component
    * operators are exactly what the composed row certifies. Returns
    * [source, n_docs, total_tokens, mean_tokens, p50_tokens, p90_tokens,
    * distinct_tokens, mean_quality, top_lang]. */
  def dataCard(df: DataFrame, sourceCol: String = "source",
      textCol: String = "text",
      stopwords: Map[String, Seq[String]] = defaultStopwords): DataFrame =
    dataCardFromPerDoc(dataCardPerDoc(df, sourceCol, textCol, stopwords),
      sourceCol)

  /** The per-DOCUMENT half of [[dataCard]] — one narrow projection per
    * doc carrying every signal the rollup needs (token count, rounded
    * quality, predicted language, the doc's distinct token set). Pure
    * column-preserving chain, so the same code runs on a stream; the
    * per-doc distinct token arrays make the vocabulary size computable
    * at the sink (union of per-doc distincts = corpus distincts). */
  def dataCardPerDoc(df: DataFrame, sourceCol: String = "source",
      textCol: String = "text",
      stopwords: Map[String, Seq[String]] = defaultStopwords): DataFrame = {
    val chained = languageId(
      qualityScore(tokenCounts(df, textCol), textCol), textCol, stopwords)
    chained.select(col(sourceCol), col("ws_tokens"),
      round(col("quality"), 6).as("quality6"), col("lang_pred"),
      filter(array_distinct(tokensCol(col(textCol))), t => t =!= "")
        .as("dtoks"))
  }

  /** The rollup half of [[dataCard]] over the per-doc table — four
    * map-side-combined aggregations joined on the source key, shared by
    * the batch row and the streaming replay. */
  def dataCardFromPerDoc(perDoc: DataFrame,
      sourceCol: String = "source"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val cs = corpusStats(perDoc, sourceCol, exact = true)
    val vs = perDoc.select(col(sourceCol), explode(col("dtoks")).as("tok"))
      .groupBy(col(sourceCol))
      .agg(count_distinct(col("tok")).cast("long").as("distinct_tokens"))
    val q = perDoc.groupBy(col(sourceCol))
      .agg(round(
        sum(col("quality6").cast("decimal(18,6)")).cast("double") /
          count(lit(1)), 6).as("mean_quality"))
    val lpc = perDoc
      .groupBy(col(sourceCol), col("lang_pred")).agg(count(lit(1)).as("cnt"))
    val w = Window.partitionBy(col(sourceCol))
      .orderBy(col("cnt").desc, col("lang_pred"))
    val top = lpc.withColumn("_rk", row_number().over(w))
      .filter(col("_rk") === 1)
      .select(col(sourceCol), col("lang_pred").as("top_lang"))
    cs.join(vs, Seq(sourceCol)).join(q, Seq(sourceCol)).join(top, Seq(sourceCol))
  }

  /** Document fingerprinting:
    * - `fingerprint`: md5 of the whitespace-normalized lowercased text
    *   (cheap exact-dup key, oracle-checkable);
    * - `rolling_fp`: 64-bit polynomial rolling hash over tokens
    *   (h = h·1000003 + murmur(token), wrap-around), robust to whitespace
    *   layout, usable for shift-tolerant chunk fingerprints. */
  def fingerprint(df: DataFrame, textCol: String = "text",
      unicodeForm: Option[String] = None): DataFrame = {
    val t = maybeUnicodeNorm(col(textCol), unicodeForm)
    df
      .withColumn("fingerprint", fingerprintCol(t))
      .withColumn("rolling_fp", rollingFpCol(t))
  }

  /** md5 of the whitespace-normalized lowercased text. */
  def fingerprintCol(text: Column): Column = md5(normTextCol(text))

  /** Winnowing document fingerprints (Schleimer–Wilkerson–Aiken, the
    * MOSS algorithm): hash every word k-gram, slide a window of `w`
    * consecutive hashes, and in each window select the minimum hash —
    * rightmost occurrence on ties, the published rule — recording
    * (position, hash). The selected set is the density-guaranteed
    * fingerprint: any shared substring of length ≥ w+k−1 tokens between
    * two documents yields at least one IDENTICAL selected (hash) pair,
    * which is what makes winnowing the standard local-similarity /
    * plagiarism screen where whole-doc hashes and minhash (global
    * Jaccard) both miss partial overlap. Returns exploded
    * [id, pos, fp] rows, distinct per doc, pos = 0-based k-gram start.
    *
    * Shape at scale: everything happens INSIDE one narrow projection —
    * token split, k-gram build (zip_with over shifted slices — constant
    * refs, no per-element re-evaluation), per-window argmin folds over
    * materialized hash-array ATTRIBUTES (the lambda references a bound
    * column, so nothing upstream re-evaluates), then one explode. No
    * shuffle until the consumer aggregates; the fingerprint index join
    * (who shares fingerprints with whom) is a (fp)-keyed exchange
    * downstream, exactly like the minhash band join. Docs shorter than
    * k + w − 1 tokens emit their single best window if they have ≥ k
    * tokens, nothing otherwise. */
  def winnowing(df: DataFrame, k: Int = 3, w: Int = 4,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val toks = tokensCol(col(textCol))
    val base = df.select(col(idCol).cast("long").as("id"),
      when(length(trim(col(textCol))) === 0,
        array().cast("array<string>")).otherwise(toks).as("toks"))
    val hashed = base.select(col("id"),
      transform(positionalGramsCol(col("toks"), k),
        g => conv(substring(md5(g), 1, 8), 16, 10).cast("long")).as("h"))
    // windows 0..n-w (or the single truncated window when 0 < n < w);
    // each selection is packed as pos·2^32 + fp (fp < 2^32 by
    // construction) so the distinct runs on plain longs — portable to
    // engines whose list-distinct can't hash structs. One-pass native
    // selection ([[graft.functions.WinnowSelect]]): the HOF form
    // re-evaluated the window slice per element inside the rightmost-min
    // aggregate (no subexpression elimination in interpreted lambdas —
    // O(windows·w²) evals per doc); values are identical by the
    // WinnowSelectSpec HOF-parity pin + the entries' oracle hashes.
    val sel = hashed.select(col("id"), {
      import org.apache.spark.sql.GraftColumnBridge
      GraftColumnBridge.column(graft.functions.WinnowSelect(
        GraftColumnBridge.expression(col("h")), w)).as("sels")
    })
    sel.select(col("id"), explode(array_distinct(col("sels"))).as("c"))
      .select(col("id"), shiftright(col("c"), 32).as("pos"),
        pmod(col("c"), lit(4294967296L)).as("fp"))
  }

  /** 131-ary rolling polynomial fingerprint: per-token 48-bit hash from
    * the md5 prefix (the same md5→int idiom the minhash/simhash kernels
    * use — deterministic across engines), folded left-to-right mod a
    * 2^51-scale prime: order-sensitive (unlike the md5 of the whole doc
    * it survives local edits elsewhere in the doc when applied per
    * chunk), and every intermediate stays < 2^58, BIGINT-safe in any SQL
    * engine. Pure codegen'd HOFs — no UDF in this path. */
  def rollingFpCol(text: Column): Column = {
    val tokInts = transform(tokensCol(text), t =>
      conv(substring(md5(t), 1, 12), 16, 10).cast("long"))
    when(length(trim(text)) === 0, lit(0L))
      .otherwise(aggregate(tokInts, lit(0L),
        (acc, h) => (acc * lit(RollingBase) + h) % lit(RollingMod)))
  }

  /** Rolling-hash constants shared with the DuckDB oracle mirror
    * ([[PipelineSql.textFingerprint]]). */
  val RollingBase = 131L
  val RollingMod = 1125899906842597L

  /** TF-IDF keyword extraction: top-k terms per document by
    * tf × (ln((N+1)/(df+1)) + 1) over the shared whitespace tokenizer,
    * blank documents excluded from N, df, and the output.
    *
    * Shape at scale: term frequencies and document frequencies are two
    * map-side-combined shuffles over the exploded token stream; the
    * tf×df join is keyed on `term` (vocabulary-partitioned, never
    * corpus×vocabulary); N rides along as a broadcast 1-row aggregate —
    * no driver action in the plan. Ranking windows on the ROUNDED score
    * (6 dp) with a term tiebreak, so cross-engine libm last-ulp ln
    * differences cannot flip ranks (the established rank-on-rounded
    * contract). Returns [<id>, rank, term, score]. */
  def tfidfTerms(df: DataFrame, topK: Int = 5, textCol: String = "text",
      idCol: String = "doc_id"): DataFrame = {
    val nonBlank = df.filter(length(trim(col(textCol))) > 0)
    val toks = nonBlank.select(col(idCol),
      explode(tokensCol(col(textCol))).as("term"))
    val tf = toks.groupBy(col(idCol), col("term"))
      .agg(count(lit(1)).as("tf"))
    val dfT = toks.groupBy(col("term"))
      .agg(countDistinct(col(idCol)).as("df_t"))
    val nDocs = nonBlank.agg(count(lit(1)).as("n_docs"))
    tfidfRankFromTf(
      tf.join(dfT, Seq("term")).crossJoin(broadcast(nDocs)),
      topK, idCol)
  }

  /** The score + rank half of [[tfidfTerms]] over a pre-joined
    * [<id>, term, tf, df_t, n_docs] table — shared by the batch row and
    * the streaming serve (which computes tf at the sink from streamed
    * per-occurrence rows and freezes df_t/n_docs from the corpus
    * snapshot). Rank-on-rounded with a term tiebreak, as the batch
    * scaladoc requires. */
  def tfidfRankFromTf(tfDf: DataFrame, topK: Int,
      idCol: String = "doc_id"): DataFrame = {
    val scored = tfDf
      .withColumn("score", round(col("tf").cast("double") *
        (log((col("n_docs").cast("double") + 1.0) /
             (col("df_t").cast("double") + 1.0)) + 1.0), 6))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(idCol)).orderBy(col("score").desc, col("term"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= topK)
      .select(col(idCol), col("rank"), col("term"), col("score"))
  }

  /** Self-trained bigram language-model perplexity — the CCNet-style
    * LM quality signal re-expressed on the corpus itself: documents
    * whose bigrams are rare under the corpus's own bigram distribution
    * (boilerplate glue, shuffled tokens, foreign-language fragments)
    * score high and can be gated out. Add-k smoothing:
    * p(w2|w1) = (c(w1,w2) + k) / (c(w1) + k·V) with c(w1) the count of
    * bigrams starting at w1 and V the corpus distinct-token count;
    * ppl(doc) = exp(−mean ln p) over the doc's bigrams. Documents with
    * fewer than 2 tokens are excluded (no bigrams).
    *
    * Shape at scale: bigram and left-context counts are
    * map-side-combined shuffles; scoring joins the doc-bigram stream to
    * the count tables on their natural keys ((w1,w2) and w1 — both
    * key-partitioned); V rides along as a broadcast 1-row aggregate.
    * Self-scoring guarantees every scored bigram exists in the model,
    * so the joins are inner; scoring held-out text against a frozen
    * model would left-join with the smoothed unseen-pair fallback.
    * Returns [<id>, n_bigrams, ppl]. */
  def lmPerplexity(df: DataFrame, addK: Double = 0.1, textCol: String = "text",
      idCol: String = "doc_id"): DataFrame = {
    val nonBlank = df.filter(length(trim(col(textCol))) > 0)
    val toks = tokensCol(col(textCol))
    // bigrams via zip_with over two slices — a CONSTANT number of
    // references to the token-split expression per row. The transform/
    // element_at(i) formulation would re-inline the split into every
    // element access after CollapseProject (O(tokens²) regex+split per
    // document — measured 25 s instead of ~2 s at sf0.1).
    val bi = nonBlank.filter(size(toks) >= 2)
      .select(col(idCol), explode(zip_with(
        slice(toks, lit(1), size(toks) - 1), slice(toks, lit(2), size(toks) - 1),
        (a, b) => struct(a.as("w1"), b.as("w2")))).as("b"))
      .select(col(idCol), col("b.w1").as("w1"), col("b.w2").as("w2"))
    val c12 = bi.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c12"))
    val c1 = bi.groupBy(col("w1")).agg(count(lit(1)).as("c1"))
    val vocab = nonBlank.select(explode(toks).as("t"))
      .agg(countDistinct(col("t")).as("v"))
    bi.join(c12, Seq("w1", "w2"))
      .join(c1, Seq("w1"))
      .crossJoin(broadcast(vocab))
      .withColumn("lnp", log(
        (col("c12").cast("double") + lit(addK)) /
        (col("c1").cast("double") + lit(addK) * col("v").cast("double"))))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_bigrams"),
        round(exp(-sum(col("lnp")) / count(lit(1))), 6).as("ppl"))
  }

  /** A trained add-k bigram LM as driver-held tables — the SERVING
    * artifact of [[lmPerplexity]] (bigram/unigram counts + vocab size;
    * vocab-bounded like the NB model, the broadcast-model contract). */
  final case class LmModel(c12: Map[(String, String), Long],
      c1: Map[String, Long], vocab: Long)

  /** Train the [[lmPerplexity]] bigram LM from a corpus (the batch half
    * of the train-batch / score-stream split). */
  def trainLmModel(df: DataFrame, textCol: String = "text"): LmModel = {
    val nonBlank = df.filter(length(trim(col(textCol))) > 0)
    val toks = tokensCol(col(textCol))
    val bi = nonBlank.filter(size(toks) >= 2)
      .select(explode(zip_with(
        slice(toks, lit(1), size(toks) - 1), slice(toks, lit(2), size(toks) - 1),
        (a, b) => struct(a.as("w1"), b.as("w2")))).as("b"))
      .select(col("b.w1").as("w1"), col("b.w2").as("w2"))
    val c12 = bi.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val c1 = bi.groupBy(col("w1")).agg(count(lit(1)).as("c"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val v = nonBlank.select(explode(toks).as("t"))
      .agg(countDistinct(col("t"))).head().getLong(0)
    LmModel(c12, c1, v)
  }

  /** A trained Kneser-Ney bigram LM as driver-held tables — the SERVING
    * artifact of [[lmPerplexityKneserNey]] (bigram counts + the two
    * count-table rollups + the (B, V) scalars; bigram-type-bounded like
    * [[LmModel]], the broadcast-model contract). `ctx` maps a context
    * word to (c(v), N₁₊(v·)); `cont` maps a word to N₁₊(·w). */
  final case class KnModel(c12: Map[(String, String), Long],
      ctx: Map[String, (Long, Long)], cont: Map[String, Long],
      b: Double, v: Double)

  /** Train the [[lmPerplexityKneserNey]] model from the SAME salted-md5
    * train split the batch entry uses (the batch half of the
    * train-batch / score-stream seam). */
  def trainKnModel(df: DataFrame, trainRate: Double = 0.8,
      salt: String = "kn", textCol: String = "text",
      idCol: String = "doc_id"): KnModel = {
    val nonBlank = df.filter(length(trim(col(textCol))) > 0)
    val isTrain = Sampling.hashPrefix(col(idCol), salt) <
      lit(Sampling.rateThreshold(trainRate))
    val toks = tokensCol(col(textCol))
    val n = greatest(size(toks) - 1, lit(0))
    val train = nonBlank.filter(isTrain)
    val c12 = train.select(explode(zip_with(
        slice(toks, lit(1), n), slice(toks, lit(2), n),
        (a, b) => struct(a.as("w1"), b.as("w2")))).as("g"))
      .select(col("g.w1").as("w1"), col("g.w2").as("w2"))
      .groupBy("w1", "w2").agg(count(lit(1)).as("c"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2))
      .toMap
    val ctx = c12.toSeq.groupBy(_._1._1)
      .map { case (w1, g) => w1 -> ((g.map(_._2).sum, g.size.toLong)) }
    val cont = c12.toSeq.groupBy(_._1._2)
      .map { case (w2, g) => w2 -> g.size.toLong }
    val v = train.select(explode(toks).as("t"))
      .agg(countDistinct(col("t"))).head().getLong(0)
    KnModel(c12, ctx, cont, c12.size.toDouble, v.toDouble)
  }

  /** Held-out trigram language-model perplexity with STUPID BACKOFF
    * (Brants et al. 2007, the published web-scale LM scoring scheme) —
    * the CCNet-style quality gate upgraded one order: train n-gram
    * counts on a deterministic hash split of the corpus, score the
    * held-out remainder, so unseen trigrams genuinely exercise the
    * backoff chain (a self-scored trigram model never backs off —
    * every scored trigram is in its own training set):
    *
    *   S(w3|w1,w2) = c(w1w2w3)/c(w1w2)            if the trigram is known
    *               = α·c(w2w3)/c(w2)              else if the bigram is
    *               = α²·(c(w3)+k)/(N+k·V)         else (add-k unigram
    *                                               floor, OOV-safe)
    *
    * ppl(doc) = exp(−mean ln S) over the doc's trigrams; docs under 3
    * tokens are excluded. The train/score split is the [[Sampling]]
    * salted-md5 split, identical on any cluster size.
    *
    * Shape at scale: three map-side-combined count shuffles over the
    * train split's n-gram streams; scoring left-joins the held-out
    * trigram stream to the count tables on their natural n-gram keys
    * (all key-partitioned, never corpus×vocab); the (N, V) scalars ride
    * as a broadcast 1-row aggregate. A known trigram implies its prefix
    * bigram is in c12 and a known (w2,w3) bigram implies w2 is in c1 —
    * the guarded divisions can't hit null or zero. Returns
    * [<id>, n_trigrams, n_backoff, ppl]. */
  def lmPerplexityTrigram(df: DataFrame, addK: Double = 0.1,
      alpha: Double = 0.4, trainRate: Double = 0.8, salt: String = "tri",
      textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    require(trainRate > 0.0 && trainRate < 1.0,
      s"trainRate must be in (0,1) so both splits are non-empty: $trainRate")
    val nonBlank = df.filter(length(trim(col(textCol))) > 0)
    val isTrain = Sampling.hashPrefix(col(idCol), salt) <
      lit(Sampling.rateThreshold(trainRate))
    val toks = tokensCol(col(textCol))
    // k-gram structs via zip_with folds over shifted slices — constant
    // references to the split expression per row (the lmPerplexity
    // lambda-reinlining trap)
    def triCol(t: Column): Column = {
      val n = greatest(size(t) - 2, lit(0))
      zip_with(
        zip_with(slice(t, lit(1), n), slice(t, lit(2), n),
          (a, b) => struct(a.as("w1"), b.as("w2"))),
        slice(t, lit(3), n),
        (p, c) => struct(p.getField("w1").as("w1"),
          p.getField("w2").as("w2"), c.as("w3")))
    }
    def biCol(t: Column): Column = {
      val n = greatest(size(t) - 1, lit(0))
      zip_with(slice(t, lit(1), n), slice(t, lit(2), n),
        (a, b) => struct(a.as("w1"), b.as("w2")))
    }
    val train = nonBlank.filter(isTrain)
    val c123 = train.select(explode(triCol(toks)).as("g"))
      .select(col("g.w1").as("w1"), col("g.w2").as("w2"), col("g.w3").as("w3"))
      .groupBy("w1", "w2", "w3").agg(count(lit(1)).as("c123"))
    val c12 = train.select(explode(biCol(toks)).as("g"))
      .select(col("g.w1").as("w1"), col("g.w2").as("w2"))
      .groupBy("w1", "w2").agg(count(lit(1)).as("c12"))
    val uni = train.select(explode(toks).as("t"))
    val c1 = uni.groupBy("t").agg(count(lit(1)).as("c1"))
    val nv = uni.agg(count(lit(1)).cast("double").as("n_tokens"),
      countDistinct(col("t")).cast("double").as("v"))
    val sg = nonBlank.filter(!isTrain)
      .select(col(idCol), explode(triCol(toks)).as("g"))
      .select(col(idCol), col("g.w1").as("w1"), col("g.w2").as("w2"),
        col("g.w3").as("w3"))
    val joined = sg
      .join(c123, Seq("w1", "w2", "w3"), "left")
      .join(c12, Seq("w1", "w2"), "left")
      .join(c12.select(col("w1").as("w2"), col("w2").as("w3"),
        col("c12").as("c23")), Seq("w2", "w3"), "left")
      .join(c1.select(col("t").as("w2"), col("c1").as("c2")), Seq("w2"), "left")
      .join(c1.select(col("t").as("w3"), col("c1").as("c3")), Seq("w3"), "left")
      .crossJoin(broadcast(nv))
    val s = when(col("c123").isNotNull,
        col("c123").cast("double") / col("c12").cast("double"))
      .when(col("c23").isNotNull,
        lit(alpha) * col("c23").cast("double") / col("c2").cast("double"))
      .otherwise(lit(alpha * alpha) *
        (coalesce(col("c3").cast("double"), lit(0.0)) + lit(addK)) /
        (col("n_tokens") + lit(addK) * col("v")))
    joined.withColumn("lns", log(s))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_trigrams"),
        sum(when(col("c123").isNull, 1L).otherwise(0L)).as("n_backoff"),
        round(exp(-sum(col("lns")) / count(lit(1))), 6).as("ppl"))
  }

  /** Held-out bigram perplexity under INTERPOLATED KNESER-NEY smoothing
    * (Kneser & Ney 1995; Chen & Goodman 1999 eq. 4.17) — the smoother
    * the real CCNet/KenLM quality gates run, where [[lmPerplexity]] is
    * the add-k classroom baseline and [[lmPerplexityTrigram]] the
    * stupid-backoff web-scale one:
    *
    *   P(w|v) = max(c(vw) − D, 0)/c(v) + (D·N₁₊(v·)/c(v)) · Pc(w)
    *   Pc(w)  = (N₁₊(·w) + k) / (B + k·V)      (continuation prob; the
    *            add-k floor keeps OOV words scoreable — plain KN gives
    *            unseen words zero mass and the ln blows up)
    *   P(w|v) = Pc(w)                           if context v unseen
    *
    * with c(v) = Σ_w c(vw) (bigram-based context mass), N₁₊(v·)/N₁₊(·w)
    * the right/left distinct-neighbor counts, B the bigram type count
    * and V the train vocab. Train/score is the same salted-md5 split as
    * the trigram entry. ppl(doc) = exp(−mean ln P); docs under 2 tokens
    * excluded.
    *
    * Shape at scale: one bigram count shuffle over the train split, two
    * k-sized rollups of the COUNT TABLE (never the corpus) for the
    * context/continuation tables, (B, V) as a broadcast 1-row
    * aggregate; scoring left-joins the held-out bigram stream on its
    * natural keys. Returns [<id>, n_bigrams, n_unseen_ctx, ppl]. */
  def lmPerplexityKneserNey(df: DataFrame, discount: Double = 0.75,
      addK: Double = 0.1, trainRate: Double = 0.8, salt: String = "kn",
      textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    require(trainRate > 0.0 && trainRate < 1.0,
      s"trainRate must be in (0,1) so both splits are non-empty: $trainRate")
    require(discount > 0.0 && discount < 1.0,
      s"discount must be in (0,1): $discount")
    val nonBlank = df.filter(length(trim(col(textCol))) > 0)
    val isTrain = Sampling.hashPrefix(col(idCol), salt) <
      lit(Sampling.rateThreshold(trainRate))
    val toks = tokensCol(col(textCol))
    def biCol(t: Column): Column = {
      val n = greatest(size(t) - 1, lit(0))
      zip_with(slice(t, lit(1), n), slice(t, lit(2), n),
        (a, b) => struct(a.as("w1"), b.as("w2")))
    }
    val train = nonBlank.filter(isTrain)
    val c12 = train.select(explode(biCol(toks)).as("g"))
      .select(col("g.w1").as("w1"), col("g.w2").as("w2"))
      .groupBy("w1", "w2").agg(count(lit(1)).as("c12"))
    // context mass + right-neighbor types: a |bigram types|-sized rollup
    val ctx = c12.groupBy(col("w1"))
      .agg(sum(col("c12")).as("c1b"), count(lit(1)).as("n_after"))
    val cont = c12.groupBy(col("w2")).agg(count(lit(1)).as("n_before"))
    val bv = c12.agg(count(lit(1)).cast("double").as("b"))
      .crossJoin(train.select(explode(toks).as("t"))
        .agg(countDistinct(col("t")).cast("double").as("v")))
    val sg = nonBlank.filter(!isTrain)
      .select(col(idCol), explode(biCol(toks)).as("g"))
      .select(col(idCol), col("g.w1").as("w1"), col("g.w2").as("w2"))
    val joined = sg
      .join(c12, Seq("w1", "w2"), "left")
      .join(ctx, Seq("w1"), "left")
      .join(cont, Seq("w2"), "left")
      .crossJoin(broadcast(bv))
    val pc = (coalesce(col("n_before").cast("double"), lit(0.0)) + lit(addK)) /
      (col("b") + lit(addK) * col("v"))
    val p = when(col("c1b").isNotNull,
        greatest(coalesce(col("c12").cast("double"), lit(0.0)) - lit(discount),
          lit(0.0)) / col("c1b").cast("double") +
        (lit(discount) * col("n_after").cast("double") /
          col("c1b").cast("double")) * pc)
      .otherwise(pc)
    joined.withColumn("lnp", log(p))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_bigrams"),
        sum(when(col("c1b").isNull, 1L).otherwise(0L)).as("n_unseen_ctx"),
        round(exp(-sum(col("lnp")) / count(lit(1))), 6).as("ppl"))
  }

  /** CCNet-style quality bucketing: per-language head/middle/tail by
    * bigram-LM perplexity terciles. Builds on [[lmPerplexity]] (whose
    * 6-decimal-rounded ppl is already engine-exact), computes per-lang
    * tercile thresholds (tiny result — one row per language, broadcast
    * back), and buckets on `ppl <= t`.
    *
    * Threshold modes — thresholds are GATES, not reported values, so the
    * scale path is sketch-based:
    *
    *   - `exact = false` (DEFAULT, the 100 TB path):
    *     `approx_percentile` with `approxAccuracy` — a bounded-memory
    *     quantile sketch that map-side-combines like any aggregate. An
    *     exact percentile at scale materializes and interpolates each
    *     language's full ppl multiset in one aggregation buffer per
    *     language — a head language holding most of a 100 TB corpus
    *     lands its entire ppl set on one task. The sketch holds the
    *     bucket split within ±accuracy rank error, which only moves
    *     documents whose ppl sits within noise of the tercile boundary —
    *     exactly the documents whose bucket is arbitrary anyway.
    *   - `exact = true` (the oracle/parity mode): the interpolating
    *     `percentile` aggregate, bit-comparable against DuckDB's
    *     `quantile_cont`. Interpolation between ROUNDED ppl values
    *     cannot drift past a data point (adjacent distinct values differ
    *     by ≥1e-6 while interpolation noise is last-ulp), so the bucket
    *     assignment is cross-engine deterministic. */
  def ccnetBuckets(df: DataFrame, addK: Double = 0.1, textCol: String = "text",
      idCol: String = "doc_id", langCol: String = "lang",
      exact: Boolean = false, approxAccuracy: Int = 10000): DataFrame = {
    val ppl = lmPerplexity(df, addK, textCol, idCol)
      .join(df.select(col(idCol), col(langCol)), idCol)
    bucketWithThresholds(ppl,
      ccnetThresholdsFromPpl(ppl, langCol, exact, approxAccuracy),
      idCol, langCol)
  }

  /** The per-language tercile table of a [doc, lang, ppl] frame — the
    * trained GATE ARTIFACT of the CCNet bucketing (one row per
    * language); the streaming serve broadcasts it. */
  def ccnetThresholdsFromPpl(ppl: DataFrame, langCol: String = "lang",
      exact: Boolean = false, approxAccuracy: Int = 10000): DataFrame = {
    def tercile(p: Double) =
      if (exact) percentile(col("ppl"), lit(p))
      else approx_percentile(col("ppl"), lit(p), lit(approxAccuracy))
    ppl.groupBy(langCol).agg(
      tercile(1.0 / 3).as("t1"), tercile(2.0 / 3).as("t2"))
  }

  /** The bucket-assignment half shared by batch and stream: pure
    * threshold comparisons against the broadcast tercile table. */
  def bucketWithThresholds(ppl: DataFrame, th: DataFrame,
      idCol: String = "doc_id", langCol: String = "lang"): DataFrame =
    ppl.join(broadcast(th), langCol)
      .withColumn("bucket",
        when(col("ppl") <= col("t1"), "head")
          .when(col("ppl") <= col("t2"), "middle")
          .otherwise("tail"))
      .select(col(idCol), col(langCol), col("ppl"), col("bucket"))

  /** BM25 ranked retrieval: for each query in the (small) `queries`
    * table ([query_id, query_text]) return the top-k corpus documents
    * by Okapi BM25 (k1 term-frequency saturation, b length
    * normalization, the Robertson-Sparck-Jones idf with the standard
    * +1 floor so scores stay positive):
    * score(q,d) = Σ_{t∈q} ln(1 + (N−df+0.5)/(df+0.5)) ·
    *              tf·(k1+1) / (tf + k1·(1−b+b·dl/avgdl)).
    *
    * Shape at scale: the corpus side is ONE map-side-combined
    * (doc, term) count shuffle (doc length rides through the explode,
    * so no separate doc-length join); document frequencies reduce the
    * SAME (doc,term) table on `term`. The query side is tiny by
    * contract — query terms join their per-term df and broadcast to
    * the tf table, so candidate generation is a broadcast-hash
    * semi-join (only documents containing a query term ever leave the
    * scan). N and avgdl ride as a broadcast 1-row aggregate. The final
    * per-query ranking is `row_number <= k` — Spark plans
    * WindowGroupLimit, so each map partition pre-truncates to k before
    * the per-query shuffle. Ranking windows on the ROUNDED score with
    * a doc_id tiebreak (the established rank-on-rounded contract).
    * Returns [query_id, rank, <id>, score]. */
  /** A built BM25 retrieval index: `postings` [idCol, term, tf, dl] (the
    * only corpus-sized table), `termDf` [term, df_t], `stats` one row
    * [n_docs, avgdl]. Build once ([[buildBm25Index]]), persist via
    * `graft.sources.SearchIO`, serve with [[bm25Query]] — indexing a
    * 100 TB corpus once and paying only the query-side joins per search
    * is the operational shape; [[bm25Search]] is the one-call form. */
  case class Bm25Index(postings: DataFrame, termDf: DataFrame,
      stats: DataFrame, idCol: String)

  /** One corpus pass → the three [[Bm25Index]] tables (one (doc, term)
    * map-side-combined shuffle with doc length riding through; df and
    * corpus stats derive from it / one scan). */
  def buildBm25Index(df: DataFrame, textCol: String = "text",
      idCol: String = "doc_id"): Bm25Index = {
    val nonBlank = df.filter(length(trim(col(textCol))) > 0)
    val toksCol = tokensCol(col(textCol))
    val tf = nonBlank
      .select(col(idCol), size(toksCol).cast("double").as("dl"),
        explode(toksCol).as("term"))
      .groupBy(col(idCol), col("term"))
      .agg(count(lit(1)).cast("double").as("tf"), first(col("dl")).as("dl"))
    val dfT = tf.groupBy(col("term")).agg(count(lit(1)).as("df_t"))
    val stats = nonBlank.agg(
      count(lit(1)).cast("double").as("n_docs"),
      avg(size(tokensCol(col(textCol)))).as("avgdl"))
    Bm25Index(tf, dfT, stats, idCol)
  }

  /** The per-(query, term) side of a BM25 query: distinct query terms
    * joined to the term-df table, idf attached. `stats` ride as
    * LITERALS (the broadcast-model contract), so the result works
    * identically whether `queries` is a batch table or a stream —
    * byte-for-byte the same idf doubles as the crossJoin(stats) form. */
  private def bm25QTerms(index: Bm25Index, queries: DataFrame): DataFrame = {
    val st = index.stats
      .select(col("n_docs").cast("double"), col("avgdl")).head()
    val nDocs = st.getDouble(0)
    queries
      .select(col("query_id"),
        explode(array_distinct(tokensCol(col("query_text")))).as("term"))
      .join(index.termDf, Seq("term"))
      .withColumn("idf",
        log(lit(1.0) + (lit(nDocs) - col("df_t") + 0.5) /
          (col("df_t").cast("double") + 0.5)))
  }

  private def bm25ContribCol(k1: Double, b: Double, avgdl: Double): Column =
    col("idf") * col("tf") * lit(k1 + 1.0) /
      (col("tf") + lit(k1) * (lit(1.0 - b) + lit(b) * col("dl") / lit(avgdl)))

  /** STREAM-shaped BM25 scoring: per-(query, doc, term) contribution
    * rows from a QUERY STREAM against the loaded index — the query side
    * explodes to terms and stream-static joins the postings on the term
    * key (stateless, no state store); [[bm25RankContrib]] finishes the
    * per-(query, doc) sum + top-k at the sink with the batch math. */
  def bm25Contributions(index: Bm25Index, queries: DataFrame,
      k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val avgdl = index.stats.select(col("avgdl")).head().getDouble(0)
    bm25QTerms(index, queries).join(index.postings, Seq("term"))
      .select(col("query_id"), col(index.idCol),
        bm25ContribCol(k1, b, avgdl).as("contrib"))
  }

  /** The rank half shared by batch and stream: per-(query, doc) sum of
    * contributions (round 6), WindowGroupLimit top-k. */
  def bm25RankContrib(contrib: DataFrame, topK: Int,
      idCol: String): DataFrame = {
    val scored = contrib.groupBy(col("query_id"), col(idCol))
      .agg(round(sum(col("contrib")), 6).as("score"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id")).orderBy(col("score").desc, col(idCol))
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= topK)
      .select(col("query_id"), col("rank"), col(idCol), col("score"))
  }

  /** The query half of [[bm25Search]] over a (possibly loaded)
    * [[Bm25Index]]: broadcast query×df side, postings-keyed term join,
    * WindowGroupLimit top-k. The contribution expression and the rank
    * stage are shared with the streaming serve path — only the join
    * build side differs (batch broadcasts the tiny query side under the
    * corpus-sized postings). */
  def bm25Query(index: Bm25Index, queries: DataFrame, topK: Int = 10,
      k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val avgdl = index.stats.select(col("avgdl")).head().getDouble(0)
    val contrib = index.postings
      .join(broadcast(bm25QTerms(index, queries)), Seq("term"))
      .select(col("query_id"), col(index.idCol),
        bm25ContribCol(k1, b, avgdl).as("contrib"))
    bm25RankContrib(contrib, topK, index.idCol)
  }

  def bm25Search(df: DataFrame, queries: DataFrame, topK: Int = 10,
      k1: Double = 1.2, b: Double = 0.75,
      textCol: String = "text", idCol: String = "doc_id"): DataFrame =
    bm25Query(buildBm25Index(df, textCol, idCol), queries, topK, k1, b)
}
