package graft

import org.apache.spark.sql.{Column, GraftColumnBridge, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.functions._

import graft.pipeline.{Ann, Dedup, Sampling, TextAnalysis}

/** The engine's SQL surface: every per-row graft kernel registered as a
  * `graft_*` SQL function, so `spark.sql` users get the same curation
  * vocabulary as the DataFrame API — one definition per kernel (the
  * scalar Column builders in TextAnalysis / Dedup / Sampling / the
  * native expressions in graft.functions), two call surfaces.
  *
  * Two installation paths, same registry list:
  *  - cluster config (preferred — survives session cloning):
  *    `spark.sql.extensions=graft.GraftExtensions`;
  *  - runtime, on an existing session: `GraftFunctions.install(spark)`
  *    (idempotent — re-registration replaces).
  *
  * Design note: functions are the ONLY Catalyst seam this engine needs to
  * inject. Spark's builtin operators express every graft dataflow
  * (SURVEY.md §4), so there is deliberately no custom LogicalPlan /
  * Strategy / optimizer rule here — the declarative plans keep Catalyst's
  * pushdown, pruning, AQE and whole-stage codegen for free, which a
  * custom operator node would opt out of.
  *
  * Most builders expand to compositions of BUILTIN codegen'd expressions
  * (the Column builders), so the registered functions cost exactly what
  * the DataFrame API costs — no UDF anywhere. `graft_cosine` and
  * `graft_hyperplane_sig` resolve to this library's native codegen
  * expressions.
  */
object GraftFunctions {

  type Builder = Seq[Expression] => Expression

  private def toCol(e: Expression): Column = GraftColumnBridge.column(e)
  // eager conversion: builder output feeds SQL analysis directly
  private def toExpr(c: Column): Expression = GraftColumnBridge.sqlExpression(c)

  /** Builder from a Column composition with a fixed arity. */
  private def colFn(name: String, arity: Int)(f: Seq[Column] => Column): Builder =
    exprs => {
      require(exprs.length == arity,
        s"$name expects $arity argument(s), got ${exprs.length}")
      toExpr(f(exprs.map(toCol)))
    }

  /** Evaluate a foldable argument (SQL literals / constant expressions)
    * at plan time — for knobs that parameterize the expression tree
    * itself (shingle size, plane counts, sampling rates). */
  private def constArg(name: String, e: Expression, pos: Int): Any = {
    require(e.foldable, s"$name: argument ${pos + 1} must be a constant, got $e")
    val v = e.eval()
    require(v != null, s"$name: argument ${pos + 1} must not be null")
    v
  }
  private def constInt(name: String, e: Expression, pos: Int): Int =
    constArg(name, e, pos) match {
      case i: Int => i
      case l: Long => l.toInt
      case s: Short => s.toInt
      case b: Byte => b.toInt
      case other => throw new IllegalArgumentException(
        s"$name: argument ${pos + 1} must be an integer, got $other")
    }
  private def constDouble(name: String, e: Expression, pos: Int): Double =
    constArg(name, e, pos) match {
      case d: Double => d
      case f: Float => f.toDouble
      case d: java.math.BigDecimal => d.doubleValue()
      case d: org.apache.spark.sql.types.Decimal => d.toDouble
      case i: Int => i.toDouble
      case l: Long => l.toDouble
      case other => throw new IllegalArgumentException(
        s"$name: argument ${pos + 1} must be numeric, got $other")
    }
  private def constString(name: String, e: Expression, pos: Int): String =
    constArg(name, e, pos).toString

  private def info(name: String, usage: String): ExpressionInfo =
    new ExpressionInfo(GraftFunctions.getClass.getName, null, name, usage, "")

  /** The registry: (identifier, help, builder) triples — the exact shape
    * `SparkSessionExtensions.injectFunction` takes. */
  val functions: Seq[(FunctionIdentifier, ExpressionInfo, Builder)] = Seq(
    // ---- text normal form / tokenization --------------------------------
    ("graft_norm_text", "graft_norm_text(text) - whitespace-normalized lowercased text",
      colFn("graft_norm_text", 1)(cs => TextAnalysis.normTextCol(cs(0)))),
    ("graft_unicode_normalize",
      "graft_unicode_normalize(text, form) - Unicode NFC/NFD/NFKC/NFKD normalization",
      (exprs: Seq[Expression]) => {
        require(exprs.length == 2,
          s"graft_unicode_normalize expects 2 arguments, got ${exprs.length}")
        val form = constString("graft_unicode_normalize", exprs(1), 1)
        toExpr(TextAnalysis.unicodeNormCol(toCol(exprs(0)), form))
      }),
    ("graft_tokens", "graft_tokens(text) - whitespace token array of the normal form",
      colFn("graft_tokens", 1)(cs => TextAnalysis.tokensCol(cs(0)))),
    ("graft_ws_tokens", "graft_ws_tokens(text) - whitespace token count (0 for blank)",
      colFn("graft_ws_tokens", 1)(cs => TextAnalysis.wsTokensCol(cs(0)))),
    ("graft_bpeish_tokens", "graft_bpeish_tokens(text) - BPE-ish pre-tokenizer segment count",
      colFn("graft_bpeish_tokens", 1)(cs => TextAnalysis.bpeishTokensCol(cs(0)))),
    // ---- quality / language ---------------------------------------------
    ("graft_quality", "graft_quality(text) - composite quality heuristic in [0,1]",
      colFn("graft_quality", 1)(cs => TextAnalysis.qualityCol(cs(0)))),
    ("graft_punct_ratio", "graft_punct_ratio(text) - share of punctuation characters",
      colFn("graft_punct_ratio", 1)(cs => TextAnalysis.punctRatioCol(cs(0)))),
    ("graft_repetition_ratio", "graft_repetition_ratio(text) - 1 - distinct/total tokens",
      colFn("graft_repetition_ratio", 1)(cs => TextAnalysis.repetitionRatioCol(cs(0)))),
    ("graft_mean_token_len", "graft_mean_token_len(text) - mean token length in chars",
      colFn("graft_mean_token_len", 1)(cs => TextAnalysis.meanTokenLenCol(cs(0)))),
    ("graft_stopword_ratio",
      "graft_stopword_ratio(text) - share of tokens in the default stopword lists",
      colFn("graft_stopword_ratio", 1)(cs => TextAnalysis.stopwordRatioCol(cs(0),
        TextAnalysis.defaultStopwords.values.flatten.toSeq))),
    ("graft_lang_id", "graft_lang_id(text) - stopword-argmax language prediction ('und' if none)",
      colFn("graft_lang_id", 1)(cs => TextAnalysis.langPredCol(cs(0)))),
    ("graft_top_ngram_share",
      "graft_top_ngram_share(text, n) - share of word n-grams taken by the most frequent one",
      (exprs: Seq[Expression]) => {
        require(exprs.length == 2,
          s"graft_top_ngram_share expects 2 arguments, got ${exprs.length}")
        val n = constInt("graft_top_ngram_share", exprs(1), 1)
        toExpr(TextAnalysis.topNgramShareCol(toCol(exprs(0)), n))
      }),
    ("graft_word_grams",
      "graft_word_grams(text, k) - positional word k-gram array of the normal form",
      (exprs: Seq[Expression]) => {
        require(exprs.length == 2,
          s"graft_word_grams expects 2 arguments, got ${exprs.length}")
        val k = constInt("graft_word_grams", exprs(1), 1)
        toExpr(TextAnalysis.positionalGramsCol(
          TextAnalysis.tokensCol(toCol(exprs(0))), k))
      }),
    // ---- fingerprints / PII ---------------------------------------------
    ("graft_fingerprint", "graft_fingerprint(text) - md5 of the normal form",
      colFn("graft_fingerprint", 1)(cs => TextAnalysis.fingerprintCol(cs(0)))),
    ("graft_rolling_fp", "graft_rolling_fp(text) - 131-ary rolling polynomial fingerprint",
      colFn("graft_rolling_fp", 1)(cs => TextAnalysis.rollingFpCol(cs(0)))),
    ("graft_canonical_url",
      "graft_canonical_url(url) - canonical URL form (case/www/port/slash/tracking-param folds)",
      colFn("graft_canonical_url", 1)(cs => TextAnalysis.canonicalUrlCol(cs(0)))),
    ("graft_pii_scrub", "graft_pii_scrub(text) - text with URLs then emails redacted",
      colFn("graft_pii_scrub", 1)(cs => TextAnalysis.piiScrubCol(cs(0)))),
    ("graft_n_urls", "graft_n_urls(text) - URL match count",
      colFn("graft_n_urls", 1)(cs => TextAnalysis.nUrlsCol(cs(0)))),
    ("graft_n_emails", "graft_n_emails(text) - email match count (URLs masked first)",
      colFn("graft_n_emails", 1)(cs => TextAnalysis.nEmailsCol(cs(0)))),
    // ---- dedup kernels --------------------------------------------------
    ("graft_shingles", "graft_shingles(text, k) - distinct word k-gram shingle set",
      (exprs: Seq[Expression]) => {
        require(exprs.length == 2, s"graft_shingles expects 2 arguments, got ${exprs.length}")
        val k = constInt("graft_shingles", exprs(1), 1)
        toExpr(Dedup.shingles(toCol(exprs(0)), k))
      }),
    ("graft_minhash", "graft_minhash(shingles, numHashes) - minhash signature of a shingle set",
      (exprs: Seq[Expression]) => {
        require(exprs.length == 2, s"graft_minhash expects 2 arguments, got ${exprs.length}")
        val n = constInt("graft_minhash", exprs(1), 1)
        toExpr(Dedup.minhashSignature(toCol(exprs(0)), n))
      }),
    ("graft_jaccard",
      "graft_jaccard(sh_a, sh_b) - exact Jaccard similarity of two shingle sets " +
        "(pair with graft_shingles for SQL-side near-dup verification)",
      colFn("graft_jaccard", 2) { cs =>
        val inter = size(org.apache.spark.sql.functions.array_intersect(cs(0), cs(1)))
        val uni = size(org.apache.spark.sql.functions.array_union(cs(0), cs(1)))
        when(uni > 0, inter.cast("double") / uni).otherwise(lit(0.0))
      }),
    ("graft_simhash",
      "graft_simhash(text) - 64-bit SimHash fingerprint (native kernel; band with " +
        "shiftrightunsigned(sig, b*16) & 0xffff for pigeonhole blocking)",
      (exprs: Seq[Expression]) => {
        require(exprs.length == 1, s"graft_simhash expects 1 argument, got ${exprs.length}")
        graft.functions.SimhashBands(exprs(0))
      }),
    // ---- embeddings -----------------------------------------------------
    ("graft_cosine", "graft_cosine(a, b) - cosine similarity of two float vectors (native codegen)",
      (exprs: Seq[Expression]) => {
        require(exprs.length == 2, s"graft_cosine expects 2 arguments, got ${exprs.length}")
        graft.functions.CosineSimilarity(exprs(0), exprs(1))
      }),
    ("graft_hyperplane_sig",
      "graft_hyperplane_sig(vec, dim, planes, seed, tables) - md5-derived hyperplane " +
        "LSH bucket array, one long per table (native codegen)",
      (exprs: Seq[Expression]) => {
        require(exprs.length == 5,
          s"graft_hyperplane_sig expects 5 arguments, got ${exprs.length}")
        val dim = constInt("graft_hyperplane_sig", exprs(1), 1)
        val planes = constInt("graft_hyperplane_sig", exprs(2), 2)
        val seed = constInt("graft_hyperplane_sig", exprs(3), 3)
        val tables = constInt("graft_hyperplane_sig", exprs(4), 4)
        val planeVecs = Array.tabulate(tables, planes) { (t, p) =>
          Array.tabulate(dim)(i => Ann.planeComponent(seed + t, p, i))
        }
        graft.functions.HyperplaneSignature(exprs(0), planeVecs)
      }),
    // ---- deterministic sampling ----------------------------------------
    ("graft_sample_keep",
      "graft_sample_keep(key, salt, rate) - deterministic Bernoulli keep decision " +
        "(salted-md5 threshold; same (key, salt, rate) => same decision on any cluster)",
      (exprs: Seq[Expression]) => {
        require(exprs.length == 3,
          s"graft_sample_keep expects 3 arguments, got ${exprs.length}")
        val salt = constString("graft_sample_keep", exprs(1), 1)
        val rate = constDouble("graft_sample_keep", exprs(2), 2)
        toExpr(
          if (rate >= 1.0) lit(true)
          else Sampling.hashPrefix(toCol(exprs(0)), salt) < lit(Sampling.rateThreshold(rate)))
      })
  ).map { case (name, usage, builder) =>
    (FunctionIdentifier(name), info(name, usage), builder)
  }

  /** Register every graft_* function on a live session (idempotent). */
  def install(spark: SparkSession): Unit =
    functions.foreach { case (ident, fnInfo, builder) =>
      spark.sessionState.functionRegistry.registerFunction(ident, fnInfo, builder)
    }
}

/** `spark.sql.extensions=graft.GraftExtensions` — builder-time injection
  * of the [[GraftFunctions]] registry (the config-driven path for
  * clusters where sessions are created outside user code). */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftFunctions.functions.foreach(ext.injectFunction)
}
