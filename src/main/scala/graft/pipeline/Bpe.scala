package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed BPE tokenizer training — the vocabulary-learning step of a
  * training-data pipeline (Sennrich et al. 2016, "Neural Machine
  * Translation of Rare Words with Subword Units").
  *
  * Spark-first shape: the ONLY corpus-proportional work is the single
  * word-count shuffle ([[wordCounts]] — map-side-combined groupBy). Every
  * merge round then runs over the *distinct-word* table, which is
  * Zipf-bounded (a few million rows even at 100 TB of text), weighted by
  * word frequency — exactly how reference BPE trainers (subword-nmt,
  * SentencePiece) structure the computation. The merge table itself is
  * `numMerges` rows, so the per-round `limit(1).collect()` argmax is a
  * driver-side scalar, not a driver-side loop over data.
  *
  * Symbol sequences are kept as a DOUBLE-SPACE-joined string column
  * (` a  b  c  </w> `): applying a merge (l, r) is then the codegen'd
  * builtin `replace(seq, " l  r ", " lr ")`, whose left-to-right
  * non-overlapping scan is exactly greedy BPE pair substitution, and whose
  * single-space replacement boundary preserves the double-space invariant
  * for consecutive matches (` a  b  a  b ` → ` ab  ab `). The same
  * `replace` exists in any SQL engine, which is what puts the whole
  * training loop — argmax pair selection included — under a fully
  * self-contained DuckDB oracle (PipelineSql.bpeTrain: each round's top
  * pair is a scalar subquery feeding the next round's replace; no replayed
  * literals).
  *
  * Reference scope note: bigartm tokenizes upstream of the engine
  * (src/artm/core/token.h treats tokens as opaque strings); subword
  * vocabulary learning is a beyond-reference training-data operator.
  */
object Bpe {

  /** End-of-word marker appended to every symbol sequence (keeps merges
    * from crossing word boundaries and encodes word-final subwords,
    * per the original BPE formulation). Must not contain spaces. */
  val EndMarker = "</w>"

  /** Lower-cased `[a-z]+` word frequencies — one map-side-combined shuffle
    * over the corpus; everything downstream of this is vocabulary-sized. */
  def wordCounts(docs: DataFrame, textCol: String = "text",
      maxWordLen: Int = 20): DataFrame =
    docs.select(explode(split(lower(col(textCol)), "[^a-z]+")).as("word"))
      .filter(length(col("word")) >= 1 && length(col("word")) <= maxWordLen)
      .groupBy(col("word"))
      .agg(count(lit(1)).as("cnt"))

  /** ` c  h  a  r  s  </w> ` — leading/trailing single space, double-space
    * separators (see object scaladoc for why doubles). */
  private[pipeline] def initSeq(word: Column): Column =
    concat(lit(" "),
      array_join(concat(
        transform(sequence(lit(1), length(word)), i => word.substr(i, lit(1))),
        array(lit(EndMarker))), "  "),
      lit(" "))

  /** Adjacent symbol pairs of a sequence column as [l, r] structs, via
    * zip_with over two slices — a constant number of references to the
    * split expression per row (a transform/element_at(i) formulation
    * would re-inline the split into every element access after
    * CollapseProject: O(symbols²) splits per word). Sequences always
    * hold >= 2 symbols (one char + [[EndMarker]]). */
  private[pipeline] def pairsOf(seq: Column): Column = {
    val t = split(trim(seq), "  ")
    zip_with(slice(t, lit(1), size(t) - 1), slice(t, lit(2), size(t) - 1),
      (a, b) => struct(a.as("l"), b.as("r")))
  }

  /** Learned merge operations, most frequent first:
    * [merge_rank, lhs, rhs, merged, pair_count]. Ties on count break
    * lexicographically on (lhs, rhs) — deterministic and engine-portable
    * (pure ASCII byte order on `[a-z</>]` symbols).
    *
    * Exact BPE is inherently sequential — merge k's pair counts depend on
    * merges 1..k-1 — so each round runs ONE aggregation job over the
    * word table and collects a single argmax row (bounded driver state;
    * the job count, not the data volume, is the scale boundary). The
    * merge applications accumulate as stacked codegen'd `replace`
    * expressions, and every `checkpointEvery` rounds the merged word
    * table is MATERIALIZED (persist + count) and becomes the new base:
    * the replace stack any round re-executes is capped at
    * `checkpointEvery`, making total vocabulary-table string passes
    * O(numMerges · checkpointEvery) instead of O(numMerges²). At
    * production merge counts (32k) the remaining cost is the 32k
    * sequential mini-jobs over the Zipf-bounded vocabulary — hundreds of
    * MB, not corpus-scale — which is the standard distributed-BPE shape;
    * a corpus of 100 TB only ever pays the ONE word-count shuffle in
    * [[wordCounts]]. */
  def train(docs: DataFrame, numMerges: Int, textCol: String = "text",
      maxWordLen: Int = 20, checkpointEvery: Int = 16): DataFrame = {
    val spark = docs.sparkSession
    val words = wordCounts(docs, textCol, maxWordLen)
      .select(col("cnt"), initSeq(col("word")).as("seq"))
      .persist()
    words.count() // materialize so every round starts from parquet-free cache
    val merges = scala.collection.mutable.ArrayBuffer.empty[(Long, String, String, String, Long)]
    var base = words            // last materialized word table
    var prevBase: DataFrame = null
    var stacked = 0             // replaces applied on top of `base`
    var cur = words
    var round = 1
    var exhausted = false
    while (round <= numMerges && !exhausted) {
      val top = cur
        .select(explode(pairsOf(col("seq"))).as("p"), col("cnt"))
        .groupBy(col("p.l").as("l"), col("p.r").as("r"))
        .agg(sum(col("cnt")).as("pc"))
        .orderBy(col("pc").desc, col("l"), col("r"))
        .limit(1)
        .collect()
      if (top.isEmpty) exhausted = true
      else {
        val (l, r, pc) = (top(0).getString(0), top(0).getString(1), top(0).getLong(2))
        merges += ((round.toLong, l, r, l + r, pc))
        cur = cur.withColumn("seq",
          replace(col("seq"), lit(s" $l  $r "), lit(s" ${l + r} ")))
        stacked += 1
        if (stacked >= checkpointEvery && round < numMerges) {
          val next = cur.persist()
          next.count() // cut the replace stack HERE — later rounds re-run <= checkpointEvery replaces
          if (prevBase != null) prevBase.unpersist(blocking = false)
          prevBase = if (base ne words) base else null
          base = next
          cur = next
          stacked = 0
        }
        round += 1
      }
    }
    if (prevBase != null) prevBase.unpersist(blocking = false)
    if (base ne words) base.unpersist(blocking = false)
    words.unpersist(blocking = false)
    import spark.implicits._
    merges.toSeq.toDF("merge_rank", "lhs", "rhs", "merged", "pair_count")
  }

  /** Tokenize text with a learned merge table: per-word symbol sequences
    * seeded from characters, merges applied in rank order (same replace
    * semantics as training), exploded back to one row per (doc, subword).
    * A pure narrow map at corpus scale — the merge table rides along as
    * `numMerges` stacked codegen'd replaces. Returns
    * [<id col>, word_pos, sub_pos, subword]. */
  def encode(docs: DataFrame, merges: Seq[(String, String)],
      textCol: String = "text", idCol: String = "doc_id",
      maxWordLen: Int = 20): DataFrame = {
    val seeded = docs
      .select(col(idCol), posexplode(split(lower(col(textCol)), "[^a-z]+"))
        .as(Seq("word_pos", "word")))
      .filter(length(col("word")) >= 1 && length(col("word")) <= maxWordLen)
      .withColumn("seq", initSeq(col("word")))
    val applied = merges.foldLeft(seeded) { case (df, (l, r)) =>
      df.withColumn("seq", replace(col("seq"), lit(s" $l  $r "), lit(s" ${l + r} ")))
    }
    applied.select(col(idCol), col("word_pos"),
      posexplode(split(trim(col("seq")), "  ")).as(Seq("sub_pos", "subword")))
  }

  /** Per-document subword ARRAYS under a learned merge table — the same
    * math as [[encode]] folded into one narrow projection (words and
    * merges applied inside array lambdas, subwords flattened per doc):
    * one output row per document instead of one per subword occurrence,
    * which is the shape a STREAMING tokenizer stage wants (sink traffic
    * = docs, not occurrences; the per-word merge chain runs exactly
    * once either way). Returns [<id col>, subwords: array<string>]. */
  def encodeDocSubwords(docs: DataFrame, merges: Seq[(String, String)],
      textCol: String = "text", idCol: String = "doc_id",
      maxWordLen: Int = 20): DataFrame = {
    val words = filter(split(lower(col(textCol)), "[^a-z]+"),
      w => length(w) >= 1 && length(w) <= maxWordLen)
    def merged(w: Column): Column = merges.foldLeft(initSeq(w)) {
      case (c, (l, r)) => replace(c, lit(s" $l  $r "), lit(s" ${l + r} "))
    }
    docs.select(col(idCol),
      flatten(transform(words, w => split(trim(merged(w)), "  "))).as("subwords"))
  }

  /** Corpus subword frequencies under a learned merge table, computed on
    * the VOCABULARY: occurrences(subword) = Σ over distinct words of
    * wordCount × (occurrences of the subword in that word's merged
    * sequence) — so the corpus-proportional work stays the single
    * word-count shuffle, and the merge/explode/re-aggregate all run on
    * the Zipf-bounded word table. Returns [subword, n_occ]. */
  def subwordCounts(docs: DataFrame, merges: Seq[(String, String)],
      textCol: String = "text", maxWordLen: Int = 20): DataFrame = {
    val words = wordCounts(docs, textCol, maxWordLen)
      .select(col("cnt"), initSeq(col("word")).as("seq"))
    val applied = merges.foldLeft(words) { case (df, (l, r)) =>
      df.withColumn("seq", replace(col("seq"), lit(s" $l  $r "), lit(s" ${l + r} ")))
    }
    applied
      .select(explode(split(trim(col("seq")), "  ")).as("subword"), col("cnt"))
      .groupBy(col("subword")).agg(sum(col("cnt")).as("n_occ"))
  }

  /** Tokenizer FERTILITY report per source — the health metric a
    * tokenizer is actually judged by in an LLM pipeline (subwords per
    * word / chars per subword): a mixture source whose fertility is far
    * above the corpus norm is under-served by the learned vocabulary
    * (its token budget buys fewer words), which skews every
    * token-budgeted mixing decision downstream.
    *
    * Scale shape mirrors [[subwordCounts]]: the corpus-proportional
    * work is ONE map-side-combined (source, word) count shuffle; the
    * merge chain then runs once per DISTINCT word (Zipf-bounded), and
    * piece counts join back on the word key. Piece count includes an
    * unmerged [[EndMarker]] element, consistent with [[encode]]'s
    * subword stream. All five aggregates are exact-integer sums with
    * ratios computed once at the end — no order-sensitive double
    * accumulation. Returns [source, n_words, n_tokens, n_az_chars,
    * fertility, chars_per_token] (one row per source with ≥1 word). */
  def fertilityBySource(docs: DataFrame, merges: Seq[(String, String)],
      textCol: String = "text", sourceCol: String = "source",
      maxWordLen: Int = 20): DataFrame = {
    val sw = docs
      .select(col(sourceCol).as("source"),
        explode(split(lower(col(textCol)), "[^a-z]+")).as("word"))
      .filter(length(col("word")) >= 1 && length(col("word")) <= maxWordLen)
      .groupBy(col("source"), col("word")).agg(count(lit(1)).as("occ"))
    val vocab = sw.select(col("word")).distinct()
      .withColumn("seq", initSeq(col("word")))
    val applied = merges.foldLeft(vocab) { case (d, (l, r)) =>
      d.withColumn("seq", replace(col("seq"), lit(s" $l  $r "), lit(s" ${l + r} ")))
    }
    val pieces = applied.select(col("word"),
      size(split(trim(col("seq")), "  ")).cast("long").as("pieces"))
    sw.join(pieces, Seq("word"))
      .groupBy(col("source"))
      .agg(sum(col("occ")).as("n_words"),
        sum(col("occ") * col("pieces")).as("n_tokens"),
        sum(col("occ") * length(col("word"))).as("n_az_chars"))
      .select(col("source"), col("n_words"), col("n_tokens"), col("n_az_chars"),
        round(col("n_tokens").cast("double") / col("n_words").cast("double"), 6)
          .as("fertility"),
        round(col("n_az_chars").cast("double") / col("n_tokens").cast("double"), 6)
          .as("chars_per_token"))
  }

  /** Per-document fertility counters as ONE narrow projection — the
    * STREAMING shape of [[fertilityBySource]]: word/subword/char counts
    * fold per row inside array lambdas (the [[encodeDocSubwords]]
    * merge-chain-in-a-lambda pattern), so an unbounded doc stream
    * carries one small integer row per document to the sink and the
    * per-source rollup ([[fertilityFromPerDoc]]) runs there. The per-
    * word merge work runs once per occurrence instead of once per
    * distinct word — the price of statelessness; the batch form stays
    * the vocab-bound default. Returns
    * [source, n_words, n_tokens, n_az_chars]. */
  def fertilityPerDoc(docs: DataFrame, merges: Seq[(String, String)],
      textCol: String = "text", sourceCol: String = "source",
      maxWordLen: Int = 20): DataFrame = {
    val words = filter(split(lower(col(textCol)), "[^a-z]+"),
      w => length(w) >= 1 && length(w) <= maxWordLen)
    def merged(w: Column): Column = merges.foldLeft(initSeq(w)) {
      case (c, (l, r)) => replace(c, lit(s" $l  $r "), lit(s" ${l + r} "))
    }
    docs.select(col(sourceCol).as("source"),
      size(words).cast("long").as("n_words"),
      aggregate(words, lit(0L), (acc, w) =>
        acc + size(split(trim(merged(w)), "  ")).cast("long")).as("n_tokens"),
      aggregate(words, lit(0L), (acc, w) =>
        acc + length(w).cast("long")).as("n_az_chars"))
  }

  /** The per-source rollup over [[fertilityPerDoc]] rows — exact
    * integer sums, ratios computed once (identical aggregation to
    * [[fertilityBySource]]'s, so stream == batch is structural).
    * Sources with zero qualifying words drop (no 0/0 row). */
  def fertilityFromPerDoc(perDoc: DataFrame): DataFrame =
    perDoc.groupBy(col("source"))
      .agg(sum(col("n_words")).as("n_words"),
        sum(col("n_tokens")).as("n_tokens"),
        sum(col("n_az_chars")).as("n_az_chars"))
      .filter(col("n_words") > 0L)
      .select(col("source"), col("n_words"), col("n_tokens"), col("n_az_chars"),
        round(col("n_tokens").cast("double") / col("n_words").cast("double"), 6)
          .as("fertility"),
        round(col("n_az_chars").cast("double") / col("n_tokens").cast("double"), 6)
          .as("chars_per_token"))
}
