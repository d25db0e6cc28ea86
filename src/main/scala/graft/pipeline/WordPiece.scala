package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed WordPiece tokenizer training + greedy encoding — the third
  * subword family next to [[Bpe]] (frequency-merge) and [[Unigram]]
  * (probabilistic prune): WordPiece merges the pair maximizing
  * LIKELIHOOD GAIN, count(l,r) / (count(l)·count(r)) (Schuster & Nakajima
  * 2012; the BERT tokenizer), and encodes with greedy
  * longest-match-first over the learned vocabulary, word-internal pieces
  * carrying the `##` continuation prefix.
  *
  * Spark-first shape (the [[Bpe]] skeleton): the ONLY corpus-proportional
  * work is the single word-count shuffle; every merge round runs three
  * vocabulary-bounded aggregations (adjacent-pair counts, symbol counts,
  * and their score join) over the Zipf-bounded distinct-word table, and
  * greedy encoding runs entirely on that same table (per-corpus cost =
  * one shuffle, regardless of corpus size).
  *
  * Engine-exact argmax: the likelihood ratio is compared on a fixed
  * integer grid, `(pc · scoreGrid) div (c_l · c_r)` — pure BIGINT
  * arithmetic in both Spark and any SQL engine (the unigram trainer's
  * 9-decimal-grid precedent), with (raw pair count, lhs, rhs) breaking
  * grid ties. [[train]] REQUIRES corpus counts small enough that the
  * grid product stays in signed-64 range and raises otherwise —
  * tokenizer vocabularies are learned on a bounded sample shard in any
  * production pipeline (the SentencePiece/HF norm), so the bound is the
  * operator's documented contract, not a scale ceiling of the engine.
  *
  * Reference scope note: bigartm tokenizes upstream of the engine
  * (src/artm/core/token.h treats tokens as opaque strings); subword
  * vocabulary learning is a beyond-reference training-data operator.
  */
object WordPiece {

  /** Continuation prefix of word-internal pieces (the BERT convention). */
  val ContMarker = "##"

  /** The whole-word fallback piece for words greedy matching cannot
    * cover (a character unseen in training). */
  val UnkPiece = "[UNK]"

  /** ` f  ##o  ##o  ##d ` — first char bare, the rest `##`-prefixed;
    * leading/trailing single space, double-space separators (the [[Bpe]]
    * sequence encoding, so `replace`-based merge application and
    * [[Bpe.pairsOf]] work unchanged). NB: `sequence(2, stop)` DESCENDS
    * when stop < 2 (the unigram lesson) — single-char words guard to an
    * empty continuation array. */
  private[pipeline] def initSeq(word: Column): Column = {
    val cont = when(length(word) === 1, array().cast("array<string>"))
      .otherwise(transform(sequence(lit(2), length(word)),
        i => concat(lit(ContMarker), word.substr(i, lit(1)))))
    concat(lit(" "),
      array_join(concat(array(word.substr(lit(1), lit(1))), cont), "  "),
      lit(" "))
  }

  /** Learned merge operations, best likelihood score first:
    * [merge_rank, lhs, rhs, merged, pair_count, score_g] where
    * `merged = lhs + rhs-without-##` and `score_g` is the integer-grid
    * likelihood score the argmax ran on. Each round: ONE pair-count
    * aggregation + ONE symbol-count aggregation over the word table,
    * a vocabulary-keyed score join, and a single collected argmax row
    * (bounded driver state — the [[Bpe.train]] job-count boundary);
    * merge applications stack as codegen'd `replace`s with the same
    * `checkpointEvery` lineage cut. */
  def train(docs: DataFrame, numMerges: Int, textCol: String = "text",
      maxWordLen: Int = 12, scoreGrid: Long = 1000000000L,
      checkpointEvery: Int = 16): DataFrame = {
    val spark = docs.sparkSession
    val wc = Bpe.wordCounts(docs, textCol, maxWordLen)
    // grid-arithmetic contract: pc·grid and c_l·c_r must fit signed 64.
    // pc <= total tokens; symbol counts <= total chars.
    val bounds = wc.agg(
      sum(col("cnt")).as("toks"),
      sum(col("cnt") * length(col("word"))).as("chars")).head()
    val (toks, chars) = (bounds.getLong(0), bounds.getLong(1))
    require(toks <= Long.MaxValue / scoreGrid,
      s"WordPiece.train: $toks tokens overflow the $scoreGrid score grid" +
        " — train on a bounded sample shard (the tokenizer-training norm)" +
        " or lower scoreGrid")
    require(chars <= 3037000499L, // floor(sqrt(Long.MaxValue))
      s"WordPiece.train: $chars chars overflow the score denominator" +
        " — train on a bounded sample shard")
    val words = wc.select(col("cnt"), initSeq(col("word")).as("seq")).persist()
    words.count()
    val merges =
      scala.collection.mutable.ArrayBuffer.empty[(Long, String, String, String, Long, Long)]
    var base = words
    var prevBase: DataFrame = null
    var stacked = 0
    var cur = words
    var round = 1
    var exhausted = false
    while (round <= numMerges && !exhausted) {
      val pairs = cur
        .select(explode(Bpe.pairsOf(col("seq"))).as("p"), col("cnt"))
        .groupBy(col("p.l").as("l"), col("p.r").as("r"))
        .agg(sum(col("cnt")).as("pc"))
      val syms = cur
        .select(explode(split(trim(col("seq")), "  ")).as("s"), col("cnt"))
        .groupBy(col("s")).agg(sum(col("cnt")).as("c"))
      val top = pairs
        .join(syms.select(col("s").as("l"), col("c").as("cl")), Seq("l"))
        .join(syms.select(col("s").as("r"), col("c").as("cr")), Seq("r"))
        .withColumn("sc", expr(s"(pc * ${scoreGrid}L) div (cl * cr)"))
        .orderBy(col("sc").desc, col("pc").desc, col("l"), col("r"))
        .limit(1)
        .collect()
      if (top.isEmpty) exhausted = true
      else {
        val row = top(0)
        val (l, r) = (row.getAs[String]("l"), row.getAs[String]("r"))
        val merged = l + r.stripPrefix(ContMarker)
        merges += ((round.toLong, l, r, merged,
          row.getAs[Long]("pc"), row.getAs[Long]("sc")))
        cur = cur.withColumn("seq",
          replace(col("seq"), lit(s" $l  $r "), lit(s" $merged ")))
        stacked += 1
        if (stacked >= checkpointEvery && round < numMerges) {
          val next = cur.persist()
          next.count()
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
    merges.toSeq
      .toDF("merge_rank", "lhs", "rhs", "merged", "pair_count", "score_g")
  }

  /** The encoding vocabulary implied by a corpus + merge table: every
    * initial symbol the corpus produces (bare first chars + `##`
    * continuations — bounded by the alphabet, collected driver-side)
    * plus each merge's output. Deterministic order (sorted). */
  def vocabulary(docs: DataFrame, mergedPieces: Seq[String],
      textCol: String = "text", maxWordLen: Int = 12): Seq[String] = {
    val singles = Bpe.wordCounts(docs, textCol, maxWordLen)
      .select(explode(split(trim(initSeq(col("word"))), "  ")).as("s"))
      .filter(length(col("s")) <= ContMarker.length + 1) // initial symbols only
      .distinct().collect().map(_.getString(0)).toSeq
    (singles ++ mergedPieces).distinct.sorted
  }

  /** Corpus subword frequencies under greedy longest-match-first
    * encoding (the WordPiece/BERT algorithm): per word, repeatedly take
    * the LONGEST vocabulary piece at the cursor (bare form at position
    * 1, `##` form after), up to `maxPieceLen` consumed chars per piece
    * (the bounded-longest-match contract — the unigram trainer's
    * UniMaxPiece precedent, identical on the SQL mirror); a position
    * with no match makes the whole word [[UnkPiece]]. Runs ENTIRELY on
    * the distinct-word table weighted by word count — the corpus pays
    * one shuffle. The greedy walk unrolls as `maxWordLen` stacked
    * narrow projections; the vocabulary rides as a literal array
    * (alphabet + merges — tens of entries). Returns [subword, n_occ]. */
  def encodeCounts(docs: DataFrame, vocab: Seq[String],
      textCol: String = "text", maxWordLen: Int = 12,
      maxPieceLen: Int = 8): DataFrame = {
    // broadcast-HashSet walk over the distinct-word table, NOT the
    // greedyPieces expression: the expression's candidate lookup is an
    // array_contains LINEAR scan of the vocabulary literal, run
    // words × maxWordLen steps × maxPieceLen lengths times through an
    // interpreted aggregate() HOF (and its unrolled whens are a large
    // codegen compile on first run). greedyWord replicates the walk
    // exactly (same longest-match order, same ## bookkeeping,
    // whole-word [UNK] on failure — the WordPieceSpec parity unit), so
    // the per-word cost drops to hash lookups. Same shape
    // encodeDocPieces already uses for the per-doc form.
    val spark = docs.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(vocab.toSet)
    Bpe.wordCounts(docs, textCol, maxWordLen)
      .select(col("word").cast("string"), col("cnt").cast("long"))
      .as[(String, Long)]
      .mapPartitions { it =>
        val v = bc.value
        it.flatMap { case (w, cnt) =>
          greedyWord(w, v, maxPieceLen).map(p => (p, cnt)) }
      }
      .toDF("subword", "cnt")
      .groupBy(col("subword")).agg(sum(col("cnt")).as("n_occ"))
  }

  /** Per-document piece ARRAYS under greedy longest-match encoding —
    * the [[encodeCounts]] math applied per word of each document and
    * flattened to one row per doc (the [[Bpe.encodeDocSubwords]]
    * shape a STREAMING tokenizer stage wants: sink traffic = docs, not
    * occurrences). Returns [<id col>, pieces: array<string>]. */
  def encodeDocPieces(docs: DataFrame, vocab: Seq[String],
      textCol: String = "text", idCol: String = "doc_id",
      maxWordLen: Int = 12, maxPieceLen: Int = 8): DataFrame = {
    // broadcast-HashSet mapPartitions, NOT the greedyPieces expression:
    // array_contains over a typedlit vocab is a LINEAR scan per
    // candidate lookup (the classify_nb_stream lesson), and the per-DOC
    // encode runs it words × steps × lengths times per row — measured
    // ~29 s at sf0.1 on the streamed entry vs ~3 s for this form. The
    // walk below replicates [[greedyPieces]] exactly (same split, same
    // longest-match order, same ## bookkeeping, whole-word [UNK] on
    // any failed position), pinned by a parity unit.
    val spark = docs.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(vocab.toSet)
    docs.select(col(idCol).cast("long"), col(textCol).cast("string"))
      .as[(Long, String)]
      .mapPartitions { it =>
        val v = bc.value
        it.map { case (id, text) =>
          // UTF8String lowercase = Spark lower() (not String.toLowerCase)
          val lowered = org.apache.spark.unsafe.types.UTF8String
            .fromString(text).toLowerCase.toString
          val pieces = lowered.split("[^a-z]+").iterator
            .filter(w => w.nonEmpty && w.length <= maxWordLen)
            .flatMap(w => greedyWord(w, v, maxPieceLen))
            .toArray
          (id, pieces)
        }
      }
      .toDF(idCol, "pieces")
  }

  /** The driver/executor-side twin of [[greedyPieces]]: greedy
    * longest-match-first over a HashSet vocab — identical output by
    * construction (parity unit in WordPieceSpec). */
  private[graft] def greedyWord(w: String, vocab: Set[String],
      maxPieceLen: Int): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var pos = 0
    while (pos < w.length) {
      var found: String = null
      var l = math.min(maxPieceLen, w.length - pos)
      while (l >= 1 && found == null) {
        val sub = w.substring(pos, pos + l)
        val form = if (pos == 0) sub else ContMarker + sub
        if (vocab.contains(form)) found = form
        l -= 1
      }
      if (found == null) return Seq(UnkPiece) // whole-word fallback
      out += found
      pos += found.length - (if (pos == 0) 0 else ContMarker.length)
    }
    out.toSeq
  }

  /** The greedy longest-match-first walk of one word as a single
    * column: ONE aggregate() HOF running `maxWordLen` steps over a
    * (pos, pieces, failed) struct state at RUNTIME — never maxWordLen
    * stacked projections, whose maxWordLen × maxPieceLen unrolled
    * candidate whens (each embedding the vocabulary literal) blew past
    * Janino's method limit and dropped the stage to interpreted
    * fallback. `word` may be an outer column or a lambda variable. */
  private[graft] def greedyPieces(word: Column, vocab: Seq[String],
      maxWordLen: Int, maxPieceLen: Int): Column = {
    val vLit = typedlit(vocab)
    def step(st: Column): Column = {
      val pos = st.getField("pos")
      val pieces = st.getField("pieces")
      val failed = st.getField("failed")
      val rem = length(word) - pos + 1
      val longest = (maxPieceLen to 1 by -1)
        .foldLeft(lit(null).cast("string")) { (acc, l) =>
          val sub = word.substr(pos, lit(l))
          val form = when(pos === 1, sub)
            .otherwise(concat(lit(ContMarker), sub))
          coalesce(acc, when(rem >= l && array_contains(vLit, form), form))
        }
      val piece = when(!failed && pos <= length(word), longest)
      struct(
        when(piece.isNotNull,
          pos + length(piece) -
            when(pos > 1, lit(ContMarker.length)).otherwise(lit(0)))
          .otherwise(pos).as("pos"),
        when(piece.isNotNull, concat(pieces, array(piece)))
          .otherwise(pieces).as("pieces"),
        (failed || (pos <= length(word) && piece.isNull)).as("failed"))
    }
    val start = struct(lit(1).as("pos"),
      array().cast("array<string>").as("pieces"), lit(false).as("failed"))
    aggregate(
      sequence(lit(1), lit(maxWordLen)), start,
      (st, _) => step(st),
      st => when(st.getField("failed"), array(lit(UnkPiece)))
        .otherwise(st.getField("pieces")))
  }
}
