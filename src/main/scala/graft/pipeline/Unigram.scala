package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Unigram-LM subword tokenizer training (SentencePiece's unigram
  * model, Kudo 2018) — the OTHER production tokenizer family beside
  * [[Bpe]]: instead of greedy merge rules, a piece VOCABULARY with
  * log-probabilities is fit by EM, and encoding is the Viterbi-best
  * segmentation of each word under the model. This implementation is
  * the deterministic hard-EM (Viterbi-EM) variant:
  *
  *   seed:  all substrings (length ≤ maxPieceLen) of the corpus words,
  *          occurrence-weighted; vocab = every single char (keeps the
  *          DP total — any word segments char-by-char) + the top
  *          `seedSize` longer pieces by (count desc, piece asc)
  *   E:     Viterbi-segment every word: b(j) = max over k ≤ maxPieceLen
  *          of b(j−k) + lnp(word[j−k..j)), ties to the SHORTEST last
  *          piece; piece counts = emitted pieces weighted by word count
  *   M:     lnp(p) = ln(c_p + 1) − ln(T + V) over the UNCHANGED vocab
  *          (add-1 keeps unused pieces alive instead of a prune
  *          schedule — the deterministic-contract simplification)
  *
  * Every model lnp is ROUNDED TO 9 DECIMALS before the DP consumes it
  * (the ml_logreg weight-grid precedent): the DP then runs exclusively
  * exact IEEE add/negate/compare on identical inputs, so the argmax
  * path — and therefore every count — is bit-identical across engines,
  * which is what lets a per-word dynamic program sit under a SQL
  * oracle at all. Counts are exact longs.
  *
  * Shape at scale: the corpus pays ONE word-count shuffle; every EM
  * round is a narrow DP map over the Zipf-bounded word table plus a
  * map-side-combined piece count. The model (≤ seedSize + alphabet
  * pieces) is driver-held and broadcast — the NbModel/LmModel
  * broadcast-model contract. */
object Unigram {

  final case class Model(lnp: Map[String, Double], maxPieceLen: Int)

  private[pipeline] def words(docs: DataFrame, textCol: String,
      maxWordLen: Int): DataFrame =
    docs.select(explode(split(lower(col(textCol)), "[^a-z]+")).as("word"))
      .filter(length(col("word")) >= 1 && length(col("word")) <= maxWordLen)
      .groupBy(col("word"))
      .agg(count(lit(1)).as("cnt"))

  /** Occurrence-weighted counts of every substring with length ≤
    * maxPieceLen (the seed statistics). */
  private def seedCounts(w: DataFrame, maxPieceLen: Int): DataFrame = {
    // guard: Spark's sequence(1, stop) DESCENDS when stop < 1, so a
    // word shorter than l must yield an EMPTY grid, not garbage substrs
    val subs = flatten(transform(sequence(lit(1), lit(maxPieceLen)),
      l => when(length(col("word")) >= l,
        transform(sequence(lit(1), length(col("word")) - l + 1),
          s => col("word").substr(s, l)))
        .otherwise(array().cast("array<string>"))))
    w.select(explode(subs).as("piece"), col("cnt"))
      .groupBy(col("piece")).agg(sum(col("cnt")).as("c"))
  }

  private def round9(x: Double): Double = BigDecimal(x)
    .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble

  /** lnp table for a vocab given its counts: ln(c+1) − ln(T+V), T = Σc
    * over the vocab, rounded to the 9-decimal grid. */
  private def lnpOf(counts: Seq[(String, Long)]): Map[String, Double] = {
    val t = counts.map(_._2).sum.toDouble
    val v = counts.length.toDouble
    counts.map { case (p, c) =>
      p -> round9(math.log(c.toDouble + 1.0) - math.log(t + v))
    }.toMap
  }

  /** Viterbi segmentation of one word under the model; returns the
    * emitted pieces. Tie rule: strictly-better score wins; at equal
    * score the SMALLEST k (shortest last piece) wins — k iterates
    * ascending with a strict `<`, matching the SQL mirror's
    * least + `<=` CASE chain. */
  private[graft] def segment(word: String, m: Model): Seq[String] = {
    val n = word.length
    val b = new Array[Double](n + 1)
    val kc = new Array[Int](n + 1)
    var j = 1
    while (j <= n) {
      var bestNs = Double.MaxValue
      var bestK = 0
      var k = 1
      val kMax = math.min(m.maxPieceLen, j)
      while (k <= kMax) {
        m.lnp.get(word.substring(j - k, j)) match {
          case Some(p) =>
            val ns = -(b(j - k) + p)
            if (ns < bestNs) { bestNs = ns; bestK = k }
          case None =>
        }
        k += 1
      }
      // OOV guard: a character outside the vocab (impossible when the
      // model trained on this corpus, routine when SERVING new text)
      // must advance as a single unknown-char piece — bestK = 0 would
      // otherwise freeze the backtrack walk
      if (bestK == 0) { bestK = 1; bestNs = 1e300 }
      b(j) = -bestNs
      kc(j) = bestK
      j += 1
    }
    val out = scala.collection.mutable.ListBuffer.empty[String]
    var pos = n
    while (pos > 0) {
      val k = kc(pos)
      out.prepend(word.substring(pos - k, pos))
      pos -= k
    }
    out.toSeq
  }

  /** One E-step: Viterbi piece counts over the word table. */
  private def countPieces(w: DataFrame, m: Model): Seq[(String, Long)] = {
    val spark = w.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(m)
    w.select(col("word").cast("string"), col("cnt").cast("long"))
      .as[(String, Long)]
      .flatMap { case (word, cnt) =>
        segment(word, bc.value).iterator.map(p => (p, cnt)) }
      .toDF("piece", "cnt")
      .groupBy(col("piece")).agg(sum(col("cnt")).as("c"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toSeq
  }

  /** The shared EM core: seed vocab, `rounds` hard-EM iterations.
    * Returns (vocab size, last E-step counts, final model — i.e. the
    * model AFTER the last M-step, the serving artifact). */
  private def emLoop(docs: DataFrame, seedSize: Int, rounds: Int,
      maxWordLen: Int, maxPieceLen: Int,
      textCol: String): (Int, Seq[(String, Long)], Model) = {
    require(rounds >= 1 && seedSize >= 0 && maxPieceLen >= 1)
    val w = words(docs, textCol, maxWordLen)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    w.count()
    val seed = seedCounts(w, maxPieceLen)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val chars = seed.filter(length(col("piece")) === 1)
      .collect().map(r => r.getString(0) -> r.getLong(1))
    val multi = seed.filter(length(col("piece")) >= 2)
      .orderBy(col("c").desc, col("piece")).limit(seedSize)
      .collect().map(r => r.getString(0) -> r.getLong(1))
    seed.unpersist(false)
    val vocab0 = (chars ++ multi).sortBy(_._1)
    var model = Model(lnpOf(vocab0), maxPieceLen)
    var counts: Seq[(String, Long)] = Nil
    for (_ <- 1 to rounds) {
      counts = countPieces(w, model)
      // M-step over the UNCHANGED vocab: unused pieces get count 0
      val cMap = counts.toMap
      val t = counts.map(_._2).sum.toDouble
      val v = vocab0.length.toDouble
      model = Model(vocab0.map { case (p, _) =>
        p -> round9(math.log(cMap.getOrElse(p, 0L).toDouble + 1.0) -
          math.log(t + v))
      }.toMap, maxPieceLen)
    }
    w.unpersist(false)
    (vocab0.length, counts, model)
  }

  /** Train the serving [[Model]] (the artifact the streaming encode
    * broadcasts — the model after the final M-step). */
  def trainModel(docs: DataFrame, seedSize: Int = 200, rounds: Int = 2,
      maxWordLen: Int = 12, maxPieceLen: Int = 4,
      textCol: String = "text"): Model =
    emLoop(docs, seedSize, rounds, maxWordLen, maxPieceLen, textCol)._3

  /** Shape piece counts into the report [piece, cnt, lnp(6)]. */
  private[graft] def report(spark: org.apache.spark.sql.SparkSession,
      counts: Seq[(String, Long)], vocabSize: Int, reportK: Int): DataFrame = {
    import spark.implicits._
    val t = counts.map(_._2).sum.toDouble
    val v = vocabSize.toDouble
    counts.sortBy { case (p, c) => (-c, p) }.take(reportK)
      .map { case (p, c) =>
        val lnp = BigDecimal(math.log(c.toDouble + 1.0) - math.log(t + v))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
        (p, c, lnp)
      }.toDF("piece", "cnt", "lnp")
  }

  /** Train the unigram tokenizer; returns the top `reportK` pieces of
    * the final E-step as [piece, cnt, lnp] (lnp from the final counts,
    * rounded 6 for reporting). */
  def train(docs: DataFrame, seedSize: Int = 200, rounds: Int = 2,
      maxWordLen: Int = 12, maxPieceLen: Int = 4, reportK: Int = 50,
      textCol: String = "text"): DataFrame = {
    val (vocabSize, counts, _) =
      emLoop(docs, seedSize, rounds, maxWordLen, maxPieceLen, textCol)
    report(docs.sparkSession, counts, vocabSize, reportK)
  }
}
