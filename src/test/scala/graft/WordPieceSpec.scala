package graft

import graft.pipeline.WordPiece

/** WordPiece tokenizer semantics on crafted fixtures: the likelihood
  * merge rule (NOT raw frequency — the distinction from BPE), the `##`
  * continuation bookkeeping through merges, greedy longest-match-first
  * encoding, and the [UNK] whole-word fallback. */
class WordPieceSpec extends SparkSpec {
  import spark.implicits._

  test("train picks the likelihood-max pair, not the frequency-max pair") {
    // Corpus: "ab" x5, "cacb" x4 (chars only, single words).
    //   ab x5       -> seqs: ' a  ##b ' x5
    //   cacb x4     -> seqs: ' c  ##a  ##c  ##b ' x4
    // Pair counts: (a,##b)=5, (c,##a)=4, (##a,##c)=4, (##c,##b)=4.
    // Symbol counts: a=5, ##b=9, c=4, ##a=4, ##c=4.
    // Likelihood grid scores (x1e9):
    //   (a,##b):   5/(5*9)  = 0.1111 -> 111111111
    //   (c,##a):   4/(4*4)  = 0.25   -> 250000000
    //   (##a,##c): 4/(4*4)  = 0.25   -> 250000000
    //   (##c,##b): 4/(4*9)  = 0.1111 -> 111111111
    // Frequency would pick (a,##b) [pc=5]; likelihood picks the
    // 0.25-scoring pairs, tie broken lexicographically: ##a < c.
    val docs = Seq((0L, ("ab " * 5) + ("cacb " * 4))).toDF("doc_id", "text")
    val m = WordPiece.train(docs, numMerges = 1).collect()
    assert(m.length === 1)
    assert(m(0).getAs[String]("lhs") === "##a")
    assert(m(0).getAs[String]("rhs") === "##c")
    assert(m(0).getAs[String]("merged") === "##ac") // ## stripped from rhs
    assert(m(0).getAs[Long]("pair_count") === 4L)
    assert(m(0).getAs[Long]("score_g") === 250000000L)
  }

  test("merged word-initial pieces stay bare; vocabulary collects both forms") {
    // "fo" x3: seqs ' f  ##o ' -> only pair (f,##o), merged = "fo" (bare).
    val docs = Seq((0L, "fo fo fo")).toDF("doc_id", "text")
    val m = WordPiece.train(docs, numMerges = 1).collect()
    assert(m(0).getAs[String]("merged") === "fo")
    val vocab = WordPiece.vocabulary(docs, Seq("fo"))
    assert(vocab === Seq("##o", "f", "fo"))
  }

  test("encodeCounts: greedy longest-match-first with ## continuations") {
    // vocab has both the short and long continuations of "abc": greedy
    // at pos 2 must take ##bc (longest), never ##b.
    val docs = Seq((0L, "abc abc")).toDF("doc_id", "text")
    val vocab = Seq("a", "##b", "##c", "##bc")
    val out = WordPiece.encodeCounts(docs, vocab).collect()
      .map(r => r.getAs[String]("subword") -> r.getAs[Long]("n_occ")).toMap
    assert(out === Map("a" -> 2L, "##bc" -> 2L))
  }

  test("encodeCounts: a position with no vocabulary match makes the word [UNK]") {
    // vocab covers a/##b but not ##z: "abz" fails at pos 3 -> [UNK];
    // "ab" still encodes.
    val docs = Seq((0L, "abz ab")).toDF("doc_id", "text")
    val vocab = Seq("a", "##b")
    val out = WordPiece.encodeCounts(docs, vocab).collect()
      .map(r => r.getAs[String]("subword") -> r.getAs[Long]("n_occ")).toMap
    assert(out === Map(WordPiece.UnkPiece -> 1L, "a" -> 1L, "##b" -> 1L))
  }

  test("train + encode round-trip: learned pieces cover the corpus, no [UNK]") {
    val docs = Seq(
      (0L, "hugging hugging hugs hugs hugs pug pug"),
      (1L, "hug hug hug bug bug dug")).toDF("doc_id", "text")
    val merges = WordPiece.train(docs, numMerges = 6)
      .orderBy("merge_rank").collect()
    val vocab = WordPiece.vocabulary(docs,
      merges.map(_.getAs[String]("merged")).toSeq)
    val out = WordPiece.encodeCounts(docs, vocab).collect()
    assert(out.nonEmpty)
    assert(!out.exists(_.getAs[String]("subword") === WordPiece.UnkPiece),
      "self-trained vocabulary must cover its own corpus")
    // mass conservation: total encoded char mass == total corpus char mass
    val encChars = out.map(r => (r.getAs[String]("subword")
      .stripPrefix(WordPiece.ContMarker).length) * r.getAs[Long]("n_occ")).sum
    val rawChars = "hugging hugging hugs hugs hugs pug pug hug hug hug bug bug dug"
      .split(" ").map(_.length.toLong).sum
    assert(encChars === rawChars)
  }

  test("encodeDocPieces (broadcast-set walk) == the greedyPieces expression form") {
    import org.apache.spark.sql.functions._
    val docs = Seq(
      (1L, "The CATS sat; cats-sat cat!"),
      (2L, "zzz qqq catsat"),
      (3L, ""),
      (4L, "supercalifragilistic cat")).toDF("doc_id", "text")
    val vocab = Seq("cat", "##s", "##sat", "sat", "s", "##a", "##t",
      "c", "##c", "z", "##z")
    val fast = WordPiece.encodeDocPieces(docs, vocab,
        maxWordLen = 12, maxPieceLen = 5)
      .orderBy(col("doc_id")).collect()
      .map(r => (r.getLong(0), r.getSeq[String](1).toList)).toList
    // the expression form (the pre-optimization path), inline
    val words = filter(split(lower(col("text")), "[^a-z]+"),
      w => length(w) >= 1 && length(w) <= 12)
    val expr = docs.select(col("doc_id"),
      flatten(transform(words,
        w => WordPiece.greedyPieces(w, vocab, 12, 5))).as("pieces"))
      .orderBy(col("doc_id")).collect()
      .map(r => (r.getLong(0), r.getSeq[String](1).toList)).toList
    assert(fast == expr, s"fast walk drifted from the expression form:\n$fast\nvs\n$expr")
    // spot semantics: "cats" = cat + ##s; "the" has no word-initial
    // match -> whole-word [UNK]
    val d1 = fast.find(_._1 == 1L).get._2
    assert(d1.contains("cat") && d1.contains("##s")
      && d1.contains(WordPiece.UnkPiece), d1.toString)
    // a word with an unmatchable position collapses to [UNK]
    val d2 = fast.find(_._1 == 2L).get._2
    assert(d2.contains(WordPiece.UnkPiece), d2.toString)
  }

  test("train refuses corpora that overflow the integer score grid") {
    val docs = Seq((0L, "ab ab")).toDF("doc_id", "text")
    val e = intercept[IllegalArgumentException] {
      WordPiece.train(docs, numMerges = 1, scoreGrid = Long.MaxValue)
    }
    assert(e.getMessage.contains("score grid"))
  }
}
