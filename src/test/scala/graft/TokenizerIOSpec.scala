package graft

import org.apache.spark.sql.functions._
import graft.pipeline.{Bpe, Unigram, WordPiece}
import graft.sources.TokenizerIO

/** TokenizerIO round-trips: a loaded artifact must encode BIT-IDENTICALLY
  * to the in-memory one for all three tokenizer families. */
class TokenizerIOSpec extends SparkSpec {
  import spark.implicits._

  private lazy val corpus = Seq(
    (1L, "the cat sat on the mat"),
    (2L, "the cat ate the rat"),
    (3L, "a mat a rat a cat"),
    (4L, "rats and cats sat and sat")).toDF("doc_id", "text")

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).resolve("art").toString

  test("BPE merges round-trip and the loaded table encodes identically") {
    val trained = Bpe.train(corpus, numMerges = 6, maxWordLen = 10)
      .orderBy(col("merge_rank")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getString(3), r.getLong(4))).toSeq
    val p = tmp("graft_bpeio")
    TokenizerIO.saveBpe(spark, trained, p)
    val loaded = TokenizerIO.loadBpe(spark, p)
    assert(loaded == trained, "BPE merge table drifted through parquet")
    val a = Bpe.subwordCounts(corpus, trained.map(m => (m._2, m._3)),
      maxWordLen = 10).orderBy(col("subword")).collect().toSeq
    val b = Bpe.subwordCounts(corpus, loaded.map(m => (m._2, m._3)),
      maxWordLen = 10).orderBy(col("subword")).collect().toSeq
    assert(a == b, "loaded BPE merges encode differently")
  }

  test("WordPiece vocab round-trips in position order and encodes identically") {
    val merged = WordPiece.train(corpus, numMerges = 6, maxWordLen = 10)
      .orderBy(col("merge_rank")).collect().map(_.getString(3)).toSeq
    val vocab = WordPiece.vocabulary(corpus, merged, maxWordLen = 10)
    val p = tmp("graft_wpio")
    TokenizerIO.saveWordPiece(spark, vocab, p)
    val loaded = TokenizerIO.loadWordPiece(spark, p)
    assert(loaded == vocab, "WordPiece vocab order drifted through parquet")
    val a = WordPiece.encodeCounts(corpus, vocab, maxWordLen = 10,
      maxPieceLen = 6).orderBy(col("subword")).collect().toSeq
    val b = WordPiece.encodeCounts(corpus, loaded, maxWordLen = 10,
      maxPieceLen = 6).orderBy(col("subword")).collect().toSeq
    assert(a == b, "loaded WordPiece vocab encodes differently")
  }

  test("Unigram model round-trips with exact IEEE doubles and segments identically") {
    val model = Unigram.trainModel(corpus, seedSize = 40, rounds = 2,
      maxWordLen = 10, maxPieceLen = 4)
    val p = tmp("graft_uniio")
    TokenizerIO.saveUnigram(spark, model, p)
    val loaded = TokenizerIO.loadUnigram(spark, p)
    assert(loaded.maxPieceLen == model.maxPieceLen)
    assert(loaded.lnp.size == model.lnp.size)
    // bit-exact: compare raw long bits, not ==, to catch any decimal detour
    model.lnp.foreach { case (piece, v) =>
      val lv = loaded.lnp(piece)
      assert(java.lang.Double.doubleToRawLongBits(lv) ==
        java.lang.Double.doubleToRawLongBits(v),
        s"lnp($piece) drifted: $v vs $lv")
    }
    val words = Seq("cats", "thecatmat", "rat")
    words.foreach { w =>
      assert(Unigram.segment(w, loaded) == Unigram.segment(w, model),
        s"segmentation of '$w' drifted through the artifact")
    }
  }
}
