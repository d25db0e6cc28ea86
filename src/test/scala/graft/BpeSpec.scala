package graft

import org.apache.spark.sql.functions._
import graft.pipeline.Bpe

/** BPE tokenizer training: hand-computed merge trajectory on the classic
  * subword-nmt style fixture, greedy-adjacent semantics of the
  * double-space replace encoding, and encode() round-trip. */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  private def fixture = Seq(
    (0L, "low low low lower lower newest newest"),
    (1L, "newest newest widest wider new aaaa")
  ).toDF("doc_id", "text")

  test("train reproduces the hand-computed merge trajectory (ties lexicographic)") {
    val m = Bpe.train(fixture, numMerges = 4).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getString(3), r.getLong(4)))
    // (w,e): lower x2 + newest x4 = 6; then a 3-way tie at 5 broken
    // lexicographically: (l,o) < (n,e) < (s,t)
    assert(m.toSeq === Seq(
      (1L, "w", "e", "we", 6L),
      (2L, "l", "o", "lo", 5L),
      (3L, "n", "e", "ne", 5L),
      (4L, "s", "t", "st", 5L)))
  }

  test("adjacent repeats merge greedily left-to-right, non-overlapping") {
    val docs = Seq((0L, "aaaa")).toDF("doc_id", "text")
    val m = Bpe.train(docs, numMerges = 2).collect()
      .map(r => (r.getString(1), r.getString(2), r.getLong(4)))
    // round 1: pairs (a,a)x3 beat (a,</w>)x1; replace is non-overlapping
    // left-to-right, so 'a a a a </w>' -> 'aa aa </w>' (greedy BPE).
    // round 2: (aa,aa)x1 ties (aa,</w>)x1; '</w>' < 'aa' bytewise.
    assert(m.toSeq === Seq(("a", "a", 3L), ("aa", "</w>", 1L)))
  }

  test("encode applies a merge table in rank order") {
    val docs = Seq((7L, "lower")).toDF("doc_id", "text")
    val subs = Bpe.encode(docs, Seq(("w", "e"), ("l", "o"), ("lo", "we")))
      .orderBy(col("word_pos"), col("sub_pos"))
      .select(col("subword")).as[String].collect()
    assert(subs.toSeq === Seq("lowe", "r", "</w>"))
  }

  test("subwordCounts weights by word frequency") {
    val sc = Bpe.subwordCounts(fixture, Seq(("w", "e"))).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // 'we': lower x2 + newest x4; 'w' survives in low x3, widest, wider,
    // new; every one of the 13 word instances ends with </w>
    assert(sc("we") === 6L)
    assert(sc("w") === 6L)
    assert(sc("</w>") === 13L)
  }

  test("word-boundary safety: a pair never matches across token boundaries") {
    // tokens [x a] [b]: the string ' x  a  b ... ' contains 'a  b' only as
    // whole tokens; merging (a,b) must not touch the 'a' inside 'xa'
    val docs = Seq((0L, "xab xab ab")).toDF("doc_id", "text")
    val subs = Bpe.encode(docs, Seq(("a", "b")))
      .filter(col("word_pos") === 0)
      .orderBy(col("sub_pos")).select(col("subword")).as[String].collect()
    assert(subs.toSeq === Seq("x", "ab", "</w>"))
  }

  test("encodeDocSubwords == encode occurrence counts (the streaming shape)") {
    import spark.implicits._
    val docs = Seq((0L, "abab cd! ab"), (1L, ""), (2L, "Cd cd 12 abab"))
      .toDF("doc_id", "text")
    val merges = Seq(("a", "b"), ("ab", "</w>"))
    val viaRows = Bpe.encode(docs, merges).groupBy("subword").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val viaArrays = Bpe.encodeDocSubwords(docs, merges)
      .select(explode(col("subwords")).as("subword"))
      .groupBy("subword").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(viaArrays === viaRows)
    assert(viaRows.nonEmpty)
  }
}
