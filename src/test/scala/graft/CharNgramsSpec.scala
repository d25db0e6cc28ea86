package graft

import org.apache.spark.sql.functions._
import graft.pipeline.TextAnalysis

/** Pins the one-pass native char n-gram extractor
  * ([[graft.functions.CharNgrams]]) bit-equal to the HOF shape it
  * replaced (`transform(sequence(1, length−(n−1)), i => substr(i, n))`)
  * over the UTF-8 edge cases that matter: multi-byte code points,
  * surrogate-pair emoji, strings shorter than n, and the empty string.
  * The r13 optimization swapped the extractor under languageIdNgram /
  * trainNbModelNgram / charEntropy(/Gate); equality here is what keeps
  * those entries' oracle hashes untouched. */
class CharNgramsSpec extends SparkSpec {

  private val fixtures = Seq(
    "hello world",
    "café au lait",          // 2-byte é
    "日本語の文", // 3-byte CJK
    "a😀b😁c",    // 4-byte emoji (surrogate pairs)
    "ab",                          // shorter than n=3
    "abc",                         // exactly n=3
    "",                            // empty
    "x",
    "  spaced  out  ")

  private def hofGrams(n: Int) =
    transform(sequence(lit(1), length(col("s")) - (n - 1)),
      i => col("s").substr(i, lit(n)))

  test("CharNgrams == positional-substr HOF for n=1..4 on UTF-8 edges") {
    import spark.implicits._
    val df = fixtures.toDF("s")
    (1 to 4).foreach { n =>
      val rows = df.select(col("s"),
          TextAnalysis.charNgramsCol(col("s"), n).as("fast"),
          // the HOF yields a DESCENDING sequence artifact when
          // length < n (sequence(1, 0) = [1, 0] is guarded by callers'
          // length >= n filters); compare only where the HOF is defined
          when(length(col("s")) >= n, hofGrams(n))
            .otherwise(array().cast("array<string>")).as("slow"))
        .collect()
      rows.foreach { r =>
        val s = r.getString(0)
        val fast = r.getSeq[String](1)
        val slow = r.getSeq[String](2)
        assert(fast == slow, s"n=$n mismatch on '$s': $fast vs $slow")
      }
    }
  }

  test("charEntropy empty-text pin survives the native split") {
    import spark.implicits._
    val out = TextAnalysis.charEntropy(
        Seq((1L, "aabb"), (2L, ""), (3L, "éé")).toDF("doc_id", "text"))
      .orderBy("doc_id").collect()
    assert(out(0).getLong(1) == 4L && out(0).getLong(2) == 2L)
    assert(out(1).getLong(1) == 0L && out(1).getDouble(3) == -1.0)
    assert(out(2).getLong(2) == 1L) // é counted as ONE code point
  }
}
