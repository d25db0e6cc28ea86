package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native expression: all code-point `n`-grams of a string in ONE pass —
  * the O(len) replacement for the HOF shape
  * `transform(sequence(1, length(s) − (n−1)), i => s.substr(i, n))`,
  * whose per-position `substr(i, n)` re-scans the UTF-8 byte stream from
  * the string start to find code point i (UTF8String.substringSQL walks
  * boundaries), making gram extraction O(len²) byte traversals per row —
  * measured as the dominant task CPU of the char-trigram language-ID
  * entries and the char-entropy split at ~300-char docs, and growing
  * quadratically with document length at scale.
  *
  * Byte-for-byte the same output: code point boundaries are walked with
  * the same `UTF8String.numBytesForFirstByte` table `substringSQL` uses,
  * and each gram is the identical byte slice the per-position substring
  * would produce (no transcoding, no normalization). Strings shorter
  * than `n` code points yield an EMPTY array — every call site either
  * pre-filters `length >= n` (the n-gram extractors) or wraps the
  * empty-text edge explicitly (the char-entropy split's `['']` pin).
  *
  * The inner loop cannot be expressed with builtin columnar functions
  * without the quadratic re-scan (no positional-slice HOF exists for
  * strings, unlike arrays); codegen emits one static call per row so the
  * surrounding projection stays inside whole-stage codegen — the
  * SimhashBands justification. */
case class CharNgrams(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, s"char n-grams need n >= 1, got $n")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_char_ngrams requires string, got $other")
  }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_char_ngrams"

  override def nullSafeEval(input: Any): Any =
    CharNgrams.compute(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.CharNgrams.compute($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): CharNgrams =
    copy(child = newChild)
}

object CharNgrams {
  private val Empty = new GenericArrayData(Array.empty[Any])

  /** One boundary walk (code point i → byte offset), then each gram is a
    * zero-copy-ish byte slice [off(i), off(i+n)). Output strings equal
    * `substringSQL(i+1, n)` of the input for every i. */
  def compute(str: UTF8String, n: Int): GenericArrayData = {
    val bytes = str.getBytes // materialized once; grams slice this array
    val len = bytes.length
    // boundary offsets for all code points (offs(i) = byte start of cp i)
    var numChars = 0
    var b = 0
    while (b < len) {
      b += UTF8String.numBytesForFirstByte(bytes(b))
      numChars += 1
    }
    val count = numChars - n + 1
    if (count <= 0) return Empty
    val offs = new Array[Int](numChars + 1)
    var i = 0
    b = 0
    while (b < len) {
      offs(i) = b
      b += UTF8String.numBytesForFirstByte(bytes(b))
      i += 1
    }
    offs(numChars) = len
    val out = new Array[Any](count)
    var k = 0
    while (k < count) {
      out(k) = UTF8String.fromBytes(bytes, offs(k), offs(k + n) - offs(k))
      k += 1
    }
    new GenericArrayData(out)
  }
}
