package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native expression: the MinHash signature of a shingle array in ONE
  * pass — the fused form of
  * `array((0 until numHashes).map(i => array_min(transform(sh, s =>
  * md5(concat(lit(i + " "), s))))))`, which evaluates `numHashes`
  * interpreted HOF lambdas per row (higher-order functions do not
  * participate in codegen), each allocating a concat buffer and a
  * 32-char hex string per shingle, then re-traversing the array for the
  * min. Value-identical by construction:
  *
  *  - element i is `min_s md5hex(i + " " + s)` — the same UTF-8 bytes
  *    are digested (decimal i, one 0x20, the shingle bytes);
  *  - the minimum is taken on the RAW 16-byte digests compared as
  *    unsigned bytes, which equals lexicographic order of the lowercase
  *    hex strings (hex digits '0'..'9','a'..'f' are ASCII-monotonic in
  *    the nibble value), so only `numHashes` hex strings are ever
  *    materialized per row instead of numHashes × |shingles|;
  *  - an EMPTY shingle array yields `numHashes` nulls, exactly what
  *    `array_min(transform([], …))` produced (every call site filters
  *    `size(sh) > 0` before signing, but the edge is preserved).
  *
  * One ThreadLocal MessageDigest serves all rows of a task. Codegen is
  * a single static call (the SimhashBands pattern), keeping the
  * signature projection inside whole-stage codegen. */
case class MinhashSignature(child: Expression, numHashes: Int)
    extends UnaryExpression {
  require(numHashes >= 1, s"minhash needs numHashes >= 1, got $numHashes")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_minhash requires array<string>, got $other")
  }
  override def dataType: DataType = ArrayType(StringType, containsNull = true)
  override def prettyName: String = "graft_minhash"

  override def nullSafeEval(input: Any): Any =
    MinhashSignature.compute(input.asInstanceOf[ArrayData], numHashes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.MinhashSignature.compute($c, $numHashes)")

  override protected def withNewChildInternal(
      newChild: Expression): MinhashSignature = copy(child = newChild)
}

object MinhashSignature {
  private val digests = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }
  // "i " prefixes, grown on demand (numHashes is a small constant per plan)
  @volatile private var prefixes: Array[Array[Byte]] = Array.empty
  private def prefix(i: Int): Array[Byte] = {
    var p = prefixes
    if (i >= p.length) synchronized {
      p = prefixes
      if (i >= p.length) {
        val np = java.util.Arrays.copyOf(p, i + 1)
        var j = p.length
        while (j < np.length) {
          np(j) = (j.toString + " ")
            .getBytes(java.nio.charset.StandardCharsets.UTF_8)
          j += 1
        }
        prefixes = np
        p = np
      }
    }
    p(i)
  }
  private val HexChars = "0123456789abcdef".toCharArray

  /** Unsigned byte-wise less-than of two 16-byte digests. */
  private def less(a: Array[Byte], b: Array[Byte]): Boolean = {
    var i = 0
    while (i < 16) {
      val ai = a(i) & 0xff
      val bi = b(i) & 0xff
      if (ai != bi) return ai < bi
      i += 1
    }
    false
  }

  def compute(sh: ArrayData, numHashes: Int): GenericArrayData = {
    val n = sh.numElements()
    val out = new Array[Any](numHashes)
    if (n == 0) return new GenericArrayData(out) // all nulls, the HOF edge
    val md = digests.get()
    val mins = new Array[Array[Byte]](numHashes)
    var j = 0
    while (j < n) {
      // shingle arrays are produced by array_distinct over non-null
      // grams — elements are never null, but a null would have md5'd as
      // null and been ignored by array_min, so skip it the same way
      if (!sh.isNullAt(j)) {
        val sBytes = sh.getUTF8String(j).getBytes
        var i = 0
        while (i < numHashes) {
          md.reset()
          md.update(prefix(i))
          md.update(sBytes)
          val d = md.digest()
          if (mins(i) == null || less(d, mins(i))) mins(i) = d
          i += 1
        }
      }
      j += 1
    }
    var i = 0
    while (i < numHashes) {
      if (mins(i) != null) {
        val hex = new Array[Char](32)
        var b = 0
        while (b < 16) {
          val v = mins(i)(b) & 0xff
          hex(b * 2) = HexChars(v >>> 4)
          hex(b * 2 + 1) = HexChars(v & 0xf)
          b += 1
        }
        out(i) = UTF8String.fromString(new String(hex))
      }
      i += 1
    }
    new GenericArrayData(out)
  }
}
