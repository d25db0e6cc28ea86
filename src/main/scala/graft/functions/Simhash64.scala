package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native expression: 64-bit SimHash of a text column — the per-row form
  * of [[graft.pipeline.Dedup.simhash]]'s typed-map kernel, exposed to the
  * SQL surface as `graft_simhash`. Bit j of the fingerprint is the sign
  * of Σ_tokens count·(±1 per bit j of md5(token) first-8-bytes
  * big-endian); whitespace tokenization over lowercased trimmed text;
  * blank text → 0. Byte-for-byte the same arithmetic as the Dataset
  * kernel (asserted by SqlSurfaceSpec), so SQL users can band the result
  * with `shiftrightunsigned(sig, b*16) & 0xffff` exactly as
  * `Dedup.simhashPairs` does.
  *
  * The 64-accumulator inner loop cannot be expressed with builtin
  * columnar HOFs (the same justification as the Dataset kernel); codegen
  * emits one static call per row, keeping the surrounding projection
  * inside whole-stage codegen. */
case class SimhashBands(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_simhash requires string, got $other")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_simhash"

  override def nullSafeEval(input: Any): Any =
    SimhashBands.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.SimhashBands.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): SimhashBands =
    copy(child = newChild)
}

object SimhashBands {
  /** The kernel — identical arithmetic to Dedup.simhash's map body. */
  def compute(text: UTF8String): Long = {
    val s = if (text == null) "" else text.toString
    val counts = new java.util.HashMap[String, Int]()
    s.toLowerCase.trim.split("\\s+")
      .filter(_.nonEmpty).foreach(t => counts.merge(t, 1, (a, b) => a + b))
    val md = java.security.MessageDigest.getInstance("MD5")
    val acc = new Array[Long](64)
    counts.forEach { (tok, n) =>
      val d = md.digest(tok.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      var h = 0L
      var b = 0
      while (b < 8) { h = (h << 8) | (d(b) & 0xffL); b += 1 }
      var j = 0
      while (j < 64) {
        if (((h >>> j) & 1L) == 1L) acc(j) += n else acc(j) -= n
        j += 1
      }
    }
    var fp = 0L
    var j = 0
    while (j < 64) { if (acc(j) > 0) fp |= (1L << j); j += 1 }
    fp
  }
}
