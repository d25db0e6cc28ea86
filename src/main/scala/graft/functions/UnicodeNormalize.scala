package graft.functions

import java.text.Normalizer

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: Unicode normalization (NFC / NFD /
  * NFKC / NFKD) of a string column — the canonical-form pass a
  * multilingual crawl needs AHEAD of every hash-keyed operator. The
  * same sentence arrives from the web in composed (NFC) and decomposed
  * (NFD) code-point sequences — "é" as U+00E9 vs `e` + U+0301 — and
  * byte-keyed exact dedup, fingerprints, line dedup and minhash
  * shingles silently treat them as distinct documents. The reference
  * engine treats tokens as opaque byte strings
  * (`src/artm/core/token.h:1-86`) because its upstream tooling
  * normalizes; this engine IS the upstream, so the pass lives here.
  *
  * Execution shape: a pure per-row scalar that stays inside
  * whole-stage codegen (the CosineArgmax precedent — never a Scala
  * UDF). The generated code quick-checks `Normalizer.isNormalized`
  * first: for ASCII and already-normalized text (the overwhelming
  * majority of a real corpus) that check is a table-driven scan with
  * no allocation beyond the String view, and the input UTF8String is
  * returned untouched. Only rows that actually carry denormalized
  * sequences pay the normalize-and-re-encode cost.
  *
  * NFC is the dedup-correctness default (byte-identity for
  * canonically-equivalent text, lossless otherwise); NFKC additionally
  * folds compatibility forms (ligatures ﬁ→fi, full-width Ａ→A,
  * superscripts) — stronger recall for fingerprinting, lossy for
  * display. Registered in SQL as `graft_unicode_normalize(text, form)`.
  */
case class UnicodeNormalize(child: Expression, form: String)
    extends UnaryExpression {

  require(UnicodeNormalize.Forms.contains(form),
    s"graft_unicode_normalize: form must be one of " +
      s"${UnicodeNormalize.Forms.mkString(", ")}, got '$form'")

  @transient private lazy val nf = Normalizer.Form.valueOf(form)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_unicode_normalize requires string, got $t")
  }
  override def dataType: DataType = StringType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "graft_unicode_normalize"

  override def nullSafeEval(v: Any): Any = {
    val s = v.asInstanceOf[UTF8String].toString
    if (Normalizer.isNormalized(s, nf)) v
    else UTF8String.fromString(Normalizer.normalize(s, nf))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val formRef = s"java.text.Normalizer.Form.$form"
    nullSafeCodeGen(ctx, ev, v => {
      val s = ctx.freshName("s")
      s"""
        final String $s = $v.toString();
        if (java.text.Normalizer.isNormalized($s, $formRef)) {
          ${ev.value} = $v;
        } else {
          ${ev.value} = UTF8String.fromString(
            java.text.Normalizer.normalize($s, $formRef));
        }
      """
    })
  }

  override protected def withNewChildInternal(newChild: Expression): UnicodeNormalize =
    copy(child = newChild)
}

object UnicodeNormalize {
  val Forms: Set[String] = Set("NFC", "NFD", "NFKC", "NFKD")
}
