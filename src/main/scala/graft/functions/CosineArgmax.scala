package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native Catalyst expression: index of the cosine-nearest centroid in a
  * fixed broadcast codebook — the spherical-cell assignment of
  * [[graft.pipeline.Dedup.semanticDedup]] (SemDeDup's k-means cells).
  *
  * Replaces a Scala UDF wrapping `Ann.nearestCentroidCosine` over a
  * boxed Seq[Float]: cell assignment runs once per corpus vector, and
  * the [[AdcDistance]] precedent showed the UDF boxing dominating
  * exactly this shape of broadcast-lookup loop. The generated code
  * reads floats straight out of columnar ArrayData against a
  * referenced float[][] codebook and stays inside whole-stage codegen.
  *
  * Arithmetic contract (the `dedup_semantic` oracle row depends on it):
  * per-centroid dot/norm partials accumulate in DOUBLE over
  * double-widened floats in index order; zero-norm guard scores −2;
  * strict `>` keeps the FIRST argmax on ties — the exact loop of the
  * driver-side trainer's assignment (`Ann.nearestCentroidCosine`), so
  * cells cannot drift between training and assignment. */
case class CosineArgmax(child: Expression, cents: Array[Array[Float]])
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_cosine_argmax requires array<float>, got $t")
  }
  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_cosine_argmax"

  override def nullSafeEval(a: Any): Any = {
    val v = a.asInstanceOf[ArrayData]
    val n = v.numElements()
    var best = 0
    var bestS = Double.NegativeInfinity
    var c = 0
    while (c < cents.length) {
      val cc = cents(c)
      var dot = 0.0; var na = 0.0; var nb = 0.0
      var i = 0
      val lim = math.min(n, cc.length)
      while (i < lim) {
        val x = v.getFloat(i).toDouble
        val y = cc(i).toDouble
        dot += x * y; na += x * x; nb += y * y
        i += 1
      }
      val s = if (na == 0.0 || nb == 0.0) -2.0
        else dot / (math.sqrt(na) * math.sqrt(nb))
      if (s > bestS) { bestS = s; best = c }
      c += 1
    }
    best
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cb = ctx.addReferenceObj("argmaxCents", cents, "float[][]")
    nullSafeCodeGen(ctx, ev, v => {
      val n = ctx.freshName("n")
      val best = ctx.freshName("best")
      val bestS = ctx.freshName("bestS")
      val c = ctx.freshName("c")
      val cc = ctx.freshName("cc")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val i = ctx.freshName("i")
      val lim = ctx.freshName("lim")
      val x = ctx.freshName("x")
      val y = ctx.freshName("y")
      val s = ctx.freshName("s")
      s"""
        final int $n = $v.numElements();
        int $best = 0;
        double $bestS = Double.NEGATIVE_INFINITY;
        for (int $c = 0; $c < $cb.length; $c++) {
          final float[] $cc = $cb[$c];
          double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
          final int $lim = Math.min($n, $cc.length);
          for (int $i = 0; $i < $lim; $i++) {
            final double $x = (double) $v.getFloat($i);
            final double $y = (double) $cc[$i];
            $dot += $x * $y; $na += $x * $x; $nb += $y * $y;
          }
          final double $s = ($na == 0.0 || $nb == 0.0)
            ? -2.0 : $dot / (Math.sqrt($na) * Math.sqrt($nb));
          if ($s > $bestS) { $bestS = $s; $best = $c; }
        }
        ${ev.value} = $best;
      """
    })
  }

  override protected def withNewChildInternal(newChild: Expression): CosineArgmax =
    copy(child = newChild)
}
