package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native Catalyst expression: asymmetric-distance (ADC) between a
  * PQ-coded corpus vector and a raw float query against a fixed
  * codebook — the inner loop of every IVF-PQ candidate scan
  * ([[graft.pipeline.Ann.queryIvfPqCandidates]], `pqTopK`).
  *
  * Replaces a Scala UDF over boxed Seq[Int]/Seq[Float]: at knn-graph
  * scale the candidate join evaluates this once per (query, candidate)
  * pair — tens of millions of rows — and the UDF's per-row boxing
  * dominated the stage (measured ~18 s of a 20 s routed-graph build at
  * 32k vectors). The generated code reads ints/floats straight out of
  * columnar ArrayData against a referenced float[][][] codebook and
  * stays inside whole-stage codegen.
  *
  * Arithmetic contract (the `ann_pq` / `ann_ivfpq` / `graph_bfs_routed`
  * oracle rows depend on it): per-subspace squared-distance partials
  * accumulate in DOUBLE over double-widened floats in sequential order,
  * then add across subspaces in subspace order — the exact loop of the
  * UDF it replaces and of the oracle's per-subspace `list_sum` chain.
  * RAISES on a code/codebook arity mismatch (a NULL would sort NULLS
  * FIRST under the ascending ADC rank — silent garbage neighbors);
  * NULL inputs stay NULL like any binary expression. */
case class AdcDistance(left: Expression, right: Expression,
    codebooks: Array[Array[Array[Float]]]) extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(IntegerType, _), ArrayType(FloatType, _)) => TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"graft_adc requires (array<int> codes, array<float> query), got ($l, $r)")
  }
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_adc"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val codes = a.asInstanceOf[ArrayData]
    val q = b.asInstanceOf[ArrayData]
    val m = codebooks.length
    // LOUD on arity mismatch (the UDF this replaced raised
    // IndexOutOfBounds): a NULL here would sort NULLS FIRST under the
    // ascending ADC rank and hand a malformed query arbitrary
    // candidates as its silent nearest neighbors
    if (codes.numElements() != m || q.numElements() % m != 0)
      throw new IllegalArgumentException(
        s"graft_adc: ${codes.numElements()} codes / ${q.numElements()}-dim " +
          s"query do not fit a $m-subspace codebook")
    else {
      val sub = q.numElements() / m
      var tot = 0.0
      var s = 0
      while (s < m) {
        val cw = codebooks(s)(codes.getInt(s))
        var sd = 0.0
        var j = 0
        while (j < sub) {
          val x = q.getFloat(s * sub + j).toDouble - cw(j).toDouble
          sd += x * x
          j += 1
        }
        tot += sd
        s += 1
      }
      tot
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cb = ctx.addReferenceObj("adcCodebooks", codebooks, "float[][][]")
    nullSafeCodeGen(ctx, ev, (codes, q) => {
      val m = ctx.freshName("m")
      val sub = ctx.freshName("sub")
      val tot = ctx.freshName("tot")
      val s = ctx.freshName("s")
      val j = ctx.freshName("j")
      val cw = ctx.freshName("cw")
      val sd = ctx.freshName("sd")
      val x = ctx.freshName("x")
      s"""
        final int $m = $cb.length;
        if ($codes.numElements() != $m || $q.numElements() % $m != 0) {
          throw new IllegalArgumentException(
            "graft_adc: " + $codes.numElements() + " codes / " +
            $q.numElements() + "-dim query do not fit a " + $m +
            "-subspace codebook");
        } else {
          final int $sub = $q.numElements() / $m;
          double $tot = 0.0;
          for (int $s = 0; $s < $m; $s++) {
            final float[] $cw = $cb[$s][$codes.getInt($s)];
            double $sd = 0.0;
            for (int $j = 0; $j < $sub; $j++) {
              final double $x = (double) $q.getFloat($s * $sub + $j) - (double) $cw[$j];
              $sd += $x * $x;
            }
            $tot += $sd;
          }
          ${ev.value} = $tot;
        }
      """
    })
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): AdcDistance = copy(left = newLeft, right = newRight)
}
