package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native Catalyst expression: packed random-hyperplane sign signatures of
  * an `array<float>` vector — one `long` bucket per hash table, all tables
  * in a single pass over the vector.
  *
  * This replaces a ScalaUDF in the ANN/embedding-dedup hot path
  * (`Ann.hyperplaneSignatures`): per-row dot products over every corpus
  * embedding. A ScalaUDF there breaks whole-stage codegen (serialization
  * boundary + boxed Seq[Float] conversion per row); this expression
  * generates a tight primitive loop reading floats straight out of the
  * columnar ArrayData, so the scan → signature → posexplode pipeline stays
  * inside one WholeStageCodegen span (asserted by PlanAssertSpec).
  *
  * Arithmetic contract (the oracle depends on it): each dot product
  * accumulates in DOUBLE over double-widened floats in sequential array
  * order — bit-identical to both the interpreted eval below and the
  * DuckDB list_sum fold in PipelineSql.annLsh, so bucket assignment is
  * engine-independent (the ann_lsh / ann_ivf / dedup_embedding oracle
  * rows). Plane components are md5-derived (`Ann.planeComponent`).
  *
  * The plane matrix rides along as a codegen reference object — driver
  * state embedded once per task, exactly like the UDF's broadcast but
  * without leaving generated code.
  */
case class HyperplaneSignature(child: Expression,
    planes: Array[Array[Array[Double]]])
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"hyperplane_signature requires array<float>, got $other")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "hyperplane_signature"

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val out = new Array[Long](planes.length)
    var t = 0
    while (t < planes.length) {
      val ps = planes(t)
      var bucket = 0L
      var p = 0
      while (p < ps.length) {
        val pv = ps(p)
        var s = 0.0
        val lim = math.min(pv.length, n)
        var i = 0
        while (i < lim) { s += pv(i) * arr.getFloat(i); i += 1 }
        if (s > 0) bucket |= (1L << p)
        p += 1
      }
      out(t) = bucket
      t += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val planesRef = ctx.addReferenceObj("planes", planes, "double[][][]")
    nullSafeCodeGen(ctx, ev, c => {
      val ts = ctx.freshName("ts")
      val out = ctx.freshName("out")
      val n = ctx.freshName("n")
      val t = ctx.freshName("t")
      val p = ctx.freshName("p")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      val pv = ctx.freshName("pv")
      val lim = ctx.freshName("lim")
      val bucket = ctx.freshName("bucket")
      s"""
        double[][][] $ts = $planesRef;
        long[] $out = new long[$ts.length];
        final int $n = $c.numElements();
        for (int $t = 0; $t < $ts.length; $t++) {
          double[][] ${p}s = $ts[$t];
          long $bucket = 0L;
          for (int $p = 0; $p < ${p}s.length; $p++) {
            double[] $pv = ${p}s[$p];
            double $s = 0.0;
            int $lim = java.lang.Math.min($pv.length, $n);
            for (int $i = 0; $i < $lim; $i++) {
              $s += $pv[$i] * (double) $c.getFloat($i);
            }
            if ($s > 0) $bucket |= (1L << $p);
          }
          $out[$t] = $bucket;
        }
        ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
      """
    })
  }

  override protected def withNewChildInternal(newChild: Expression): HyperplaneSignature =
    copy(child = newChild)
}
