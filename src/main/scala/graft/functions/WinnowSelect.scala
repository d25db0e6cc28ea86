package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native expression: MOSS winnowing window selections over a per-doc
  * k-gram hash array in ONE pass — the fused form of the HOF shape
  *
  * {{{
  * transform(sequence(0, greatest(size(h) − w, 0)), i => {
  *   val sub = slice(h, i + 1, w)
  *   val ri  = aggregate(sequence(0, size(sub) − 1), 0L, (acc, j) =>
  *     when(element_at(sub, j + 1) === array_min(sub), j).otherwise(acc))
  *   (i + ri) · 2³² + array_min(sub)
  * })
  * }}}
  *
  * whose interpreted lambdas re-evaluate the `slice` subtree on every
  * reference (no subexpression elimination inside HOFs — the PLANS §11
  * trap one level deeper): `element_at(sub, j)` inside the inner
  * aggregate rebuilds the window slice PER ELEMENT, making selection
  * O(windows · w²) interpreted evaluations with per-call allocations.
  * Here: one primitive-long pass, O(windows · w) comparisons, zero
  * allocation beyond the output.
  *
  * Value-identical by construction: per window i (0 .. max(n−w, 0)),
  * window = h[i .. min(i+w, n)−1] (the slice's truncation at the array
  * end), m = its minimum, ri = the RIGHTMOST index of m in the window,
  * selection = (i + ri)·2³² + m — the same packed long. An empty input
  * yields an empty array (callers pin their own empty-text edge, as the
  * HOF form did with its outer `when`). Null elements cannot occur (the
  * hash projection is non-null by construction) but are defended as the
  * HOF would fail loudly: a null element raises. */
case class WinnowSelect(child: Expression, w: Int) extends UnaryExpression {
  require(w >= 1, s"winnowing needs window w >= 1, got $w")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_winnow_select requires array<bigint>, got $other")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_winnow_select"

  override def nullSafeEval(input: Any): Any =
    WinnowSelect.compute(input.asInstanceOf[ArrayData], w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.WinnowSelect.compute($c, $w)")

  override protected def withNewChildInternal(newChild: Expression): WinnowSelect =
    copy(child = newChild)
}

object WinnowSelect {
  def compute(hArr: ArrayData, w: Int): GenericArrayData = {
    val n = hArr.numElements()
    if (n == 0) return new GenericArrayData(Array.empty[Any])
    val h = new Array[Long](n)
    var i = 0
    while (i < n) {
      require(!hArr.isNullAt(i), "winnowing hash array holds a null")
      h(i) = hArr.getLong(i)
      i += 1
    }
    val windows = math.max(n - w, 0) + 1
    val out = new Array[Any](windows)
    i = 0
    while (i < windows) {
      val end = math.min(i + w, n) // slice truncation at the array end
      var m = h(i)
      var ri = 0
      var j = i + 1
      while (j < end) {
        if (h(j) <= m) { m = h(j); ri = j - i } // rightmost min
        j += 1
      }
      out(i) = (i.toLong + ri.toLong) * 4294967296L + m
      i += 1
    }
    new GenericArrayData(out)
  }
}
