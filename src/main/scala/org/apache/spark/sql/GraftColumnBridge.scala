package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into spark-sql's package-private Column ⇄ Expression
  * conversions (`classic.ExpressionUtils` is `private[sql]` in Spark 4).
  * The one sanctioned-by-convention way for an external library to wire a
  * custom Catalyst `Expression` (e.g. graft.functions.HyperplaneSignature)
  * into the public DataFrame API. */
object GraftColumnBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
