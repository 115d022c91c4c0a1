package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into the `private[sql]` Column↔Expression converters (Spark 4
  * moved Column onto ColumnNode; `classic.ExpressionUtils` is the supported
  * conversion point but is package-private). This is the only file outside
  * the `graft` namespace — it exists solely to let graft's custom Catalyst
  * expressions surface as Columns. */
object GraftExpressionBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
