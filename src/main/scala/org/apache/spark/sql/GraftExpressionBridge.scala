package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Bridge into the `private[sql]` Column↔Expression converters (Spark 4
  * moved Column onto ColumnNode; `classic.ExpressionUtils` is the supported
  * conversion point but is package-private) and the `Dataset.ofRows`
  * constructor (needed to surface a custom LogicalPlan — graft's
  * TopKPerGroup — as a DataFrame). This is the only file outside the
  * `graft` namespace — it exists solely to let graft's custom Catalyst
  * extensions surface through the public Column/DataFrame API. */
object GraftExpressionBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
  /** EAGER Catalyst tree of a Column. [[expression]] returns a lazy
    * `ColumnNodeExpression` wrapper whose children are invisible to
    * pattern matches; this converts the ColumnNode fully (operators
    * arrive as `UnresolvedFunction("=", …)` etc.), for callers that
    * INSPECT predicates rather than evaluate them. */
  def catalystExpression(c: Column): Expression =
    classic.ColumnNodeToExpressionConverter(c.node)
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
