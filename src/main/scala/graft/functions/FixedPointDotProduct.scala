package graft.functions

import org.apache.spark.sql.{Column, GraftExpressionBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native Catalyst expression for the engine's fixed-point dot product
  * (semantics identical to the higher-order-function formulation in
  * `PortableHash.dotFixed`, and to its DuckDB oracle twin `sqlDotFixed`):
  *
  *   sum_i⌊ (double)a[i] · (double)b[i] · 10¹² ⌋  /  10¹²
  *
  * Exact long accumulation → order-independent, engine-portable result.
  *
  * Why a custom expression: the `zip_with` + `aggregate` version allocates a
  * lambda frame per element and is evaluated interpreted (higher-order
  * functions don't participate in whole-stage codegen), which made the
  * LSH-candidate similarity joins the bench hot spot. This `doGenCode` emits
  * a tight primitive loop inside the generated stage — no allocation, no
  * virtual calls — the (b)-tier of the build rules: a native Expression
  * where built-ins can't express the performance.
  */
case class FixedPointDotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(FloatType, _), ArrayType(FloatType, _)) => TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<float> arguments, got ${l.sql} and ${r.sql}")
  }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "fixed_point_dot"
  // A null ELEMENT (not just a null array) propagates to a NULL result —
  // the declared types allow containsNull, and reading a null slot as a
  // primitive would silently produce garbage instead.
  override def nullable: Boolean = true

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0L
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      acc += math.floor(x.getFloat(i).toDouble * y.getFloat(i).toDouble * 1.0e12).toLong
      i += 1
    }
    acc.toDouble / 1.0e12
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val acc = ctx.freshName("acc")
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      s"""
         |long $acc = 0L;
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |  $acc += (long) java.lang.Math.floor(
         |    (double) $a.getFloat($i) * (double) $b.getFloat($i) * 1.0E12);
         |}
         |${ev.value} = ((double) $acc) / 1.0E12;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): FixedPointDotProduct =
    copy(left = newLeft, right = newRight)
}

object FixedPointDotProduct {
  /** Column-API entry point. */
  def dot(a: Column, b: Column): Column =
    GraftExpressionBridge.column(FixedPointDotProduct(
      GraftExpressionBridge.expression(a), GraftExpressionBridge.expression(b)))
}
