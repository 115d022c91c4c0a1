package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType, LongType}

/** Morton (Z-order) interleaving of two 32-bit dimension keys — the layout
  * key for multi-column data clustering: sorting a table by
  * `zorder64(a, b)` places rows close in BOTH dimensions into the same
  * files, so parquet min-max stats prune selective predicates on EITHER
  * column (a single-column sort only prunes its own column; the second
  * column's per-file ranges stay full-width). Pair with
  * `etl.Compact.directory(..., sortBy = zorder col)` for the rewrite.
  *
  * Values are offset by Int.MinValue (order-preserving) so the interleave
  * is monotone over the full signed range; bits then alternate a/b from
  * the top. Pure bit arithmetic → codegen-friendly, no allocation.
  */
object ZOrder {
  /** Spread the low 32 bits of v so bit i lands at bit 2i. */
  def spread(v: Long): Long = {
    var x = v & 0xffffffffL
    x = (x | (x << 16)) & 0x0000ffff0000ffffL
    x = (x | (x << 8)) & 0x00ff00ff00ff00ffL
    x = (x | (x << 4)) & 0x0f0f0f0f0f0f0f0fL
    x = (x | (x << 2)) & 0x3333333333333333L
    x = (x | (x << 1)) & 0x5555555555555555L
    x
  }

  /** Morton code with a's bits at odd positions (more significant). */
  def interleave(a: Int, b: Int): Long = {
    val ua = (a.toLong - Int.MinValue.toLong) & 0xffffffffL
    val ub = (b.toLong - Int.MinValue.toLong) & 0xffffffffL
    (spread(ua) << 1) | spread(ub)
  }

  /** Spread the low 21 bits of v so bit i lands at bit 3i. */
  def spread3(v: Long): Long = {
    var x = v & 0x1fffffL
    x = (x | (x << 32)) & 0x001f00000000ffffL
    x = (x | (x << 16)) & 0x001f0000ff0000ffL
    x = (x | (x << 8)) & 0x100f00f00f00f00fL
    x = (x | (x << 4)) & 0x10c30c30c30c30c3L
    x = (x | (x << 2)) & 0x1249249249249249L
    x
  }

  /** Three-dimensional Morton code: each int offsets to unsigned order and
    * keeps its TOP 21 bits (a clustering key — the truncated low bits only
    * blur within-file order, never the per-file min-max ranges pruning
    * reads). 63 bits total, a's bits most significant per triple. */
  def interleave3(a: Int, b: Int, c: Int): Long = {
    def top21(v: Int): Long =
      (((v.toLong - Int.MinValue.toLong) & 0xffffffffL) >>> 11)
    (spread3(top21(a)) << 2) | (spread3(top21(b)) << 1) | spread3(top21(c))
  }
}

case class ZOrder64(left: Expression, right: Expression) extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (IntegerType, IntegerType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (int, int), got (${l.sql}, ${r.sql})")
    }
  override def dataType: DataType = LongType
  override def prettyName: String = "zorder64"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    ZOrder.interleave(a.asInstanceOf[Int], b.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.ZOrder.interleave($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ZOrder64 =
    copy(left = newLeft, right = newRight)
}

/** 3-dimensional Morton interleave (`OPTIMIZE … ZORDER BY (a, b, c)`) —
  * same contract as [[ZOrder64]] with 21 bits per dimension. */
case class ZOrder3(first: Expression, second: Expression, third: Expression)
  extends org.apache.spark.sql.catalyst.expressions.TernaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType) match {
      case (IntegerType, IntegerType, IntegerType) => TypeCheckResult.TypeCheckSuccess
      case (a, b, c) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (int, int, int), got (${a.sql}, ${b.sql}, ${c.sql})")
    }
  override def dataType: DataType = LongType
  override def prettyName: String = "zorder3"

  override protected def nullSafeEval(a: Any, b: Any, c: Any): Any =
    ZOrder.interleave3(a.asInstanceOf[Int], b.asInstanceOf[Int], c.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b, c) =>
      s"${ev.value} = graft.functions.ZOrder.interleave3($a, $b, $c);")

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): ZOrder3 =
    copy(first = f, second = s, third = t)
}
