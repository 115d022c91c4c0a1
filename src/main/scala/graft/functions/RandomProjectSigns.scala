package graft.functions

import org.apache.spark.sql.{Column, GraftExpressionBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native Catalyst expression for the ±1 random projection (q_embed_project
  * semantics, bit-identical to the higher-order-function formulation and
  * its DuckDB mirror):
  *
  *   p[j] = Σ_i sign(i, j) · ⌊(double)x[i] · 10⁹⌋        (i 1-based)
  *   sign(i, j) = +1  iff  ((i·2654435761 + j·40503) >> 5) & 1 == 0
  *
  * Why a custom expression: the HOF form evaluates nProj `aggregate` lambdas
  * per row — nProj × dim interpreted lambda frames outside whole-stage
  * codegen. This emits ONE tight fused primitive loop in the generated
  * stage: the deterministic sign matrix is arithmetic (regenerated in
  * registers — there is no matrix to load), so the projection runs at
  * memory bandwidth. The "faster custom Expression" tier of the build
  * rules, same shape as [[FixedPointDotProduct]].
  */
case class RandomProjectSigns(child: Expression, nProj: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float>, got ${other.sql}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "random_project_signs"
  override def nullable: Boolean = true // null array or null element → NULL

  override protected def nullSafeEval(input: Any): Any = {
    val x = input.asInstanceOf[ArrayData]
    val n = x.numElements()
    val out = new Array[Long](nProj)
    var j = 0
    while (j < nProj) {
      var acc = 0L
      var i = 0
      while (i < n) {
        if (x.isNullAt(i)) return null
        val h = (i + 1).toLong * 2654435761L + j.toLong * 40503L
        val sign = if (((h >> 5) & 1L) == 0L) 1L else -1L
        acc += sign * math.floor(x.getFloat(i).toDouble * 1.0e9).toLong
        i += 1
      }
      out(j) = acc
      j += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x => {
      val out = ctx.freshName("out")
      val acc = ctx.freshName("acc")
      val h = ctx.freshName("h")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val n = ctx.freshName("n")
      s"""
         |long[] $out = new long[$nProj];
         |int $n = $x.numElements();
         |for (int $j = 0; $j < $nProj && !${ev.isNull}; $j++) {
         |  long $acc = 0L;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($x.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    long $h = ((long) ($i + 1)) * 2654435761L + ((long) $j) * 40503L;
         |    $acc += ((($h >> 5) & 1L) == 0L ? 1L : -1L)
         |      * (long) java.lang.Math.floor((double) $x.getFloat($i) * 1.0E9);
         |  }
         |  $out[$j] = $acc;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): RandomProjectSigns =
    copy(child = newChild)
}

object RandomProjectSigns {
  /** Column-API entry point. */
  def project(x: Column, nProj: Int): Column =
    GraftExpressionBridge.column(RandomProjectSigns(
      GraftExpressionBridge.expression(x), nProj))
}
