package graft.functions

import org.apache.spark.sql.{Column, GraftExpressionBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Codegen'd one-pass replacements for the winnowing-fingerprint pipeline
  * (`q_text_fingerprint` / `q_dedup_containment`). The HOF formulation —
  * `transform(sequence(…), i -> polyChar(substr(i, k)))` followed by
  * `transform(…, i -> array_min(slice(kh, i, w)))` — evaluates an
  * interpreted lambda frame PER CHARACTER and allocates a slice PER
  * WINDOW; profiling at sf0.1 put ~95% of `q_dedup_containment` in that
  * scan stage (single input split, ~30 s). These two expressions do the
  * same work in one generated loop each.
  *
  * Hash semantics are EXACTLY [[graft.llm.PortableHash.polyChar]] over
  * each k-CHARACTER gram — `h = (31h + code) mod (2³¹−1)` over the gram's
  * UTF-8 bytes, identical to `polyChar(substr(text, i, k))` for ASCII
  * text (the corpus; the DuckDB oracle's `ascii()` is also
  * byte == codepoint only on ASCII). */
object CharGrams {
  private[functions] val P = 2147483647L

  /** Hashes of all k-character grams of `s` (order preserved). */
  def charGramHashes(s: Column, k: Int): Column =
    GraftExpressionBridge.column(CharGramHashes(
      GraftExpressionBridge.expression(s), k))

  /** Sliding-window minima: out(i) = min(arr(i..i+w)). */
  def windowMins(arr: Column, w: Int): Column =
    GraftExpressionBridge.column(WindowMins(
      GraftExpressionBridge.expression(arr), w))
}

case class CharGramHashes(child: Expression, k: Int) extends UnaryExpression {
  import CharGrams.P

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string, got ${t.sql}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "char_gram_hashes"

  override protected def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String].getBytes
    val n = bytes.length
    val out = new Array[Long](math.max(n - k + 1, 0))
    var i = 0
    while (i + k <= n) {
      var h = 0L
      var b = 0
      while (b < k) { h = (h * 31L + (bytes(i + b) & 0xffL)) % P; b += 1 }
      out(i) = h
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val bytes = ctx.freshName("bytes"); val n = ctx.freshName("n")
      val out = ctx.freshName("out"); val i = ctx.freshName("i")
      val h = ctx.freshName("h"); val b = ctx.freshName("b")
      s"""
         |byte[] $bytes = $c.getBytes();
         |int $n = $bytes.length;
         |long[] $out = new long[java.lang.Math.max($n - $k + 1, 0)];
         |for (int $i = 0; $i + $k <= $n; $i++) {
         |  long $h = 0L;
         |  for (int $b = 0; $b < $k; $b++) {
         |    $h = ($h * 31L + ($bytes[$i + $b] & 0xffL)) % ${P}L;
         |  }
         |  $out[$i] = $h;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): CharGramHashes =
    copy(child = newChild)
}

case class WindowMins(child: Expression, w: Int) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<bigint>, got ${t.sql}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "window_mins"

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val out = new Array[Long](math.max(n - w + 1, 0))
    var i = 0
    while (i + w <= n) {
      var m = Long.MaxValue
      var j = 0
      while (j < w) { val v = arr.getLong(i + j); if (v < m) m = v; j += 1 }
      out(i) = m
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val n = ctx.freshName("n"); val out = ctx.freshName("out")
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val m = ctx.freshName("m"); val v = ctx.freshName("v")
      s"""
         |int $n = $c.numElements();
         |long[] $out = new long[java.lang.Math.max($n - $w + 1, 0)];
         |for (int $i = 0; $i + $w <= $n; $i++) {
         |  long $m = Long.MAX_VALUE;
         |  for (int $j = 0; $j < $w; $j++) {
         |    long $v = $c.getLong($i + $j);
         |    if ($v < $m) $m = $v;
         |  }
         |  $out[$i] = $m;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): WindowMins =
    copy(child = newChild)
}
