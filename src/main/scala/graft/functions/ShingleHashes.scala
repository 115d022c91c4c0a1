package graft.functions

import org.apache.spark.sql.{Column, GraftExpressionBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Codegen'd one-pass replacements for the interpreted higher-order-function
  * hashing pipeline in the dedup operators. Profiling at sf0.1 put >80% of
  * MinHash/n-gram time in per-element lambda evaluation of
  * `transform(..., polyChar)` (millions of interpreter frames); these
  * expressions hash an entire document in one generated loop.
  *
  * Hash semantics are EXACTLY [[graft.llm.PortableHash]]'s polynomial hash
  * (`h = (31h + code) mod (2³¹−1)`) computed over the UTF-8 bytes of the
  * k-token shingle joined with spaces — identical to
  * `polyChar(concat_ws(" ", …))` for ASCII text (the testdata corpus; the
  * DuckDB oracle's `ascii()` is also byte == codepoint only on ASCII). */
object ShingleHashes {
  private[functions] val P = 2147483647L

  /** Hashes of all k-token shingles (order preserved, duplicates kept). */
  def shingles(tokens: Column, k: Int): Column =
    GraftExpressionBridge.column(ShinglePolyHashes(
      GraftExpressionBridge.expression(tokens), k))

  /** MinHash signature: element j = min over hv of (2j+1)·h + 7j + 13 mod P
    * — [[graft.llm.PortableHash.permute]] over the whole family in one pass. */
  def minhashSignature(hashes: Column, numHashes: Int): Column =
    GraftExpressionBridge.column(MinHashSignature(
      GraftExpressionBridge.expression(hashes), numHashes))

  /** 31-bit SimHash from a token-hash array, one pass. */
  def simhash(hashes: Column): Column =
    GraftExpressionBridge.column(SimHashPack(
      GraftExpressionBridge.expression(hashes)))
}

case class ShinglePolyHashes(child: Expression, k: Int) extends UnaryExpression {
  import ShingleHashes.P

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${t.sql}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "shingle_poly_hashes"

  override protected def nullSafeEval(input: Any): Any = {
    val toks = input.asInstanceOf[ArrayData]
    val n = toks.numElements()
    val out = new Array[Long](math.max(n - k + 1, 0))
    var i = 0
    while (i + k <= n) {
      var h = 0L
      var t = 0
      while (t < k) {
        if (t > 0) h = (h * 31L + 32L) % P // the joining space
        val bytes = toks.getUTF8String(i + t).getBytes
        var b = 0
        while (b < bytes.length) { h = (h * 31L + (bytes(b) & 0xffL)) % P; b += 1 }
        t += 1
      }
      out(i) = h
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val n = ctx.freshName("n"); val out = ctx.freshName("out")
      val i = ctx.freshName("i"); val t = ctx.freshName("t")
      val h = ctx.freshName("h"); val bytes = ctx.freshName("bytes")
      val b = ctx.freshName("b")
      s"""
         |int $n = $c.numElements();
         |long[] $out = new long[java.lang.Math.max($n - $k + 1, 0)];
         |for (int $i = 0; $i + $k <= $n; $i++) {
         |  long $h = 0L;
         |  for (int $t = 0; $t < $k; $t++) {
         |    if ($t > 0) $h = ($h * 31L + 32L) % ${P}L;
         |    byte[] $bytes = $c.getUTF8String($i + $t).getBytes();
         |    for (int $b = 0; $b < $bytes.length; $b++) {
         |      $h = ($h * 31L + ($bytes[$b] & 0xffL)) % ${P}L;
         |    }
         |  }
         |  $out[$i] = $h;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): ShinglePolyHashes =
    copy(child = newChild)
}

case class MinHashSignature(child: Expression, numHashes: Int) extends UnaryExpression {
  import ShingleHashes.P

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<bigint>, got ${t.sql}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_signature"

  override protected def nullSafeEval(input: Any): Any = {
    val hv = input.asInstanceOf[ArrayData]
    val n = hv.numElements()
    val sig = Array.fill(numHashes)(Long.MaxValue)
    var i = 0
    while (i < n) {
      val h = hv.getLong(i)
      var j = 0
      while (j < numHashes) {
        val v = (h * (2L * j + 1L) + 7L * j + 13L) % P
        if (v < sig(j)) sig(j) = v
        j += 1
      }
      i += 1
    }
    new GenericArrayData(sig)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val n = ctx.freshName("n"); val sig = ctx.freshName("sig")
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val h = ctx.freshName("h"); val v = ctx.freshName("v")
      s"""
         |int $n = $c.numElements();
         |long[] $sig = new long[$numHashes];
         |java.util.Arrays.fill($sig, Long.MAX_VALUE);
         |for (int $i = 0; $i < $n; $i++) {
         |  long $h = $c.getLong($i);
         |  for (int $j = 0; $j < $numHashes; $j++) {
         |    long $v = ($h * (2L * $j + 1L) + 7L * $j + 13L) % ${P}L;
         |    if ($v < $sig[$j]) $sig[$j] = $v;
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($sig);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): MinHashSignature =
    copy(child = newChild)
}

/** SimHash packing: one pass over the token-hash array computing all 31 bit
  * votes (±1 per hash per bit) and packing positive votes into a long —
  * replaces 31 interpreted fold-`aggregate`s per row. Semantics identical
  * to the bit-vote formulation in [[graft.llm.Dedup]]'s oracle SQL. */
case class SimHashPack(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<bigint>, got ${t.sql}")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash_pack"

  override protected def nullSafeEval(input: Any): Any = {
    val hv = input.asInstanceOf[ArrayData]
    val n = hv.numElements()
    val votes = new Array[Long](31)
    var i = 0
    while (i < n) {
      val h = hv.getLong(i)
      var b = 0
      while (b < 31) { votes(b) += ((h >> b) & 1L) * 2L - 1L; b += 1 }
      i += 1
    }
    var sig = 0L
    var b = 0
    while (b < 31) { if (votes(b) > 0) sig |= 1L << b; b += 1 }
    sig
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val n = ctx.freshName("n"); val votes = ctx.freshName("votes")
      val i = ctx.freshName("i"); val b = ctx.freshName("b")
      val h = ctx.freshName("h"); val sig = ctx.freshName("sig")
      s"""
         |int $n = $c.numElements();
         |long[] $votes = new long[31];
         |for (int $i = 0; $i < $n; $i++) {
         |  long $h = $c.getLong($i);
         |  for (int $b = 0; $b < 31; $b++) { $votes[$b] += (($h >> $b) & 1L) * 2L - 1L; }
         |}
         |long $sig = 0L;
         |for (int $b = 0; $b < 31; $b++) { if ($votes[$b] > 0) $sig |= 1L << $b; }
         |${ev.value} = $sig;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): SimHashPack =
    copy(child = newChild)
}
