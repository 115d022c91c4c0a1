package graft.functions

import java.text.Normalizer

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization as a native Catalyst expression — the
  * canonical-composition pass every text-ingest pipeline runs before
  * dedup/hashing (the same visible string can arrive as precomposed `é` or
  * as `e` + U+0301; shingle/minhash/exact-dedup keys diverge unless the
  * corpus is normalized first). Spark has no built-in for this, so it is a
  * (b)-tier custom expression; DuckDB's `nfc_normalize` is the oracle twin.
  *
  * Codegen note: normalization is a JDK library call (`java.text.Normalizer`
  * over the decoded string), so doGenCode stays inside whole-stage codegen
  * by calling the static helper below — one virtual call per row, no
  * interpreted-projection fallback. The fast path for already-NFC ASCII/text
  * (the overwhelming majority of a real corpus) is `isNormalized`, which
  * scans without allocating.
  */
object NfcNormalize {
  /** Static entry for generated code: returns the input object unchanged
    * when already normalized (no copy — UTF8String is immutable). */
  def normalize(s: UTF8String): UTF8String = {
    val str = s.toString
    if (Normalizer.isNormalized(str, Normalizer.Form.NFC)) s
    else UTF8String.fromString(Normalizer.normalize(str, Normalizer.Form.NFC))
  }
}

case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string, got ${t.sql}")
  }
  override def dataType: DataType = StringType
  override def prettyName: String = "nfc_normalize"

  override protected def nullSafeEval(input: Any): Any =
    NfcNormalize.normalize(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.NfcNormalize.normalize($c);")

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}
