package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import org.apache.spark.sql.{Column, DataFrame, GraftExpressionBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.functions.lit
import org.apache.spark.sql.types._
import org.apache.spark.util.sketch.BloomFilter

/** Bloom-filter semi-join reduction — the shuffle-avoidance pattern for
  * `fact SEMI JOIN dim` when `dim` is too large to broadcast as a hash
  * relation but its KEY SET compresses to a few hundred KB of bloom bits:
  *
  *   1. aggregate the dim keys into a bloom filter ([[BloomFilterBuild]],
  *      partial filters merged via bitwise OR — a two-level agg like any
  *      partial/final sum);
  *   2. ship the serialized filter to the fact side as a LITERAL (driver
  *      materializes one small binary — same move as Spark's own runtime
  *      filter subquery) and pre-filter the scan with
  *      [[BloomMightContain]] — no false negatives, so no row is lost;
  *   3. run the exact semi-join on the survivors to scrub false positives.
  *
  * At 100 TB the pre-filter drops non-matching fact rows BEFORE the
  * semi-join shuffle, shrinking it by the selectivity of the dim predicate;
  * the result is bit-identical to the plain semi-join (oracle-checked by
  * `q_join_bloom` against exactly that SQL).
  *
  * Built on Spark's public `org.apache.spark.util.sketch.BloomFilter`
  * (stable serialized format, mergeInPlace = bitwise OR).
  */
case class BloomFilterBuild(
    child: Expression,
    expectedItems: Long,
    fpp: Double,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[BloomFilter] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType
  override def prettyName: String = "bloom_filter_build"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType | IntegerType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires bigint/int key, got ${t.sql}")
  }

  override def createAggregationBuffer(): BloomFilter =
    BloomFilter.create(expectedItems, fpp)

  override def update(buf: BloomFilter, input: InternalRow): BloomFilter = {
    val v = child.eval(input)
    if (v != null) buf.putLong(v match {
      case l: Long => l
      case i: Int => i.toLong
    })
    buf
  }

  override def merge(a: BloomFilter, b: BloomFilter): BloomFilter = {
    a.mergeInPlace(b); a
  }

  override def eval(buf: BloomFilter): Any = serialize(buf)

  override def serialize(buf: BloomFilter): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    buf.writeTo(out)
    out.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): BloomFilter =
    BloomFilter.readFrom(new ByteArrayInputStream(bytes))

  override def withNewMutableAggBufferOffset(newOffset: Int): BloomFilterBuild =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BloomFilterBuild =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): BloomFilterBuild =
    copy(child = newChildren.head)
}

/** Probe: `bloom_might_contain(<serialized filter>, key)`. The filter side
  * is foldable in the intended pattern (a literal produced by the build
  * step), so deserialization happens once per expression instance — the
  * per-row cost is the sketch's k hash probes. Falls back to per-value
  * deserialization (correct, slower) if a non-foldable filter is supplied.
  */
case class BloomMightContain(left: Expression, right: Expression)
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, LongType | IntegerType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (binary, bigint/int), got (${l.sql}, ${r.sql})")
    }
  override def dataType: DataType = BooleanType
  override def prettyName: String = "bloom_might_contain"

  @transient private lazy val foldedFilter: BloomFilter =
    if (left.foldable) {
      val bytes = left.eval(null).asInstanceOf[Array[Byte]]
      if (bytes == null) null
      else BloomFilter.readFrom(new ByteArrayInputStream(bytes))
    } else null

  private def keyOf(v: Any): Long = v match {
    case l: Long => l
    case i: Int => i.toLong
  }

  override protected def nullSafeEval(bloomBytes: Any, key: Any): Any = {
    val bf =
      if (foldedFilter != null) foldedFilter
      else BloomFilter.readFrom(
        new ByteArrayInputStream(bloomBytes.asInstanceOf[Array[Byte]]))
    bf.mightContainLong(keyOf(key))
  }

  // The hot path stays inside whole-stage codegen: the foldable filter
  // deserializes once into a referenced object; generated code pays only
  // the k hash probes per row.
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    if (left.foldable && foldedFilter != null) {
      val bfRef = ctx.addReferenceObj("bloomFilter", foldedFilter, classOf[BloomFilter].getName)
      val keyEval = right.genCode(ctx)
      ev.copy(code =
        code"""
          ${keyEval.code}
          boolean ${ev.isNull} = ${keyEval.isNull};
          boolean ${ev.value} = false;
          if (!${ev.isNull}) {
            ${ev.value} = $bfRef.mightContainLong((long) ${keyEval.value});
          }""")
    } else {
      // non-foldable (or null) filter: deserialize per value — correct,
      // slower, not the intended usage
      nullSafeCodeGen(ctx, ev, (bloom, key) => {
        val bfClass = classOf[BloomFilter].getName
        s"${ev.value} = $bfClass.readFrom(new java.io.ByteArrayInputStream($bloom)).mightContainLong((long) $key);"
      })
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BloomMightContain =
    copy(left = newLeft, right = newRight)
}

object BloomFilterJoin {
  /** Column API: build a bloom filter over a key column (use inside agg). */
  def build(key: Column, expectedItems: Long, fpp: Double): Column =
    GraftExpressionBridge.column(
      BloomFilterBuild(GraftExpressionBridge.expression(key), expectedItems, fpp)
        .toAggregateExpression())

  /** Column API: probe a serialized filter (typically `lit(bytes)`). */
  def mightContain(bloom: Column, key: Column): Column =
    GraftExpressionBridge.column(BloomMightContain(
      GraftExpressionBridge.expression(bloom), GraftExpressionBridge.expression(key)))

  /** The full reduction: materialize the dim-key filter (one small binary on
    * the driver — the same shape as Spark's runtime-filter subquery), then
    * pre-filter `fact` before the exact semi-join scrubs false positives. */
  def semiJoinReduced(fact: DataFrame, factKey: String,
                      dimKeys: DataFrame, dimKey: String,
                      expectedItems: Long = 1 << 16, fpp: Double = 0.01): DataFrame = {
    val bytes = dimKeys.agg(build(dimKeys(dimKey), expectedItems, fpp).as("bf"))
      .head().getAs[Array[Byte]](0)
    fact
      .filter(mightContain(lit(bytes), fact(factKey)))
      .join(dimKeys, fact(factKey) === dimKeys(dimKey), "left_semi")
  }
}
