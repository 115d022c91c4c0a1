package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import org.apache.spark.sql.{Column, GraftExpressionBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types._
import org.apache.spark.util.sketch.CountMinSketch

/** Count-Min sketch build — the heavy-hitter / frequency-estimation member
  * of the mergeable-sketch family (HLL for distincts, t-digest for
  * quantiles, bloom for membership, CMS for frequencies). Partial sketches
  * build per partition and MERGE by cell-wise addition — the same
  * partial/final shape as any sum, so 1000 executors sketch a 100 TB key
  * stream without ever shuffling the keys; only the (ε, δ)-sized table
  * moves.
  *
  * Guarantees (by construction, spec-pinned): estimates never
  * underestimate, and overshoot ≤ ε·N with probability ≥ 1−δ.
  * Built on Spark's public `org.apache.spark.util.sketch.CountMinSketch`
  * (stable serialized format; `mergeInPlace` adds cell-wise).
  */
case class CountMinBuild(
    child: Expression,
    eps: Double,
    confidence: Double,
    seed: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[CountMinSketch] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType
  override def prettyName: String = "count_min_build"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType | IntegerType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires bigint/int key, got ${t.sql}")
  }

  override def createAggregationBuffer(): CountMinSketch =
    CountMinSketch.create(eps, confidence, seed)

  override def update(buf: CountMinSketch, input: InternalRow): CountMinSketch = {
    val v = child.eval(input)
    if (v != null) buf.addLong(v match {
      case l: Long => l
      case i: Int => i.toLong
    })
    buf
  }

  override def merge(a: CountMinSketch, b: CountMinSketch): CountMinSketch = {
    a.mergeInPlace(b); a
  }

  override def eval(buf: CountMinSketch): Any = serialize(buf)

  override def serialize(buf: CountMinSketch): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    buf.writeTo(out)
    out.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): CountMinSketch =
    CountMinSketch.readFrom(new ByteArrayInputStream(bytes))

  override def withNewMutableAggBufferOffset(newOffset: Int): CountMinBuild =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CountMinBuild =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): CountMinBuild =
    copy(child = newChildren.head)
}

object CountMinAgg {
  /** Column API: build a CMS over a key column (use inside agg). */
  def build(key: Column, eps: Double = 0.001, confidence: Double = 0.99,
            seed: Int = 42): Column =
    GraftExpressionBridge.column(
      CountMinBuild(GraftExpressionBridge.expression(key), eps, confidence, seed)
        .toAggregateExpression())

  /** Driver-side estimate helper for a serialized sketch. */
  def estimate(bytes: Array[Byte], key: Long): Long =
    CountMinSketch.readFrom(new ByteArrayInputStream(bytes)).estimateCount(key)
}
