package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.{Column, GraftExpressionBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Element-wise SUM over a float-vector column — the custom AGGREGATE tier
  * of the build rules (`TypedImperativeAggregate` with a mutable primitive
  * buffer): the centroid-accumulation primitive an embedding pipeline needs
  * (k-means/IVF list training, cluster mean updates) at 100 TB, where the
  * explode-to-(row × dim)-and-groupBy alternative multiplies the shuffle by
  * the vector dimension.
  *
  * Accumulation is fixed-point (⌊x·10¹²⌋ summed as Long per dimension —
  * same contract as [[FixedPointDotProduct]]): exact, order-independent,
  * merge-safe across partitions, and reproducible against the DuckDB
  * oracle. Output is `array<double>` of the per-dimension sums / 10¹².
  */
case class VectorSumFixed(
    child: Expression,
    dim: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "vector_sum_fixed"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float>, got ${t.sql}")
  }

  override def createAggregationBuffer(): Array[Long] = new Array[Long](dim)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val arr = v.asInstanceOf[ArrayData]
      val n = math.min(arr.numElements(), dim)
      var i = 0
      while (i < n) {
        buf(i) += math.floor(arr.getFloat(i).toDouble * 1.0e12).toLong
        i += 1
      }
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < dim) { a(i) += b(i); i += 1 }
    a
  }

  override def eval(buf: Array[Long]): Any = {
    val out = new Array[Double](dim)
    var i = 0
    while (i < dim) { out(i) = buf(i).toDouble / 1.0e12; i += 1 }
    new GenericArrayData(out)
  }

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(dim * 8)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(dim)(bb.getLong())
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): VectorSumFixed =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): VectorSumFixed =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): VectorSumFixed =
    copy(child = newChildren.head)
}

object VectorSumFixed {
  /** Column-API entry point: `vectorSum(col, 64)` inside `agg(...)`. */
  def sum(c: Column, dim: Int): Column =
    GraftExpressionBridge.column(
      VectorSumFixed(GraftExpressionBridge.expression(c), dim).toAggregateExpression())
}
