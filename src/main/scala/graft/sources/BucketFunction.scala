package graft.sources

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.functions.{BoundFunction, ScalarFunction, UnboundFunction}
import org.apache.spark.sql.types._

/** The `bucket(n, col)` hash shared by the WRITER (which routes each row of
  * a bucket-partitioned manifest table to a bucket-pure data file —
  * [[BucketFanoutWriter]]) and the CATALOG-EXPOSED V2 function (which lets
  * Catalyst reason about that layout for storage-partitioned joins —
  * [[GraftBucketFunction]]). The two MUST agree: Spark may evaluate the
  * function to shuffle a non-bucketed join side into this layout, and rows
  * hashed differently from the files they sit in would join wrong.
  *
  * The hash rides [[FileBloom]]'s splitmix64/FNV-1a primitives (already the
  * sink's portable value hashes) with non-negative modulo. Value encoding
  * matches the zone-map/bloom conventions: int/date widen to long, timestamp
  * is epoch micros, strings hash raw UTF-8 bytes — so `ALTER COLUMN TYPE`
  * INT→BIGINT widening keeps every existing bucket id valid. NULL buckets to
  * 0 (an equi-join never matches NULL, so its placement only affects layout,
  * never join correctness). Float/double are rejected at DDL time (no stable
  * cross-engine encoding — the Iceberg rule).
  */
private[graft] object BucketHash {
  def supported(dt: DataType): Boolean = dt match {
    case LongType | IntegerType | StringType | DateType | TimestampType => true
    case _ => false
  }

  def ofLong(v: Long, n: Int): Int =
    (((FileBloom.hashLong(v)._1 % n) + n) % n).toInt

  def ofBytes(b: Array[Byte], n: Int): Int =
    (((FileBloom.hashBytes(b)._1 % n) + n) % n).toInt

  /** Bucket of column `i` of `row` under the column's declared type. */
  def ofRow(row: InternalRow, i: Int, dt: DataType, n: Int): Int =
    if (row.isNullAt(i)) 0
    else dt match {
      case LongType | TimestampType => ofLong(row.getLong(i), n)
      case IntegerType | DateType => ofLong(row.getInt(i).toLong, n)
      case StringType => ofBytes(row.getUTF8String(i).getBytes, n)
      case _ => throw new IllegalStateException(s"bucket on unsupported type $dt")
    }
}

/** `bucket` as a catalog V2 function ([[GraftCatalog]] implements
  * `FunctionCatalog`): what lets Spark resolve the `bucket(n, col)` transform
  * a [[ManifestScan]] reports through `KeyGroupedPartitioning` — the
  * handshake behind storage-partitioned joins. Two co-bucketed manifest
  * tables joined on the bucket column then plan with NO shuffle on either
  * side: Spark matches partition keys (bucket ids) instead of exchanging
  * 100 TB twice. Signature: `bucket(numBuckets INT, value) -> INT`. */
private[graft] object GraftBucketFunction extends UnboundFunction {
  override def name(): String = "bucket"
  override def description(): String =
    "bucket(numBuckets, col) - graft's portable hash bucket (SPJ transform)"

  override def bind(inputType: StructType): BoundFunction = {
    if (inputType.length != 2)
      throw new UnsupportedOperationException(
        s"bucket takes (numBuckets INT, value), got ${inputType.simpleString}")
    if (inputType.fields(0).dataType != IntegerType)
      throw new UnsupportedOperationException(
        s"bucket: numBuckets must be INT, got ${inputType.fields(0).dataType.simpleString}")
    val vt = inputType.fields(1).dataType
    if (!BucketHash.supported(vt))
      throw new UnsupportedOperationException(
        s"bucket: unsupported value type ${vt.simpleString} " +
          "(long/int/string/date/timestamp)")
    BoundBucket(vt)
  }
}

private[graft] case class BoundBucket(valueType: DataType)
  extends ScalarFunction[Integer] {
  override def inputTypes(): Array[DataType] = Array(IntegerType, valueType)
  override def resultType(): DataType = IntegerType
  override def name(): String = "bucket"
  // SPJ compatibility: two TransformExpressions are interchangeable when
  // their bound functions share this name (plus equal arguments) — one
  // stable identity across every table of every graft catalog instance
  override def canonicalName(): String = "graft.bucket"
  override def isResultNullable: Boolean = false
  override def produceResult(input: InternalRow): Integer =
    Integer.valueOf(BucketHash.ofRow(input, 1, valueType, input.getInt(0)))
}
