package graft.sources

import java.util.{Map => JMap}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import java.util.OptionalLong

import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.{EqualTo, Filter, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** A full DataSource V2 READ connector — the remaining public extension
  * surface after expressions / optimizer rules / planner strategies: a
  * deterministic synthetic `documents` generator that implements the two
  * contracts that matter at 100 TB at the CONNECTOR level (where a real
  * warehouse/service source must implement them, since parquet's built-in
  * pushdown doesn't exist there):
  *
  *  - `SupportsPushDownRequiredColumns`: readers materialize only the
  *    projected columns — `SELECT doc_id` never builds text strings;
  *  - `SupportsPushDownFilters`: `doc_id` range predicates narrow the key
  *    space BEFORE partition planning — partitions outside the range are
  *    never created, the moral equivalent of partition pruning.
  *
  * Usage: `spark.read.format("graft.sources.GraftDocsSource")
  *   .option("rows", n).option("partitions", p).load()`.
  * Scan `description()` exposes the effective range + read schema so tests
  * (SourcesV2Spec) can assert both pushdowns fired.
  */
class GraftDocsSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    GraftDocsSource.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: JMap[String, String]): Table =
    new GraftDocsTable(
      properties.asScala.getOrElse("rows", "1000").toLong,
      properties.asScala.getOrElse("partitions", "8").toInt)
  override def supportsExternalMetadata(): Boolean = false
}

object GraftDocsSource {
  val schema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("source", StringType, nullable = false),
    StructField("text", StringType, nullable = false)))

  /** Deterministic row content — the same doc_id always yields the same
    * document, on any executor. */
  def sourceOf(id: Long): String = s"src${id % 20}"
  def textOf(id: Long): String = {
    val words = Seq("the", "quick", "spark", "engine", "reads", "row", "group",
      "stats", "and", "prunes")
    (0 until 12).map(i => words(((id * 31 + i * 7) % words.size).toInt)).mkString(" ")
  }
}

private[sources] class GraftDocsTable(rows: Long, parts: Int)
  extends Table with SupportsRead {
  override def name(): String = s"graft_docs($rows)"
  override def schema(): StructType = GraftDocsSource.schema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new GraftDocsScanBuilder(rows, parts)
}

private[sources] class GraftDocsScanBuilder(rows: Long, parts: Int)
  extends ScanBuilder with SupportsPushDownRequiredColumns with SupportsPushDownFilters {

  private var required: StructType = GraftDocsSource.schema
  private var lo: Long = 0L            // inclusive
  private var hi: Long = rows          // exclusive
  private var pushed: Array[Filter] = Array.empty

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  /** Accept doc_id range/equality filters (narrowing [lo, hi)); everything
    * else stays post-scan. */
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (accepted, rejected) = filters.partition {
      case GreaterThan("doc_id", _: Long) | GreaterThanOrEqual("doc_id", _: Long) |
           LessThan("doc_id", _: Long) | LessThanOrEqual("doc_id", _: Long) |
           EqualTo("doc_id", _: Long) => true
      case _ => false
    }
    accepted.foreach {
      case GreaterThan("doc_id", v: Long) => lo = math.max(lo, v + 1)
      case GreaterThanOrEqual("doc_id", v: Long) => lo = math.max(lo, v)
      case LessThan("doc_id", v: Long) => hi = math.min(hi, v)
      case LessThanOrEqual("doc_id", v: Long) => hi = math.min(hi, v + 1)
      case EqualTo("doc_id", v: Long) => lo = math.max(lo, v); hi = math.min(hi, v + 1)
      case _ =>
    }
    pushed = accepted
    rejected
  }
  override def pushedFilters(): Array[Filter] = pushed

  override def build(): Scan = new GraftDocsScan(required, math.max(lo, 0L), hi, parts)
}

private[sources] case class DocsRange(start: Long, end: Long, schema: StructType)
  extends InputPartition

private[sources] class GraftDocsScan(required: StructType, lo: Long, hi: Long, parts: Int)
  extends Scan with Batch with SupportsReportStatistics {

  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"GraftDocsScan range=[$lo,$hi) cols=${required.fieldNames.mkString(",")}"

  /** Connector-level statistics for Catalyst's size estimation — what lets
    * the optimizer choose broadcast-vs-shuffle for DSv2 sources the way
    * parquet's file sizes do. Row count is EXACT (post-pushdown range);
    * bytes assume the fixed generated-row width of the PRUNED columns, so
    * `SELECT doc_id` reports ~8 bytes/row while the full row reports ~100 —
    * column pruning shrinks the estimate the optimizer sees. */
  override def estimateStatistics(): Statistics = new Statistics {
    private val rows = math.max(hi - lo, 0L)
    private val rowBytes = required.fieldNames.map {
      case "doc_id" => 8L
      case "source" => 6L
      case "text" => 80L
      case _ => 16L // future columns: degrade the estimate, never MatchError planning
    }.sum
    override def numRows(): OptionalLong = OptionalLong.of(rows)
    override def sizeInBytes(): OptionalLong =
      OptionalLong.of(rows * math.max(rowBytes, 1L))
  }

  override def planInputPartitions(): Array[InputPartition] = {
    val n = math.max(hi - lo, 0L)
    if (n == 0) return Array.empty
    val span = (n + parts - 1) / parts
    (0 until parts).iterator
      .map(p => DocsRange(lo + p * span, math.min(lo + (p + 1) * span, hi), required))
      .filter(r => r.start < r.end)
      .toArray
  }

  override def createReaderFactory(): PartitionReaderFactory = DocsReaderFactory
}

private[sources] object DocsReaderFactory extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val DocsRange(start, end, schema) = partition.asInstanceOf[DocsRange]
    new PartitionReader[InternalRow] {
      private var id = start - 1
      override def next(): Boolean = { id += 1; id < end }
      override def get(): InternalRow = {
        // only the pruned columns are materialized — `SELECT doc_id`
        // never pays for text generation
        val values = schema.fieldNames.map {
          case "doc_id" => id
          case "source" => UTF8String.fromString(GraftDocsSource.sourceOf(id))
          case "text" => UTF8String.fromString(GraftDocsSource.textOf(id))
        }
        InternalRow.fromSeq(values.toIndexedSeq)
      }
      override def close(): Unit = ()
    }
  }
}
