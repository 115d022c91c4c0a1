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
  *    never created, the moral equivalent of partition pruning;
  *  - `SupportsPushDownAggregates`: COUNT/MIN/MAX over the key answer from
  *    range arithmetic — a metadata-only scan, zero rows generated;
  *  - `MicroBatchStream` + `SupportsTriggerAvailableNow`: the same key
  *    space as a rate-limited stream with positional offsets — checkpoint
  *    resume is exactly-once, `Trigger.AvailableNow` drains a backlog in
  *    bounded admission-controlled batches.
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
      properties.asScala.getOrElse("partitions", "8").toInt,
      properties.asScala.getOrElse("rowsPerBatch", "1000").toLong)
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

private[sources] class GraftDocsTable(rows: Long, parts: Int, rowsPerBatch: Long)
  extends Table with SupportsRead {
  override def name(): String = s"graft_docs($rows)"
  override def schema(): StructType = GraftDocsSource.schema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new GraftDocsScanBuilder(rows, parts, rowsPerBatch)
}

private[sources] class GraftDocsScanBuilder(rows: Long, parts: Int, rowsPerBatch: Long = 1000L)
  extends ScanBuilder with SupportsPushDownRequiredColumns with SupportsPushDownFilters
  with SupportsPushDownAggregates {
  import org.apache.spark.sql.connector.expressions.NamedReference
  import org.apache.spark.sql.connector.expressions.aggregate._

  private var required: StructType = GraftDocsSource.schema
  private var lo: Long = 0L            // inclusive
  private var hi: Long = rows          // exclusive
  private var pushed: Array[Filter] = Array.empty
  private var aggKinds: Option[Seq[GraftDocsScanBuilder.AggKind]] = None

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  /** COMPLETE aggregate pushdown for metadata-answerable aggregates:
    * COUNT(*) / COUNT(doc_id) / MIN(doc_id) / MAX(doc_id) with no GROUP BY
    * are pure functions of the (post-filter-pushdown) key range [lo, hi) —
    * the scan answers them from arithmetic, materializing ZERO rows. This
    * is the connector-level analog of parquet's footer-count optimization:
    * at 100 TB, `SELECT count(*)` over a service-backed source must never
    * enumerate the service. Anything else falls back to a normal scan. */
  private def translate(agg: Aggregation): Option[Seq[GraftDocsScanBuilder.AggKind]] = {
    import GraftDocsScanBuilder._
    def docIdRef(e: org.apache.spark.sql.connector.expressions.Expression): Boolean =
      e match {
        case nr: NamedReference =>
          nr.fieldNames.length == 1 && nr.fieldNames()(0) == "doc_id"
        case _ => false
      }
    if (agg.groupByExpressions().nonEmpty) return None
    val kinds = agg.aggregateExpressions().map {
      case _: CountStar => Some(KCount)
      case c: Count if !c.isDistinct && docIdRef(c.column) => Some(KCount)
      case m: Min if docIdRef(m.column) => Some(KMin)
      case m: Max if docIdRef(m.column) => Some(KMax)
      case _ => None
    }
    if (kinds.forall(_.isDefined)) Some(kinds.flatten.toSeq) else None
  }

  override def supportCompletePushDown(agg: Aggregation): Boolean =
    translate(agg).isDefined

  override def pushAggregation(agg: Aggregation): Boolean =
    translate(agg) match {
      case some @ Some(_) => aggKinds = some; true
      case None => false
    }

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

  override def build(): Scan = aggKinds match {
    case Some(kinds) => new GraftDocsAggScan(math.max(lo, 0L), hi, kinds)
    case None => new GraftDocsScan(required, math.max(lo, 0L), hi, parts, rowsPerBatch)
  }
}

private[sources] object GraftDocsScanBuilder {
  sealed trait AggKind
  case object KCount extends AggKind
  case object KMin extends AggKind
  case object KMax extends AggKind
}

private[sources] case class DocsRange(start: Long, end: Long, schema: StructType)
  extends InputPartition

private[sources] class GraftDocsScan(required: StructType, lo: Long, hi: Long, parts: Int,
    rowsPerBatch: Long = 1000L)
  extends Scan with Batch with SupportsReportStatistics {

  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def toMicroBatchStream(checkpointLocation: String):
      org.apache.spark.sql.connector.read.streaming.MicroBatchStream =
    new GraftDocsMicroBatch(required, lo, hi, parts, rowsPerBatch)
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

/** Micro-batch streaming read over the same deterministic key space — the
  * STREAMING half of the connector surface (`MicroBatchStream` +
  * `SupportsAdmissionControl`):
  *
  *  - offsets are plain row positions (`DocsOffset`), serialized to the
  *    checkpoint as their decimal string — restart resumes exactly where
  *    the last committed batch ended (exactly-once at the source, the
  *    contract Kafka offsets provide);
  *  - admission control paces ingestion: each trigger admits at most
  *    `rowsPerBatch` rows (`ReadLimit.maxRows`), so a backlogged source
  *    drains in bounded batches instead of one unbounded catch-up batch —
  *    `Trigger.AvailableNow` walks the backlog in rate-limited steps;
  *  - each batch's range splits into the same `DocsRange` partitions the
  *    batch scan plans, read by the same reader factory (column pruning
  *    included) — batch ≡ stream by construction.
  */
private[sources] case class DocsOffset(id: Long)
  extends org.apache.spark.sql.connector.read.streaming.Offset {
  override def json(): String = id.toString
}

private[sources] class GraftDocsMicroBatch(required: StructType, lo: Long, hi: Long,
    parts: Int, rowsPerBatch: Long)
  extends org.apache.spark.sql.connector.read.streaming.MicroBatchStream
  with org.apache.spark.sql.connector.read.streaming.SupportsTriggerAvailableNow {
  import org.apache.spark.sql.connector.read.streaming.{Offset => SOffset, ReadLimit, ReadMaxRows}

  /** Trigger.AvailableNow contract: pin the drain target when the query
    * starts so the rate-limited batches walk toward a FIXED end even if
    * the source keeps growing. Our key space is already fixed per query
    * (`hi` from the rows option), so the pin is the existing bound. */
  override def prepareForTriggerAvailableNow(): Unit = ()

  override def initialOffset(): SOffset = DocsOffset(lo)
  override def deserializeOffset(json: String): SOffset = DocsOffset(json.toLong)
  override def getDefaultReadLimit: ReadLimit = ReadLimit.maxRows(rowsPerBatch)
  override def latestOffset(): SOffset =
    throw new UnsupportedOperationException(
      "admission-controlled source: latestOffset(start, limit) is the entry point")
  override def latestOffset(start: SOffset, limit: ReadLimit): SOffset = {
    val s = start.asInstanceOf[DocsOffset].id
    val cap = limit match {
      case mr: ReadMaxRows => mr.maxRows()
      case _ => rowsPerBatch
    }
    DocsOffset(math.min(s + math.max(cap, 1L), hi))
  }
  override def reportLatestOffset(): SOffset = DocsOffset(hi)

  override def planInputPartitions(start: SOffset, end: SOffset): Array[InputPartition] = {
    val s = start.asInstanceOf[DocsOffset].id
    val e = end.asInstanceOf[DocsOffset].id
    val n = math.max(e - s, 0L)
    if (n == 0) return Array.empty
    val span = (n + parts - 1) / parts
    (0 until parts).iterator
      .map(p => DocsRange(s + p * span, math.min(s + (p + 1) * span, e), required))
      .filter(r => r.start < r.end)
      .toArray
  }
  override def createReaderFactory(): PartitionReaderFactory = DocsReaderFactory
  override def commit(end: SOffset): Unit = ()
  override def stop(): Unit = ()
}

/** Completed-aggregate scan: one partition, one row, zero generated rows.
  * count = hi − lo; min/max = range endpoints (NULL on an empty range). */
private[sources] case class DocsAggResult(lo: Long, hi: Long,
    kinds: Seq[GraftDocsScanBuilder.AggKind]) extends InputPartition

private[sources] class GraftDocsAggScan(lo: Long, hi: Long,
    kinds: Seq[GraftDocsScanBuilder.AggKind]) extends Scan with Batch {
  import GraftDocsScanBuilder._
  override def readSchema(): StructType = StructType(kinds.zipWithIndex.map {
    case (KCount, i) => StructField(s"agg$i", LongType, nullable = false)
    case (_, i) => StructField(s"agg$i", LongType, nullable = true)
  })
  override def toBatch: Batch = this
  override def description(): String =
    s"GraftDocsAggScan range=[$lo,$hi) aggs=${kinds.mkString(",")} (metadata-only)"
  override def planInputPartitions(): Array[InputPartition] =
    Array(DocsAggResult(lo, hi, kinds))
  override def createReaderFactory(): PartitionReaderFactory = DocsAggReaderFactory
}

private[sources] object DocsAggReaderFactory extends PartitionReaderFactory {
  import GraftDocsScanBuilder._
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val DocsAggResult(lo, hi, kinds) = partition.asInstanceOf[DocsAggResult]
    val empty = hi <= lo
    val row = InternalRow.fromSeq(kinds.map {
      case KCount => math.max(hi - lo, 0L)
      case KMin => if (empty) null else lo
      case KMax => if (empty) null else hi - 1
    }.toIndexedSeq)
    new PartitionReader[InternalRow] {
      private var emitted = false
      override def next(): Boolean = { val r = !emitted; emitted = true; r }
      override def get(): InternalRow = row
      override def close(): Unit = ()
    }
  }
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
