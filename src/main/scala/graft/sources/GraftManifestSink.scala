package graft.sources

import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import java.util.{Map => JMap}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.connector.write.{BatchWrite, DataWriter, DataWriterFactory, LogicalWriteInfo, PhysicalWriteInfo, SupportsTruncate, Write, WriteBuilder, WriterCommitMessage}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** The WRITE half of the DSv2 extension surface (the read half is
  * [[GraftDocsSource]]): a manifest-committed table with the commit protocol
  * a real warehouse sink needs at 1000 executors —
  *
  *  - each task writes to a UNIQUELY-NAMED staged file under `_staging/`
  *    (name carries queryId + partition + task attempt), so concurrent and
  *    speculative attempts never collide;
  *  - only the driver-side `BatchWrite.commit` makes data visible: staged
  *    files named by the surviving attempts' commit messages are promoted
  *    into the table directory and an atomically-replaced `_manifest` lists
  *    exactly the committed files (+ schema + row counts);
  *  - readers plan ONE partition per manifest-listed file and never see
  *    staged, aborted, or orphaned files — a torn job leaves the previous
  *    table state fully intact (exactly-once at the job level, the moral of
  *    Spark's own FileCommitProtocol / Iceberg-style snapshot commit);
  *  - `abort` deletes this query's staged files; a crash that skips abort
  *    leaves garbage only in `_staging/`, invisible to readers.
  *
  * Concurrency contract: SINGLE WRITER (like Delta on a filesystem with no
  * lock service) — Spark serializes the commits of one write job, but two
  * concurrent jobs writing the SAME table directory could race the
  * read-modify-write of the manifest (last commit wins, the other's files
  * become vacuum-able orphans, never torn reads). Concurrent READERS are
  * always safe: they see whichever manifest the atomic swap last published.
  *
  * Each committed file carries a ZONE MAP — per-numeric-column [min, max]
  * gathered by the task writer in the same pass that writes the rows — and
  * the reader implements `SupportsPushDownFilters`: pushed numeric
  * predicates skip whole files whose range proves no row can match (the
  * manifest-level analog of parquet row-group statistics / Delta file
  * skipping). All filters stay residual — surviving files still filter
  * row-by-row — so skipping is purely an I/O eliminator, never a
  * correctness dependency.
  *
  * Append and truncate-overwrite are supported (`SupportsTruncate` — the
  * manifest swap makes overwrite atomic too). Every commit also archives
  * the new state as `_manifest.v{n}` — SNAPSHOT TIME TRAVEL: read any past
  * version with `.option("snapshot", n)` (overwritten files stay on disk
  * until `VACUUM MANIFEST '<dir>' RETAIN k SNAPSHOTS` expires the versions
  * that reference them — the Iceberg snapshot-expiry model). Reads prune
  * columns at the reader ([[SupportsPushDownRequiredColumns]]).
  *
  * Row encoding is line-oriented TSV with `\`-escaping (encoding is
  * incidental — the commit protocol is the point; a production fork swaps
  * the writer body for parquet). Supported field types: long, int, double,
  * boolean, string.
  *
  * Usage:
  * {{{
  *   df.write.format("graft.sources.GraftManifestSink")
  *     .option("path", dir).mode("append").save()
  *   spark.read.format("graft.sources.GraftManifestSink")
  *     .option("path", dir).load()
  * }}}
  */
class GraftManifestSink extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType = {
    val dir = GraftManifestSink.tableDir(options)
    val m = Option(options.get("snapshot")) match {
      case Some(v) => Manifest.readSnapshot(dir, v.toInt)
      case None => Manifest.read(dir)
    }
    m.map(_.schema).getOrElse(throw new IllegalArgumentException(
      s"no _manifest at $dir: write first, or pass a schema"))
  }
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: JMap[String, String]): Table = {
    val dir = properties.asScala.getOrElse("path",
      throw new IllegalArgumentException("graft-manifest table requires option 'path'"))
    new ManifestTable(Paths.get(dir), schema)
  }
  override def supportsExternalMetadata(): Boolean = true
}

object GraftManifestSink {
  private[sources] def tableDir(options: CaseInsensitiveStringMap): Path =
    Paths.get(Option(options.get("path")).getOrElse(
      throw new IllegalArgumentException("graft-manifest table requires option 'path'")))

  // --- TSV field codec (escape: \\ \t \n \r; null = \N) -------------------
  private[sources] def escape(s: String): String = {
    val b = new StringBuilder(s.length + 8)
    s.foreach {
      case '\\' => b.append("\\\\")
      case '\t' => b.append("\\t")
      case '\n' => b.append("\\n")
      case '\r' => b.append("\\r")
      case c => b.append(c)
    }
    b.toString
  }
  private[sources] def unescape(s: String): String = {
    val b = new StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '\\' && i + 1 < s.length) {
        s.charAt(i + 1) match {
          case '\\' => b.append('\\'); case 't' => b.append('\t')
          case 'n' => b.append('\n'); case 'r' => b.append('\r')
          case o => b.append(o)
        }
        i += 2
      } else { b.append(c); i += 1 }
    }
    b.toString
  }

  private[sources] def render(row: InternalRow, schema: StructType): String =
    schema.fields.indices.map { i =>
      if (row.isNullAt(i)) "\\N"
      else schema.fields(i).dataType match {
        case LongType => row.getLong(i).toString
        case IntegerType => row.getInt(i).toString
        case DoubleType => row.getDouble(i).toString
        case BooleanType => row.getBoolean(i).toString
        case StringType => escape(row.getUTF8String(i).toString)
        case dt => throw new UnsupportedOperationException(s"type $dt")
      }
    }.mkString("\t")

  /** Per-file column index of the pruned schema into the stored layout —
    * computed once per reader, NOT per line. */
  private[sources] def columnIndex(full: StructType, wanted: StructType): Array[Int] = {
    val byName = full.fieldNames.zipWithIndex.toMap
    wanted.fieldNames.map(byName)
  }

  private[sources] def parse(line: String, idx: Array[Int], wanted: StructType): InternalRow = {
    val cells = line.split("\t", -1)
    InternalRow.fromSeq(wanted.fields.indices.map { i =>
      val raw = cells(idx(i))
      if (raw == "\\N") null
      else wanted.fields(i).dataType match {
        case LongType => raw.toLong
        case IntegerType => raw.toInt
        case DoubleType => raw.toDouble
        case BooleanType => raw.toBoolean
        case StringType => UTF8String.fromString(unescape(raw))
        case dt => throw new UnsupportedOperationException(s"type $dt")
      }
    })
  }
}

/** Per-file zone map: [min, max] per numeric column (long/int/double),
  * gathered by the task writer in the same pass that writes the rows.
  * Conservative by construction — a column absent from the map never
  * prunes. `incomplete` marks columns whose range does NOT describe every
  * row (NULL cells, NaN/Infinity): such a range can still PRUNE (a NULL or
  * NaN row never satisfies a comparison predicate, so "range proves no
  * match" stays sound) but can never PROVE a full-file match for
  * metadata-only DELETE — dropping the file would silently delete the
  * NULL/NaN rows the predicate does not select. Serialized as `name=min,
  * max` pairs joined with `;`, with incomplete columns after a `#` (column
  * names in this sink are identifier-safe; strings/booleans carry no
  * stats). */
private[graft] case class ColumnStats(ranges: Map[String, (BigDecimal, BigDecimal)],
    incomplete: Set[String] = Set.empty) {
  def render: String = {
    val r = ranges.toSeq.sortBy(_._1)
      .map { case (c, (lo, hi)) => s"$c=$lo,$hi" }.mkString(";")
    if (incomplete.isEmpty) r
    else r + "#" + incomplete.toSeq.sorted.mkString(",")
  }
}

private[graft] object ColumnStats {
  val empty: ColumnStats = ColumnStats(Map.empty)
  def parse(s: String): ColumnStats =
    if (s.isEmpty) empty
    else {
      val (rangesPart, incPart) = s.split("#", 2) match {
        case Array(r, i) => (r, i.split(",").filter(_.nonEmpty).toSet)
        case Array(r) => (r, Set.empty[String])
      }
      val ranges =
        if (rangesPart.isEmpty) Map.empty[String, (BigDecimal, BigDecimal)]
        else rangesPart.split(";").map { cell =>
          val Array(c, mm) = cell.split("=", 2)
          val Array(lo, hi) = mm.split(",", 2)
          c -> (BigDecimal(lo), BigDecimal(hi))
        }.toMap
      ColumnStats(ranges, incPart)
    }
}

/** One committed data file: name, row count, zone map. */
private[graft] case class ManifestFile(name: String, rows: Long, stats: ColumnStats)

/** `_manifest` contents: schema + the exact committed file list (+ per-file
  * zone maps). Stored as simple line-oriented text (no JSON dependency):
  * first line the schema as `name:type` pairs, then one
  * `fileName\trowCount[\tstats]` line per data file — the third field is
  * optional, so pre-zone-map manifests still parse. */
private[graft] case class Manifest(schema: StructType, entries: Seq[ManifestFile]) {
  def files: Seq[(String, Long)] = entries.map(e => (e.name, e.rows))
}

private[graft] object Manifest {
  private val TypeNames: Map[DataType, String] = Map(
    LongType -> "long", IntegerType -> "int", DoubleType -> "double",
    BooleanType -> "boolean", StringType -> "string")
  private val ByName = TypeNames.map(_.swap)

  private def parse(lines: Seq[String]): Manifest = {
    val schema = StructType(lines.head.split("\t").filter(_.nonEmpty).map { cell =>
      val Array(n, t) = cell.split(":", 2)
      StructField(n, ByName(t))
    }.toIndexedSeq)
    val entries = lines.tail.map { l =>
      l.split("\t") match {
        case Array(f, n) => ManifestFile(f, n.toLong, ColumnStats.empty)
        case Array(f, n, st) => ManifestFile(f, n.toLong, ColumnStats.parse(st))
      }
    }
    Manifest(schema, entries)
  }

  /** Current table state. */
  def read(dir: Path): Option[Manifest] = {
    val mf = dir.resolve("_manifest")
    if (!Files.exists(mf)) None
    else Some(parse(Files.readAllLines(mf).asScala.toSeq))
  }

  /** A specific archived snapshot (1-based, ascending commit order). */
  def readSnapshot(dir: Path, version: Int): Option[Manifest] = {
    val mf = dir.resolve(s"_manifest.v$version")
    if (!Files.exists(mf)) None
    else Some(parse(Files.readAllLines(mf).asScala.toSeq))
  }

  private val SnapshotName = """_manifest\.v(\d+)""".r

  /** All archived snapshot versions present, ascending. Strictly matches
    * `_manifest.v<digits>` — editor backups (`_manifest.v1~`) or leftover
    * tmp files must not break version parsing for every read and vacuum. */
  def snapshotVersions(dir: Path): Seq[Int] =
    if (!Files.isDirectory(dir)) Seq.empty
    else {
      val s = Files.list(dir)
      try s.iterator().asScala
        .map(_.getFileName.toString)
        .collect { case SnapshotName(v) => v.toInt }
        .toSeq.sorted
      finally s.close()
    }

  /** Atomic publish: archive the new state as `_manifest.v{n+1}` (time
    * travel), then move a tmp copy over `_manifest` (current). BOTH files
    * are published via tmp + ATOMIC_MOVE so a concurrent snapshot reader —
    * or VACUUM computing its reachable-file set — can never observe a
    * torn-but-parseable prefix and mistake live files for unreachable. */
  def write(dir: Path, m: Manifest): Unit = {
    val body = (m.schema.fields.map(f => s"${f.name}:${TypeNames(f.dataType)}")
      .mkString("\t") +:
      m.entries.map(e => s"${e.name}\t${e.rows}\t${e.stats.render}"))
      .mkString("\n").getBytes(UTF_8)
    val next = snapshotVersions(dir).lastOption.getOrElse(0) + 1
    // `.tmp` LAST keeps the name outside SnapshotName even for substring
    // matching — `_manifest.tmp.v3` was only ignored because the regex
    // pattern match anchors full-string, a trap for future edits
    val snapTmp = dir.resolve(s"_manifest.v$next.tmp")
    Files.write(snapTmp, body)
    Files.move(snapTmp, dir.resolve(s"_manifest.v$next"),
      StandardCopyOption.REPLACE_EXISTING, StandardCopyOption.ATOMIC_MOVE)
    val tmp = dir.resolve("_manifest.tmp")
    Files.write(tmp, body)
    Files.move(tmp, dir.resolve("_manifest"),
      StandardCopyOption.REPLACE_EXISTING, StandardCopyOption.ATOMIC_MOVE)
  }
}

private[sources] class ManifestTable(dir: Path, writeSchema: StructType)
  extends Table with SupportsRead with SupportsWrite
  with org.apache.spark.sql.connector.catalog.SupportsDelete {
  import org.apache.spark.sql.sources.Filter

  override def name(): String = s"graft_manifest($dir)"
  override def schema(): StructType =
    Manifest.read(dir).map(_.schema).getOrElse(writeSchema)
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.BATCH_WRITE,
      TableCapability.TRUNCATE)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ManifestScanBuilder(dir,
      Option(options.get("snapshot")).map(_.toInt))
  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new ManifestWriteBuilder(dir, info.schema(), info.queryId())

  /** METADATA-ONLY DELETE (the Iceberg model): `DELETE FROM t WHERE p` is
    * satisfiable without rewriting data iff the zone maps split every file
    * cleanly — a file either PROVABLY matches `p` on all rows (its range
    * sits entirely inside the predicate → dropped from the manifest) or
    * provably matches none (→ untouched). A file the predicate would cut
    * through the middle needs a rewrite this sink does not do, so
    * `canDeleteWhere` returns false and Spark reports the delete
    * unsupported instead of silently dropping extra rows. Dropped files
    * stay on disk — archived snapshots still reference them (time travel);
    * `VACUUM MANIFEST … RETAIN n SNAPSHOTS` reaps them later. */
  private def splitEntries(filters: Array[Filter])
    : Option[(Seq[ManifestFile], Seq[ManifestFile])] = {
    val entries = Manifest.read(dir).map(_.entries).getOrElse(Seq.empty)
    val (drop, rest) = entries.partition(e =>
      filters.forall(f => ManifestScanBuilder.mustMatchAll(f, e.stats)))
    // any remaining file the predicate MIGHT touch is a partial delete
    if (rest.exists(e =>
        filters.forall(f => ManifestScanBuilder.mightMatch(f, e.stats)) &&
          e.rows > 0)) None
    else Some((drop, rest))
  }

  override def canDeleteWhere(filters: Array[Filter]): Boolean =
    splitEntries(filters).isDefined

  override def deleteWhere(filters: Array[Filter]): Unit =
    splitEntries(filters) match {
      case Some((_, rest)) => Manifest.write(dir, Manifest(schema(), rest))
      case None => throw new UnsupportedOperationException(
        "DELETE FROM on a manifest table is metadata-only: the predicate " +
          "cuts through a file's zone-map range and would need a rewrite")
    }
}

// ---------------------------------------------------------------- write ----

private[sources] class ManifestWriteBuilder(dir: Path, schema: StructType, queryId: String)
  extends WriteBuilder with SupportsTruncate {
  private var overwrite = false
  override def truncate(): WriteBuilder = { overwrite = true; this }
  override def build(): Write = new Write {
    override def toBatch: BatchWrite = new ManifestBatchWrite(dir, schema, queryId, overwrite)
  }
}

private[sources] case class StagedFile(name: String, rows: Long, stats: String)
  extends WriterCommitMessage

private[sources] class ManifestBatchWrite(dir: Path, schema: StructType,
    queryId: String, overwrite: Boolean) extends BatchWrite {

  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory =
    ManifestWriterFactory(dir.toString, schema, queryId)

  /** Driver-side atomic publish: promote exactly the surviving attempts'
    * staged files, then swap the manifest. Readers either see the old
    * manifest or the new one — never a partial file set. */
  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val staging = dir.resolve("_staging")
    val committed = messages.map { case StagedFile(name, rows, stats) =>
      Files.move(staging.resolve(name), dir.resolve(name),
        StandardCopyOption.REPLACE_EXISTING)
      ManifestFile(name, rows, ColumnStats.parse(stats))
    }.toSeq
    // truncate drops old files from the CURRENT manifest only — they stay
    // on disk because archived snapshots still reference them (time travel);
    // `VACUUM MANIFEST ... RETAIN n SNAPSHOTS` expires them later.
    val prev =
      if (overwrite) Seq.empty
      else Manifest.read(dir).map(_.entries).getOrElse(Seq.empty)
    Manifest.write(dir, Manifest(schema, prev ++ committed))
  }

  /** Job failed: this query's staged files (all attempts) are garbage. */
  override def abort(messages: Array[WriterCommitMessage]): Unit = {
    val staging = dir.resolve("_staging")
    if (Files.exists(staging)) {
      val s = Files.list(staging)
      try s.iterator().asScala
        .filter(_.getFileName.toString.contains(queryId))
        .foreach(Files.deleteIfExists(_))
      finally s.close()
    }
  }
}

private[sources] case class ManifestWriterFactory(dir: String, schema: StructType,
    queryId: String) extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new ManifestDataWriter(Paths.get(dir), schema,
      s"part-$partitionId-$taskId-$queryId.tsv")
}

private[sources] class ManifestDataWriter(dir: Path, schema: StructType, name: String)
  extends DataWriter[InternalRow] {
  private val staging = { // unique name per (partition, task attempt, query)
    val s = dir.resolve("_staging"); Files.createDirectories(s); s
  }
  private val out = Files.newBufferedWriter(staging.resolve(name), UTF_8)
  private var rows = 0L
  // zone map, gathered in the same pass that writes the rows: min/max per
  // numeric column (null cells skipped — absent range never prunes)
  private val statIdx = schema.fields.zipWithIndex.collect {
    case (f, i) if f.dataType == LongType || f.dataType == IntegerType ||
      f.dataType == DoubleType => i
  }
  private val mins = new Array[BigDecimal](schema.length)
  private val maxs = new Array[BigDecimal](schema.length)
  // a NULL or non-finite cell makes the column's range "incomplete": still
  // sound for pruning, never sufficient to prove a full-file match
  private val partial = new Array[Boolean](schema.length)

  override def write(row: InternalRow): Unit = {
    out.write(GraftManifestSink.render(row, schema)); out.write("\n"); rows += 1
    statIdx.foreach { i =>
      if (row.isNullAt(i)) partial(i) = true
      else {
        val v: Option[BigDecimal] = schema.fields(i).dataType match {
          case LongType => Some(BigDecimal(row.getLong(i)))
          case IntegerType => Some(BigDecimal(row.getInt(i)))
          case DoubleType =>
            val d = row.getDouble(i)
            if (java.lang.Double.isFinite(d)) Some(BigDecimal(d))
            else { partial(i) = true; None } // NaN/Inf: no BigDecimal, no range update
        }
        v.foreach { x =>
          if (mins(i) == null || x < mins(i)) mins(i) = x
          if (maxs(i) == null || x > maxs(i)) maxs(i) = x
        }
      }
    }
  }
  override def commit(): WriterCommitMessage = {
    out.close()
    val stats = ColumnStats(
      statIdx.collect {
        case i if mins(i) != null => schema.fields(i).name -> ((mins(i), maxs(i)))
      }.toMap,
      statIdx.collect { case i if partial(i) => schema.fields(i).name }.toSet)
    StagedFile(name, rows, stats.render)
  }
  override def abort(): Unit = { out.close(); Files.deleteIfExists(staging.resolve(name)) }
  override def close(): Unit = ()
}

// ----------------------------------------------------------------- read ----

private[sources] class ManifestScanBuilder(dir: Path, snapshot: Option[Int])
  extends ScanBuilder with SupportsPushDownRequiredColumns
  with org.apache.spark.sql.connector.read.SupportsPushDownFilters {
  import org.apache.spark.sql.sources._

  private val manifest = snapshot match {
    case Some(v) => Manifest.readSnapshot(dir, v).orElse(
      throw new IllegalArgumentException(s"no snapshot v$v at $dir " +
        s"(have: ${Manifest.snapshotVersions(dir).mkString(", ")})"))
    case None => Manifest.read(dir)
  }
  private val full = manifest.map(_.schema).getOrElse(StructType(Nil))
  private var required: StructType = full
  private var skipping: Array[Filter] = Array.empty
  override def pruneColumns(requiredSchema: StructType): Unit = required = requiredSchema

  /** Zone-map pushdown: filters are used to SKIP whole files via the
    * per-file min/max ranges the writer recorded; they are all returned as
    * residual (surviving files still contain non-matching rows), the same
    * contract as parquet row-group skipping. */
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    skipping = filters.filter(ManifestScanBuilder.prunable)
    filters
  }
  override def pushedFilters(): Array[Filter] = skipping

  override def build(): Scan = {
    val entries = manifest.map(_.entries).getOrElse(Seq.empty)
    val kept = entries.filter(e =>
      skipping.forall(f => ManifestScanBuilder.mightMatch(f, e.stats)))
    new ManifestScan(dir, full, required, kept, entries.length)
  }
}

private[sources] object ManifestScanBuilder {
  import org.apache.spark.sql.sources._

  private def num(v: Any): Option[BigDecimal] = v match {
    case n: Long => Some(BigDecimal(n))
    case n: Int => Some(BigDecimal(n))
    case n: Double => if (java.lang.Double.isFinite(n)) Some(BigDecimal(n)) else None
    case n: Float => if (java.lang.Float.isFinite(n)) Some(BigDecimal(n.toDouble)) else None
    case n: Short => Some(BigDecimal(n.toInt))
    case n: Byte => Some(BigDecimal(n.toInt))
    case _ => None
  }

  private[sources] def prunable(f: Filter): Boolean = f match {
    case EqualTo(_, v) => num(v).isDefined
    case GreaterThan(_, v) => num(v).isDefined
    case GreaterThanOrEqual(_, v) => num(v).isDefined
    case LessThan(_, v) => num(v).isDefined
    case LessThanOrEqual(_, v) => num(v).isDefined
    case In(_, vs) => vs.nonEmpty && vs.forall(num(_).isDefined)
    case And(l, r) => prunable(l) && prunable(r)
    case _ => false
  }

  /** Dual of [[mightMatch]] for metadata-only DELETE: true iff the file's
    * [min, max] PROVES every row matches. Conservative the other way — a
    * column without stats can never prove a full match. `AlwaysTrue`
    * (an unconditional DELETE) trivially matches all. */
  private[sources] def mustMatchAll(f: Filter, st: ColumnStats): Boolean = {
    // an incomplete range (NULL/NaN cells exist) can never prove a full
    // match — those rows do not satisfy any comparison predicate
    def rng(c: String) =
      if (st.incomplete(c)) None else st.ranges.get(c)
    f match {
      case AlwaysTrue() => true
      case EqualTo(c, v) =>
        rng(c).exists { case (lo, hi) => num(v).exists(x => lo == x && hi == x) }
      case GreaterThan(c, v) => rng(c).exists { case (lo, _) => num(v).exists(lo > _) }
      case GreaterThanOrEqual(c, v) => rng(c).exists { case (lo, _) => num(v).exists(lo >= _) }
      case LessThan(c, v) => rng(c).exists { case (_, hi) => num(v).exists(hi < _) }
      case LessThanOrEqual(c, v) => rng(c).exists { case (_, hi) => num(v).exists(hi <= _) }
      case In(c, vs) =>
        rng(c).exists { case (lo, hi) =>
          lo == hi && vs.exists(v => num(v).contains(lo)) }
      case And(l, r) => mustMatchAll(l, st) && mustMatchAll(r, st)
      case Or(l, r) => mustMatchAll(l, st) || mustMatchAll(r, st)
      case _ => false
    }
  }

  /** Conservative: true unless the file's [min, max] PROVES no row can
    * match. A column without stats never prunes. */
  private[sources] def mightMatch(f: Filter, st: ColumnStats): Boolean = {
    def rng(c: String) = st.ranges.get(c)
    f match {
      case EqualTo(c, v) =>
        rng(c).forall { case (lo, hi) => num(v).forall(x => x >= lo && x <= hi) }
      case GreaterThan(c, v) => rng(c).forall { case (_, hi) => num(v).forall(hi > _) }
      case GreaterThanOrEqual(c, v) => rng(c).forall { case (_, hi) => num(v).forall(hi >= _) }
      case LessThan(c, v) => rng(c).forall { case (lo, _) => num(v).forall(lo < _) }
      case LessThanOrEqual(c, v) => rng(c).forall { case (lo, _) => num(v).forall(lo <= _) }
      case In(c, vs) =>
        rng(c).forall { case (lo, hi) =>
          vs.exists(v => num(v).forall(x => x >= lo && x <= hi)) }
      case And(l, r) => mightMatch(l, st) && mightMatch(r, st)
      case _ => true
    }
  }
}

private[sources] case class ManifestFilePartition(file: String, dir: String,
    full: StructType, wanted: StructType) extends InputPartition

private[sources] class ManifestScan(dir: Path, full: StructType, wanted: StructType,
    entries: Seq[ManifestFile], totalFiles: Int) extends Scan with Batch
  with org.apache.spark.sql.connector.read.SupportsRuntimeFiltering
  with org.apache.spark.sql.connector.read.SupportsReportStatistics {
  import org.apache.spark.sql.connector.expressions.{Expressions, NamedReference}
  import org.apache.spark.sql.connector.read.Statistics
  import org.apache.spark.sql.sources.Filter
  import java.util.OptionalLong

  // runtime filters (e.g. broadcast-join key sets arriving as In) shrink
  // this BEFORE partition planning — Iceberg-style runtime file pruning
  // against the same zone maps compile-time pushdown uses
  private var current: Seq[ManifestFile] = entries
  /** Observable by tests: how many files the last planning kept. */
  @volatile private[sources] var plannedFiles: Int = entries.length

  override def readSchema(): StructType = wanted
  override def toBatch: Batch = this
  override def description(): String =
    s"GraftManifestScan dir=$dir cols=${wanted.fieldNames.mkString(",")} " +
      s"files=${entries.length}/$totalFiles"

  /** Manifest-derived statistics (exact row counts, on-disk bytes of the
    * surviving files) — what lets Catalyst size broadcast/join decisions
    * and DPP benefit estimates for this sink the way parquet file sizes
    * do. */
  override def estimateStatistics(): Statistics = new Statistics {
    private val rowsTotal = entries.map(_.rows).sum
    private val bytesTotal = entries.map { e =>
      val p = dir.resolve(e.name)
      if (Files.exists(p)) Files.size(p) else e.rows * 32L
    }.sum
    override def numRows(): OptionalLong = OptionalLong.of(rowsTotal)
    override def sizeInBytes(): OptionalLong =
      OptionalLong.of(math.max(bytesTotal, 1L))
  }

  /** Any numeric column can prune at runtime — the zone maps carry ranges
    * for every long/int/double column the writer saw. */
  override def filterAttributes(): Array[NamedReference] =
    full.fields.collect {
      case f if f.dataType == LongType || f.dataType == IntegerType ||
        f.dataType == DoubleType => Expressions.column(f.name)
    }

  /** Runtime pruning: executed-side filters (DPP subquery results, runtime
    * IN-sets from a broadcast join build side) drop whole files whose zone
    * map proves no match — the join-time analog of the compile-time
    * skipping in [[ManifestScanBuilder]]. Conservative: unknown filter
    * shapes and stat-less columns keep the file. */
  override def filter(filters: Array[Filter]): Unit =
    current = current.filter(e =>
      filters.forall(f => ManifestScanBuilder.mightMatch(f, e.stats)))

  /** One partition per COMMITTED file of the selected snapshot — staged and
    * orphaned files are never planned, the read half of the exactly-once
    * contract. */
  override def planInputPartitions(): Array[InputPartition] = {
    plannedFiles = current.length
    current.map(e => ManifestFilePartition(e.name, dir.toString, full, wanted))
      .toArray[InputPartition]
  }

  override def createReaderFactory(): PartitionReaderFactory = ManifestReaderFactory
}

private[sources] object ManifestReaderFactory extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val ManifestFilePartition(file, dir, full, wanted) =
      partition.asInstanceOf[ManifestFilePartition]
    new PartitionReader[InternalRow] {
      private val stream = Files.lines(Paths.get(dir).resolve(file), UTF_8)
      private val it = stream.iterator()
      private val idx = GraftManifestSink.columnIndex(full, wanted)
      private var row: InternalRow = _
      override def next(): Boolean = {
        if (!it.hasNext) false
        else { row = GraftManifestSink.parse(it.next(), idx, wanted); true }
      }
      override def get(): InternalRow = row
      override def close(): Unit = stream.close()
    }
  }
}
