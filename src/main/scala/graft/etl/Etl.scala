package graft.etl

import java.nio.file.{Files, Path, Paths}
import scala.jdk.CollectionConverters._
import scala.util.{Failure, Success, Try}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

import graft.dates.DateBounds

/** The reference's medallion ETL pipeline re-expressed Spark-first
  * (SURVEY.md §2 A19-A26; dataflow traced in §3.1 from
  * /root/reference/pasta1_etl/src/main.py:135-269):
  *
  *   source monthly files ──list→prune→cast→filter──▶ bronze (append)
  *                      bronze ──drop→derive──▶ gold (partitioned) ──▶ CSV
  *
  * Deliberate divergences from the reference (documented, not silent):
  *  - Delta → plain parquet directories (no Delta jars in this environment,
  *    SURVEY.md §7.4): append/partition semantics identical, txn log lost.
  *  - No per-file progress `count()`s (main.py:167,188 force two extra full
  *    scans per file before the write — at 100 TB that triples read volume);
  *    row counts come from the write result metrics instead of actions.
  *  - Listing is Hadoop-FS/NIO against a directory; S3 pagination
  *    (utils.py:32-35) is an object-store deployment note.
  */
object Etl {

  /** Pipeline configuration — schema-driven like the reference's
    * YELLOW_TRIP_SCHEMA dict (main.py:69-106). */
  final case class Config(
      srcDir: String,
      bronzeDir: String,
      goldDir: String,
      logDir: String,
      filePrefix: String,
      tsCol: String,
      startYm: String,
      endYm: String,
      toleranceHours: Int,
      bronzeSchema: StructType,
      goldDropCols: Seq[String],
      yearCol: String = "pickup_year",
      monthCol: String = "pickup_month")

  /** Per-run manifest: which files landed in bronze (with the row count
    * each contributed), which failed (main.py:146-147; written as text
    * blobs by [[writeManifests]]). Counts come from `observe` metrics
    * captured ON the write pass — the reference pays a second full scan per
    * file for the same telemetry (`df.count()` at main.py:188, re-reading
    * what the write is about to read; at 100 TB that doubles bronze I/O). */
  final case class Manifest(processed: Seq[String], failed: Seq[(String, String)],
                            rowCounts: Map[String, Long] = Map.empty)

  /** A4 — source enumeration: list the source directory, keep parquet
    * entries, sort lexicographically (utils.py:46-66). Directories count
    * (Spark writes datasets as directories). */
  def listSourceFiles(srcDir: String): Seq[Path] =
    Files.list(Paths.get(srcDir)).iterator().asScala
      .filter(_.getFileName.toString.endsWith(".parquet"))
      .toSeq.sortBy(_.getFileName.toString)

  /** A6 — cast-on-read schema normalization: every declared column coerced
    * to its declared type (main.py:170-171's loop as a single select — one
    * Project of Casts, not 19 stacked withColumns). */
  def castToSchema(df: DataFrame, schema: StructType): DataFrame =
    df.select(schema.fields.map(f => col(f.name).cast(f.dataType).as(f.name)).toSeq: _*)

  /** A7+A8 — the half-open month interval with lower tolerance:
    * ts ∈ [month_start − tolerance, first_day_of_next_month)
    * (main.py:180-186; bounds from DateBounds ⇔ utils.py:87-116). */
  def monthIntervalFilter(df: DataFrame, tsCol: String, ym: String, tolHours: Int): DataFrame = {
    val lo = DateBounds.sqlLiteral(DateBounds.dateMinusTolerance(ym, tolHours))
    val hi = DateBounds.sqlLiteral(DateBounds.firstDayOfNextMonth(ym))
    df.filter(col(tsCol) >= to_timestamp(lit(lo)) && col(tsCol) < to_timestamp(lit(hi)))
  }

  /** Bronze layer (A1,A4-A8,A19,A25): enumerate → prune by filename date →
    * per-file fault-isolated subpipeline (cast → interval filter → append).
    * One spark action per file (the write); a failing file is recorded and
    * the run continues (main.py:155,197-199). */
  def runBronze(spark: SparkSession, cfg: Config): Manifest = {
    val all = listSourceFiles(cfg.srcDir)
    val inRange = all.flatMap { p =>
      DateBounds.yearMonthOfFile(p.getFileName.toString)
        .filter(ym => DateBounds.inRange(ym, cfg.startYm, cfg.endYm))
        .map(ym => (p, ym))
    }
    val results = inRange.map { case (path, ym) =>
      val name = path.getFileName.toString
      Try {
        val raw = spark.read.parquet(path.toString)
        val casted = castToSchema(raw, cfg.bronzeSchema)
        val bounded = monthIntervalFilter(casted, cfg.tsCol, ym, cfg.toleranceHours)
        // Row-count telemetry rides the write action via observe — no
        // second scan (the reference's count()-then-write reads twice).
        val obs = new org.apache.spark.sql.Observation(s"bronze_$name")
        // A19 — append sink: bronze accumulates across monthly files.
        bounded.observe(obs, count(lit(1)).as("n_rows"))
          .write.mode("append").parquet(cfg.bronzeDir)
        name -> obs.get("n_rows").asInstanceOf[Long]
      } match {
        case Success((n, rows)) => Left(n -> rows)
        case Failure(e) => Right(name -> e.getMessage)
      }
    }
    Manifest(
      results.collect { case Left((n, _)) => n },
      results.collect { case Right(f) => f },
      results.collect { case Left(nr) => nr }.toMap)
  }

  /** Gold layer (A9,A10,A20): column pruning by set difference, derived
    * partition columns, dynamic partitioned append (main.py:204-239). */
  def runGold(spark: SparkSession, cfg: Config): Unit = {
    val bronze = spark.read.parquet(cfg.bronzeDir)
    bronze
      .drop(cfg.goldDropCols: _*)
      .withColumn(cfg.yearCol, year(col(cfg.tsCol)))
      .withColumn(cfg.monthCol, month(col(cfg.tsCol)))
      .write
      .partitionBy(cfg.yearCol, cfg.monthCol) // A20 — layout drives pruning
      .mode("append")
      .parquet(cfg.goldDir)
  }

  /** A22 — run-manifest text blobs: processed / failed file lists as dated
    * .txt files (utils.py:69-84, call sites main.py:254-267). */
  def writeManifests(cfg: Config, runDate: String, m: Manifest): Unit = {
    val dir = Paths.get(cfg.logDir)
    Files.createDirectories(dir)
    Files.writeString(dir.resolve(s"processed_files_$runDate.txt"),
      m.processed.map(n => s"$n\t${m.rowCounts.getOrElse(n, 0L)} rows").mkString("\n"))
    Files.writeString(dir.resolve(s"failed_files_$runDate.txt"),
      m.failed.map { case (n, e) => s"$n\t$e" }.mkString("\n"))
  }

  /** A21 — CSV result sink with header, overwrite mode
    * (pasta2_analytics/src/main.py:26,51). */
  def writeCsv(df: DataFrame, path: String): Unit =
    df.write.option("header", "true").mode("overwrite").csv(path)

  /** A26 — orchestration (main.py:242-269): DDL → bronze (per-file loop) →
    * manifests → gold. `runDate` is injected (no wall-clock in query paths). */
  def run(spark: SparkSession, cfg: Config, runDate: String): Manifest = {
    // Table name is salted with the gold location: re-running the pipeline
    // against a fresh directory must not re-point an existing catalog entry
    // (the round-2 bench's q_etl_gold timed run tripped over the metastore
    // re-create of a fixed-name external table with a new LOCATION).
    val ddlName = s"${cfg.filePrefix}_gold_ddl_${(cfg.goldDir.hashCode.toLong & 0xffffffffL).toHexString}"
    // CREATE TABLE resolves its LOCATION; pointing it at a directory that
    // does not exist yet makes Spark log a FileNotFoundException stack trace
    // (WARN, harmless — but it pollutes the bench/verify logs).
    Files.createDirectories(Paths.get(cfg.goldDir))
    Ddl.createPartitionedTable(spark, ddlName,
      goldSchema(cfg), Seq(cfg.yearCol, cfg.monthCol), cfg.goldDir)
    val manifest = runBronze(spark, cfg)
    writeManifests(cfg, runDate, manifest)
    runGold(spark, cfg)
    manifest
  }

  /** Gold schema = bronze − dropped + derived partition ints
    * (set-difference derivation, main.py:218-228). */
  def goldSchema(cfg: Config): StructType = {
    import org.apache.spark.sql.types._
    StructType(
      cfg.bronzeSchema.fields.filterNot(f => cfg.goldDropCols.contains(f.name)).toSeq ++
        Seq(StructField(cfg.yearCol, IntegerType), StructField(cfg.monthCol, IntegerType)))
  }
}

/** DDL surface (A23, A24): declared-schema table creation against the
  * session catalog — the engine twin of the reference's DeltaTable builder
  * (main.py:109-132) and Hive external DDL (sql/yellow_tripdata_*.sql). */
object Ddl {

  /** A23 — create an (empty) partitioned external table from a schema. */
  def createPartitionedTable(spark: SparkSession, name: String, schema: StructType,
      partitionCols: Seq[String], location: String): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS $name")
    val cols = schema.fields.map(f => s"`${f.name}` ${f.dataType.sql}").mkString(", ")
    val parts = if (partitionCols.nonEmpty) s"PARTITIONED BY (${partitionCols.mkString(", ")})" else ""
    spark.sql(s"CREATE TABLE $name ($cols) USING PARQUET $parts LOCATION '$location'")
  }

  /** A24 — register an existing parquet directory as an external table
    * (the engine's analog of the Hive DeltaStorageHandler registration). */
  def registerExternal(spark: SparkSession, name: String, location: String): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS $name")
    spark.sql(s"CREATE TABLE $name USING PARQUET LOCATION '$location'")
  }

  /** A24 for a partitioned layout: declare schema + partition columns over
    * the existing location, then recover the partition directories into the
    * catalog (without the repair, a partitioned external table is empty). */
  def registerExternalPartitioned(spark: SparkSession, name: String, schema: StructType,
      partitionCols: Seq[String], location: String): Unit = {
    createPartitionedTable(spark, name, schema, partitionCols, location)
    spark.sql(s"MSCK REPAIR TABLE $name")
  }
}
