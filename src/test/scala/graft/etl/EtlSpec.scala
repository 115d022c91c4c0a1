package graft.etl

import java.nio.file.{Files, Paths}
import java.sql.Timestamp

import org.apache.spark.sql.types._

import graft.SparkSuite

/** End-to-end and edge-semantics tests for the medallion pipeline, built on
  * the fixture guidance in FIXTURES.md §2: boundary timestamps at exactly
  * `month_start − tolerance` (inclusive) and `first_day_of_next_month`
  * (exclusive), a December file, out-of-month outliers, nulls through the
  * cast loop, and a corrupt file exercising per-file fault isolation. */
class EtlSpec extends SparkSuite {
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("id", LongType), StructField("ts", TimestampType),
    StructField("amount", DoubleType), StructField("tag", StringType)))

  private def ts(s: String) = Timestamp.valueOf(s)

  private def freshDirs(): Etl.Config = {
    val tmp = Files.createTempDirectory("etl_spec_").toString
    Etl.Config(
      srcDir = s"$tmp/src", bronzeDir = s"$tmp/bronze", goldDir = s"$tmp/gold",
      logDir = s"$tmp/logs", filePrefix = "trips", tsCol = "ts",
      startYm = "2023-11", endYm = "2023-12", toleranceHours = 72,
      bronzeSchema = schema, goldDropCols = Seq("tag"),
      yearCol = "y", monthCol = "m")
  }

  private def writeMonth(cfg: Etl.Config, ym: String, rows: Seq[(Long, Timestamp, Double, String)]): Unit =
    rows.toDF("id", "ts", "amount", "tag")
      .write.mode("overwrite").parquet(s"${cfg.srcDir}/trips_$ym.parquet")

  test("bronze: half-open interval — lower bound inclusive, upper exclusive (main.py:182,186)") {
    val cfg = freshDirs()
    writeMonth(cfg, "2023-12", Seq(
      (1L, ts("2023-11-28 00:00:00"), 1.0, "exact lower bound: IN"),
      (2L, ts("2023-11-27 23:59:59"), 2.0, "below lower: OUT"),
      (3L, ts("2023-12-15 12:00:00"), 3.0, "mid-month: IN"),
      (4L, ts("2024-01-01 00:00:00"), 4.0, "exact upper bound: OUT (Dec rollover)"),
      (5L, ts("2023-12-31 23:59:59"), 5.0, "last tick: IN"),
      (6L, ts("2008-12-31 18:00:00"), 6.0, "reference's documented 2008 outlier: OUT")))
    val m = Etl.runBronze(spark, cfg)
    assert(m.processed === Seq("trips_2023-12.parquet") && m.failed.isEmpty)
    val got = spark.read.parquet(cfg.bronzeDir).select("id").as[Long].collect().sorted
    assert(got === Array(1L, 3L, 5L))
  }

  test("bronze: filename pruning skips out-of-range files; fault isolation records corrupt ones") {
    val cfg = freshDirs()
    writeMonth(cfg, "2023-10", Seq((1L, ts("2023-10-05 00:00:00"), 1.0, "out of range")))
    writeMonth(cfg, "2023-11", Seq((2L, ts("2023-11-05 00:00:00"), 2.0, "in range")))
    // corrupt "file": a .parquet directory with junk content
    val bad = Paths.get(cfg.srcDir, "trips_2023-12.parquet")
    Files.createDirectories(bad)
    Files.writeString(bad.resolve("part-00000.parquet"), "not parquet at all")
    val m = Etl.run(spark, cfg, runDate = "2024-01-01")
    assert(m.processed === Seq("trips_2023-11.parquet"))
    assert(m.failed.map(_._1) === Seq("trips_2023-12.parquet"))
    // observe-metric telemetry: the count rode the write action (no second
    // scan) and matches what actually landed in bronze
    assert(m.rowCounts("trips_2023-11.parquet") ===
      spark.read.parquet(cfg.bronzeDir).count())
    // pruned file is neither processed nor failed (skipped before read)
    assert(!m.processed.contains("trips_2023-10.parquet"))
    // manifests written as text blobs (utils.py:69-84)
    assert(Files.readString(Paths.get(cfg.logDir, "processed_files_2024-01-01.txt"))
      .contains("trips_2023-11.parquet"))
    assert(Files.readString(Paths.get(cfg.logDir, "failed_files_2024-01-01.txt"))
      .contains("trips_2023-12.parquet"))
  }

  test("cast loop passes nulls through and coerces drifted types (main.py:170-171)") {
    val cfg = freshDirs()
    // source writes amount as STRING and id as INT — month-to-month drift
    Seq(("7", "2023-11-03 10:00:00", "12.5", null.asInstanceOf[String]),
        ("8", "2023-11-04 11:00:00", null.asInstanceOf[String], "ok"))
      .toDF("id", "ts", "amount", "tag")
      .selectExpr("CAST(id AS INT) id", "CAST(ts AS TIMESTAMP) ts", "amount", "tag")
      .write.mode("overwrite").parquet(s"${cfg.srcDir}/trips_2023-11.parquet")
    assert(Etl.runBronze(spark, cfg).failed.isEmpty)
    val bronze = spark.read.parquet(cfg.bronzeDir)
    assert(bronze.schema("id").dataType === LongType)
    assert(bronze.schema("amount").dataType === DoubleType)
    val rows = bronze.orderBy("id").collect()
    assert(rows(0).getDouble(2) === 12.5 && rows(0).isNullAt(3))
    assert(rows(1).isNullAt(2) && rows(1).getString(3) === "ok")
  }

  test("gold: drops columns, derives partition ints, writes a prunable layout (main.py:218-239)") {
    val cfg = freshDirs()
    writeMonth(cfg, "2023-11", Seq((1L, ts("2023-11-10 00:00:00"), 10.0, "t")))
    writeMonth(cfg, "2023-12", Seq((2L, ts("2023-12-10 00:00:00"), 20.0, "t")))
    Etl.run(spark, cfg, runDate = "2024-01-01")
    // partition directories exist → directory-level pruning works
    assert(Files.exists(Paths.get(cfg.goldDir, "y=2023", "m=11")))
    assert(Files.exists(Paths.get(cfg.goldDir, "y=2023", "m=12")))
    val gold = spark.read.parquet(cfg.goldDir)
    assert(!gold.columns.contains("tag"))
    assert(gold.filter($"m" === 12).select("id").as[Long].collect() === Array(2L))
    // gold schema derivation matches what landed
    assert(Etl.goldSchema(cfg).fieldNames.toSet === gold.columns.toSet)
  }

  test("DDL: external tables over bronze and partitioned gold are queryable (A23/A24)") {
    val cfg = freshDirs()
    writeMonth(cfg, "2023-11", Seq((1L, ts("2023-11-10 00:00:00"), 10.0, "t")))
    Etl.run(spark, cfg, runDate = "2024-01-01")
    Ddl.registerExternal(spark, "etl_spec_bronze_ext", cfg.bronzeDir)
    assert(spark.sql("SELECT count(*) FROM etl_spec_bronze_ext").head().getLong(0) === 1L)
    Ddl.registerExternalPartitioned(spark, "etl_spec_gold_ext",
      Etl.goldSchema(cfg), Seq(cfg.yearCol, cfg.monthCol), cfg.goldDir)
    assert(spark.sql("SELECT count(*) FROM etl_spec_gold_ext").head().getLong(0) === 1L)
    assert(spark.sql("SELECT y, m FROM etl_spec_gold_ext").head().toSeq === Seq(2023, 11))
  }
}
