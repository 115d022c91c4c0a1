package graft.etl

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.functions.col

import graft.SparkSuite

/** End-to-end run of the reference-shaped pipeline: yellow-trip 19-column
  * schema, env-style config, monthly files with the FIXTURES.md §2 edge
  * rows (boundary timestamps, 2008 outlier, nulls), then the two analytics
  * queries over the produced gold. */
class ReferenceSpec extends SparkSuite {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  /** Minimal yellow-trip rows: (pickup, dropoff, passengers, total). The
    * remaining 15 columns are nulls — the cast loop must pass them through. */
  private def trip(pickup: String, pax: Integer, total: java.lang.Double) =
    (pickup, pax, total)

  test("yellow-trip pipeline end-to-end: bronze edges, gold partitions, analytics queries") {
    val tmp = Files.createTempDirectory("ref_spec_").toString
    val env = Map(
      "SOURCE_DIR" -> s"$tmp/raw", "BRONZE_DIR" -> s"$tmp/bronze",
      "GOLD_DIR" -> s"$tmp/gold", "LOG_DIR" -> s"$tmp/logs",
      "START_DATE" -> "2023-01", "END_DATE" -> "2023-02")
    val cfg = ReferenceSchemas.configFromEnv(env)

    // 2023-01 file: normal rows + boundary + documented outliers
    val jan = Seq(
      trip("2023-01-05 10:00:00", 1, 20.0),
      trip("2023-01-15 22:30:00", 2, 35.5),
      trip("2022-12-29 00:00:00", 1, 10.0),  // exactly start − 72h: IN (inclusive)
      trip("2022-12-28 23:59:59", 1, 10.0),  // below tolerance: OUT
      trip("2023-02-01 00:00:00", 1, 10.0),  // next month start: OUT (exclusive)
      trip("2008-12-31 18:00:00", 3, 5.0),   // the 2008 outlier (README.md:8): OUT
      trip("2023-01-20 08:00:00", null, null)) // nulls survive the cast loop
    val feb = Seq(
      trip("2023-02-10 12:00:00", 4, 80.0),
      trip("2023-02-28 23:00:00", 1, 15.0))
    val mar = Seq(trip("2023-03-01 09:00:00", 1, 9.0)) // outside END_DATE: pruned

    for ((rows, ym) <- Seq((jan, "2023-01"), (feb, "2023-02"), (mar, "2023-03"))) {
      rows.toDF("p", "pax", "total")
        .selectExpr(
          "CAST(1 AS TINYINT) AS VendorID",
          "CAST(p AS TIMESTAMP) AS tpep_pickup_datetime",
          "CAST(p AS TIMESTAMP) AS tpep_dropoff_datetime",
          "CAST(pax AS INT) AS Passenger_count",
          "CAST(NULL AS DOUBLE) AS Trip_distance",
          "CAST(1 AS BIGINT) AS PULocationID", "CAST(2 AS BIGINT) AS DOLocationID",
          "CAST(NULL AS DOUBLE) AS RateCodeID", "CAST('N' AS STRING) AS Store_and_fwd_flag",
          "CAST(1 AS TINYINT) AS Payment_type", "CAST(NULL AS DOUBLE) AS Fare_amount",
          "CAST(NULL AS DOUBLE) AS Extra", "CAST(NULL AS DOUBLE) AS MTA_tax",
          "CAST(NULL AS DOUBLE) AS Improvement_surcharge", "CAST(NULL AS DOUBLE) AS Tip_amount",
          "CAST(NULL AS DOUBLE) AS Tolls_amount", "CAST(total AS DOUBLE) AS Total_amount",
          "CAST(NULL AS DOUBLE) AS congestion_Surcharge", "CAST(NULL AS DOUBLE) AS Airport_fee")
        .write.mode("overwrite").parquet(s"${cfg.srcDir}/yellow_tripdata_$ym.parquet")
    }

    val m = Etl.run(spark, cfg, runDate = "2023-03-01")
    assert(m.processed === Seq("yellow_tripdata_2023-01.parquet", "yellow_tripdata_2023-02.parquet"))
    assert(m.failed.isEmpty)

    val gold = spark.read.parquet(cfg.goldDir)
    // gold schema: 5 kept + 2 derived partition columns
    assert(gold.columns.toSet === Set("VendorID", "tpep_pickup_datetime",
      "tpep_dropoff_datetime", "Passenger_count", "Total_amount",
      "pickup_year", "pickup_month"))
    // half-open interval + tolerance semantics: 4 Jan-file survivors
    // (incl. the Dec-29 tolerance row and the null row) + 2 Feb rows
    assert(gold.count() === 6)
    assert(gold.filter(col("pickup_year") === 2022).count() === 1) // tolerance row
    assert(Files.exists(java.nio.file.Paths.get(cfg.goldDir, "pickup_year=2023", "pickup_month=2")))

    // the two reference analytics queries run over this gold
    val q1 = AnalyticsMain.q1MonthlyAvg(spark, cfg.goldDir).collect()
    assert(q1.length === 3) // (2022,12), (2023,1), (2023,2)
    val feb23 = q1.find(r => r.getInt(0) === 2023 && r.getInt(1) === 2).get
    assert(math.abs(feb23.getDouble(2) - 47.5) < 1e-9) // (80.0 + 15.0) / 2
    val q2 = AnalyticsMain.q2WindowAvgs(spark, cfg.goldDir).collect()
    assert(q2.length === 6) // one row per distinct (y,m,day,hour)
  }
}
