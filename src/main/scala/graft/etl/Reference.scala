package graft.etl

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types._

import graft.Sessions

/** The reference pipeline's domain schemas and env-driven entry points — the
  * drop-in replacement for running `pasta1_etl/src/main.py` +
  * `pasta2_analytics/src/main.py`.
  *
  * Schemas transcribe /root/reference/pasta1_etl/src/main.py:69-106 (the
  * code's schema dict is the source of truth; the Hive DDL drifts —
  * SURVEY.md §1.3). Money stays DoubleType and RateCodeID is deliberately
  * DoubleType (NaN-bearing source column), both per §1.2.
  */
object ReferenceSchemas {

  /** 19-column bronze (main.py:71-92), unpartitioned. */
  val yellowBronze: StructType = StructType(Seq(
    StructField("VendorID", ByteType),
    StructField("tpep_pickup_datetime", TimestampType),
    StructField("tpep_dropoff_datetime", TimestampType),
    StructField("Passenger_count", IntegerType),
    StructField("Trip_distance", DoubleType),
    StructField("PULocationID", LongType),
    StructField("DOLocationID", LongType),
    StructField("RateCodeID", DoubleType),
    StructField("Store_and_fwd_flag", StringType),
    StructField("Payment_type", ByteType),
    StructField("Fare_amount", DoubleType),
    StructField("Extra", DoubleType),
    StructField("MTA_tax", DoubleType),
    StructField("Improvement_surcharge", DoubleType),
    StructField("Tip_amount", DoubleType),
    StructField("Tolls_amount", DoubleType),
    StructField("Total_amount", DoubleType),
    StructField("congestion_Surcharge", DoubleType),
    StructField("Airport_fee", DoubleType)))

  /** Columns dropped bronze→gold (set difference per main.py:218-223; gold
    * keeps VendorID, pickup/dropoff, Passenger_count, Total_amount +
    * derived pickup_year/pickup_month — main.py:94-105). */
  val goldDropCols: Seq[String] = Seq(
    "Trip_distance", "PULocationID", "DOLocationID", "RateCodeID",
    "Store_and_fwd_flag", "Payment_type", "Fare_amount", "Extra", "MTA_tax",
    "Improvement_surcharge", "Tip_amount", "Tolls_amount",
    "congestion_Surcharge", "Airport_fee")

  /** The reference's pipeline config from environment variables — its
    * example.env surface (START_DATE/END_DATE as YYYY-MM), with local
    * directories standing in for the S3 bucket prefixes. */
  def configFromEnv(env: Map[String, String]): Etl.Config = Etl.Config(
    srcDir = env.getOrElse("SOURCE_DIR", "data/raw"),
    bronzeDir = env.getOrElse("BRONZE_DIR", "data/bronze"),
    goldDir = env.getOrElse("GOLD_DIR", "data/gold"),
    logDir = env.getOrElse("LOG_DIR", "data/logs"),
    filePrefix = env.getOrElse("FILE_PREFIX", "yellow_tripdata"),
    tsCol = "tpep_pickup_datetime",
    startYm = env.getOrElse("START_DATE", "2023-01"),
    endYm = env.getOrElse("END_DATE", "2023-05"),
    toleranceHours = env.getOrElse("TOLERANCE_HOURS", "72").toInt,
    bronzeSchema = yellowBronze,
    goldDropCols = goldDropCols)
}

/** ETL entry point — twin of `pasta1_etl/src/main.py` `main()`
  * (main.py:242-269): DDL → bronze per-file loop → manifests → gold. */
object EtlMain {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "4"), "graft-etl")
    val cfg = ReferenceSchemas.configFromEnv(sys.env)
    val runDate = sys.env.getOrElse("RUN_DATE", java.time.LocalDate.now.toString)
    val m = Etl.run(spark, cfg, runDate)
    println(s"[etl] processed=${m.processed.size} failed=${m.failed.size}")
    m.failed.foreach { case (f, e) => System.err.println(s"[etl] FAILED $f: $e") }
    spark.stop()
  }
}

/** Analytics entry point — twin of `pasta2_analytics/src/main.py`: the two
  * reference queries over gold, written as headered CSV. */
object AnalyticsMain {

  /** Q1 (analytics main.py:18-25): monthly AVG(Total_amount), ordered. */
  def q1MonthlyAvg(spark: SparkSession, goldDir: String) = {
    import org.apache.spark.sql.functions._
    spark.read.parquet(goldDir)
      .groupBy("pickup_year", "pickup_month")
      .agg(avg("Total_amount").as("avg_total_amount"))
      .orderBy("pickup_year", "pickup_month")
  }

  /** Q2 (analytics main.py:30-52): dual window averages of Passenger_count
    * per day and hour, deduped via GROUP BY over all selected columns
    * (window values in the grouping key — the reference's quirk, §3.3). */
  def q2WindowAvgs(spark: SparkSession, goldDir: String) = {
    spark.read.parquet(goldDir).createOrReplaceTempView("yellow_tripdata_gold")
    spark.sql(
      """WITH yellow_tripdata_window AS (
        |  SELECT pickup_year, pickup_month,
        |         DAY(tpep_pickup_datetime) AS pickup_day,
        |         HOUR(tpep_pickup_datetime) AS pickup_hour,
        |         AVG(Passenger_count) OVER (PARTITION BY pickup_year, pickup_month, DAY(tpep_pickup_datetime)) AS avg_passenger_day,
        |         AVG(Passenger_count) OVER (PARTITION BY pickup_year, pickup_month, DAY(tpep_pickup_datetime), HOUR(tpep_pickup_datetime)) AS avg_passenger_hour
        |  FROM yellow_tripdata_gold)
        |SELECT pickup_year, pickup_month, pickup_day, pickup_hour,
        |       avg_passenger_day, avg_passenger_hour
        |FROM yellow_tripdata_window
        |GROUP BY pickup_year, pickup_month, pickup_day, pickup_hour,
        |         avg_passenger_day, avg_passenger_hour
        |ORDER BY pickup_year, pickup_month, pickup_day, pickup_hour""".stripMargin)
  }

  def main(args: Array[String]): Unit = {
    val spark = Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "4"), "graft-analytics")
    val goldDir = sys.env.getOrElse("GOLD_DIR", "data/gold")
    val outDir = sys.env.getOrElse("RESULTS_DIR", "data/results")
    Etl.writeCsv(q1MonthlyAvg(spark, goldDir), s"$outDir/monthly_avg_total")
    Etl.writeCsv(q2WindowAvgs(spark, goldDir), s"$outDir/window_avg_passengers")
    println(s"[analytics] wrote 2 result sets to $outDir")
    spark.stop()
  }
}
