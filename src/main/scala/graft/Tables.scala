package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver's testdata tables (see TESTDATA.md / FIXTURES.md).
  *
  * Tables are plain parquet files `<dir>/<name>.parquet`. At cluster scale the
  * same loader works over a partitioned directory or object-store prefix —
  * Spark's FileSourceScan handles both; filters and projections declared on the
  * returned DataFrame are pushed down into the parquet reader.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** events.ts is parquet TIMESTAMP(NANOS) which Spark's vectorized reader
    * rejects outright; with `spark.sql.legacy.parquet.nanosAsLong=true` it
    * arrives as LongType nanos. We truncate to micros (integer div — no double
    * round-trip, which would lose precision above 2^53) to match both the
    * reference's microsecond TimestampType semantics and DuckDB's ns→µs read. */
  def apply(spark: SparkSession, dir: String, name: String): DataFrame = {
    if (name == "events") {
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      spark.read.parquet(s"$dir/$name.parquet")
        .withColumn("ts", timestamp_micros(expr("ts div 1000")))
    } else spark.read.parquet(s"$dir/$name.parquet")
  }

  /** Register every testdata table as a temp view so `spark.sql` queries
    * (CTE / SQL-surface operators) can address them by bare name, matching the
    * DuckDB oracle's table names. */
  def registerAll(spark: SparkSession, dir: String): Unit =
    names.foreach(n => apply(spark, dir, n).createOrReplaceTempView(n))
}
