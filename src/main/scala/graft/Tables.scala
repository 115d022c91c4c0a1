package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
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
    * rejects outright; the session must set
    * `spark.sql.legacy.parquet.nanosAsLong=true` (done in the Verify/Bench/test
    * builders — NOT here: a query builder must not mutate shared session
    * state) so it arrives as LongType nanos. We truncate to micros (integer
    * div — no double round-trip, which would lose precision above 2^53) to
    * match both the reference's microsecond TimestampType semantics and
    * DuckDB's ns→µs read. The `pmod` form floors (not truncates) the
    * division so pre-epoch (negative) nanos also agree with DuckDB's
    * conversion — `div` alone would round toward zero and drift 1µs. */
  def apply(spark: SparkSession, dir: String, name: String): DataFrame = {
    if (name == "events") {
      spark.read.parquet(s"$dir/$name.parquet")
        .withColumn("ts", nanosToMicrosFloor("ts"))
    } else spark.read.parquet(s"$dir/$name.parquet")
  }

  /** The ns→µs FLOOR conversion described above, shared by the batch loader
    * and [[graft.stream.Streaming.readEvents]] so batch ≡ stream holds for
    * pre-epoch timestamps too (plain `div` rounds toward zero). */
  def nanosToMicrosFloor(colName: String): Column =
    timestamp_micros(expr(s"($colName - pmod($colName, 1000)) div 1000"))

  /** Register a subset of testdata tables as temp views so `spark.sql`
    * queries (CTE / SQL-surface operators) can address them by bare name,
    * matching the DuckDB oracle's table names. Register only what the query
    * reads — at scale, schema inference of unrelated multi-TB prefixes is
    * pure waste. */
  def register(spark: SparkSession, dir: String, tables: String*): Unit =
    tables.foreach(n => apply(spark, dir, n).createOrReplaceTempView(n))

  /** Register every testdata table (harness/diagnostic use only). */
  def registerAll(spark: SparkSession, dir: String): Unit =
    register(spark, dir, names: _*)
}
