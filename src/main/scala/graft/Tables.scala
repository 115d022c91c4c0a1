package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

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

  /** events.ts has shipped in two physical flavors across driver testdata
    * generations: TIMESTAMP(NANOS) (read as LongType nanos under
    * `spark.sql.legacy.parquet.nanosAsLong=true`, then floor-truncated to
    * micros here) and plain micros TIMESTAMP (current — arrives as
    * TimestampType under the session's UTC zone with
    * `inferTimestampNTZ.enabled=false`, or TIMESTAMP_NTZ without it). The
    * loader branches on the ACTUAL column type so every flavor lands as
    * microsecond TimestampType — the reference's semantics and DuckDB's
    * read of the same file. */
  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    // MEMOIZED per (session, dir, table) (r16, guide §6 "file listing"):
    // `spark.read.parquet` re-lists the path and re-infers the schema on
    // EVERY call, and parquet footer inference launches a (small) Spark
    // job — a fixed tax paid 2-5× per query invocation across the whole
    // suite. The memo reuses the LAZY plan only: every action still scans
    // the parquet from disk (nothing is persisted or cached — this is
    // metadata reuse, the same class as Spark's own
    // filesourcePartitionFileCacheSize listing cache). Testdata tables
    // are immutable fixture inputs; keying by session keeps temp-view
    // registration and session configs correct across suites.
    cache.computeIfAbsent(
      s"${System.identityHashCode(spark)}|$dir|$name",
      _ => load(spark, dir, name))

  private val cache =
    new java.util.concurrent.ConcurrentHashMap[String, DataFrame]()

  private def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    if (name == "events") {
      val df = spark.read.parquet(s"$dir/$name.parquet")
      df.schema("ts").dataType match {
        case LongType => df.withColumn("ts", nanosToMicrosFloor("ts"))
        case TimestampNTZType =>
          // value-preserving under the engine's UTC session zone
          df.withColumn("ts", col("ts").cast(TimestampType))
        case _ => df
      }
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
