package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.types.StructType

/** Source/sink surface beyond plain parquet: bucketed catalog tables
  * (co-located joins), and CSV/JSON read+write.
  *
  * Bucketing is the pre-computed shuffle: both sides of a frequent join are
  * written hash-partitioned into the same number of buckets on the join
  * key, so the join plans with ZERO Exchange on either side — at 100 TB
  * this turns every fact⋈fact join on the bucket key from a full shuffle
  * into a local merge. The cost is paid once at write time; asserted in
  * `BucketedJoinSpec`.
  */
object Sources {

  /** Write a DataFrame as a bucketed+sorted catalog table (parquet files
    * hash-partitioned by `bucketCol` into `numBuckets`). */
  def writeBucketed(df: DataFrame, table: String, bucketCol: String, numBuckets: Int): Unit =
    df.write
      .format("parquet")
      .bucketBy(numBuckets, bucketCol)
      .sortBy(bucketCol)
      .mode(SaveMode.Overwrite)
      .saveAsTable(table)

  /** Drop a catalog table AND clear its leftover warehouse directory: a
    * fresh JVM's in-memory catalog doesn't know tables from prior runs, so
    * DROP alone can't clear the directory and the next saveAsTable would
    * fail with LOCATION_ALREADY_EXISTS. */
  def resetTable(spark: SparkSession, table: String): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS $table")
    val dir = new java.io.File(s"/tmp/graft_warehouse/$table")
    if (dir.exists()) {
      java.nio.file.Files.walk(dir.toPath)
        .sorted(java.util.Comparator.reverseOrder())
        .forEach(p => java.nio.file.Files.delete(p))
    }
  }

  /** CSV with header — the reference's result format
    * (pasta2_analytics/src/main.py:26,51) — as a readable SOURCE too. */
  def writeCsv(df: DataFrame, path: String): Unit =
    df.write.option("header", "true").mode(SaveMode.Overwrite).csv(path)

  def readCsv(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.option("header", "true").schema(schema).csv(path)

  /** Line-delimited JSON (schema-explicit read — schema inference over a
    * multi-TB prefix is a full extra scan; never rely on it at scale). */
  def writeJson(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).json(path)

  def readJson(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).json(path)

  /** ORC — the other first-class columnar format (vectorized reader,
    * predicate pushdown and column pruning like parquet). Schema passed
    * explicitly on read for the same no-inference-scan reason as JSON.
    * Compression pinned to zlib: Spark 4's default ORC codec (zstd) writes
    * but silently fails to decode in this container (no native zstd for the
    * ORC reader path — probed snappy/zlib/none all round-trip). */
  def writeOrc(df: DataFrame, path: String): Unit =
    df.write.option("compression", "zlib").mode(SaveMode.Overwrite).orc(path)

  /** ORC is self-describing (schema in the footer — no inference scan), but
    * Spark 4 round-trips TimestampType through ORC's plain `timestamp` and
    * reads it back as TIMESTAMP_NTZ; forcing the declared schema at read
    * time throws ORC_TYPE_CAST. So: read the footer schema, then cast to
    * the declared types — lossless under the project's pinned UTC session. */
  def readOrc(spark: SparkSession, path: String, schema: StructType): DataFrame = {
    import org.apache.spark.sql.functions.col
    spark.read.orc(path)
      .select(schema.fields.map(f => col(f.name).cast(f.dataType).as(f.name)).toSeq: _*)
  }
}
