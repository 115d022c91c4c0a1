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
}
