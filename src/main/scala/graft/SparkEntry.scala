package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * Aggregates every query module's declared queries and oracle SQL. */
object SparkEntry {
  private val modules: Seq[QueryModule] = Seq(
    Core, Joins, Aggs, SetsScalars, TimeSeries, Features, Graph, Analytics, TypedOps,
    graft.llm.Dedup, graft.llm.Text, graft.llm.Similarity, graft.llm.Multimodal,
    graft.llm.Sampling, graft.llm.Corpus, graft.llm.Packing, graft.llm.Clustering,
    graft.stream.Windows, graft.etl.EtlQueries, graft.sources.SourceQueries)

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Uses the reference's Analytics-Q1 shape (grouped average over monthly
    * keys — pasta2_analytics/src/main.py:18-25). */
  def entry(spark: SparkSession): DataFrame =
    queries("q_groupby_avg")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    modules.flatMap(_.queries).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    modules.flatMap(_.oracles).toMap
}
