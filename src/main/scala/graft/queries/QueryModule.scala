package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** A named set of declared queries (SURVEY.md §2) plus their DuckDB oracle
  * SQL. `SparkEntry` merges all modules; the driver's `Verify` dumps each
  * query's result and hash-compares against the oracle on sf0.01. */
trait QueryModule {
  type Q = (SparkSession, String) => DataFrame
  def queries: Map[String, Q]
  /** Subset of `queries` keys that are SQL-expressible in DuckDB. */
  def oracles: Map[String, String]
}
