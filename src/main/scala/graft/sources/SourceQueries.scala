package graft.sources

import org.apache.spark.sql.types._

import graft.Tables
import graft.queries.QueryModule

/** Declared round-trip queries for the non-parquet sources: the table is
  * written to CSV / line-JSON and read back with an explicit schema; the
  * DuckDB oracle reads the ORIGINAL parquet — so the round-trip must be
  * lossless (timestamp formatting, double shortest-repr, nulls, header
  * handling) for the hashes to match. */
object SourceQueries extends QueryModule {

  private val ordersSchema = StructType(Seq(
    StructField("o_orderkey", LongType), StructField("o_custkey", LongType),
    StructField("o_orderstatus", StringType), StructField("o_totalprice", DoubleType),
    StructField("o_orderdate", TimestampType), StructField("o_orderpriority", StringType)))

  private val oracleSelect =
    """SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
      |FROM orders ORDER BY o_orderkey""".stripMargin

  def queries: Map[String, Q] = Map(
    "q_source_csv_roundtrip" -> ((s, d) => {
      val tmp = graft.Scratch.dir("graft_csv_")
      Sources.writeCsv(Tables(s, d, "orders"), s"$tmp/orders_csv")
      Sources.readCsv(s, s"$tmp/orders_csv", ordersSchema).orderBy("o_orderkey")
    }),
    "q_source_json_roundtrip" -> ((s, d) => {
      val tmp = graft.Scratch.dir("graft_json_")
      Sources.writeJson(Tables(s, d, "orders"), s"$tmp/orders_json")
      Sources.readJson(s, s"$tmp/orders_json", ordersSchema).orderBy("o_orderkey")
    }),
    "q_source_orc_roundtrip" -> ((s, d) => {
      val tmp = graft.Scratch.dir("graft_orc_")
      Sources.writeOrc(Tables(s, d, "orders"), s"$tmp/orders_orc")
      Sources.readOrc(s, s"$tmp/orders_orc", ordersSchema).orderBy("o_orderkey")
    })
  )

  def oracles: Map[String, String] = Map(
    "q_source_csv_roundtrip" -> oracleSelect,
    "q_source_json_roundtrip" -> oracleSelect,
    "q_source_orc_roundtrip" -> oracleSelect
  )
}
