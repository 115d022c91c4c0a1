package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Tables
import graft.dates.DateBounds

/** Part A of SURVEY.md §2 — the reference's core operator surface (scan, cast,
  * time-interval filters, projection, derived partition columns, aggregates,
  * window averages, CTE, distinct, multi-column sort), re-expressed as
  * declarative DataFrame/SQL plans so Catalyst handles pushdown, pruning and
  * partial aggregation. Every query ends in a total-order sort for oracle
  * hash stability (SURVEY.md §7.5).
  */
object Core extends QueryModule {

  // A7/A8 — the reference's month-interval semantics (main.py:180-186):
  // half-open [month_start - tolerance, first_day_of_next_month), applied to
  // the orders table over month 1997-06 with a 72h tolerance so both bounds
  // actually discriminate on the testdata's 1995-2001 date range.
  private val Ym = "1997-06"
  private val TolHours = 72
  private val LowerLit = DateBounds.sqlLiteral(DateBounds.dateMinusTolerance(Ym, TolHours))
  private val UpperLit = DateBounds.sqlLiteral(DateBounds.firstDayOfNextMonth(Ym))
  // A5 — combined half-open interval on lineitem (file-prune twin at query level)
  private val PruneYm = "1996-03"
  private val PruneLower = DateBounds.sqlLiteral(DateBounds.dateMinusTolerance(PruneYm, TolHours))
  private val PruneUpper = DateBounds.sqlLiteral(DateBounds.firstDayOfNextMonth(PruneYm))

  /** A6 — cast-on-read schema normalization (main.py:170-171): every column
    * coerced to the declared type via a fold of Catalyst Casts. Exercised on
    * `events` whose ns timestamp needs explicit µs truncation (§7.5). */
  private val eventsTarget = StructType(Seq(
    StructField("event_id", LongType), StructField("ts", TimestampType),
    StructField("user_id", LongType), StructField("event_type", StringType),
    StructField("value", DoubleType)))

  def queries: Map[String, Q] = Map(
    "q_scan_parquet" -> ((s, d) =>
      Tables(s, d, "lineitem")
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")
        .orderBy("l_orderkey", "l_linenumber")),

    "q_scan_delta" -> ((s, d) =>
      // Delta jars are absent in this environment (SURVEY.md §7.4): the
      // reference's Delta scan maps to the identical logical parquet scan with
      // a partition-prunable date predicate.
      Tables(s, d, "orders")
        .filter(col("o_orderdate") >= lit("1998-01-01 00:00:00").cast(TimestampType))
        .select("o_orderkey", "o_totalprice", "o_orderdate")
        .orderBy("o_orderkey")),

    "q_scan_sql_path" -> ((s, d) =>
      s.sql(s"SELECT r_regionkey, r_name FROM parquet.`$d/region.parquet` ORDER BY r_regionkey")),

    "q_prune_files" -> ((s, d) =>
      Tables(s, d, "lineitem")
        .filter(col("l_shipdate") >= lit(PruneLower).cast(TimestampType) &&
                col("l_shipdate") <  lit(PruneUpper).cast(TimestampType))
        .select("l_orderkey", "l_linenumber", "l_shipdate")
        .orderBy("l_orderkey", "l_linenumber")),

    // A5b — the NON-sargable spelling of year pruning, made sargable by the
    // injected [[graft.plans.YearPredicateRewrite]] optimizer rule:
    // year(l_shipdate) = 1995 would scan everything (function over the
    // column defeats row-group stats); the rule rewrites it to the
    // half-open timestamp range, which reaches the scan as PushedFilters
    // (asserted in PlanSpec).
    "q_prune_year" -> ((s, d) =>
      Tables(s, d, "lineitem")
        .filter(year(col("l_shipdate")) === 1995)
        .select("l_orderkey", "l_linenumber", "l_shipdate")
        .orderBy("l_orderkey", "l_linenumber")),

    "q_cast_schema" -> ((s, d) => {
      val raw = Tables(s, d, "events") // ts already normalized ns→µs
      eventsTarget.fields.foldLeft(raw.select(eventsTarget.fieldNames.map(col): _*)) {
        (df, f) => df.withColumn(f.name, col(f.name).cast(f.dataType))
      }.orderBy("event_id")
    }),

    "q_filter_ts_lower" -> ((s, d) =>
      Tables(s, d, "orders")
        .filter(col("o_orderdate") >= lit(LowerLit).cast(TimestampType))
        .select("o_orderkey", "o_orderdate")
        .orderBy("o_orderkey")),

    "q_filter_ts_upper" -> ((s, d) =>
      Tables(s, d, "orders")
        .filter(col("o_orderdate") < lit(UpperLit).cast(TimestampType))
        .select("o_orderkey", "o_orderdate")
        .orderBy("o_orderkey")),

    "q_project_drop" -> ((s, d) =>
      // bronze→gold column pruning by set difference (main.py:218-223)
      Tables(s, d, "lineitem")
        .drop("l_partkey", "l_suppkey", "l_extendedprice", "l_discount", "l_tax", "l_shipdate")
        .orderBy("l_orderkey", "l_linenumber")),

    "q_derive_year_month" -> ((s, d) =>
      Tables(s, d, "orders")
        .withColumn("o_year", year(col("o_orderdate")))
        .withColumn("o_month", month(col("o_orderdate")))
        .select("o_orderkey", "o_year", "o_month")
        .orderBy("o_orderkey")),

    "q_day_hour" -> ((s, d) =>
      Tables(s, d, "events")
        .select(col("event_id"),
          dayofmonth(col("ts")).as("e_day"), hour(col("ts")).as("e_hour"))
        .orderBy("event_id")),

    "q_count" -> ((s, d) =>
      Tables(s, d, "lineitem").agg(count(lit(1)).as("n_rows"))),

    "q_groupby_avg" -> ((s, d) =>
      // Analytics Q1 shape (pasta2_analytics/src/main.py:18-25)
      Tables(s, d, "orders")
        .groupBy(year(col("o_orderdate")).as("o_year"), month(col("o_orderdate")).as("o_month"))
        .agg(Det.davg(col("o_totalprice")).as("avg_total"))
        .orderBy("o_year", "o_month")),

    "q_orderby_multi" -> ((s, d) =>
      Tables(s, d, "lineitem")
        .select("l_returnflag", "l_linestatus", "l_orderkey", "l_linenumber")
        .orderBy("l_returnflag", "l_linestatus", "l_orderkey", "l_linenumber")),

    // Scale note (A15/A16): Window.partitionBy(year, month, day) makes one
    // window partition hold a full day of global data — at 100 TB a hot day
    // is a single straggler task (WindowExec buffers the partition). The
    // frame is the whole partition, so the scale-safe equivalent is
    // groupBy(day).agg(avg) + broadcast join back; the window form is kept
    // because it is the reference's exact shape (analytics main.py:41-42)
    // and the oracle checks that composition.
    "q_window_avg_day" -> ((s, d) => {
      val e = Tables(s, d, "events")
      val w = Window.partitionBy(year(col("ts")), month(col("ts")), dayofmonth(col("ts")))
      e.select(col("event_id"),
          (sum(col("value").cast(DecimalType(18, 4))).over(w).cast(DoubleType) /
            count(lit(1)).over(w)).as("avg_day"))
        .orderBy("event_id")
    }),

    "q_window_avg_hour" -> ((s, d) => {
      // dual window specs sharing a shuffle prefix (analytics main.py:41-42)
      val e = Tables(s, d, "events")
      val wd = Window.partitionBy(year(col("ts")), month(col("ts")), dayofmonth(col("ts")))
      val wh = Window.partitionBy(year(col("ts")), month(col("ts")), dayofmonth(col("ts")), hour(col("ts")))
      e.select(col("event_id"),
          (sum(col("value").cast(DecimalType(18, 4))).over(wd).cast(DoubleType) /
            count(lit(1)).over(wd)).as("avg_day"),
          (sum(col("value").cast(DecimalType(18, 4))).over(wh).cast(DoubleType) /
            count(lit(1)).over(wh)).as("avg_hour"))
        .orderBy("event_id")
    }),

    // A15-at-scale — the groupBy + broadcast-join-back twin of
    // q_window_avg_day (the rewrite the scale note above prescribes): the
    // per-day aggregate is partial+final (map-side combine), its result is
    // tiny (one row per day) and broadcasts back onto the fact — the fact
    // side never shuffles and no WindowExec buffers a whole hot day in one
    // task. Oracle-checked against the WINDOW form, proving the rewrite is
    // value-identical (same decimal-exact sum/count arithmetic).
    "q_window_avg_day_scalable" -> ((s, d) => {
      val e = Tables(s, d, "events")
        .withColumn("e_year", year(col("ts")))
        .withColumn("e_month", month(col("ts")))
        .withColumn("e_day", dayofmonth(col("ts")))
      val daily = e.groupBy("e_year", "e_month", "e_day")
        .agg((sum(col("value").cast(DecimalType(18, 4))).cast(DoubleType) /
          count(lit(1))).as("avg_day"))
      e.join(broadcast(daily), Seq("e_year", "e_month", "e_day"))
        .select(col("event_id"), col("avg_day"))
        .orderBy("event_id")
    }),

    "q_cte" -> ((s, d) => {
      Tables.register(s, d, "events") // only the table the SQL reads
      s.sql(CteSql) // same text runs on DuckDB — see oracles
    }),

    "q_distinct_groupby" -> ((s, d) =>
      Tables(s, d, "orders")
        .select("o_orderstatus", "o_orderpriority")
        .distinct()
        .orderBy("o_orderstatus", "o_orderpriority"))
  )

  /** Mirrors the reference's Analytics Q2 composition
    * (pasta2_analytics/src/main.py:33-50): dual window averages computed
    * inside a CTE, then dedup via GROUP BY over ALL selected columns —
    * including the window values in the grouping key (the reference's
    * semantic quirk, SURVEY.md §3.3) — then a multi-column ORDER BY.
    * Identical text runs on Spark and DuckDB. */
  private val CteSql =
    """WITH events_window AS (
      |  SELECT CAST(year(ts) AS INTEGER) AS e_year,
      |         CAST(month(ts) AS INTEGER) AS e_month,
      |         CAST(day(ts) AS INTEGER) AS e_day,
      |         CAST(hour(ts) AS INTEGER) AS e_hour,
      |         CAST(SUM(CAST(value AS DECIMAL(18,4))) OVER wd AS DOUBLE) / COUNT(*) OVER wd AS avg_day,
      |         CAST(SUM(CAST(value AS DECIMAL(18,4))) OVER wh AS DOUBLE) / COUNT(*) OVER wh AS avg_hour
      |  FROM events
      |  WINDOW wd AS (PARTITION BY year(ts), month(ts), day(ts)),
      |         wh AS (PARTITION BY year(ts), month(ts), day(ts), hour(ts)))
      |SELECT e_year, e_month, e_day, e_hour, avg_day, avg_hour
      |FROM events_window
      |GROUP BY e_year, e_month, e_day, e_hour, avg_day, avg_hour
      |ORDER BY e_year, e_month, e_day, e_hour""".stripMargin

  def oracles: Map[String, String] = Map(
    "q_scan_parquet" ->
      "SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice FROM lineitem ORDER BY l_orderkey, l_linenumber",
    "q_scan_delta" ->
      "SELECT o_orderkey, o_totalprice, o_orderdate FROM orders WHERE o_orderdate >= TIMESTAMP '1998-01-01 00:00:00' ORDER BY o_orderkey",
    "q_scan_sql_path" ->
      "SELECT r_regionkey, r_name FROM region ORDER BY r_regionkey",
    "q_prune_files" ->
      s"SELECT l_orderkey, l_linenumber, l_shipdate FROM lineitem WHERE l_shipdate >= TIMESTAMP '$PruneLower' AND l_shipdate < TIMESTAMP '$PruneUpper' ORDER BY l_orderkey, l_linenumber",
    // DuckDB evaluates year() directly; Spark runs the rewritten sargable
    // range — value equality proves the rewrite is semantics-preserving.
    "q_prune_year" ->
      "SELECT l_orderkey, l_linenumber, l_shipdate FROM lineitem WHERE year(l_shipdate) = 1995 ORDER BY l_orderkey, l_linenumber",
    "q_cast_schema" ->
      "SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, CAST(user_id AS BIGINT) AS user_id, CAST(event_type AS VARCHAR) AS event_type, CAST(value AS DOUBLE) AS value FROM events ORDER BY event_id",
    "q_filter_ts_lower" ->
      s"SELECT o_orderkey, o_orderdate FROM orders WHERE o_orderdate >= TIMESTAMP '$LowerLit' ORDER BY o_orderkey",
    "q_filter_ts_upper" ->
      s"SELECT o_orderkey, o_orderdate FROM orders WHERE o_orderdate < TIMESTAMP '$UpperLit' ORDER BY o_orderkey",
    "q_project_drop" ->
      "SELECT l_orderkey, l_linenumber, l_quantity, l_returnflag, l_linestatus FROM lineitem ORDER BY l_orderkey, l_linenumber",
    "q_derive_year_month" ->
      "SELECT o_orderkey, CAST(year(o_orderdate) AS INTEGER) AS o_year, CAST(month(o_orderdate) AS INTEGER) AS o_month FROM orders ORDER BY o_orderkey",
    "q_day_hour" ->
      "SELECT event_id, CAST(day(ts) AS INTEGER) AS e_day, CAST(hour(ts) AS INTEGER) AS e_hour FROM events ORDER BY event_id",
    "q_count" ->
      "SELECT COUNT(*) AS n_rows FROM lineitem",
    "q_groupby_avg" ->
      s"SELECT CAST(year(o_orderdate) AS INTEGER) AS o_year, CAST(month(o_orderdate) AS INTEGER) AS o_month, ${Det.sqlAvg("o_totalprice")} AS avg_total FROM orders GROUP BY 1, 2 ORDER BY 1, 2",
    "q_orderby_multi" ->
      "SELECT l_returnflag, l_linestatus, l_orderkey, l_linenumber FROM lineitem ORDER BY l_returnflag, l_linestatus, l_orderkey, l_linenumber",
    "q_window_avg_day" ->
      "SELECT event_id, CAST(SUM(CAST(value AS DECIMAL(18,4))) OVER w AS DOUBLE) / COUNT(*) OVER w AS avg_day FROM events WINDOW w AS (PARTITION BY year(ts), month(ts), day(ts)) ORDER BY event_id",
    "q_window_avg_hour" ->
      """SELECT event_id,
        | CAST(SUM(CAST(value AS DECIMAL(18,4))) OVER wd AS DOUBLE) / COUNT(*) OVER wd AS avg_day,
        | CAST(SUM(CAST(value AS DECIMAL(18,4))) OVER wh AS DOUBLE) / COUNT(*) OVER wh AS avg_hour
        |FROM events
        |WINDOW wd AS (PARTITION BY year(ts), month(ts), day(ts)),
        |       wh AS (PARTITION BY year(ts), month(ts), day(ts), hour(ts))
        |ORDER BY event_id""".stripMargin,
    // Same oracle text as q_window_avg_day: the scalable rewrite must
    // reproduce the reference's WINDOW semantics exactly.
    "q_window_avg_day_scalable" ->
      "SELECT event_id, CAST(SUM(CAST(value AS DECIMAL(18,4))) OVER w AS DOUBLE) / COUNT(*) OVER w AS avg_day FROM events WINDOW w AS (PARTITION BY year(ts), month(ts), day(ts)) ORDER BY event_id",
    "q_cte" -> CteSql,
    "q_distinct_groupby" ->
      "SELECT DISTINCT o_orderstatus, o_orderpriority FROM orders ORDER BY o_orderstatus, o_orderpriority"
  )
}
