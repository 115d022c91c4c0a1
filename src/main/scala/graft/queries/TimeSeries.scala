package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType, IntegerType, TimestampType}

import graft.Tables

/** Time-series surface over `events` (generalizes the reference's
  * day/hour window analytics, pasta2_analytics/src/main.py:39-42, to the
  * operators a metrics/feature pipeline needs):
  *
  *  - trailing event-time RANGE frames (value-based windows — no frame-row
  *    count assumptions, ties included by definition on both engines);
  *  - regular-grid resampling with forward fill (grid × dims left-join
  *    observations, then `last(value, ignoreNulls)` over the ordered grid).
  *
  * Scale design: the range frame shuffles once on the partition key (the
  * same WindowExec shape as B9); the resample grid is |users| × |hours| —
  * built from a BROADCAST hour spine crossed against the (small) user dim,
  * never against the fact table; observations reduce per (user, hour)
  * before joining the grid.
  */
object TimeSeries extends QueryModule {

  private val Day = "2024-01-15"
  private val HourUs = 3600L * 1000000L

  def queries: Map[String, Q] = Map(
    // Trailing 1-hour per-user event-time window: RANGE frame over epoch
    // micros — frame membership is by timestamp value, so concurrent
    // events (ties) are all peers; no ORDER-dependent nondeterminism.
    "q_window_range_frame" -> ((s, d) => {
      val w = Window.partitionBy("user_id").orderBy("ts_us")
        .rangeBetween(-HourUs, 0)
      Tables(s, d, "events")
        .withColumn("ts_us", unix_micros(col("ts")))
        .select(col("event_id"), col("user_id"),
          count(lit(1)).over(w).as("n_1h"),
          sum(col("value").cast(DecimalType(18, 4))).over(w)
            .cast(DoubleType).as("sum_1h"))
        .orderBy("event_id")
    }),

    // Batch sessionization (gaps-and-islands): the batch twin of the
    // streaming session window (B19) — a new session starts where the gap
    // from the previous event exceeds 30 min. lag + running-sum over the
    // per-user event-time order, then one per-session aggregate. Scale: the
    // two windows and the aggregate all share ONE hash partitioning on
    // user_id — Catalyst reuses the exchange, so the fact table shuffles
    // once. Ties are ordered by (ts, event_id) — fully deterministic.
    "q_sessionize" -> ((s, d) => {
      val GapUs = 1800L * 1000000L // 30-minute inactivity gap
      val wOrd = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
      val prev = lag(col("ts_us"), 1).over(wOrd)
      Tables(s, d, "events")
        .withColumn("ts_us", unix_micros(col("ts")))
        .withColumn("new_s",
          when(prev.isNull || col("ts_us") - prev > GapUs, 1).otherwise(0))
        .withColumn("session_id",
          sum(col("new_s")).over(
            wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow))
            .cast(IntegerType))
        .groupBy("user_id", "session_id")
        .agg(count(lit(1)).as("n_events"),
          min("ts_us").as("start_us"),
          max("ts_us").as("end_us"),
          Det.dsum(col("value")).as("sum_value"))
        .withColumn("dur_us", col("end_us") - col("start_us"))
        .orderBy("user_id", "session_id")
    }),

    // Hourly resample + forward fill for one day: every (user, hour) cell
    // gets the latest observation at or before it (within the day).
    // "Latest in hour" is keyed on event_id (unique, monotone within the
    // generator) — fully deterministic on both engines.
    "q_resample_ffill" -> ((s, d) => {
      val dayStart = lit(s"$Day 00:00:00").cast(TimestampType)
      val dayEnd = lit(s"$Day 23:59:59.999999").cast(TimestampType)
      val e = Tables(s, d, "events")
      val obs = e
        .filter(col("ts") >= dayStart && col("ts") <= dayEnd)
        .withColumn("hour_ts", date_trunc("hour", col("ts")))
        .withColumn("rn", row_number().over(
          Window.partitionBy("user_id", "hour_ts").orderBy(desc("event_id"))))
        .filter(col("rn") === 1)
        .select("user_id", "hour_ts", "value")
      val users = e.select("user_id").distinct()
      val spine = e.sparkSession.range(1)
        .select(explode(sequence(lit(0), lit(23))).as("h"))
        .select(timestamp_micros(
          (unix_micros(dayStart) + col("h") * HourUs)).as("hour_ts"))
      users.crossJoin(broadcast(spine))
        .join(obs, Seq("user_id", "hour_ts"), "left")
        .select(col("user_id"), col("hour_ts"),
          last(col("value"), ignoreNulls = true).over(
            Window.partitionBy("user_id").orderBy("hour_ts")
              .rowsBetween(Window.unboundedPreceding, Window.currentRow))
            .as("v_ffill"))
        .orderBy("user_id", "hour_ts")
    }),

    // Trailing moving MEDIAN (robust smoothing): the per-user median of the
    // last 11 observations — unlike a moving average, one corrupt spike
    // cannot drag the smoothed series. Exact interpolated percentile over a
    // bounded ROWS frame (11-value buffer per position — constant memory);
    // one user_id exchange shared with the other per-user windows.
    "q_window_median" -> ((s, d) => {
      val w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
        .rowsBetween(-10, Window.currentRow)
      Tables(s, d, "events")
        .withColumn("ts_us", unix_micros(col("ts")))
        .select(col("event_id"), col("user_id"),
          percentile(col("value"), lit(0.5)).over(w).as("med_trailing"))
        .orderBy("event_id")
    }),

    // Coverage-gap detection: every (event_type, hour) calendar cell with NO
    // events — the monitoring query behind "did ingestion stall?". The hour
    // spine is generated from the global min/max (a 1-row aggregate), the
    // candidate grid is |types| × |hours| (tiny, built broadcast-side), and
    // the fact table reduces to DISTINCT (type, hour) in one shuffle before
    // the anti-join — facts are never joined row-per-row against the grid.
    "q_gap_detect" -> ((s, d) => {
      val e = Tables(s, d, "events")
      val bounds = e.agg(
        date_trunc("hour", min(col("ts"))).as("h0"),
        date_trunc("hour", max(col("ts"))).as("h1"))
      val spine = bounds.select(explode(
        sequence(col("h0"), col("h1"), expr("interval 1 hour"))).as("hour_ts"))
      val types = e.select("event_type").distinct()
      val observed = e.select(col("event_type"),
        date_trunc("hour", col("ts")).as("hour_ts")).distinct()
      types.crossJoin(broadcast(spine))
        .join(observed, Seq("event_type", "hour_ts"), "left_anti")
        .orderBy("event_type", "hour_ts")
    })
  )

  def oracles: Map[String, String] = Map(
    "q_window_median" ->
      """SELECT event_id, user_id,
        |  quantile_cont(value, 0.5) OVER (
        |    PARTITION BY user_id ORDER BY epoch_us(ts), event_id
        |    ROWS BETWEEN 10 PRECEDING AND CURRENT ROW) AS med_trailing
        |FROM events ORDER BY event_id""".stripMargin,
    "q_gap_detect" ->
      """WITH b AS (
        |  SELECT date_trunc('hour', min(ts)) AS h0,
        |         date_trunc('hour', max(ts)) AS h1 FROM events),
        |hours AS (
        |  SELECT unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS hour_ts
        |  FROM b),
        |t AS (SELECT DISTINCT event_type FROM events),
        |obs AS (
        |  SELECT DISTINCT event_type, date_trunc('hour', ts) AS hour_ts
        |  FROM events)
        |SELECT t.event_type, h.hour_ts
        |FROM t CROSS JOIN hours h
        |LEFT JOIN obs o ON o.event_type = t.event_type AND o.hour_ts = h.hour_ts
        |WHERE o.event_type IS NULL
        |ORDER BY t.event_type, h.hour_ts""".stripMargin,
    "q_sessionize" ->
      """WITH o AS (
        |  SELECT user_id, event_id, epoch_us(ts) AS ts_us, value,
        |    lag(epoch_us(ts)) OVER (
        |      PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS prev_us
        |  FROM events),
        |f AS (
        |  SELECT *, CASE WHEN prev_us IS NULL OR ts_us - prev_us > 1800000000
        |                 THEN 1 ELSE 0 END AS new_s
        |  FROM o),
        |s AS (
        |  SELECT *, CAST(SUM(new_s) OVER (
        |    PARTITION BY user_id ORDER BY ts_us, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS INTEGER) AS session_id
        |  FROM f)
        |SELECT user_id, session_id, COUNT(*) AS n_events,
        |  min(ts_us) AS start_us, max(ts_us) AS end_us,
        |  CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value,
        |  max(ts_us) - min(ts_us) AS dur_us
        |FROM s GROUP BY user_id, session_id
        |ORDER BY user_id, session_id""".stripMargin,
    "q_window_range_frame" ->
      """SELECT event_id, user_id,
        |  COUNT(*) OVER w AS n_1h,
        |  CAST(SUM(CAST(value AS DECIMAL(18,4))) OVER w AS DOUBLE) AS sum_1h
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
        |             RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
        |ORDER BY event_id""".stripMargin,
    "q_resample_ffill" ->
      s"""WITH hours AS (
         |  SELECT unnest(generate_series(TIMESTAMP '$Day 00:00:00',
         |                                TIMESTAMP '$Day 23:00:00',
         |                                INTERVAL 1 HOUR)) AS hour_ts),
         |users AS (SELECT DISTINCT user_id FROM events),
         |obs AS (
         |  SELECT user_id, hour_ts, value FROM (
         |    SELECT user_id, date_trunc('hour', ts) AS hour_ts, value,
         |           row_number() OVER (PARTITION BY user_id, date_trunc('hour', ts)
         |                              ORDER BY event_id DESC) AS rn
         |    FROM events
         |    WHERE ts >= TIMESTAMP '$Day 00:00:00'
         |      AND ts <= TIMESTAMP '$Day 23:59:59.999999') x
         |  WHERE rn = 1)
         |SELECT g.user_id, g.hour_ts,
         |  last_value(o.value IGNORE NULLS) OVER (
         |    PARTITION BY g.user_id ORDER BY g.hour_ts
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS v_ffill
         |FROM (SELECT u.user_id, h.hour_ts FROM users u CROSS JOIN hours h) g
         |LEFT JOIN obs o ON g.user_id = o.user_id AND g.hour_ts = o.hour_ts
         |ORDER BY g.user_id, g.hour_ts""".stripMargin
  )
}
