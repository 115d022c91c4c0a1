package graft.stream

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Tables
import graft.queries.{Det, QueryModule}

/** Time-window aggregation surface over `events` (SURVEY.md §2 B17-B19):
  * tumbling, sliding and session windows.
  *
  * Each window shape is implemented once as a DataFrame→DataFrame transform
  * and declared twice:
  *  - batch form (below) — oracle-checked against DuckDB;
  *  - streaming twin ([[Streaming]]) — the same transform applied to a
  *    `readStream` source with a watermark, exercised by ScalaTest with the
  *    AvailableNow trigger. Spark's unified Dataset API makes the transform
  *    literally shared code, which is the point: correctness is proven on
  *    the batch side, the streaming side adds only source/sink/watermark.
  *
  * Scale: windowed groupBys are partial+final hash aggregates keyed by
  * (window, key) — sliding windows fan each row out `window/slide`-fold
  * before the partial agg (4× here), which is the standard cost model;
  * session windows shuffle by user key and merge per-key intervals.
  */
object Windows extends QueryModule {

  /** B17 — tumbling 1-hour windows per event_type. */
  def tumbling(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), Det.dsum(col("value")).as("sum_value"))
      .select(col("w.start").as("w_start"), col("w.end").as("w_end"),
        col("event_type"), col("n_events"), col("sum_value"))

  /** B18 — sliding 1-hour windows every 15 minutes per event_type. */
  def sliding(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "1 hour", "15 minutes").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), Det.dsum(col("value")).as("sum_value"))
      .select(col("w.start").as("w_start"), col("w.end").as("w_end"),
        col("event_type"), col("n_events"), col("sum_value"))

  /** B19 — session windows per user with a 30-minute inactivity gap.
    * Session end = last event + gap (Spark semantics; mirrored in the
    * oracle's lag-based sessionization). */
  def session(events: DataFrame): DataFrame =
    events
      .groupBy(session_window(col("ts"), "30 minutes").as("w"), col("user_id"))
      .agg(count(lit(1)).as("n_events"), Det.dsum(col("value")).as("sum_value"))
      .select(col("user_id"), col("w.start").as("s_start"), col("w.end").as("s_end"),
        col("n_events"), col("sum_value"))

  /** Event-time interval join: each purchase matched to the same user's
    * views in the 30 minutes leading up to it. An equi-join on the user key
    * with the time bounds as residual predicates — one shuffle per side,
    * never a time-range nested loop. This is THE stream-stream join shape:
    * the identical transform runs under Structured Streaming with
    * watermarks on both sides ([[Streaming.intervalJoinStream]]), where the
    * time bounds are what let Spark evict join state. */
  def intervalJoin(views: DataFrame, purchases: DataFrame): DataFrame = {
    val v = views.select(col("event_id").as("v_event_id"),
      col("user_id").as("v_user_id"), col("ts").as("v_ts"))
    val p = purchases.select(col("event_id").as("p_event_id"),
      col("user_id").as("user_id"), col("ts").as("p_ts"))
    p.join(v,
        col("user_id") === col("v_user_id") &&
          col("v_ts") >= col("p_ts") - expr("INTERVAL 30 MINUTES") &&
          col("v_ts") <= col("p_ts"))
      .select(col("p_event_id"), col("user_id"), col("p_ts"),
        col("v_event_id"), col("v_ts"))
  }

  /** Stream-static enrichment join: every event picks up its user's
    * market segment from the (static) customer dimension. THE most common
    * streaming pattern in production — the dim is broadcast, so each
    * micro-batch enriches with zero shuffle and no streaming state at all
    * (unlike stream-stream joins there is nothing to watermark: the static
    * side is complete by definition). Left join: events without a dim row
    * survive with a NULL segment. */
  def enrich(events: DataFrame, customers: DataFrame): DataFrame =
    events.join(
        broadcast(customers.select(col("c_custkey").as("user_id"),
          col("c_mktsegment"))),
        Seq("user_id"), "left")
      .select(col("event_id"), col("user_id"), col("event_type"),
        col("c_mktsegment"), col("value"))

  def queries: Map[String, Q] = Map(
    "q_stream_enrich" -> ((s, d) =>
      enrich(Tables(s, d, "events"), Tables(s, d, "customer"))
        .orderBy("event_id")),
    "q_stream_tumbling" -> ((s, d) =>
      tumbling(Tables(s, d, "events")).orderBy("w_start", "event_type")),
    "q_stream_sliding" -> ((s, d) =>
      sliding(Tables(s, d, "events")).orderBy("w_start", "event_type")),
    "q_stream_session" -> ((s, d) =>
      session(Tables(s, d, "events")).orderBy("user_id", "s_start")),
    "q_stream_join" -> ((s, d) => {
      val e = Tables(s, d, "events")
      intervalJoin(e.filter(col("event_type") === "view"),
          e.filter(col("event_type") === "purchase"))
        .orderBy("p_event_id", "v_event_id")
    })
  )

  def oracles: Map[String, String] = Map(
    "q_stream_enrich" ->
      """SELECT e.event_id, e.user_id, e.event_type, c.c_mktsegment, e.value
        |FROM events e LEFT JOIN customer c ON e.user_id = c.c_custkey
        |ORDER BY e.event_id""".stripMargin,
    "q_stream_tumbling" ->
      s"""SELECT time_bucket(INTERVAL '1 hour', ts) AS w_start,
         |  time_bucket(INTERVAL '1 hour', ts) + INTERVAL '1 hour' AS w_end,
         |  event_type, COUNT(*) AS n_events, ${Det.sqlSum("value")} AS sum_value
         |FROM events GROUP BY 1, 2, 3 ORDER BY w_start, event_type""".stripMargin,
    "q_stream_sliding" ->
      s"""WITH bounds AS (
         |  SELECT time_bucket(INTERVAL '15 minutes', min(ts)) - INTERVAL '45 minutes' AS lo,
         |         max(ts) AS hi
         |  FROM events),
         |starts AS (SELECT unnest(generate_series(lo, hi, INTERVAL '15 minutes')) AS ws FROM bounds)
         |SELECT s.ws AS w_start, s.ws + INTERVAL '1 hour' AS w_end, e.event_type,
         |  COUNT(*) AS n_events, ${Det.sqlSum("e.value")} AS sum_value
         |FROM events e JOIN starts s
         |  ON e.ts >= s.ws AND e.ts < s.ws + INTERVAL '1 hour'
         |GROUP BY 1, 2, 3 ORDER BY w_start, event_type""".stripMargin,
    "q_stream_session" ->
      s"""WITH o AS (
         |  SELECT user_id, ts, value,
         |    CASE WHEN lag(ts) OVER w IS NULL
         |           OR ts - lag(ts) OVER w >= INTERVAL '30 minutes' THEN 1 ELSE 0 END AS new_s
         |  FROM events
         |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
         |s AS (
         |  SELECT user_id, ts, value,
         |    SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts
         |                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
         |  FROM o)
         |SELECT user_id, min(ts) AS s_start, max(ts) + INTERVAL '30 minutes' AS s_end,
         |  COUNT(*) AS n_events, ${Det.sqlSum("value")} AS sum_value
         |FROM s GROUP BY user_id, sid ORDER BY user_id, s_start""".stripMargin,
    "q_stream_join" ->
      """SELECT p.event_id AS p_event_id, p.user_id, p.ts AS p_ts,
        |  v.event_id AS v_event_id, v.ts AS v_ts
        |FROM (SELECT * FROM events WHERE event_type = 'purchase') p
        |JOIN (SELECT * FROM events WHERE event_type = 'view') v
        |  ON p.user_id = v.user_id
        |  AND v.ts >= p.ts - INTERVAL 30 MINUTE AND v.ts <= p.ts
        |ORDER BY p_event_id, v_event_id""".stripMargin
  )
}

/** Structured Streaming twins of the batch window queries: same transforms
  * over `readStream` with event-time watermarks. Used by ScalaTest (memory
  * sink + AvailableNow) — the driver's oracle gate covers the batch forms.
  *
  * The parquet streaming source needs an explicit schema; `events.ts` is
  * micros TIMESTAMP (no zone flag), which the explicit TimestampType schema
  * reads under the session's UTC zone exactly like the batch loader —
  * batch ≡ stream holds by construction.
  */
object Streaming {
  private val eventsRawSchema = StructType(Seq(
    StructField("event_id", LongType), StructField("ts", TimestampType),
    StructField("user_id", LongType), StructField("event_type", StringType),
    StructField("value", DoubleType), StructField("props", StringType)))

  /** Streaming events source: `dir` must be a DIRECTORY of events parquet
    * files (Spark's FileStreamSource monitors directories — it rejects a
    * bare file path; in production this is the landing prefix new files
    * arrive into). */
  def readEvents(spark: SparkSession, dir: String,
      maxFilesPerTrigger: Option[Int] = None): DataFrame = {
    val r = spark.readStream.schema(eventsRawSchema)
    maxFilesPerTrigger.foreach(n => r.option("maxFilesPerTrigger", n))
    r.parquet(dir)
  }

  /** Tumbling-window streaming aggregation with a 10-minute watermark: the
    * watermark bounds state (windows older than max-event-time − 10 min are
    * finalized and evicted) — the knob that makes this run forever at scale. */
  def tumblingStream(events: DataFrame): DataFrame =
    Windows.tumbling(events.withWatermark("ts", "10 minutes"))

  def slidingStream(events: DataFrame): DataFrame =
    Windows.sliding(events.withWatermark("ts", "10 minutes"))

  def sessionStream(events: DataFrame): DataFrame =
    Windows.session(events.withWatermark("ts", "10 minutes"))

  /** Stream-stream self-join twin of [[Windows.intervalJoin]]: watermarks
    * on BOTH sides plus the event-time bounds in the join condition are
    * what let Spark bound the join state — a view older than
    * (purchase watermark − 30 min) can never match again and is evicted.
    * Without them a stream-stream join buffers forever. */
  def intervalJoinStream(events: DataFrame): DataFrame = {
    val withWm = events.withWatermark("ts", "10 minutes")
    Windows.intervalJoin(
      withWm.filter(col("event_type") === "view"),
      withWm.filter(col("event_type") === "purchase"))
  }

  /** Stream-static twin of [[Windows.enrich]]: the static dim DataFrame is
    * re-resolved against each micro-batch (Spark's stream-static join
    * contract), broadcast per batch — no state, no watermark needed. */
  def enrichStream(events: DataFrame, customers: DataFrame): DataFrame =
    Windows.enrich(events, customers)

  /** Streaming exact dedup by key within the watermark horizon:
    * `dropDuplicatesWithinWatermark` keeps state only for keys younger than
    * the watermark (bounded memory forever), unlike plain `dropDuplicates`
    * on a stream which accumulates every key ever seen. */
  def dedupStream(events: DataFrame): DataFrame =
    events.withWatermark("ts", "10 minutes")
      .dropDuplicatesWithinWatermark("event_id")

  /** Run a streaming query to completion over the (bounded) file source and
    * return the collected result from the memory sink. `complete` fits the
    * windowed aggregations; stateful Append operators pass "append". */
  def runToMemory(spark: SparkSession, streamed: DataFrame, name: String,
      outputMode: String = "complete"): DataFrame = {
    val q = streamed.writeStream
      .format("memory")
      .queryName(name)
      .outputMode(outputMode)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.table(name)
  }

  /** Exactly-once parquet output via `foreachBatch` + idempotent epoch
    * writes: each micro-batch lands in its own `batch_id=N` directory with
    * overwrite mode. The streaming engine gives at-least-once delivery of
    * each batch (a crash between the write and the checkpoint commit
    * replays the SAME batchId); the overwrite makes the replay rewrite the
    * same directory instead of appending a duplicate — at-least-once
    * delivery × idempotent write = exactly-once output, with no
    * transactional sink required. Read the result back with a plain
    * `spark.read.parquet(outPath)` (the epoch dir is partition-discovered
    * as a `batch_id` column). */
  def runForeachBatchExactlyOnce(spark: SparkSession, streamed: DataFrame,
      outPath: String, checkpoint: String): Unit = {
    val q = streamed.writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        writeEpoch(batch.toDF(), outPath, batchId)
      }
      .option("checkpointLocation", checkpoint)
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }

  /** The idempotent epoch write `foreachBatch` delegates to — public so the
    * redelivery path is directly testable. */
  def writeEpoch(df: DataFrame, outPath: String, batchId: Long): Unit =
    df.write.mode("overwrite").parquet(s"$outPath/batch_id=$batchId")

  /** Epoch write through the manifest-committed DSv2 sink
    * ([[graft.sources.GraftManifestSink]]): each epoch is its own manifest
    * table, truncate-overwritten on (re)delivery — idempotent like
    * [[writeEpoch]], but ATOMIC: a crash mid-replay leaves the previous
    * epoch snapshot fully readable (the parquet overwrite can tear between
    * delete and write). At-least-once delivery × atomic idempotent epoch
    * commit = exactly-once output, with per-epoch snapshot history for
    * free. */
  def writeEpochManifest(df: DataFrame, tableDir: String, batchId: Long): Unit =
    df.write.format("graft.sources.GraftManifestSink")
      .option("path", s"$tableDir/epoch=$batchId").mode("overwrite").save()

  /** STREAMING UPSERT into a catalog-managed manifest table — the
    * canonical streaming-CDC-into-lakehouse loop: each micro-batch
    * compacts to one row per key (newest by `versionCol`, so
    * within-batch redeliveries and out-of-order rows never violate the
    * MERGE cardinality rule), then MERGEs by key through the
    * FILE-BOUNDED path (no NOT-MATCHED-BY-SOURCE clause — only files
    * holding matched keys rewrite; new keys append). At-least-once batch
    * delivery × an idempotent per-batch MERGE (same batch content →
    * same table state) = exactly-once table contents, the Delta
    * `foreachBatch` + MERGE pattern. At 100 TB each epoch's rewrite is
    * bounded by the files its keys touch, never the table.
    *
    * The matched clause carries `s.version >= t.version`, so a late
    * cross-batch arrival of an OLDER row never regresses the table —
    * monotone state, idempotent replay. Rows tying on `versionCol`
    * within one batch break arbitrarily; use a totally-ordered version
    * column where that matters. */
  def runUpsertStream(spark: SparkSession, streamed: DataFrame,
      table: String, keys: Seq[String], versionCol: String,
      checkpoint: String): Unit = {
    import org.apache.spark.sql.expressions.Window
    val q = streamed.writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        // foreachBatch hands the batch in a CLONED session — register the
        // view and run the MERGE there, not in the outer session
        val bs = batch.sparkSession
        val cols = bs.table(table).columns
        val w = Window.partitionBy(keys.map(col): _*)
          .orderBy(desc(versionCol))
        val compacted = batch.toDF()
          .withColumn("__rn", row_number().over(w))
          .filter(col("__rn") === 1).drop("__rn")
          .select(cols.map(col).toIndexedSeq: _*)
        val view = s"__graft_upsert_$batchId"
        compacted.createOrReplaceTempView(view)
        val on = keys.map(k => s"t.$k = s.$k").mkString(" AND ")
        val sets = cols.filterNot(c => keys.exists(_.equalsIgnoreCase(c)))
          .map(c => s"$c = s.$c").mkString(", ")
        val insCols = cols.mkString(", ")
        val insVals = cols.map(c => s"s.$c").mkString(", ")
        bs.sql(
          s"""MERGE INTO $table t USING $view s ON $on
             |WHEN MATCHED AND s.$versionCol >= t.$versionCol THEN UPDATE SET $sets
             |WHEN NOT MATCHED THEN INSERT ($insCols) VALUES ($insVals)""".stripMargin)
        bs.catalog.dropTempView(view)
        ()
      }
      .option("checkpointLocation", checkpoint)
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }

  /** [[runForeachBatchExactlyOnce]] with the manifest sink as the epoch
    * store. */
  def runForeachBatchManifest(spark: SparkSession, streamed: DataFrame,
      tableDir: String, checkpoint: String): Unit = {
    val q = streamed.writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        writeEpochManifest(batch.toDF(), tableDir, batchId)
      }
      .option("checkpointLocation", checkpoint)
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }

  /** Run one AvailableNow increment into a FAULT-TOLERANT parquet sink with
    * a checkpoint: offsets AND the event-time watermark persist, so calling
    * this again after new files land resumes the stream exactly where it
    * stopped — the shape of a production incremental job, and what lets the
    * late-data test replay an out-of-order arrival against a persisted
    * watermark (the memory sink cannot recover from a checkpoint). */
  def runIncrement(spark: SparkSession, streamed: DataFrame,
      outPath: String, checkpoint: String): Unit = {
    val q = streamed.writeStream
      .format("parquet")
      .option("path", outPath)
      .option("checkpointLocation", checkpoint)
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }
}
