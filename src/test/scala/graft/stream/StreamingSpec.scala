package graft.stream

import org.apache.spark.sql.DataFrame

import graft.{SparkSuite, Tables}

/** The streaming twins must agree with the oracle-checked batch forms: same
  * transform, streaming source + watermark + AvailableNow, memory sink.
  * (Correctness of the transforms themselves is the driver's DuckDB gate;
  * these tests pin the batch↔streaming equivalence.) */
class StreamingSpec extends SparkSuite {

  /** FileStreamSource needs a directory to monitor; testdata ships a single
    * file, so stage it into a landing dir like a real ingest prefix. */
  private lazy val eventsDir: String = {
    val dir = java.nio.file.Files.createTempDirectory("stream_spec_").toString
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sfDir/events.parquet"),
      java.nio.file.Paths.get(s"$dir/events.parquet"))
    dir
  }

  private def assertSameResult(batch: DataFrame, streamed: DataFrame, keys: Seq[String]): Unit = {
    val b = batch.orderBy(keys.map(org.apache.spark.sql.functions.col): _*).collect()
    val s = streamed.orderBy(keys.map(org.apache.spark.sql.functions.col): _*).collect()
    assert(b.length === s.length, s"row count: batch ${b.length} vs stream ${s.length}")
    b.zip(s).foreach { case (br, sr) => assert(br === sr) }
  }

  test("foreachBatch exactly-once sink: no dupes, no loss, batch replay is idempotent") {
    import org.apache.spark.sql.functions._
    val base = java.nio.file.Files.createTempDirectory("stream_eo_").toString
    val landing = s"$base/landing"; val out = s"$base/out"; val ckpt = s"$base/ckpt"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(landing))
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sfDir/events.parquet"),
      java.nio.file.Paths.get(s"$landing/events_1.parquet"))

    def run(): Unit = Streaming.runForeachBatchExactlyOnce(spark,
      Streaming.readEvents(spark, landing).select("event_id", "user_id", "value"),
      out, ckpt)

    run()
    val expected = Tables(spark, sfDir, "events").count()
    assert(spark.read.parquet(out).count() === expected)

    // redelivery of an already-written epoch (crash between write and
    // checkpoint commit): the engine re-sends batch 0's SOURCE rows under
    // the same batchId -> output unchanged
    val redelivered = Tables(spark, sfDir, "events").select("event_id", "user_id", "value")
    Streaming.writeEpoch(redelivered, out, 0)
    assert(spark.read.parquet(out).count() === expected, "epoch replay must be idempotent")

    // a second increment (new file lands, same checkpoint) appends its rows
    // exactly once and leaves batch 0 untouched
    // raw read (ts arrives as micros TimestampType) so the staged file
    // matches the stream source schema
    val more = spark.read.parquet(s"$sfDir/events.parquet")
      .withColumn("event_id", col("event_id") + 1000000L)
    more.coalesce(1).write.parquet(s"$base/staging")
    val staged = java.nio.file.Files.list(java.nio.file.Paths.get(s"$base/staging"))
      .filter(_.toString.endsWith(".parquet")).findFirst().get()
    java.nio.file.Files.copy(staged, java.nio.file.Paths.get(s"$landing/events_2.parquet"))
    run()
    val all = spark.read.parquet(out)
    assert(all.count() === expected * 2, "second increment must append exactly once")
    assert(all.select("event_id").distinct().count() === expected * 2, "no duplicate event ids")
  }

  test("streaming upsert: micro-batches MERGE into a catalog table, newest version wins") {
    import org.apache.spark.sql.functions._
    val root = java.nio.file.Files.createTempDirectory("graft_upsstream_").toString
    spark.conf.set("spark.sql.catalog.graftups",
      classOf[graft.sources.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.graftups.root", root)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graftups.s")
    spark.sql("DROP TABLE IF EXISTS graftups.s.state")
    spark.sql(
      "CREATE TABLE graftups.s.state (user_id BIGINT, event_type STRING, ts TIMESTAMP, value DOUBLE)")
    val landing = java.nio.file.Files.createTempDirectory("ups_landing_").toString
    val ckpt = java.nio.file.Files.createTempDirectory("ups_ckpt_").toString
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sfDir/events.parquet"),
      java.nio.file.Paths.get(s"$landing/events_1.parquet"))
    def run(): Unit = Streaming.runUpsertStream(spark,
      Streaming.readEvents(spark, landing)
        .select("user_id", "event_type", "ts", "value"),
      "graftups.s.state", Seq("user_id", "event_type"), "ts", ckpt)

    run()
    val events = Tables(spark, sfDir, "events")
    val keyed = spark.table("graftups.s.state")
    // one row per key, carrying the key's NEWEST event time
    assert(keyed.groupBy("user_id", "event_type").count()
      .filter(col("count") > 1).count() === 0)
    val expectedTs = events.groupBy("user_id", "event_type")
      .agg(max("ts").as("ts"))
    assert(keyed.select("user_id", "event_type", "ts")
      .exceptAll(expectedTs.select("user_id", "event_type", "ts")).count() === 0)
    val nKeys = expectedTs.count()
    assert(keyed.count() === nKeys)

    // a second increment updates ONLY the keys it carries (newer ts wins)
    val bump = events.filter(col("user_id") === 1L)
      .groupBy("user_id", "event_type")
      .agg((max("ts") + expr("INTERVAL 365 DAYS")).as("ts"))
      .withColumn("value", lit(-1.0))
      .select("user_id", "event_type", "ts", "value")
    val stage = java.nio.file.Files.createTempDirectory("ups_stage_").toString
    bump.coalesce(1).write.mode("overwrite").parquet(stage)
    val staged = java.nio.file.Files.list(java.nio.file.Paths.get(stage))
      .filter(_.toString.endsWith(".parquet")).findFirst().get()
    java.nio.file.Files.copy(staged,
      java.nio.file.Paths.get(s"$landing/events_2.parquet"))
    run()
    val after = spark.table("graftups.s.state")
    assert(after.count() === nKeys, "upsert must not grow the key set")
    assert(after.filter(col("user_id") === 1L && col("value") =!= -1.0).count() === 0,
      "user 1 keys must carry the second increment's values")
    // untouched keys keep their first-increment state
    assert(after.filter(col("user_id") =!= 1L)
      .select("user_id", "event_type", "ts")
      .exceptAll(expectedTs.filter(col("user_id") =!= 1L)
        .select("user_id", "event_type", "ts")).count() === 0)
  }

  test("manifest-sink epoch writes: atomic, idempotent on replay, snapshot-versioned") {
    import org.apache.spark.sql.functions._
    val base = java.nio.file.Files.createTempDirectory("stream_mf_").toString
    val landing = s"$base/landing"; val out = s"$base/table"; val ckpt = s"$base/ckpt"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(landing))
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sfDir/events.parquet"),
      java.nio.file.Paths.get(s"$landing/events_1.parquet"))
    Streaming.runForeachBatchManifest(spark,
      Streaming.readEvents(spark, landing)
        .select(col("event_id"), col("user_id"), col("value")),
      out, ckpt)
    val expected = Tables(spark, sfDir, "events").count()
    def epoch0 = spark.read.format("graft.sources.GraftManifestSink")
      .option("path", s"$out/epoch=0").load()
    assert(epoch0.count() === expected)

    // redelivery of epoch 0 (crash between write and checkpoint commit):
    // the truncate-overwrite replaces the epoch atomically — same rows,
    // and the superseded attempt stays readable as snapshot v1
    val redelivered = Tables(spark, sfDir, "events")
      .select("event_id", "user_id", "value")
    Streaming.writeEpochManifest(redelivered, out, 0)
    assert(epoch0.count() === expected, "epoch replay must be idempotent")
    assert(epoch0.select("event_id").distinct().count() === expected)
    val v1 = spark.read.format("graft.sources.GraftManifestSink")
      .option("path", s"$out/epoch=0").option("snapshot", "1").load()
    assert(v1.count() === expected, "pre-replay snapshot must stay readable")
  }

  test("native DSv2 streaming write: epochs commit atomically, restart replay is exactly-once") {
    import java.nio.file.{Files, Paths}
    import org.apache.spark.sql.functions._
    val Fmt = "graft.sources.GraftManifestSink"
    val base = Files.createTempDirectory("stream_native_").toString
    val landing = s"$base/landing"; val table = s"$base/table"; val ckpt = s"$base/ckpt"
    Files.createDirectories(Paths.get(landing))
    Files.copy(Paths.get(s"$sfDir/events.parquet"), Paths.get(s"$landing/events_1.parquet"))

    // writeStream straight into the manifest sink — no foreachBatch glue
    def run(): Unit = {
      val q = Streaming.readEvents(spark, landing)
        .select("event_id", "user_id", "value")
        .writeStream.format(Fmt)
        .option("path", table).option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    run()
    val expected = Tables(spark, sfDir, "events").count()
    def current = spark.read.format(Fmt).option("path", table).load()
    assert(current.count() === expected)
    // the epoch watermark rides the manifest itself (same atomic swap),
    // keyed by the checkpoint-stable streaming query id
    val m0 = graft.sources.Manifest.read(Paths.get(table)).get
    assert(m0.props.exists { case (k, v) => k.startsWith("lastEpoch.") && v == "0" },
      m0.props.toString)

    // kill-and-resume replay: the engine wrote its offset WAL but "crashed"
    // before recording batch 0 in the commit log — on restart it re-delivers
    // the SAME batch under the same epoch id; the sink must publish nothing
    Files.delete(Paths.get(ckpt, "commits", "0"))
    Files.deleteIfExists(Paths.get(ckpt, "commits", ".0.crc")) // hadoop checksum shadow
    run()
    assert(current.count() === expected, "replayed epoch must be dropped")
    assert(current.select("event_id").distinct().count() === expected,
      "no duplicate event ids after replay")

    // a new file lands → a new epoch appends exactly once
    val more = spark.read.parquet(s"$sfDir/events.parquet")
      .withColumn("event_id", col("event_id") + 1000000L)
    more.coalesce(1).write.parquet(s"$base/staging")
    val staged = Files.list(Paths.get(s"$base/staging"))
      .filter(_.toString.endsWith(".parquet")).findFirst().get()
    Files.copy(staged, Paths.get(s"$landing/events_2.parquet"))
    run()
    assert(current.count() === expected * 2, "new epoch must append exactly once")
    assert(current.select("event_id").distinct().count() === expected * 2)

    // every epoch is an archived snapshot — time travel across stream progress
    val versions = graft.sources.Manifest.snapshotVersions(Paths.get(table))
    val counts = versions.map(v => spark.read.format(Fmt)
      .option("path", table).option("snapshot", v.toString).load().count())
    assert(counts.contains(expected) && counts.contains(expected * 2), counts.toString)

    // a DIFFERENT query (fresh checkpoint) into the same table starts at its
    // OWN epoch watermark: its epoch 0 must commit, not be mistaken for a
    // replay of the first query's epoch 0
    val q2 = Streaming.readEvents(spark, landing)
      .select((col("event_id") + 2000000L).as("event_id"), col("user_id"), col("value"))
      .writeStream.format(Fmt)
      .option("path", table).option("checkpointLocation", s"$base/ckpt2")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q2.awaitTermination()
    assert(current.count() === expected * 4,
      "a fresh query's first epochs must not be dropped as replays")
    assert(current.select("event_id").distinct().count() === expected * 4)
  }

  test("complete-mode streaming into the manifest sink replaces per epoch, never stacks") {
    import java.nio.file.{Files, Paths}
    import org.apache.spark.sql.functions._
    val Fmt = "graft.sources.GraftManifestSink"
    val base = Files.createTempDirectory("stream_complete_").toString
    val landing = s"$base/landing"; val table = s"$base/table"; val ckpt = s"$base/ckpt"
    Files.createDirectories(Paths.get(landing))
    Files.copy(Paths.get(s"$sfDir/events.parquet"), Paths.get(s"$landing/events_1.parquet"))
    def run(): Unit = {
      val q = Streaming.readEvents(spark, landing)
        .groupBy("event_type").agg(count(lit(1)).as("n"))
        .writeStream.outputMode("complete").format(Fmt)
        .option("path", table).option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    run()
    val types = Tables(spark, sfDir, "events").select("event_type").distinct().count()
    def current = spark.read.format(Fmt).option("path", table).load()
    assert(current.count() === types)

    // second increment: the refreshed FULL aggregate must REPLACE the table
    // (an appending sink would return each group twice with mixed counts)
    Files.copy(Paths.get(s"$sfDir/events.parquet"), Paths.get(s"$landing/events_2.parquet"))
    run()
    assert(current.count() === types, "complete mode must replace, not stack epochs")
    val total = current.agg(sum("n")).head().getLong(0)
    assert(total === Tables(spark, sfDir, "events").count() * 2,
      "the replacing aggregate must cover both increments")
  }

  test("stream-static enrichment join: streaming equals batch, append mode, no state") {
    val customers = Tables(spark, sfDir, "customer")
    val batch = Windows.enrich(Tables(spark, sfDir, "events"), customers)
    val streamed = Streaming.runToMemory(spark,
      Streaming.enrichStream(Streaming.readEvents(spark, eventsDir), customers),
      "t_enrich", outputMode = "append")
    assertSameResult(batch, streamed, Seq("event_id"))
  }

  test("tumbling windows: streaming (watermark + AvailableNow) equals batch") {
    val batch = Windows.tumbling(Tables(spark, sfDir, "events"))
    val streamed = Streaming.runToMemory(spark,
      Streaming.tumblingStream(Streaming.readEvents(spark, eventsDir)), "t_tumbling")
    assertSameResult(batch, streamed, Seq("w_start", "event_type"))
  }

  test("sliding windows: streaming equals batch") {
    val batch = Windows.sliding(Tables(spark, sfDir, "events"))
    val streamed = Streaming.runToMemory(spark,
      Streaming.slidingStream(Streaming.readEvents(spark, eventsDir)), "t_sliding")
    assertSameResult(batch, streamed, Seq("w_start", "event_type"))
  }

  test("session windows: streaming equals batch") {
    val batch = Windows.session(Tables(spark, sfDir, "events"))
    val streamed = Streaming.runToMemory(spark,
      Streaming.sessionStream(Streaming.readEvents(spark, eventsDir)), "t_session")
    assertSameResult(batch, streamed, Seq("user_id", "s_start"))
  }

  test("stream-stream interval join: streaming (two watermarked sides) equals batch") {
    val e = Tables(spark, sfDir, "events")
    val batch = Windows.intervalJoin(
      e.filter(org.apache.spark.sql.functions.col("event_type") === "view"),
      e.filter(org.apache.spark.sql.functions.col("event_type") === "purchase"))
    val streamed = Streaming.runToMemory(spark,
      Streaming.intervalJoinStream(Streaming.readEvents(spark, eventsDir)),
      "t_ssjoin", outputMode = "append")
    assertSameResult(batch, streamed, Seq("p_event_id", "v_event_id"))
  }

  test("dropDuplicatesWithinWatermark: streaming dedup keys equal batch distinct keys") {
    import spark.implicits._
    // event_id is unique in the testdata, so duplicate it: stage the same
    // file twice into the landing dir — every key arrives exactly twice.
    val dir = java.nio.file.Files.createTempDirectory("dedup_stream_").toString
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sfDir/events.parquet"),
      java.nio.file.Paths.get(s"$dir/a.parquet"))
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sfDir/events.parquet"),
      java.nio.file.Paths.get(s"$dir/b.parquet"))
    val streamed = Streaming.runToMemory(spark,
      Streaming.dedupStream(Streaming.readEvents(spark, dir)),
      "t_dedup_wm", outputMode = "append")
    val batchKeys = Tables(spark, sfDir, "events")
      .select("event_id").as[Long].collect().sorted
    val streamKeys = streamed.select("event_id").as[Long].collect().sorted
    assert(streamKeys.toSeq === batchKeys.toSeq,
      s"expected each duplicated key once: ${streamKeys.length} vs ${batchKeys.length}")
  }

  test("watermark late-data policy: an out-of-watermark row is dropped, windows finalize") {
    import spark.implicits._
    // Two RESUMED runs over one checkpoint (offsets + watermark persist):
    //  run 1: 10:05 + 10:20 (window [10:00,11:00)) and 12:00 — the
    //         watermark advances to 12:00 − 10 min = 11:50;
    //  run 2: a LATE 10:30 arrival (< watermark) — must be DROPPED.
    // Batch semantics would count 3 events in the [10:00,11:00) window; the
    // watermark policy says 2. The 12:00 window never finalizes (watermark
    // never passes 13:00) so it must be absent from append output.
    def tstamp(h: Int, m: Int): java.sql.Timestamp =
      java.sql.Timestamp.from(java.time.LocalDateTime.of(2000, 3, 1, h, m)
        .toInstant(java.time.ZoneOffset.UTC))
    def writeFile(dir: String, name: String,
        rows: Seq[(Long, java.sql.Timestamp)]): Unit = {
      val stage = java.nio.file.Files.createTempDirectory("late_stage_").toString
      rows.map { case (id, ts) => (id, ts, 1L, "view", 1.0, "{}") }
        .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
        .coalesce(1).write.mode("overwrite").parquet(stage)
      val src = java.nio.file.Files.list(java.nio.file.Paths.get(stage))
        .filter(_.getFileName.toString.endsWith(".parquet")).findFirst().get()
      java.nio.file.Files.copy(src, java.nio.file.Paths.get(s"$dir/$name"))
    }
    val dir = java.nio.file.Files.createTempDirectory("late_data_").toString
    val ckpt = java.nio.file.Files.createTempDirectory("late_ckpt_").toString
    val sink = java.nio.file.Files.createTempDirectory("late_sink_").toString
    def runIncrement(): Unit =
      Streaming.runIncrement(spark,
        Streaming.tumblingStream(Streaming.readEvents(spark, dir)), sink, ckpt)

    writeFile(dir, "a.parquet",
      Seq((1L, tstamp(10, 5)), (2L, tstamp(10, 20)), (3L, tstamp(12, 0))))
    runIncrement()
    writeFile(dir, "b.parquet", Seq((4L, tstamp(10, 30)))) // late vs wm 11:50
    runIncrement()

    val emitted = spark.read.parquet(sink)
      .select("w_start", "n_events").collect()
      .map(r => (r.getTimestamp(0).toInstant, r.getLong(1))).toSeq
    val w10 = java.time.Instant.parse("2000-03-01T10:00:00Z")
    assert(emitted === Seq((w10, 2L)),
      s"expected only [10:00,11:00)×2 (late row dropped, 12:00 window unfinalized), got $emitted")
  }

  test("transformWithState running counter matches batch per-user counts") {
    // transformWithState requires the RocksDB state store provider
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val out = Streaming.runToMemory(spark,
        StatefulCounter.runningCounts(StatefulDedup.typedEvents(spark, eventsDir)).toDF(),
        "t_tws_counts", outputMode = "update")
      // single AvailableNow batch -> final state = total count per user
      val streamCounts = out.groupBy("user_id")
        .agg(org.apache.spark.sql.functions.max("n_events").as("n"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val batchCounts = Tables(spark, sfDir, "events")
        .groupBy("user_id").count()
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(streamCounts === batchCounts)
    } finally {
      prev match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }
  }

  test("stateful dedup: one first-seen row per key, keys match batch distinct") {
    val out = Streaming.runToMemory(spark,
      StatefulDedup.firstSeen(StatefulDedup.typedEvents(spark, eventsDir)).toDF(),
      "t_stateful_dedup", outputMode = "append")
    // exactly one row per (user_id, event_type)
    assert(out.groupBy("user_id", "event_type").count()
      .filter(org.apache.spark.sql.functions.col("count") > 1).count() === 0)
    // key set identical to the batch distinct key set
    val streamKeys = out.select("user_id", "event_type").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    val batchKeys = Tables(spark, sfDir, "events")
      .select("user_id", "event_type").distinct().collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(streamKeys === batchKeys)
  }

  test("transformWithState event-time timers close gap sessions and clear state") {
    import spark.implicits._
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      def tstamp(h: Int, m: Int): java.sql.Timestamp =
        java.sql.Timestamp.from(java.time.LocalDateTime.of(2000, 3, 1, h, m)
          .toInstant(java.time.ZoneOffset.UTC))
      def writeFile(dir: String, name: String,
          rows: Seq[(Long, Long, java.sql.Timestamp)]): Unit = {
        val stage = java.nio.file.Files.createTempDirectory("tws_stage_").toString
        rows.map { case (id, u, ts) => (id, ts, u, "view", 1.0, "{}") }
          .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
          .coalesce(1).write.mode("overwrite").parquet(stage)
        val src = java.nio.file.Files.list(java.nio.file.Paths.get(stage))
          .filter(_.getFileName.toString.endsWith(".parquet")).findFirst().get()
        java.nio.file.Files.copy(src, java.nio.file.Paths.get(s"$dir/$name"))
      }
      val dir = java.nio.file.Files.createTempDirectory("tws_data_").toString
      val ckpt = java.nio.file.Files.createTempDirectory("tws_ckpt_").toString
      val sink = java.nio.file.Files.createTempDirectory("tws_sink_").toString
      def run(): Unit = Streaming.runIncrement(spark,
        StatefulSessions.sessions(
          Streaming.readEvents(spark, dir)
            .select("event_id", "ts", "user_id", "event_type", "value")
            .as[StatefulDedup.EventRow],
          gapMs = 30 * 60 * 1000L, watermarkDelay = "0 seconds").toDF(),
        sink, ckpt)

      // batch 1: u1 opens a session (2 events), u2 opens one (1 event)
      writeFile(dir, "a.parquet",
        Seq((1L, 1L, tstamp(10, 0)), (2L, 1L, tstamp(10, 10)),
          (3L, 2L, tstamp(10, 5))))
      run()
      // batch 2: u1 EXTENDS its session (10:25 < 10:10 + 30 min — the timer
      // re-arms to 10:55); the sentinel pushes the watermark to 13:00
      writeFile(dir, "b.parquet",
        Seq((4L, 1L, tstamp(10, 25)), (5L, 99L, tstamp(13, 0))))
      run()
      // batch 3 evaluates timers against watermark 13:00: u1 (10:55) and
      // u2 (10:35) fire and emit their CLOSED sessions; the sentinel's own
      // timer (13:30) stays armed — its session is still open
      writeFile(dir, "c.parquet", Seq((6L, 98L, tstamp(13, 5))))
      run()

      val out = spark.read.parquet(sink)
        .select("user_id", "n_events", "start_ms", "end_ms").collect()
        .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
        .toMap
      assert(out.keySet == Set(1L, 2L),
        s"exactly the closed sessions must emit, got $out")
      assert(out(1L) == ((3L, tstamp(10, 0).getTime, tstamp(10, 25).getTime)),
        s"u1's cross-batch session must merge: ${out(1L)}")
      assert(out(2L) == ((1L, tstamp(10, 5).getTime, tstamp(10, 5).getTime)))
    } finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }
}
