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
}
