package graft.sources

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** The DSv2 connector must generate deterministic rows, prune columns at
  * the reader, and narrow partition planning with pushed doc_id ranges. */
class SourcesV2Spec extends SparkSuite {
  import spark.implicits._

  private def docs(n: Long, parts: Int = 8) = spark.read
    .format("graft.sources.GraftDocsSource")
    .option("rows", n.toString).option("partitions", parts.toString)
    .load()

  test("generates exactly n deterministic rows across partitions") {
    val df = docs(1000)
    assert(df.count() === 1000L)
    assert(df.select("doc_id").as[Long].collect().sorted.toSeq === (0L until 1000L))
    // same id -> same content, independent of partitioning
    val a = docs(1000, 3).filter($"doc_id" === 123L).select("text").head().getString(0)
    val b = docs(1000, 11).filter($"doc_id" === 123L).select("text").head().getString(0)
    assert(a === b && a === GraftDocsSource.textOf(123L))
  }

  test("doc_id range filters push into partition planning") {
    val df = docs(100000).filter($"doc_id" >= 99990L && $"doc_id" < 99995L)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("range=[99990,99995)"), plan.take(1200))
    assert(df.count() === 5)
    // equality narrows to a single-row range
    val eq = docs(100000).filter($"doc_id" === 7L)
    assert(eq.queryExecution.executedPlan.toString.contains("range=[7,8)"))
    assert(eq.count() === 1)
  }

  test("column pruning reaches the reader: projection shows only requested cols") {
    val df = docs(1000).select("doc_id", "source")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("cols=doc_id,source"), plan.take(1200))
    assert(!plan.contains("cols=doc_id,source,text"))
    assert(df.groupBy("source").count().count() === 20)
  }

  test("connector statistics reach the optimizer and shrink with pruning") {
    // full row: optimizer sees row count and byte size from the connector
    val full = docs(10000)
    val fullStats = full.queryExecution.optimizedPlan.stats
    assert(fullStats.rowCount.exists(_.toLong == 10000L),
      s"row count not reported: ${fullStats.rowCount}")
    // pruned projection reports far fewer bytes (text column dominates) —
    // the estimate Catalyst uses for broadcast decisions
    val pruned = docs(10000).select("doc_id")
    val prunedStats = pruned.queryExecution.optimizedPlan.stats
    assert(prunedStats.sizeInBytes < fullStats.sizeInBytes / 4,
      s"pruning did not shrink the size estimate: " +
        s"${prunedStats.sizeInBytes} vs ${fullStats.sizeInBytes}")
    // pushdown narrows the reported row count too
    val ranged = docs(10000).filter($"doc_id" < 100L)
    assert(ranged.queryExecution.optimizedPlan.stats.rowCount.exists(_.toLong == 100L))
  }

  test("non-pushable predicates still apply post-scan") {
    val df = docs(1000).filter($"source" === "src3")
    assert(df.count() === 50)
    assert(df.select("doc_id").as[Long].collect().forall(_ % 20 == 3))
  }

  test("count/min/max push down completely: metadata-only scan, zero rows generated") {
    import org.apache.spark.sql.functions._
    val agg = docs(100000).agg(
      count(lit(1)).as("n"), min($"doc_id").as("lo"), max($"doc_id").as("hi"))
    val plan = agg.queryExecution.executedPlan.toString
    assert(plan.contains("GraftDocsAggScan"), plan.take(600))
    assert(plan.contains("metadata-only"))
    val r = agg.head()
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) == ((100000L, 0L, 99999L)))

    // composes with filter pushdown: the range narrows FIRST, then the
    // aggregate is answered from the narrowed range
    val ranged = docs(100000).filter($"doc_id" >= 10L && $"doc_id" < 20L)
      .agg(count(lit(1)).as("n"), min($"doc_id").as("lo"), max($"doc_id").as("hi"))
    assert(ranged.queryExecution.executedPlan.toString.contains("GraftDocsAggScan"))
    val rr = ranged.head()
    assert((rr.getLong(0), rr.getLong(1), rr.getLong(2)) == ((10L, 10L, 19L)))

    // aggregates the metadata cannot answer still read rows and stay right
    val grouped = docs(1000).groupBy($"source").count()
    assert(!grouped.queryExecution.executedPlan.toString.contains("GraftDocsAggScan"))
    assert(grouped.collect().map(_.getLong(1)).sum === 1000L)
  }

  test("micro-batch stream: admission control paces batches, checkpoint resumes exactly-once") {
    import org.apache.spark.sql.streaming.Trigger
    val ckpt = java.nio.file.Files.createTempDirectory("docs_stream_ckpt_").toString
    val batches = scala.collection.mutable.ArrayBuffer.empty[Seq[Long]]

    def drain(rows: Int): Unit = {
      val q = spark.readStream.format("graft.sources.GraftDocsSource")
        .option("rows", rows.toString).option("partitions", "4")
        .option("rowsPerBatch", "40")
        .load().select("doc_id")
        .writeStream.option("checkpointLocation", ckpt)
        .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
          batches.synchronized {
            batches += batch.collect().map(_.getLong(0)).toSeq.sorted
          }; ()
        }
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }

    // 100 rows at 40/trigger → batches of 40, 40, 20 (admission control,
    // not one unbounded catch-up batch)
    drain(100)
    val sizes = batches.map(_.size).toSeq
    assert(sizes == Seq(40, 40, 20), s"batch sizes $sizes")
    assert(batches.flatten.sorted.toSeq == (0L until 100L).toSeq, "rows lost or duplicated")

    // the source grows to 160 rows; the same checkpoint resumes at 100 —
    // no re-read, no gap
    batches.clear()
    drain(160)
    assert(batches.flatten.sorted.toSeq == (100L until 160L).toSeq,
      s"resume re-read or skipped rows: ${batches.map(_.size)}")
  }
}
