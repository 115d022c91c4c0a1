package graft

import org.apache.spark.sql.functions._

/** The QueryExecutionListener hook must observe completed actions (name,
  * duration, physical root) without touching results — and failures must be
  * reported as failures. Events arrive asynchronously, so assertions poll. */
class InstrumentationSpec extends SparkSuite {

  private def awaitEvents(min: Int, timeoutMs: Long = 15000): Seq[GraftQueryListener.QueryEvent] = {
    val deadline = System.currentTimeMillis() + timeoutMs
    val got = scala.collection.mutable.ArrayBuffer.empty[GraftQueryListener.QueryEvent]
    while (got.size < min && System.currentTimeMillis() < deadline) {
      got ++= GraftQueryListener.drain()
      if (got.size < min) Thread.sleep(100)
    }
    got.toSeq
  }

  test("listener observes successful actions with duration and physical root") {
    GraftQueryListener.register(spark)
    try {
      GraftQueryListener.drain() // discard anything from earlier suites
      val n = Tables(spark, sfDir, "nation").filter(col("n_nationkey") >= 0).count()
      assert(n > 0)
      val evs = awaitEvents(1)
      assert(evs.nonEmpty, "no query event delivered")
      val e = evs.find(_.funcName == "count").getOrElse(evs.head)
      assert(e.ok, s"successful count reported as failure: $e")
      assert(e.durationNs > 0, s"missing duration: $e")
      assert(e.rootOperator.nonEmpty)
    } finally GraftQueryListener.unregister(spark)
  }

  test("listener reports a failing action as a failure") {
    GraftQueryListener.register(spark)
    try {
      GraftQueryListener.drain()
      val boom = udf((x: Long) => { throw new RuntimeException("boom"); x })
      intercept[Exception] {
        Tables(spark, sfDir, "nation").select(boom(col("n_nationkey"))).collect()
      }
      val evs = awaitEvents(1)
      assert(evs.exists(!_.ok), s"failure not observed: $evs")
    } finally GraftQueryListener.unregister(spark)
  }
}
