package graft

import java.util.concurrent.ConcurrentLinkedQueue

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.util.QueryExecutionListener

/** Engine instrumentation through the public `QueryExecutionListener` API —
  * the observability tier a production deployment hangs audit logs, SLO
  * timers and cost attribution on. The listener receives every completed
  * action's `QueryExecution` (logical + physical plans) and wall time,
  * asynchronously and off the query path: recording costs nothing at
  * 100 TB because it never touches the executors.
  *
  * This is the last public hook family the engine exposes alongside the
  * four SparkSessionExtensions tiers, the DSv2 read/write connectors and
  * the typed Aggregator surface. Registered per-session via
  * `GraftQueryListener.register(spark)`; events drain to the caller (a
  * metrics sink in production, assertions in InstrumentationSpec).
  */
object GraftQueryListener extends QueryExecutionListener {

  /** One completed action: the DataFrame method that triggered it, wall
    * time, success flag, and the physical root operator. */
  final case class QueryEvent(funcName: String, durationNs: Long, ok: Boolean,
      rootOperator: String)

  private val events = new ConcurrentLinkedQueue[QueryEvent]()

  override def onSuccess(funcName: String, qe: QueryExecution, durationNs: Long): Unit =
    events.add(QueryEvent(funcName, durationNs, ok = true, qe.executedPlan.nodeName))

  override def onFailure(funcName: String, qe: QueryExecution, exception: Exception): Unit =
    events.add(QueryEvent(funcName, 0L, ok = false, qe.logical.nodeName))

  /** Atomically take everything recorded so far. */
  def drain(): Seq[QueryEvent] = {
    val out = Iterator.continually(events.poll()).takeWhile(_ != null).toSeq
    out
  }

  def register(spark: SparkSession): Unit =
    spark.listenerManager.register(this)
  def unregister(spark: SparkSession): Unit =
    spark.listenerManager.unregister(this)
}
