package graft.queries

import java.math.{BigDecimal => JBigDecimal, RoundingMode}

import org.apache.spark.sql.functions._

import graft.Tables

/** Typed `Dataset[T]` surface (`groupByKey` + `flatMapGroups`) — the
  * imperative per-group tier the build rules reserve for logic the
  * relational operators can't express cleanly. Exercised here on
  * sessionization, where the SQL twin DOES exist (`q_sessionize`), so the
  * oracle certifies the typed path produces row-identical output to the
  * declarative one — the strongest possible test of the typed API.
  *
  * Scale note: `flatMapGroups` materializes ONE user's events at a time
  * (bounded by per-user activity, not corpus size); the shuffle is the same
  * single user_id exchange as the window form. For unbounded-key skew the
  * window form remains the scale path — this query is the API-surface twin,
  * not a replacement.
  */
object TypedOps extends QueryModule {

  private val GapUs = 1800L * 1000000L

  final case class Ev(user_id: Long, ts_us: Long, event_id: Long, value: Double)
  final case class Session(user_id: Long, session_id: Int, n_events: Long,
      start_us: Long, end_us: Long, sum_value: Double, dur_us: Long)

  def queries: Map[String, Q] = Map(
    // Sessionization rebuilt imperatively per group: sort one user's events,
    // cut where the gap exceeds 30 min, aggregate each island — then prove
    // (via the SAME oracle SQL as q_sessionize) that the typed and
    // declarative engines agree cell-exactly, decimal value sums included.
    "q_typed_sessions" -> ((s, d) => {
      import s.implicits._
      val evs = Tables(s, d, "events")
        .select(col("user_id"), unix_micros(col("ts")).as("ts_us"),
          col("event_id"), col("value"))
        .as[Ev]
      evs.groupByKey(_.user_id)
        .flatMapGroups { (uid, it) =>
          val sorted = it.toIndexedSeq.sortBy(e => (e.ts_us, e.event_id))
          val out = scala.collection.mutable.ArrayBuffer.empty[Session]
          var sid = 0
          var batch = scala.collection.mutable.ArrayBuffer.empty[Ev]
          def flush(): Unit = if (batch.nonEmpty) {
            sid += 1
            val sum = batch.foldLeft(JBigDecimal.ZERO)((acc, e) =>
              acc.add(JBigDecimal.valueOf(e.value).setScale(4, RoundingMode.HALF_UP)))
            out += Session(uid, sid, batch.size.toLong,
              batch.head.ts_us, batch.last.ts_us,
              sum.doubleValue, batch.last.ts_us - batch.head.ts_us)
            batch = scala.collection.mutable.ArrayBuffer.empty[Ev]
          }
          sorted.foreach { e =>
            if (batch.nonEmpty && e.ts_us - batch.last.ts_us > GapUs) flush()
            batch += e
          }
          flush()
          out
        }
        .toDF()
        .orderBy("user_id", "session_id")
    })
  )

  // Identical SQL to q_sessionize's oracle — the typed path must reproduce
  // the declarative result bit-for-bit.
  def oracles: Map[String, String] = Map(
    "q_typed_sessions" ->
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
        |ORDER BY user_id, session_id""".stripMargin
  )
}
