package graft.stream

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming._

/** Spark 4 `transformWithState` with EVENT-TIME TIMERS: gap-based session
  * windows as an explicit stateful processor — the full new-API surface
  * (typed `ValueState` + `registerTimer`/`handleExpiredTimer`), beside the
  * timer-less running counter ([[StatefulCounter]]) and the
  * `session_window` declarative form (`q_stream_session`).
  *
  * Per user: every batch folds its events into (n, start, last) state and
  * re-arms ONE timer at `last + gap`. When the WATERMARK passes the timer
  * (no event for `gap` — the session closed and no straggler can reopen
  * it), `handleExpiredTimer` emits the finished session and clears the
  * state — so state size is live-sessions only, the property that keeps an
  * unbounded-key stream's store finite at 100 TB/day. A key with events in
  * a later batch before expiry just re-arms its timer (the session
  * extends).
  */
object StatefulSessions {

  final case class SessionOut(user_id: Long, n_events: Long,
      start_ms: Long, end_ms: Long)

  class SessionProcessor(gapMs: Long)
    extends StatefulProcessor[Long, StatefulDedup.EventRow, SessionOut] {
    @transient private var st: ValueState[(Long, Long, Long)] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getValueState[(Long, Long, Long)]("sess",
        Encoders.product[(Long, Long, Long)], TTLConfig.NONE)

    override def handleInputRows(key: Long,
        rows: Iterator[StatefulDedup.EventRow],
        timerValues: TimerValues): Iterator[SessionOut] = {
      var (n, start, last) =
        if (st.exists()) st.get() else (0L, Long.MaxValue, Long.MinValue)
      rows.foreach { r =>
        val ms = r.ts.getTime
        n += 1
        if (ms < start) start = ms
        if (ms > last) last = ms
      }
      st.update((n, start, last))
      // exactly one armed timer per key: the session's current deadline
      getHandle.listTimers().foreach(t => getHandle.deleteTimer(t.asInstanceOf[Long]))
      getHandle.registerTimer(last + gapMs)
      Iterator.empty
    }

    override def handleExpiredTimer(key: Long, timerValues: TimerValues,
        expiredTimerInfo: ExpiredTimerInfo): Iterator[SessionOut] = {
      val out =
        if (st.exists()) {
          val (n, s, l) = st.get()
          Iterator.single(SessionOut(key, n, s, l))
        } else Iterator.empty
      st.clear() // closed session: state drops, store stays bounded
      out
    }
  }

  /** Closed gap-sessions per user over a watermarked event stream. */
  def sessions(events: Dataset[StatefulDedup.EventRow],
      gapMs: Long, watermarkDelay: String): Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.user_id)
      .transformWithState(new SessionProcessor(gapMs),
        TimeMode.EventTime(), OutputMode.Append())
  }
}
