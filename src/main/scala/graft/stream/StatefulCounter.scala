package graft.stream

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming._

/** Spark 4 `transformWithState` demo (the successor of
  * [mapGroups|flatMapGroups]WithState): a running per-user event counter
  * with typed `ValueState`. TimeMode/TTLConfig are the production knobs —
  * `TTLConfig(Duration)` bounds state lifetime per key, which is what keeps
  * an unbounded-key stream's store finite at 100 TB/day ingest. Requires
  * the RocksDB state store provider (set in the test / production conf).
  */
object StatefulCounter {

  final case class UserStats(user_id: Long, n_events: Long)

  class CountProcessor extends StatefulProcessor[Long, StatefulDedup.EventRow, UserStats] {
    @transient private var count: ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      count = getHandle.getValueState[Long]("count", Encoders.scalaLong, TTLConfig.NONE)

    override def handleInputRows(key: Long, rows: Iterator[StatefulDedup.EventRow],
        timerValues: TimerValues): Iterator[UserStats] = {
      val prev = if (count.exists()) count.get() else 0L
      val n = prev + rows.size
      count.update(n)
      Iterator.single(UserStats(key, n))
    }
  }

  /** Running event counts per user over a (possibly unbounded) stream. */
  def runningCounts(events: Dataset[StatefulDedup.EventRow]): Dataset[UserStats] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .transformWithState(new CountProcessor, TimeMode.None(), OutputMode.Update())
  }
}
