package graft.stream

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Arbitrary-state streaming operator (SURVEY.md §2 B19's state note): exact
  * first-seen deduplication over an event stream with
  * `flatMapGroupsWithState` — the streaming twin of the batch keep-one
  * dedup, and the pattern a 100 TB ingest pipeline uses to drop duplicate
  * deliveries (at-least-once sources) before they land.
  *
  * State is one boolean per business key, partitioned by the key hash —
  * horizontally scalable; in production bound the state with
  * `GroupStateTimeout.EventTimeTimeout` + watermark (duplicates only arrive
  * within the redelivery horizon). NoTimeout keeps the test deterministic on
  * the bounded testdata stream.
  */
object StatefulDedup {

  final case class EventKey(userId: Long, eventType: String)
  final case class EventRow(
      event_id: Long, ts: java.sql.Timestamp, user_id: Long,
      event_type: String, value: Double)

  /** Emit only the first event seen per (user_id, event_type); later
    * arrivals for a key are dropped. */
  def firstSeen(events: Dataset[EventRow]): Dataset[EventRow] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(e => EventKey(e.user_id, e.event_type))
      .flatMapGroupsWithState[Boolean, EventRow](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (_: EventKey, rows: Iterator[EventRow], state: GroupState[Boolean]) =>
          if (state.exists) Iterator.empty
          else { state.update(true); rows.take(1) }
      }
  }

  /** Streaming events as the typed row the stateful operator consumes. */
  def typedEvents(spark: SparkSession, dir: String): Dataset[EventRow] = {
    import spark.implicits._
    Streaming.readEvents(spark, dir)
      .select("event_id", "ts", "user_id", "event_type", "value")
      .as[EventRow]
  }
}
