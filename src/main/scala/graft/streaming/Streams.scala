package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import java.sql.Timestamp

/**
 * Structured-Streaming operators over the events-shaped stream
 * (event_id, ts, user_id, event_type, value). The reference is batch-only
 * (SURVEY §1.1); these are the Spark-native streaming counterparts a
 * production ingest of the same tables needs: watermarked windowed
 * aggregation and custom keyed state (sessionization).
 */
object Streams {

  /** Tumbling-window event counts with a watermark for late data. */
  def windowedCounts(events: DataFrame, watermark: String = "10 minutes",
                     window: String = "5 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(org.apache.spark.sql.functions.window(col("ts"), window), col("event_type"))
      .agg(count(lit(1)).as("cnt"), sum("value").as("total"))
      .select(col("window.start").as("win_start"), col("event_type"),
        col("cnt"), col("total"))

  case class Event(event_id: Long, ts: Timestamp, user_id: Long,
                   event_type: String, value: Double)
  case class Session(user_id: Long, events: Long, total: Double,
                     firstTs: Timestamp, lastTs: Timestamp, closed: Boolean)

  /**
   * Sessionization via flatMapGroupsWithState with EVENT-TIME timeouts.
   * Within a batch the user's events are sorted and split into gap islands
   * (a new session starts when the inter-event gap exceeds `gapMs` STRICTLY)
   * — a batch can span many sessions, so batch-boundary-only splitting would
   * under-segment. Every island but the newest closes immediately; the
   * newest becomes state and closes once the watermark passes
   * `lastTs + gapMs`. Event-time state is deterministic (no wall clock) and
   * the query quiesces between batches — processing-time timeouts would
   * re-trigger batches forever.
   */
  def sessionize(events: Dataset[Event], gapMs: Long,
                 watermarkDelay: String = "0 seconds"): Dataset[Session] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[Session, Session](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (userId: Long, rows: Iterator[Event], state: GroupState[Session]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator(s.copy(closed = true))
          } else {
            val evs = rows.toArray.sortBy(_.ts.getTime)
            var closedOut = List.empty[Session]
            var cur = state.getOption.orNull
            var i = 0
            while (i < evs.length) {
              val e = evs(i)
              if (cur == null) {
                cur = Session(userId, 1L, e.value, e.ts, e.ts, closed = false)
              } else if (e.ts.getTime - cur.lastTs.getTime > gapMs) {
                closedOut ::= cur.copy(closed = true)
                cur = Session(userId, 1L, e.value, e.ts, e.ts, closed = false)
              } else {
                cur = cur.copy(events = cur.events + 1, total = cur.total + e.value,
                  firstTs = if (e.ts.getTime < cur.firstTs.getTime) e.ts else cur.firstTs,
                  lastTs = if (e.ts.getTime > cur.lastTs.getTime) e.ts else cur.lastTs)
              }
              i += 1
            }
            // evs can be empty only on a watermark-advance no-data pass, in
            // which case prior state exists; keep its timeout unchanged.
            if (cur != null) {
              state.update(cur)
              state.setTimeoutTimestamp(cur.lastTs.getTime + gapMs)
            }
            closedOut.reverseIterator
          }
      }
  }
}
