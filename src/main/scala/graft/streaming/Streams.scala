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
   * Sessionization via flatMapGroupsWithState with EVENT-TIME timeouts: a
   * session closes once the watermark passes `lastTs + gapMs`. Event-time
   * state is deterministic (no wall clock) and the query quiesces between
   * batches — processing-time timeouts would re-trigger batches forever.
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
            val evs = rows.toSeq
            val prev = state.getOption
            val first = prev.map(_.firstTs).getOrElse(
              evs.map(_.ts).min(Ordering.by[Timestamp, Long](_.getTime)))
            val last = {
              val newest = evs.map(_.ts).max(Ordering.by[Timestamp, Long](_.getTime))
              prev.map(_.lastTs).filter(_.getTime > newest.getTime).getOrElse(newest)
            }
            val merged = Session(userId,
              prev.map(_.events).getOrElse(0L) + evs.size,
              prev.map(_.total).getOrElse(0.0) + evs.map(_.value).sum,
              first, last, closed = false)
            state.update(merged)
            state.setTimeoutTimestamp(last.getTime + gapMs)
            Iterator.empty
          }
      }
  }
}
