package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured-Streaming twins of the batch operators: the same
  * logical transforms bound to `readStream` sources. The reference's
  * pipeline is batch-only; these give the engine an incremental-
  * ingest path (the lakehouse "bronze append → silver merge" loop as
  * a stream instead of scheduled jobs).
  */
object Streams {

  case class Event(event_id: Long, ts: java.sql.Timestamp, user_id: Long,
                   event_type: String, value: Double)

  case class UserState(user_id: Long, event_type: String,
                       last_ts: java.sql.Timestamp)

  /** Tumbling-window count/sum per event type with a watermark —
    * identical semantics to Analytics.windowedEvents on a bounded
    * input (proved in tests via MemoryStream). */
  def windowedAgg(events: DataFrame, watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "1 hour").getField("start").as("win_start"),
        col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(28,6)")).cast("double").as("sum_value"))

  /** Streaming SCD1: last-writer-wins current state per user via
    * mapGroupsWithState — the incremental form of Scd.scd1Upsert /
    * the reference's MERGE loop. Emits the updated current row per
    * key per micro-batch. */
  def streamingScd1(events: Dataset[Event]): Dataset[UserState] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .mapGroupsWithState[UserState, UserState](
        GroupStateTimeout.NoTimeout) {
        (userId: Long, batch: Iterator[Event], state: GroupState[UserState]) =>
          val latest = batch.reduceOption { (a, b) =>
            if (b.ts.after(a.ts) ||
              (b.ts.equals(a.ts) && b.event_id > a.event_id)) b else a
          }
          val merged = (state.getOption, latest) match {
            case (Some(s), Some(e)) if e.ts.after(s.last_ts) =>
              UserState(userId, e.event_type, e.ts)
            case (Some(s), _) => s
            case (None, Some(e)) => UserState(userId, e.event_type, e.ts)
            case (None, None) => UserState(userId, null, null)
          }
          state.update(merged)
          merged
      }
  }

  /** Streaming exact dedup on a key column with state TTL via
    * dropDuplicatesWithinWatermark — bounded state at 100 TB/day
    * ingest rates (unbounded dropDuplicates state would OOM). */
  def streamingDedup(events: DataFrame, keyCols: Seq[String],
                     watermark: String = "1 hour"): DataFrame =
    events.withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark(keyCols)

  /** Output mode for the windowed agg sink. */
  val defaultOutputMode: OutputMode = OutputMode.Update()
}
