package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Structured Streaming twins of the batch event analytics in
  * [[graft.operators.EventsOps]] (the reference engine is batch-only —
  * SURVEY.md §2.10 — so this is pure extension surface).
  *
  * Each transform takes an unbounded DataFrame with the `events`
  * schema (`ts TIMESTAMP, user_id, event_type, value, event_id`) from
  * any `readStream` source and returns a streaming DataFrame; callers
  * pick the sink/trigger. State is always watermark-bounded so long
  * runs cannot accumulate unbounded state — the property that matters
  * at production scale.
  */
object EventStream {

  /** Tumbling 1-hour counts per event type — the streaming twin of
    * q_events_hourly. Watermark 2h bounds both late data and state. */
  def hourly(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour").as("win"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_value"))
      .select(col("win.start").as("hour"), col("event_type"), col("n"), col("sum_value"))

  /** 30-minute-gap sessions per user — the streaming twin of
    * q_events_sessions, via the native session_window (the batch query
    * builds the same sessions with lag + cumulative sum). */
  def sessions(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(session_window(col("ts"), "30 minutes").as("win"), col("user_id"))
      .agg(count(lit(1)).as("n_events"), min(col("event_id")).as("first_event"))
      .select(col("user_id"), col("win.start").as("session_start"),
        col("n_events"), col("first_event"))

  /** Streaming exact dedup by event_id — the streaming face of the
    * dedup pillar: dropDuplicates state is GC'd past the watermark,
    * so the dedup window is explicit (2h) instead of unbounded. */
  def deduped(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .dropDuplicatesWithinWatermark("event_id")
}
