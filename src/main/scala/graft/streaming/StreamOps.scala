package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Structured Streaming operators over the `events` shape — the streaming
  * face of EventOps. The reference has no streaming at all (SURVEY §2.9);
  * this is north-star surface for the `events` table.
  *
  * Each op takes a (streaming or batch) DataFrame with
  * (event_id, ts: timestamp, user_id, event_type, value) and returns the
  * transformed frame; callers bind sources/sinks (`readStream` →
  * `writeStream`). Watermarks bound state: at 100 TB-rate ingest the
  * session/window state store only retains events newer than the
  * watermark horizon, so state is O(active keys), not O(stream).
  */
object StreamOps {

  /** Gap-based sessionization with session_window — the streaming
    * equivalent of EventOps.sessionize (same 30-min gap semantics).
    * Output per closed session: user_id, session start/end, n_events,
    * sum_value.
    */
  def sessionize(events: DataFrame, gap: String = "30 minutes",
                 watermark: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(session_window(col("ts"), gap), col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(28,4)")).cast("double").as("sum_value"))
      .select(col("user_id"),
        col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("n_events"), col("sum_value"))

  /** Sliding/tumbling windowed counts per event_type. */
  def windowedCounts(events: DataFrame, window: String = "10 minutes",
                     watermark: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(org.apache.spark.sql.functions.window(col("ts"), window),
        col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(28,4)")).cast("double").as("sum_value"))
      .select(col("window.start").as("w_start"), col("event_type"),
        col("n"), col("sum_value"))
}
