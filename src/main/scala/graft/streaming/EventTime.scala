package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Event-time transforms (SURVEY §2.B streaming block).
  *
  * Each builder takes any events DataFrame — batch or streaming — and
  * returns the same logical plan, so streaming-vs-batch equivalence is a
  * test, not a hope. Streaming callers add `withWatermark("ts", ...)`
  * before the groupBy; state then ages out with the watermark instead of
  * growing unboundedly.
  */
object EventTime {

  /** Tumbling 1-hour counts per event_type. Window starts are epoch-aligned
    * (UTC), matching `date_trunc('hour', ts)`.
    */
  def tumblingCounts(events: DataFrame): DataFrame =
    events.groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(unix_timestamp(col("window.start")).as("ws"), col("event_type"), col("n"))

  /** Sliding 1-hour windows every 15 minutes: avg + count of `value`.
    * Portable floor-rounding (graft.functions.Rounding) for the oracle.
    */
  def slidingAvg(events: DataFrame): DataFrame =
    events.groupBy(window(col("ts"), "1 hour", "15 minutes"))
      .agg(graft.functions.Rounding.roundTo(avg(col("value")), 2).as("avg_value"),
        count(lit(1)).as("n"))
      .select(unix_timestamp(col("window.start")).as("ws"), col("avg_value"), col("n"))

  /** Per-user session windows with a 30-minute inactivity gap. */
  def sessionStats(events: DataFrame): DataFrame =
    events.groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("session_value"))
      .select(col("user_id"),
        unix_timestamp(col("session_window.start")).as("session_start"),
        col("n"), col("session_value"))

  /** Streaming dedup surface: drop duplicate event_ids (bounded by the
    * caller's watermark in streaming mode), then count per type.
    */
  def dedupCounts(events: DataFrame): DataFrame =
    events.dropDuplicates("event_id")
      .groupBy(col("event_type")).agg(count(lit(1)).as("n"))
}
