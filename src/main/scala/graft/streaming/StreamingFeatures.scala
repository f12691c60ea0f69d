package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Structured Streaming wrappers for the window-family operators
  * (SURVEY.md §2.8 — the reference is pure batch; these are the engine's
  * incremental form of the same semantics).
  *
  * Batch ↔ streaming mapping:
  *  - tumbling/sliding buckets (W1-W3)  → `window(ts, dur[, slide])`
  *  - gap sessionization (W9)           → `session_window(ts, gap)`
  *  - late data                         → `withWatermark`
  * State stays bounded by the watermark; aggregates are the same partial
  * `vecAvg`/avg/count aggregations the batch path uses, so a migration from
  * nightly batch to continuous ingest keeps semantics identical.
  */
object StreamingFeatures {

  /** Tumbling event-time aggregate: per (user, window) count + mean value. */
  def tumblingAgg(events: DataFrame, windowDur: String, watermark: String): DataFrame =
    events
      .withColumn("ts_t", col("ts").cast("timestamp"))
      .withWatermark("ts_t", watermark)
      .groupBy(window(col("ts_t"), windowDur), col("user_id"))
      .agg(count(lit(1)).as("n"), avg(col("value")).as("avg_v"))
      .select(
        col("user_id"),
        unix_micros(col("window.start")).as("win_start_us"),
        col("n"),
        col("avg_v"))

  /** Gap-based session aggregate — streaming form of
    * `graft.ops.Sessionize` (new session when idle > gap). */
  def sessionAgg(events: DataFrame, gap: String, watermark: String): DataFrame =
    events
      .withColumn("ts_t", col("ts").cast("timestamp"))
      .withWatermark("ts_t", watermark)
      .groupBy(session_window(col("ts_t"), gap), col("user_id"))
      .agg(count(lit(1)).as("n_rows"), avg(col("value")).as("avg_value"))
      .select(
        col("user_id"),
        unix_micros(col("session_window.start")).as("session_start_us"),
        unix_micros(col("session_window.end")).as("session_end_us"),
        col("n_rows"),
        col("avg_value"))
}
