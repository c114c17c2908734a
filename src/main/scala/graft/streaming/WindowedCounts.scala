package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Event-time windowed aggregations with watermarking — the streaming
  * extension the reference lacks entirely (SURVEY.md §2.9 ST4/ST5: all
  * its temporal semantics are receipt-time running totals). These are the
  * shapes a production chat-analytics pipeline actually wants: counts per
  * tumbling/sliding window, per-key session windows, late data dropped
  * once the watermark passes.
  *
  * All built-in operators: `window`/`session_window` aggregations compile
  * to streaming state-store aggregations with watermark-driven eviction —
  * bounded state, unlike the unbounded running totals (which remain
  * available for reference parity in [[StreamingPipeline]]).
  */
object WindowedCounts {

  /** Tumbling-window counts per key, emitted once final (append mode). */
  def tumbling(
      events: DataFrame,
      tsCol: String,
      keyCol: String,
      windowLength: String,
      watermark: String): DataFrame =
    events
      .withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), windowLength), col(keyCol))
      .agg(count(lit(1)).alias("n"))
      .select(
        col("window.start").alias("window_start"),
        col("window.end").alias("window_end"),
        col(keyCol),
        col("n"))

  /** Sliding-window counts per key. */
  def sliding(
      events: DataFrame,
      tsCol: String,
      keyCol: String,
      windowLength: String,
      slide: String,
      watermark: String): DataFrame =
    events
      .withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), windowLength, slide), col(keyCol))
      .agg(count(lit(1)).alias("n"))
      .select(
        col("window.start").alias("window_start"),
        col("window.end").alias("window_end"),
        col(keyCol),
        col("n"))

  /** Session windows: events within `gap` of each other merge into one
    * session per key (the streaming analogue of the batch sessionize
    * query q13).
    */
  def sessions(
      events: DataFrame,
      tsCol: String,
      keyCol: String,
      gap: String,
      watermark: String): DataFrame =
    events
      .withWatermark(tsCol, watermark)
      .groupBy(session_window(col(tsCol), gap), col(keyCol))
      .agg(count(lit(1)).alias("n_events"))
      .select(
        col("session_window.start").alias("session_start"),
        col("session_window.end").alias("session_end"),
        col(keyCol),
        col("n_events"))
}
