package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Stream-stream joins with watermark-bounded state — the streaming
  * extension for correlating two live feeds (e.g. chat messages with
  * moderation actions, impressions with clicks). The reference has no
  * joins across streams at all (SURVEY.md §2.3: its only join is the
  * batch state merge J1); this is the Structured Streaming shape a
  * production pipeline needs.
  *
  * Both sides are watermarked and the join condition carries an explicit
  * event-time interval, so Spark derives state-eviction bounds on BOTH
  * sides (without the interval the left side would buffer forever
  * waiting for arbitrarily-late right rows). State is keyed by the join
  * key — at 100 TB/day feed rates the state store holds only
  * `rate × interval` rows per side, independent of stream lifetime.
  */
object StreamJoin {

  /** Inner interval join: left row (k, t) matches right rows with the
    * same key whose event time lies in `[t, t + maxDelay]` — the
    * "click follows impression within N minutes" shape.
    *
    * Column names must be disjoint across the two inputs (standard
    * stream-stream join requirement; rename upstream).
    */
  def intervalJoin(
      left: DataFrame,
      right: DataFrame,
      leftKey: String,
      rightKey: String,
      leftTs: String,
      rightTs: String,
      watermark: String,
      maxDelay: String): DataFrame =
    left.withWatermark(leftTs, watermark)
      .join(
        right.withWatermark(rightTs, watermark),
        col(leftKey) === col(rightKey) &&
          col(rightTs) >= col(leftTs) &&
          col(rightTs) <= col(leftTs) + expr(s"INTERVAL $maxDelay"))

  /** Left-outer variant: unmatched left rows emit with nulls once the
    * watermark proves no matching right row can still arrive (the
    * "impressions that never converted" shape — emitted exactly once,
    * after the interval closes).
    */
  def intervalJoinLeftOuter(
      left: DataFrame,
      right: DataFrame,
      leftKey: String,
      rightKey: String,
      leftTs: String,
      rightTs: String,
      watermark: String,
      maxDelay: String): DataFrame =
    left.withWatermark(leftTs, watermark)
      .join(
        right.withWatermark(rightTs, watermark),
        col(leftKey) === col(rightKey) &&
          col(rightTs) >= col(leftTs) &&
          col(rightTs) <= col(leftTs) + expr(s"INTERVAL $maxDelay"),
        "left_outer")
}
