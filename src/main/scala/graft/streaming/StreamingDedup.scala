package graft.streaming

import graft.functions.TextFunctions
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

/** Streaming deduplication by content fingerprint — the streaming form of
  * `Dedup.exact` for ingest pipelines: only the first occurrence of each
  * distinct text passes downstream.
  *
  *  - [[exact]] keeps fingerprint state forever (same unbounded-state
  *    contract as the running-count tables);
  *  - [[withinWatermark]] bounds state via
  *    `dropDuplicatesWithinWatermark`: duplicates are only suppressed
  *    while their event time is within the watermark, after which state
  *    is evicted — the shape to use at sustained 100 TB ingest.
  */
object StreamingDedup {

  def exact(messages: DataFrame, textCol: String): DataFrame =
    messages
      .withColumn("__fp", TextFunctions.contentFingerprint(col(textCol)))
      .dropDuplicates("__fp")
      .drop("__fp")

  def withinWatermark(
      messages: DataFrame,
      textCol: String,
      tsCol: String,
      watermark: String): DataFrame =
    messages
      .withWatermark(tsCol, watermark)
      .withColumn("__fp", TextFunctions.contentFingerprint(col(textCol)))
      .dropDuplicatesWithinWatermark("__fp")
      .drop("__fp")
}
