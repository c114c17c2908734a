package graft.streaming

import graft.operators.CountMin
import graft.sinks.KVTableSink
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types._

/** Streaming Count-Min maintenance — the running per-key frequency
  * summary for an unbounded ingest, in `depth × width` integers of
  * state no matter how many keys or batches arrive.
  *
  * The whole tier is one consequence of the sketch's additivity
  * ([[graft.operators.CountMin.merge]]): each micro-batch's sketch
  * merges into the persisted one by bucket-wise sum, so the state
  * after ANY batch boundaries is EXACTLY the batch-mode sketch of the
  * union — the strongest batching-invariance contract in the ingest
  * family (the exact tier's contract, with a fixed-size state). The
  * same additivity gives EXACT retirement: subtracting a retired
  * batch's sketch is the precise negation of what ingest added, so
  * takedown cost is `O(takedown + depth · width)`, never a corpus
  * rescan (`removedDocs` must be rows as ingested — the
  * [[TokenizerStats.retire]] contract).
  *
  * At 100 TB: per-executor partial sketches combine map-side (the
  * build's groupBy), the merged exchange carries ≤ `depth · width`
  * rows per trigger, and point queries broadcast the state
  * ([[graft.operators.CountMin.estimate]]). Exact streaming counts
  * (`TokenizerStats`) keep per-key state that grows with vocabulary;
  * this tier is the bounded-state alternative when the vocabulary is
  * open-ended (URLs, n-grams, user ids) and one-sided estimates
  * suffice.
  */
object FreqSketch {

  val sketchStateSchema: StructType = new StructType()
    .add("row", IntegerType, nullable = false)
    .add("bucket", LongType, nullable = false)
    .add("cnt", LongType, nullable = false)

  /** One batch's occurrences of `keyCol` folded into the sketch state
    * — bucket-wise sum, associative and commutative.
    */
  def mergeSketchState(
      state: DataFrame,
      batch: DataFrame,
      keyCol: String,
      depth: Int,
      width: Int): DataFrame =
    StateMerge.fullOuterMerge(
      state,
      CountMin.buildTable(batch, keyCol, depth, width),
      keyCols = Seq("row", "bucket"),
      valueCombiners = Seq("cnt" -> StateMerge.addLong))

  /** Retirement: subtract the retired rows' sketch — the exact
    * negation of their ingest. Buckets at zero leave the table;
    * `removedDocs` must be rows as ingested (a superset or an edited
    * row under-subtracts elsewhere and leaves phantom mass here).
    */
  def retireSketchState(
      state: DataFrame,
      removedDocs: DataFrame,
      keyCol: String,
      depth: Int,
      width: Int): DataFrame =
    StateMerge.fullOuterMerge(
      state,
      CountMin.buildTable(removedDocs, keyCol, depth, width)
        .withColumn("cnt", -col("cnt")),
      keyCols = Seq("row", "bucket"),
      valueCombiners = Seq("cnt" -> StateMerge.addLong))
      .filter(col("cnt") > 0)

  /** Point-query the persisted sketch for a bounded key set. */
  def estimate(
      spark: SparkSession,
      sink: KVTableSink,
      table: String,
      queries: DataFrame,
      keyCol: String,
      depth: Int,
      width: Int): DataFrame =
    CountMin.estimate(
      sink.read(spark, table, sketchStateSchema),
      queries, keyCol, depth, width)

  /** The per-micro-batch body (factored out for the replay spec). */
  private[streaming] def applyBatch(
      batch: DataFrame,
      batchId: Long,
      keyCol: String,
      depth: Int,
      width: Int,
      sink: KVTableSink,
      table: String): Unit = {
    val spark = batch.sparkSession
    if (batch.head(1).nonEmpty && !DedupIngest.alreadyApplied(spark, sink, table, batchId)) {
      val state = sink.read(spark, table, sketchStateSchema)
      sink.write(
        mergeSketchState(state, batch, keyCol, depth, width),
        table, SaveMode.Overwrite)
      DedupIngest.markApplied(spark, sink, table, batchId)
    }
  }

  /** Start the sketch ingest: every micro-batch's key occurrences
    * merge into the `depth × width` state at `table`.
    */
  def start(
      items: DataFrame,
      keyCol: String,
      sink: KVTableSink,
      table: String,
      checkpointDir: String,
      trigger: Trigger,
      depth: Int = 4,
      width: Int = 4096): StreamingQuery =
    items.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        applyBatch(batch, batchId, keyCol, depth, width, sink, table)
      }
      .start()
}
