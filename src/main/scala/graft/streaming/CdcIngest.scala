package graft.streaming

import graft.operators.Cdc
import graft.sinks.KVTableSink
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types._

/** Streaming chunk-containment dedup — [[Cdc.containmentDedup]]'s
  * incremental form: per micro-batch, each document's chunk mass is
  * measured against the RETAINED corpus's chunk-ownership state plus
  * the batch's own earlier ids, and ≥-threshold-covered docs drop.
  *
  * Retained-corpus semantics, pinned by spec: ownership accrues only
  * from KEPT documents (a dropped re-upload does not block future
  * docs — its owner already does), so across any batching a document
  * drops iff it is covered by the corpus that actually survives.
  * Within one batch the rule is exactly the batch operator's
  * (smallest id owns); a single whole-corpus batch therefore equals
  * [[Cdc.containmentDedup]] bit-for-bit.
  *
  * Scale shape (the q72 inverted-probe doctrine): the state is
  * `(h, owner)` — one row per distinct retained chunk fingerprint —
  * and it NEVER shuffles. The batch's distinct fingerprints broadcast
  * INTO the state scan (left-semi, map-side), the bounded hit set
  * broadcasts back into the batch-side arithmetic, and the state
  * update appends only the kept docs' previously-unseen fingerprints.
  * Retirement deletes rows owned by retired ids (broadcast anti-join,
  * takedown-sized): the blocker's reason is gone, so a future
  * identical document is admitted as fresh ownership — the exact
  * tier's retirement contract at chunk granularity.
  */
object CdcIngest {

  val chunkStateSchema: StructType = new StructType()
    .add("h", LongType, nullable = false)
    .add("owner", LongType, nullable = false)

  val decisionsSchema: StructType = new StructType()
    .add("doc_id", LongType)
    .add("n_chunks", LongType, nullable = false)
    .add("borrowed_chunks", LongType, nullable = false)
    .add("covered_micro", LongType)
    .add("keep", BooleanType, nullable = false)
    .add("batch", LongType, nullable = false)

  /** Batch decisions + the state delta, one pass over the batch
    * payloads. Returns (decisions, newStateRows).
    */
  private[streaming] def decide(
      state: DataFrame,
      batch: DataFrame,
      idCol: String,
      contentCol: String,
      window: Int,
      divisor: Int,
      maxCoveredMicro: Long): (DataFrame, DataFrame) = {
    val batchChunks = batch
      .select(col(idCol).alias("doc_id"),
        explode(Cdc.chunkHashes(col(contentCol), window, divisor)).alias("h"))
      .groupBy("h", "doc_id").agg(count(lit(1)).alias("c"))
      .localCheckpoint()
    // map-side state probe: the batch's distinct fingerprints broadcast
    // into the state scan; output bounded by the batch's chunk universe
    val stateHits = state
      .join(broadcast(batchChunks.select("h").distinct()), Seq("h"), "left_semi")
      .select(col("h"), lit(true).alias("in_state"))
    val owned = batchChunks
      .withColumn("batch_owner", min("doc_id").over(Window.partitionBy("h")))
      .join(broadcast(stateHits), Seq("h"), "left")
      .withColumn("borrowed",
        coalesce(col("in_state"), lit(false)) || col("batch_owner") < col("doc_id"))
    val perDoc = owned.groupBy("doc_id")
      .agg(
        sum("c").alias("n_chunks"),
        sum(when(col("borrowed"), col("c")).otherwise(lit(0L))).alias("borrowed_chunks"))
    val decisions = batch.select(col(idCol).alias("doc_id"))
      .join(perDoc, Seq("doc_id"), "left")
      .na.fill(0L, Seq("n_chunks", "borrowed_chunks"))
      .select(
        col("doc_id"), col("n_chunks"), col("borrowed_chunks"),
        when(col("n_chunks") > 0,
          round(col("borrowed_chunks") * lit(1000000.0) / col("n_chunks")).cast("long"))
          .alias("covered_micro"))
      .withColumn("keep",
        col("covered_micro").isNull || col("covered_micro") < maxCoveredMicro)
      .localCheckpoint()
    // ownership accrues from KEPT docs' previously-unseen fingerprints:
    // kept ids are batch-bounded by contract — broadcast them
    val keptIds = decisions.filter(col("keep")).select("doc_id")
    val newRows = owned.filter(!coalesce(col("in_state"), lit(false)))
      .join(broadcast(keptIds), Seq("doc_id"), "left_semi")
      .groupBy("h").agg(min("doc_id").alias("owner"))
    (decisions, newRows)
  }

  /** Retirement: ownership rows of retired docs leave the state —
    * future identical chunks are admitted as fresh ownership. The
    * takedown side broadcasts; the state scan stays map-side.
    */
  def retire(state: DataFrame, removedIds: DataFrame, idCol: String): DataFrame =
    state.join(
      broadcast(removedIds.select(col(idCol).cast("long").alias("owner")).distinct()),
      Seq("owner"), "left_anti")

  /** The per-micro-batch body (factored out for the replay spec) —
    * per-table acks, decisions first: a crash after the decisions
    * append but before the state write replays only the state side.
    */
  private[streaming] def applyBatch(
      batch: DataFrame,
      batchId: Long,
      idCol: String,
      contentCol: String,
      window: Int,
      divisor: Int,
      maxCoveredMicro: Long,
      sink: KVTableSink,
      table: String): Unit = {
    val spark = batch.sparkSession
    if (batch.head(1).isEmpty) return
    val needDecisions = !DedupIngest.alreadyApplied(spark, sink, s"${table}_decisions", batchId)
    val needState = !DedupIngest.alreadyApplied(spark, sink, s"${table}_chunks", batchId)
    if (!needDecisions && !needState) return
    val state = sink.read(spark, s"${table}_chunks", chunkStateSchema)
    val (decisions, newRows) = decide(
      state, batch, idCol, contentCol, window, divisor, maxCoveredMicro)
    if (needDecisions) {
      sink.write(
        decisions.withColumn("batch", lit(batchId)),
        s"${table}_decisions", SaveMode.Append)
      DedupIngest.markApplied(spark, sink, s"${table}_decisions", batchId)
    }
    if (needState) {
      sink.write(state.unionByName(newRows), s"${table}_chunks", SaveMode.Overwrite)
      DedupIngest.markApplied(spark, sink, s"${table}_chunks", batchId)
    }
  }

  /** Start the containment-dedup ingest: per batch, decisions append
    * to `<table>_decisions`, retained ownership accrues in
    * `<table>_chunks`.
    */
  def start(
      docs: DataFrame,
      sink: KVTableSink,
      table: String,
      checkpointDir: String,
      trigger: Trigger,
      idCol: String = "doc_id",
      contentCol: String = "text",
      window: Int = 8,
      divisor: Int = 16,
      maxCoveredMicro: Long = 500000L): StreamingQuery =
    docs.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        applyBatch(batch, batchId, idCol, contentCol, window, divisor,
          maxCoveredMicro, sink, table)
      }
      .start()
}
