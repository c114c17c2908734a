package graft.streaming

import graft.operators.Sampling
import graft.sinks.KVTableSink
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types._

/** Streaming weighted reservoir — [[Sampling.weightedSample]]'s
  * bounded-state twin: maintain, per group, the top-`k` A-ES
  * priorities seen across ALL triggers. The classic distributed
  * weighted-reservoir argument makes this exact, not approximate:
  * priorities are row-intrinsic (`ln(u)/w` from the row's own seeded
  * hash), so
  *
  *   top-k(A ∪ B) = top-k( top-k(A) ∪ top-k(B) )
  *
  * — each batch pre-trims to its own ≤ k rows per group map-side, the
  * merge unions two ≤ k sets and re-trims, and the state after any
  * batching equals the one-pass batch sample over everything ingested
  * (spec-pinned). State is ≤ k rows per group, independent of stream
  * lifetime.
  *
  * Replay: per-batch ack (the [[DistStats]] doctrine) — priorities are
  * deterministic, so even an UNACKED replay merges identical rows
  * (dropDuplicates on the key makes the merge idempotent); the ack
  * just skips the work.
  *
  * Retirement ([[retire]]): retired ids are deleted from the
  * reservoir — what remains is exactly the top-(k − m) of the
  * surviving seen rows. The reservoir then REFILLS only from future
  * batches: candidates evicted before the retirement are gone (the
  * KMV trade — an evicted row is unrecoverable), so a takedown-heavy
  * corpus that needs an always-full exact sample should rebuild from
  * the survivors instead. Documented, not silent.
  */
object WeightedReservoir {

  val stateSchema: StructType = new StructType()
    .add("grp", StringType)
    .add("id", LongType, nullable = false)
    .add("w", DoubleType, nullable = false)
    .add("pri_micro", LongType, nullable = false)

  private def topK(df: DataFrame, k: Int): DataFrame = {
    val w = Window.partitionBy("grp").orderBy(col("pri_micro").desc, col("id").asc)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= k)
      .drop("__rn")
  }

  /** One batch folded into the reservoir: pre-trim the batch to its
    * own per-group top-k (map-side bounded — the full batch never
    * reaches the merge), union with the ≤ k-row state, re-trim.
    */
  def mergeState(
      state: DataFrame,
      batch: DataFrame,
      groupCol: String,
      idCol: String,
      weightCol: String,
      k: Int,
      seed: Long): DataFrame = {
    val trimmed = Sampling
      .weightedSample(
        batch.select(
          col(groupCol).cast("string").alias("grp"),
          col(idCol).cast("long").alias("id"),
          col(weightCol).cast("double").alias("w")),
        "grp", "id", "w", k, seed)
      .select(col("grp"), col("id"), col("w"), col("pri_micro"))
    // same id re-ingested later (or replayed unacked) carries the same
    // deterministic priority — one row per (grp, id) keeps the merge
    // idempotent
    topK(state.unionByName(trimmed).dropDuplicates("grp", "id"), k)
  }

  /** Delete retired ids from the reservoir (see the class-level
    * retirement contract: exact for what remains, refills only from
    * the future).
    *
    * No broadcast hint on `removedIds`: a mass-takedown list is
    * unbounded while the state side is <= k rows per group — forcing
    * the unbounded side driver-resident would be the wrong build
    * side. AQE picks the small build at runtime.
    */
  def retire(
      spark: SparkSession,
      sink: KVTableSink,
      table: String,
      removedIds: DataFrame,
      idCol: String): Unit = {
    val state = sink.read(spark, table, stateSchema)
    val rem = removedIds.select(col(idCol).cast("long").alias("id")).distinct()
    sink.write(
      state.join(rem, Seq("id"), "left_anti"),
      table, SaveMode.Overwrite)
  }

  /** The current sample — read the state, no corpus pass. */
  def sample(spark: SparkSession, sink: KVTableSink, table: String): DataFrame =
    sink.read(spark, table, stateSchema)

  private[streaming] def applyBatch(
      batch: DataFrame,
      batchId: Long,
      groupCol: String,
      idCol: String,
      weightCol: String,
      k: Int,
      seed: Long,
      sink: KVTableSink,
      table: String): Unit = {
    val spark = batch.sparkSession
    if (batch.head(1).isEmpty) return
    if (DedupIngest.alreadyApplied(spark, sink, table, batchId)) return
    val state = sink.read(spark, table, stateSchema)
    sink.write(
      mergeState(state, batch, groupCol, idCol, weightCol, k, seed),
      table, SaveMode.Overwrite)
    DedupIngest.markApplied(spark, sink, table, batchId)
  }

  /** Start the reservoir ingest over a streaming frame. */
  def start(
      docs: DataFrame,
      sink: KVTableSink,
      table: String,
      checkpointDir: String,
      trigger: Trigger,
      groupCol: String,
      idCol: String,
      weightCol: String,
      k: Int,
      seed: Long = 42L): StreamingQuery =
    docs.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        applyBatch(batch, batchId, groupCol, idCol, weightCol, k, seed, sink, table)
      }
      .start()
}
