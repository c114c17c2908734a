package graft.streaming

import graft.operators.{Mixture, Sampling}
import graft.sinks.KVTableSink
import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types._

/** Streaming learned-mixture twin — q161's multiplicative-weights
  * trainer maintained INCREMENTALLY over micro-batches, in the
  * [[StreamQuota]]/[[StreamBoiler]] frozen-vs-live pattern: the live
  * state accumulates per-source sufficient statistics (`n_docs`,
  * `n_pos` — mergeable counts, so state after ANY trigger
  * partitioning equals one batch pass over the union), the trainer
  * RE-LEARNS from that state on refresh ([[learnedTable]] — the
  * identical driver-side integer-micro trainer the batch operator
  * runs, via [[Mixture.learnedRatesLocal]]), and ingest applies the
  * FROZEN rates as a stateless scan-side hash predicate
  * ([[applyFrozen]]) until the next refresh. Spec-pinned:
  * streamed-final rates ≡ the batch trainer on the same prefix, any
  * batching.
  *
  * Why sufficient statistics and not incremental weights: the
  * multiplicative-weights update is order-dependent (30 rounds over
  * the FINAL quality table), so "fold the trainer over triggers"
  * would diverge from the batch operator the oracle pins. Counts
  * merge exactly; the trainer is config-scale driver arithmetic (one
  * row per source) — re-learning from state costs microseconds and
  * keeps live ≡ batch bit-for-bit.
  *
  * State size: one row per SOURCE (mixture sources are config-scale
  * by the q73/q161 contract). Replay: merges behind the
  * [[DedupIngest.alreadyApplied]] batch-id ack.
  */
object StreamMixture {

  val stateSchema: StructType = new StructType()
    .add("source", StringType, nullable = false)
    .add("n_docs", LongType, nullable = false)
    .add("n_pos", LongType, nullable = false)

  /** One batch's per-source counts merged into the state. Null
    * sources are excluded (the batch operator's `sourceQuality`
    * rule).
    */
  def mergeState(
      state: DataFrame,
      batch: DataFrame,
      sourceCol: String,
      positive: Column): DataFrame = {
    val delta = batch
      .filter(col(sourceCol).isNotNull)
      .groupBy(col(sourceCol).cast("string").alias("source"))
      .agg(
        count(lit(1)).alias("n_docs"),
        sum(when(positive, 1L).otherwise(0L)).alias("n_pos"))
    StateMerge.fullOuterMerge(
      state, delta,
      keyCols = Seq("source"),
      valueCombiners = Seq(
        "n_docs" -> StateMerge.addLong,
        "n_pos" -> StateMerge.addLong))
  }

  private[streaming] def applyBatch(
      batch: DataFrame,
      batchId: Long,
      sourceCol: String,
      positive: Column,
      sink: KVTableSink,
      table: String): Unit = {
    val spark = batch.sparkSession
    if (batch.head(1).isEmpty ||
      DedupIngest.alreadyApplied(spark, sink, table, batchId)) return
    val st = sink.read(spark, table, stateSchema)
    sink.write(
      mergeState(st, batch, sourceCol, positive), table, SaveMode.Overwrite)
    DedupIngest.markApplied(spark, sink, table, batchId)
  }

  /** RE-LEARN from the live state: exactly the batch operator's
    * learned table — `(source, n_docs, quality_micro, weight_micro,
    * n_target, rate_pm)` — over the documents the stream has seen so
    * far. `quality_micro` derives from the state counts by the same
    * HALF_UP rounding as the batch `sourceQuality` aggregate.
    */
  def learnedTable(
      spark: SparkSession,
      sink: KVTableSink,
      table: String,
      budgetPermille: Int,
      iters: Int = 30,
      lr: Double = 0.5,
      epsMicro: Long = 100000L): DataFrame = {
    import spark.implicits._
    val stats = sink.read(spark, table, stateSchema)
      .select(
        col("source"),
        col("n_docs"),
        round(col("n_pos").cast("double") * lit(1000000.0)
          / col("n_docs").cast("double")).cast("long").alias("quality_micro"))
      .collect() // one row per source — config-scale by contract
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .toSeq
    Mixture
      .learnedRatesLocal(stats, budgetPermille, iters, lr, epsMicro)
      .toDF("source", "n_docs", "quality_micro", "weight_micro",
        "n_target", "rate_pm")
  }

  /** Apply a FROZEN learned table to a (possibly streaming) frame —
    * the stateless deployment half: broadcast rates + the
    * deterministic scan-side hash predicate, identical to the batch
    * operator's tail, so it chains in front of any streaming ingest.
    */
  def applyFrozen(
      docs: DataFrame,
      keyCol: String,
      sourceCol: String,
      rates: DataFrame): DataFrame =
    docs
      .select(col(keyCol), col(sourceCol).alias("source"))
      .join(broadcast(rates), Seq("source"))
      .filter(Sampling.hashBucket(col(keyCol), 1000) < col("rate_pm"))

  /** Start the statistics observer over a streaming frame. */
  def start(
      docs: DataFrame,
      positive: Column,
      sink: KVTableSink,
      table: String,
      checkpointDir: String,
      trigger: Trigger,
      sourceCol: String = "source"): StreamingQuery =
    docs.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        applyBatch(batch, batchId, sourceCol, positive, sink, table)
      }
      .start()
}
