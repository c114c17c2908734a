package graft.streaming

import graft.operators.NgramLm
import graft.sinks.KVTableSink
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types._

/** Streaming DSIR selection — [[NgramLm.importanceSelectWith]]'s
  * bounded-state twin: maintain the top-`k` importance-weighted Gumbel
  * keys seen across ALL triggers, scored against two FROZEN persisted
  * LMs ([[NgramLm.saveLm]] artifacts — training is a batch decision
  * taken on corpus drift, the frozen-quantizer doctrine).
  *
  * Exactness argument (the [[WeightedReservoir]] lemma, verbatim): the
  * selection key `lw_micro + gum_micro` is ROW-INTRINSIC — a pure
  * function of the row's own text (through the frozen LMs) and id
  * (through the seeded Gumbel) — so
  *
  *   top-k(A ∪ B) = top-k( top-k(A) ∪ top-k(B) )
  *
  * and the state after any batching equals the one-pass batch draw
  * over everything ingested (spec-pinned). Each batch scores only its
  * own rows against the LMs (gram-keyed joins, batch-sized probe),
  * pre-trims map-side to ≤ k, merges with the ≤ k state, re-trims:
  * state is ≤ k rows regardless of stream lifetime, and the corpus is
  * never re-scored.
  *
  * Replay: per-batch ack (the [[DistStats]] doctrine); keys are
  * deterministic, so an unacked replay merges identical rows and
  * `dropDuplicates(id)` keeps the fold idempotent.
  *
  * Retirement: [[retire]] deletes ids from the reservoir — the
  * survivors are exactly the top-(k − m) of the surviving seen rows;
  * refill happens only from future batches (the documented
  * evicted-candidate caveat, as in [[WeightedReservoir.retire]]).
  */
object DsirSelect {

  val stateSchema: StructType = new StructType()
    .add("doc_id", LongType, nullable = false)
    .add("n_bigrams", LongType, nullable = false)
    .add("ll_t_micro", LongType, nullable = false)
    .add("ll_r_micro", LongType, nullable = false)
    .add("lw_micro", LongType, nullable = false)
    .add("gum_micro", LongType, nullable = false)
    .add("key_micro", LongType, nullable = false)

  private val cols = stateSchema.fieldNames.map(col).toSeq

  private def topK(df: DataFrame, k: Int): DataFrame = {
    val w = Window.orderBy(col("key_micro").desc, col("doc_id").asc)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= k)
      .drop("__rn")
  }

  /** One batch folded in: score against the frozen LMs, pre-trim to
    * the batch's own top-k, union with the ≤ k state, re-trim. The
    * global single-partition window runs over ≤ 2k rows — the batch
    * side is cut by a TakeOrdered first, so no corpus-sized frame ever
    * reaches a single task.
    */
  def mergeState(
      state: DataFrame,
      batch: DataFrame,
      idCol: String,
      textCol: String,
      tgtLm: NgramLm.LmTables,
      rawLm: NgramLm.LmTables,
      k: Int,
      backoff: Double,
      seed: Long): DataFrame = {
    val trimmed = NgramLm
      .importanceSelectWith(batch, idCol, textCol, tgtLm, rawLm, k, backoff, seed)
      .select(cols: _*)
    topK(state.unionByName(trimmed).dropDuplicates("doc_id"), k)
  }

  /** The current selection — read the ≤ k-row state, rank it; no
    * corpus pass, no LM join.
    */
  def selection(spark: SparkSession, sink: KVTableSink, table: String): DataFrame = {
    val w = Window.orderBy(col("key_micro").desc, col("doc_id").asc)
    sink.read(spark, table, stateSchema)
      .withColumn("rank", row_number().over(w).cast("long"))
  }

  /** Delete retired ids (takedown) — exact for what remains, refills
    * only from future batches.
    */
  def retire(
      spark: SparkSession,
      sink: KVTableSink,
      table: String,
      removedIds: DataFrame,
      idCol: String): Unit = {
    val state = sink.read(spark, table, stateSchema)
    // no broadcast hint: the takedown list is the unbounded side, the
    // <=k state is the tiny one — let AQE pick the build side
    val rem = removedIds.select(col(idCol).cast("long").alias("doc_id")).distinct()
    sink.write(
      state.join(rem, Seq("doc_id"), "left_anti"),
      table, SaveMode.Overwrite)
  }

  private[streaming] def applyBatch(
      batch: DataFrame,
      batchId: Long,
      idCol: String,
      textCol: String,
      tgtLm: NgramLm.LmTables,
      rawLm: NgramLm.LmTables,
      k: Int,
      backoff: Double,
      seed: Long,
      sink: KVTableSink,
      table: String): Unit = {
    val spark = batch.sparkSession
    if (batch.head(1).isEmpty) return
    if (DedupIngest.alreadyApplied(spark, sink, table, batchId)) return
    val state = sink.read(spark, table, stateSchema)
    sink.write(
      mergeState(state, batch, idCol, textCol, tgtLm, rawLm, k, backoff, seed),
      table, SaveMode.Overwrite)
    DedupIngest.markApplied(spark, sink, table, batchId)
  }

  /** Start the selection ingest. The LM artifacts are loaded ONCE at
    * start (vocabulary-bounded count tables) and pinned for the
    * query's lifetime — swap by restarting, the frozen-model contract.
    */
  def start(
      docs: DataFrame,
      tgtLmPath: String,
      rawLmPath: String,
      sink: KVTableSink,
      table: String,
      checkpointDir: String,
      trigger: Trigger,
      idCol: String,
      textCol: String,
      k: Int,
      backoff: Double = 0.4,
      seed: Long = 42L): StreamingQuery = {
    val spark = docs.sparkSession
    val tgtLm = NgramLm.loadLm(spark, tgtLmPath)
    val rawLm = NgramLm.loadLm(spark, rawLmPath)
    docs.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        applyBatch(batch, batchId, idCol, textCol, tgtLm, rawLm, k, backoff,
          seed, sink, table)
      }
      .start()
  }
}
