package graft.streaming

import graft.operators.NgramLm
import graft.sinks.KVTableSink
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types._

/** Streaming quality-profile ingest: q104's per-source NLL histogram
  * kept LIVE during ingest — each micro-batch is scored against a
  * FROZEN persisted bigram LM ([[graft.operators.NgramLm.saveLm]])
  * and rolled into a `(source, nll_bin)` state table. The curation
  * dashboard that says which domains are shipping junk RIGHT NOW,
  * without re-scanning the corpus.
  *
  * The state is fully mergeable by construction: `n_docs` is an
  * additive count; `best_nll` is the max and `worst_nll` the min
  * (LESS negative avg NLL = better fit) — all three are
  * associative+commutative, so the final state after ANY batch
  * partitioning equals the q104-shape batch rollup over the union
  * with the same LM (spec-pinned), independent of arrival order. The
  * LM is frozen by the same contract as the tokenizer-stats merge
  * list and the semantic tiers' quantizer: re-training mid-stream
  * would score history and future with different models in one table;
  * refresh is a batch decision that rebuilds the state.
  *
  * At 100 TB: per-trigger cost is the batch's gram explode plus
  * LM-keyed shuffle joins (the q101 scale shape — the LM is never
  * broadcast or collected) and a merge keyed on (source, bin) —
  * mixture-config × histogram-width scale, so the state never grows
  * with the corpus.
  *
  * Document RETIREMENT is deliberately NOT offered here, unlike the
  * other maintained states (`DedupIngest.retireUnified`,
  * `SearchIndex.retire`, `TokenizerStats.retire`): `n_docs` is
  * subtractable, but `best_nll`/`worst_nll` are extrema — retiring the
  * doc that set a bin's max cannot restore the runner-up without
  * rescanning that bin's survivors, which the state does not hold.
  * Retirement for this dashboard is a rebuild from the surviving
  * snapshot (cheap: one scoring pass against the same frozen LM); a
  * subtract-counts-only retire would silently turn the extrema into
  * historical watermarks and was rejected for that reason.
  */
object QualityProfile {

  val stateSchema: StructType = new StructType()
    .add("source", StringType, nullable = true)
    .add("nll_bin", LongType, nullable = false)
    .add("n_docs", LongType, nullable = false)
    .add("best_nll", DoubleType, nullable = false)
    .add("worst_nll", DoubleType, nullable = false)

  /** One batch's q104-shape rollup against the frozen LM: per
    * (group, unit-width NLL bin) doc count and exact score range.
    * Unscorable docs (<2 tokens) emit nothing — same population rule
    * as the batch query.
    */
  def profileDelta(
      batch: DataFrame,
      idCol: String,
      textCol: String,
      groupCol: String,
      lm: NgramLm.LmTables): DataFrame =
    NgramLm.score(batch, idCol, textCol, lm)
      .join(
        batch.select(col(idCol).alias("doc_id"), col(groupCol).alias("source")),
        Seq("doc_id"))
      .select(col("source"), col("avg_nll"),
        floor(col("avg_nll")).cast("long").alias("nll_bin"))
      .groupBy("source", "nll_bin")
      .agg(
        count(lit(1)).alias("n_docs"),
        max("avg_nll").alias("best_nll"),
        min("avg_nll").alias("worst_nll"))

  /** Merge a delta into the state: sum counts, max/min the range — the
    * shared [[StateMerge]] null-safe full-outer merge on the
    * (source, bin) key (`least`/`greatest` skip the null side of a key
    * present in only one input).
    */
  def mergeState(state: DataFrame, delta: DataFrame): DataFrame =
    StateMerge.fullOuterMerge(
      state, delta,
      keyCols = Seq("source", "nll_bin"),
      valueCombiners = Seq(
        "n_docs" -> StateMerge.addLong,
        "best_nll" -> ((a, b) => greatest(a, b)),
        "worst_nll" -> ((a, b) => least(a, b))))

  /** The per-micro-batch body (factored out for the replay spec):
    * single state table behind the batch-id ack — a replayed batch id
    * is a no-op, and the delta is a pure function of (batch, LM), so
    * a crash-replay recomputes the same merge.
    */
  private[streaming] def applyBatch(
      batch: DataFrame,
      batchId: Long,
      idCol: String,
      textCol: String,
      groupCol: String,
      lmPath: String,
      sink: KVTableSink,
      table: String): Unit = {
    val spark = batch.sparkSession
    if (batch.head(1).isEmpty || DedupIngest.alreadyApplied(spark, sink, table, batchId)) return
    val lm = NgramLm.loadLm(spark, lmPath)
    val state = sink.read(spark, table, stateSchema)
    sink.write(
      mergeState(state, profileDelta(batch, idCol, textCol, groupCol, lm)),
      table, SaveMode.Overwrite)
    DedupIngest.markApplied(spark, sink, table, batchId)
  }

  /** Start the live quality-profile ingest over a document stream. */
  def start(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      groupCol: String,
      lmPath: String,
      sink: KVTableSink,
      table: String,
      checkpointDir: String,
      trigger: Trigger): StreamingQuery =
    docs.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        applyBatch(batch, batchId, idCol, textCol, groupCol, lmPath, sink, table)
      }
      .start()
}
