package graft.streaming

import graft.operators.{Bpe, Vocab}
import graft.sinks.KVTableSink
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types._

/** Streaming tokenizer-statistics ingest: keeps the curation
  * dashboards' tables LIVE during ingest — q96's vocab-coverage input
  * (the subword count table) and q98's per-source fertility totals —
  * maintained incrementally per micro-batch against a FROZEN merge
  * list. Both states are pure additive counts, so each trigger is one
  * q02-shape full-outer merge of the batch's aggregate into the state:
  * the final state after any batch partitioning equals the batch
  * computation over the union (spec-pinned), independent of arrival
  * order.
  *
  * The merge list is frozen by contract, exactly like the semantic
  * tiers' quantizer: retraining BPE mid-stream would re-segment
  * history, silently mixing two tokenizers' counts in one table —
  * refresh is a batch decision that rebuilds the state.
  *
  * At 100 TB: per-trigger cost is the batch's distinct-word kernel
  * (`Bpe.tokenStream` / `Bpe.groupTokenStats`) plus a merge keyed on
  * the bounded token vocabulary (≤ |alphabet| + |merges| rows) and the
  * source key (mixture-config-scale) — corpus text is never re-read,
  * and neither state grows with the corpus.
  */
object TokenizerStats {

  val tokenStateSchema: StructType = new StructType()
    .add("token", StringType, nullable = false)
    .add("cnt", LongType, nullable = false)

  val sourceStateSchema: StructType = new StructType()
    .add("source", StringType, nullable = true)
    .add("n_docs", LongType, nullable = false)
    .add("n_tokens", LongType, nullable = false)
    .add("n_chars", LongType, nullable = false)

  /** One batch's subword counts merged into the `(token, cnt)` state —
    * q02's associative/commutative full-outer sum per token (tokens are
    * never null: they are substrings of whitespace-split words).
    */
  def mergeTokenState(
      state: DataFrame,
      batch: DataFrame,
      textCol: String,
      merges: Seq[(String, String)]): DataFrame =
    StateMerge.fullOuterMerge(
      state,
      Bpe.tokenStream(batch, textCol, merges)
        .groupBy("token").agg(count(lit(1)).alias("cnt")),
      keyCols = Seq("token"),
      valueCombiners = Seq("cnt" -> StateMerge.addLong))

  /** One batch's per-source fertility totals merged into the
    * `(source, n_docs, n_tokens, n_chars)` state. The join is
    * NULL-SAFE on the source key: a null source is a real group (both
    * engines' GROUP BY semantics), not a non-match.
    */
  def mergeSourceState(
      state: DataFrame,
      batch: DataFrame,
      groupCol: String,
      textCol: String,
      merges: Seq[(String, String)]): DataFrame =
    StateMerge.fullOuterMerge(
      state,
      Bpe.groupTokenStats(batch, groupCol, textCol, merges)
        .withColumnRenamed(groupCol, "source"),
      keyCols = Seq("source"),
      valueCombiners = Seq(
        "n_docs" -> StateMerge.addLong,
        "n_tokens" -> StateMerge.addLong,
        "n_chars" -> StateMerge.addLong))

  /** The per-micro-batch body (factored out for the replay spec): each
    * state table merges behind its OWN batch-id ack (the unified exact
    * tier's discipline) — a replay after a crash between the token
    * write and the source write re-merges only the table that never
    * acked, so neither count table can double-apply a batch. The
    * remaining exposure is the single write-vs-ack rename window per
    * table (the single-tier pipelines' documented contract).
    */
  private[streaming] def applyBatch(
      batch: DataFrame,
      batchId: Long,
      groupCol: String,
      textCol: String,
      merges: Seq[(String, String)],
      sink: KVTableSink,
      table: String): Unit = {
    val spark = batch.sparkSession
    if (batch.head(1).isEmpty || DedupIngest.alreadyApplied(spark, sink, table, batchId)) return
    if (!DedupIngest.alreadyApplied(spark, sink, s"${table}__tokens", batchId)) {
      val tokState = sink.read(spark, s"${table}__tokens", tokenStateSchema)
      sink.write(
        mergeTokenState(tokState, batch, textCol, merges),
        s"${table}__tokens", SaveMode.Overwrite)
      DedupIngest.markApplied(spark, sink, s"${table}__tokens", batchId)
    }
    if (!DedupIngest.alreadyApplied(spark, sink, s"${table}__sources", batchId)) {
      val srcState = sink.read(spark, s"${table}__sources", sourceStateSchema)
      sink.write(
        mergeSourceState(srcState, batch, groupCol, textCol, merges),
        s"${table}__sources", SaveMode.Overwrite)
      DedupIngest.markApplied(spark, sink, s"${table}__sources", batchId)
    }
    DedupIngest.markApplied(spark, sink, table, batchId)
  }

  /** Document RETIREMENT through the tokenizer-statistics states — the
    * [[DedupIngest.retireUnified]] family's discipline applied to the
    * two additive count tables: the retired docs' subword counts and
    * per-source fertility totals are recomputed with the SAME frozen
    * merge list and subtracted (the exact negation of what
    * [[applyBatch]] added, which is what makes the reversal exact).
    * Tokens/sources whose counts reach zero leave their tables.
    *
    * Contract mirrors [[graft.streaming.SearchIndex.retire]]:
    * `removedDocs` are the rows AS INGESTED and a subset of the
    * ingested stream (retiring a never-ingested or since-edited row
    * under-/over-subtracts); `retireId`s are monotone per deployment;
    * subtractions are not idempotent and sit behind per-table acks in
    * their own `__retire` meta namespace; single-writer maintenance.
    */
  def retire(
      removedDocs: DataFrame,
      groupCol: String,
      textCol: String,
      merges: Seq[(String, String)],
      sink: KVTableSink,
      table: String,
      retireId: Long,
      idCol: Option[String] = None): Unit = {
    val spark = removedDocs.sparkSession
    if (DedupIngest.alreadyApplied(spark, sink, s"${table}__retire", retireId)) return
    // the count subtractions below are NOT idempotent per row: a work
    // list carrying the same doc twice double-subtracts silently.
    // With an id column available, enforce one row per doc here; a
    // caller without one owns the uniqueness contract (full-row dedup
    // would be WRONG — two distinct docs may share group and text,
    // and each must subtract)
    val uniq = idCol.fold(removedDocs)(removedDocs.dropDuplicates(_))
    val removed = uniq
      .select(col(groupCol).alias(groupCol), col(textCol).cast("string").alias(textCol))
      .localCheckpoint(true)
    if (!DedupIngest.alreadyApplied(spark, sink, s"${table}__tokens__retire", retireId)) {
      val tokState = sink.read(spark, s"${table}__tokens", tokenStateSchema)
      val merged = StateMerge.fullOuterMerge(
        tokState,
        Bpe.tokenStream(removed, textCol, merges)
          .groupBy("token").agg((-count(lit(1))).alias("cnt")),
        keyCols = Seq("token"),
        valueCombiners = Seq("cnt" -> StateMerge.addLong))
        .filter(col("cnt") > 0)
      sink.write(merged, s"${table}__tokens", SaveMode.Overwrite)
      DedupIngest.markApplied(spark, sink, s"${table}__tokens__retire", retireId)
    }
    if (!DedupIngest.alreadyApplied(spark, sink, s"${table}__sources__retire", retireId)) {
      val srcState = sink.read(spark, s"${table}__sources", sourceStateSchema)
      val merged = StateMerge.fullOuterMerge(
        srcState,
        Bpe.groupTokenStats(removed, groupCol, textCol, merges)
          .withColumnRenamed(groupCol, "source")
          .select(col("source"), (-col("n_docs")).alias("n_docs"),
            (-col("n_tokens")).alias("n_tokens"), (-col("n_chars")).alias("n_chars")),
        keyCols = Seq("source"),
        valueCombiners = Seq(
          "n_docs" -> StateMerge.addLong,
          "n_tokens" -> StateMerge.addLong,
          "n_chars" -> StateMerge.addLong))
        .filter(col("n_docs") > 0)
      sink.write(merged, s"${table}__sources", SaveMode.Overwrite)
      DedupIngest.markApplied(spark, sink, s"${table}__sources__retire", retireId)
    }
    DedupIngest.markApplied(spark, sink, s"${table}__retire", retireId)
  }

  /** Start the tokenizer-stats ingest over a document stream. */
  def start(
      docs: DataFrame,
      groupCol: String,
      textCol: String,
      merges: Seq[(String, String)],
      sink: KVTableSink,
      table: String,
      checkpointDir: String,
      trigger: Trigger): StreamingQuery =
    docs.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        applyBatch(batch, batchId, groupCol, textCol, merges, sink, table)
      }
      .start()

  /** q96's coverage curve served FROM the maintained state — no corpus
    * scan, just the top-V tail over the bounded count table.
    */
  def vocabCoverage(
      spark: SparkSession,
      sink: KVTableSink,
      table: String,
      topV: Int): DataFrame =
    Vocab.coverageFromCounts(
      sink.read(spark, s"${table}__tokens", tokenStateSchema), "token", "cnt", topV)

  /** q98's fertility table served from the maintained state. */
  def sourceStats(
      spark: SparkSession,
      sink: KVTableSink,
      table: String): DataFrame =
    sink.read(spark, s"${table}__sources", sourceStateSchema)
      .withColumn("chars_per_token",
        col("n_chars").cast("double") / col("n_tokens").cast("double"))
}
