package graft.streaming

import graft.functions.TextFunctions
import graft.functions.expressions.{CharEntropyExpr, CorpusStatsExpr, KmvSketchAgg}
import graft.operators.Kmv
import graft.sinks.KVTableSink
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types._

/** Streaming corpus data card —
  * [[graft.operators.TrainingPrep.dataCard]]'s bounded-state twin: the
  * per-source datasheet (docs, tokens, duplicate fraction, majority
  * language, mean character entropy) maintained live across an
  * unbounded ingest. Three state tables, each with the merge contract
  * its summary admits (the [[DistStats]] doctrine):
  *
  *  - `<table>_add(source, n_docs, n_texted, n_tokens, sum_ent_micro,
  *    n_retired_texted)` — pure additive longs (`n_texted` = docs with
  *    non-null text, the dup-fraction denominator's honest numerator
  *    base; `n_retired_texted` = texted docs retired since the last
  *    [[rebuildFp]], the sketch-staleness counter): batching-invariant
  *    AND exactly retirable (subtraction re-derives each removed doc's
  *    contribution from its text, the [[TokenizerStats]] pattern);
  *  - `<table>_lang(source, lang_pred, lc)` — additive votes, same
  *    contract;
  *  - `<table>_fp(source, h)` — the ≤ k KMV minima of the per-doc
  *    token-normalized fingerprints. Union is associative
  *    (batching-invariant), but an evicted minimum is unrecoverable,
  *    so the DISTINCT-DOC estimate (and therefore `dup_frac_est`) is
  *    approximate and NOT retirable — [[retire]] subtracts the exact
  *    tables and leaves the sketch, so after heavy takedowns the
  *    estimate reads STALE-high until [[rebuildFp]] re-sketches the
  *    survivors. The KMV trade is stated AND measured: [[card]] emits
  *    `fp_staleness` (retired-since-rebuild share of the sketch's
  *    doc mass) so a card consumer sees exactly how stale, not just
  *    "possibly stale".
  *
  * Replay / crash contract: every state write carries its own acks
  * (`last_batch_id`, `last_retire_id` columns, constant across the
  * table's rows) and the sink's Overwrite is an atomic swap — so a
  * state mutation and its ack commit TOGETHER. There is no window in
  * which a crash leaves a committed add or subtraction unacked (the
  * double-subtract hazard of a separate `__meta` ack table). For the
  * acks to survive, at least one row must survive every write — so
  * [[retire]] keeps fully-subtracted rows as ZEROS instead of pruning
  * them (the round-17 review's crash+takedown interleaving: a retire
  * that emptied a table lost `last_batch_id`, and a crash-replayed
  * ingest batch afterwards re-ADDED docs that were already counted).
  * Zero rows are bounded by |sources|, honest state ("source seen,
  * currently zero live docs" — the staleness counters stay visible),
  * and the next add merges onto them normally.
  *
  * At 100 TB: each batch pays one fused `corpus_stats`+`char_entropy`
  * scan of ITS OWN rows; every merge touches state-sized frames
  * (≤ |sources| + |sources|·|langs| + |sources|·k rows); [[card]]
  * reads the states alone — no corpus pass, ever.
  */
object DataCard {

  val addStateSchema: StructType = new StructType()
    .add("source", StringType)
    .add("n_docs", LongType, nullable = false)
    .add("n_texted", LongType, nullable = false)
    .add("n_tokens", LongType, nullable = false)
    .add("sum_ent_micro", LongType, nullable = false)
    .add("n_retired_texted", LongType, nullable = false)

  val langStateSchema: StructType = new StructType()
    .add("source", StringType)
    .add("lang_pred", StringType)
    .add("lc", LongType, nullable = false)

  val fpStateSchema: StructType = new StructType()
    .add("source", StringType)
    .add("h", LongType, nullable = false)

  // ==== in-state acks =======================================================

  /** On-disk layout of each state table: the logical rows plus the two
    * ack ids, constant across rows, committed ATOMICALLY with the data
    * by the sink's swap-write.
    */
  private def diskSchema(base: StructType): StructType =
    base.add("last_batch_id", LongType).add("last_retire_id", LongType)

  private final case class TableState(
      state: DataFrame, lastBatchId: Long, lastRetireId: Long)

  private def readState(
      spark: SparkSession,
      sink: KVTableSink,
      table: String,
      base: StructType): TableState = {
    val df = sink.read(spark, table, diskSchema(base))
    val ids = df.select("last_batch_id", "last_retire_id").head(1)
    val (b, r) = ids.headOption match {
      case Some(row) =>
        (if (row.isNullAt(0)) -1L else row.getLong(0),
         if (row.isNullAt(1)) -1L else row.getLong(1))
      case None => (-1L, -1L)
    }
    TableState(df.select(base.fieldNames.toIndexedSeq.map(col): _*), b, r)
  }

  private def writeState(
      sink: KVTableSink,
      table: String,
      state: DataFrame,
      lastBatchId: Long,
      lastRetireId: Long): Unit =
    sink.write(
      state
        .withColumn("last_batch_id", lit(lastBatchId))
        .withColumn("last_retire_id", lit(lastRetireId)),
      table, SaveMode.Overwrite)

  /** One fused scan of a batch's rows into the per-doc stats frame —
    * the same kernels and null semantics as the batch card (null text:
    * no tokens, no vote, no fingerprint, no entropy). [[applyBatch]]
    * materializes this ONCE per batch and all three merges consume the
    * checkpointed frame — the batch is never re-scanned per table.
    */
  private def docStats(batch: DataFrame, sourceCol: String, textCol: String): DataFrame =
    batch
      .select(
        col(sourceCol).alias("source"),
        CorpusStatsExpr.corpusStats(col(textCol)).as("cs"),
        CharEntropyExpr.charEntropy(col(textCol)).alias("ent_micro"))
      .select(
        col("source"),
        col("cs.n_tokens").alias("n_tokens"),
        col("cs.lang_pred").alias("lang_pred"),
        col("cs.fp").alias("fp"),
        col("ent_micro"))

  private def addDelta(st: DataFrame): DataFrame =
    st.groupBy("source")
      .agg(
        count(lit(1)).alias("n_docs"),
        count(col("fp")).alias("n_texted"),
        coalesce(sum("n_tokens"), lit(0L)).alias("n_tokens"),
        coalesce(sum("ent_micro"), lit(0L)).alias("sum_ent_micro"))

  private def langDelta(st: DataFrame): DataFrame =
    st.filter(col("lang_pred").isNotNull)
      .groupBy("source", "lang_pred")
      .agg(count(lit(1)).alias("lc"))

  /** Merge a batch's PRE-COMPUTED per-doc stats frame ([[docStats]]
    * output) into the additive state.
    */
  def mergeAddState(state: DataFrame, stats: DataFrame): DataFrame =
    StateMerge.fullOuterMerge(
      state, addDelta(stats).withColumn("n_retired_texted", lit(0L)),
      keyCols = Seq("source"),
      valueCombiners = Seq(
        "n_docs" -> StateMerge.addLong,
        "n_texted" -> StateMerge.addLong,
        "n_tokens" -> StateMerge.addLong,
        "sum_ent_micro" -> StateMerge.addLong,
        "n_retired_texted" -> StateMerge.addLong))

  def mergeLangState(state: DataFrame, stats: DataFrame): DataFrame =
    StateMerge.fullOuterMerge(
      state, langDelta(stats),
      keyCols = Seq("source", "lang_pred"),
      valueCombiners = Seq("lc" -> StateMerge.addLong))

  def mergeFpState(state: DataFrame, stats: DataFrame, k: Int): DataFrame = {
    val minima = stats
      .filter(col("fp").isNotNull)
      .groupBy("source")
      .agg(KmvSketchAgg.kmvSketch(TextFunctions.md5Hash60(col("fp")), k).alias("kmv"))
      .select(col("source"), explode(col("kmv")).alias("h"))
    state.unionByName(minima)
      .distinct()
      .withColumn("rn", row_number().over(Window.partitionBy("source").orderBy("h")))
      .filter(col("rn") <= k)
      .drop("rn")
  }

  /** The live card — read the three states, no corpus pass. Shape
    * matches the batch card with `dup_frac` replaced by the KMV
    * estimate pair (`est_distinct_fp`, `dup_frac_est`, clamped at 0 —
    * the estimator can overshoot `n_docs` on near-dup-free sources),
    * plus the staleness pair (`n_retired_texted`, `fp_staleness`): the
    * sketch was built over `n_texted + n_retired_texted` docs, so the
    * retired share IS the fraction of sketch mass that no longer
    * exists — 0 means `dup_frac_est` is as honest as KMV gets, and a
    * consumer can gate on it ("rebuild when staleness > 0.2").
    */
  def card(spark: SparkSession, sink: KVTableSink, table: String, k: Int): DataFrame = {
    val add = readState(spark, sink, s"${table}_add", addStateSchema).state
    val lang = readState(spark, sink, s"${table}_lang", langStateSchema).state
    val fp = readState(spark, sink, s"${table}_fp", fpStateSchema).state
    val w = Window.partitionBy("source").orderBy(col("lc").desc, col("lang_pred").asc)
    val top = lang
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("source"), col("lang_pred").alias("top_lang"),
        col("lc").alias("top_lang_docs"))
    add
      .join(broadcast(Kmv.estimateFromMinimaRows(fp, k)
        .withColumnRenamed("est_distinct", "est_distinct_fp")), Seq("source"), "left")
      .join(broadcast(top), Seq("source"), "left")
      .select(
        col("source"), col("n_docs"), col("n_texted"), col("n_tokens"),
        col("est_distinct_fp"),
        // duplicate mass only among TEXTED docs (the batch card's rule:
        // a null-text doc is not a duplicate of anything). A MISSING
        // sketch row (a crash between the _add and _fp writes, or a
        // concurrent read) defaults the estimate to n_texted — zero
        // claimed duplicates, the neutral reading — never to 0, which
        // would report the source as entirely duplicate. The clamp
        // absorbs estimator overshoot.
        // n_docs = 0 rows exist after a full retirement (zero rows are
        // the ack carriers) — every per-doc ratio reads 0.0 there, not
        // a 0/0 NaN
        when(col("n_docs") > 0L, greatest(lit(0.0),
          (col("n_texted") - coalesce(col("est_distinct_fp"), col("n_texted")))
            .cast("double") / col("n_docs").cast("double")))
          .otherwise(lit(0.0)).alias("dup_frac_est"),
        col("top_lang"), col("top_lang_docs"),
        when(col("n_docs") > 0L,
          col("top_lang_docs").cast("double") / col("n_docs").cast("double"))
          .otherwise(lit(0.0)).alias("top_lang_share"),
        col("sum_ent_micro"),
        when(col("n_docs") > 0L,
          col("sum_ent_micro").cast("double") / col("n_docs").cast("double") /
            lit(1000000.0)).otherwise(lit(0.0)).alias("mean_ent"),
        col("n_retired_texted"),
        when(col("n_texted") + col("n_retired_texted") > 0L,
          col("n_retired_texted").cast("double") /
            (col("n_texted") + col("n_retired_texted")).cast("double"))
          .otherwise(lit(0.0)).alias("fp_staleness"))
  }

  /** Exact retirement of the ADDITIVE tables: each removed doc's
    * contribution is re-derived from its text and subtracted; zeroed
    * rows are KEPT (they carry the in-state acks — see the object
    * scaladoc's crash contract); the per-source `n_retired_texted`
    * staleness counter absorbs the removed texted count. The fingerprint sketch
    * is NOT touched (an evicted minimum is unrecoverable) — see
    * [[rebuildFp]], and gate on [[card]]'s `fp_staleness`. The
    * subtraction commits atomically with its `last_retire_id` ack (the
    * in-state ack contract above), so a replayed `retireId` is a
    * no-op — never a double-subtract. `idCol` (when given) enforces
    * one row per doc.
    */
  def retire(
      removedDocs: DataFrame,
      sourceCol: String,
      textCol: String,
      sink: KVTableSink,
      table: String,
      retireId: Long,
      idCol: Option[String] = None): Unit = {
    val spark = removedDocs.sparkSession
    // read acks BEFORE touching removedDocs: a fully-acked replay must
    // not pay the stats scan
    val addSt = readState(spark, sink, s"${table}_add", addStateSchema)
    val langSt = readState(spark, sink, s"${table}_lang", langStateSchema)
    if (addSt.lastRetireId >= retireId && langSt.lastRetireId >= retireId) return
    val uniq = idCol.fold(removedDocs)(removedDocs.dropDuplicates(_))
    val st = docStats(uniq, sourceCol, textCol).localCheckpoint(true)
    // clamped at zero: a retire of docs never ingested (or a mismatched
    // slice) would otherwise leave persistent NEGATIVE counters that the
    // card's n_docs > 0 guards silently mask as 0.0 ratios — floor the
    // merge so the worst a bad retire input can do is zero a row out,
    // the same state an exact full retirement leaves
    val subLong = (a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =>
      greatest(coalesce(a, lit(0L)) - coalesce(b, lit(0L)), lit(0L))
    if (addSt.lastRetireId < retireId) {
      // the removed TEXTED count moves from n_texted into the
      // staleness counter — same delta column, opposite sign
      val delta = addDelta(st).withColumn("n_retired_texted", col("n_texted"))
      // fully-subtracted rows stay as ZEROS — pruning them here could
      // empty the table and lose the in-state acks (see the replay /
      // crash contract in the object scaladoc)
      writeState(sink, s"${table}_add",
        StateMerge.fullOuterMerge(addSt.state, delta, Seq("source"), Seq(
            "n_docs" -> subLong, "n_texted" -> subLong,
            "n_tokens" -> subLong, "sum_ent_micro" -> subLong,
            "n_retired_texted" -> StateMerge.addLong)),
        addSt.lastBatchId, retireId)
    }
    if (langSt.lastRetireId < retireId) {
      writeState(sink, s"${table}_lang",
        StateMerge.fullOuterMerge(langSt.state, langDelta(st),
            Seq("source", "lang_pred"), Seq("lc" -> subLong)),
        langSt.lastBatchId, retireId)
    }
  }

  /** Re-sketch the fingerprint minima from the surviving corpus — the
    * post-takedown path that makes `dup_frac_est` honest again. One
    * pass over `survivors` (the corpus read the sketch otherwise never
    * needs), state back to ≤ k rows per source; the `_add` staleness
    * counter resets to 0. (Two table writes: a crash between them
    * leaves the counter un-reset — staleness OVER-reported until the
    * rebuild is re-run, the conservative side of the window.)
    */
  def rebuildFp(
      survivors: DataFrame,
      sourceCol: String,
      textCol: String,
      sink: KVTableSink,
      table: String,
      k: Int): Unit = {
    val spark = survivors.sparkSession
    val empty = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], fpStateSchema)
    val fpSt = readState(spark, sink, s"${table}_fp", fpStateSchema)
    writeState(sink, s"${table}_fp",
      mergeFpState(empty, docStats(survivors, sourceCol, textCol), k),
      fpSt.lastBatchId, fpSt.lastRetireId)
    val addSt = readState(spark, sink, s"${table}_add", addStateSchema)
    writeState(sink, s"${table}_add",
      addSt.state.withColumn("n_retired_texted", lit(0L)),
      addSt.lastBatchId, addSt.lastRetireId)
  }

  /** Per-table in-state acks: a crash between state writes must not
    * double-add on replay — and cannot, because each table's ack
    * commits in the same atomic swap as its data.
    */
  private[streaming] def applyBatch(
      batch: DataFrame,
      batchId: Long,
      sourceCol: String,
      textCol: String,
      k: Int,
      sink: KVTableSink,
      table: String): Unit = {
    val spark = batch.sparkSession
    if (batch.head(1).isEmpty) return
    val addSt = readState(spark, sink, s"${table}_add", addStateSchema)
    val langSt = readState(spark, sink, s"${table}_lang", langStateSchema)
    val fpSt = readState(spark, sink, s"${table}_fp", fpStateSchema)
    if (addSt.lastBatchId >= batchId && langSt.lastBatchId >= batchId &&
        fpSt.lastBatchId >= batchId) return
    // ONE fused kernel pass over the batch; all three merges consume
    // the checkpointed stats frame (per-doc scalars — tiny vs text)
    val st = docStats(batch, sourceCol, textCol).localCheckpoint(true)
    if (addSt.lastBatchId < batchId) {
      writeState(sink, s"${table}_add", mergeAddState(addSt.state, st),
        batchId, addSt.lastRetireId)
    }
    if (langSt.lastBatchId < batchId) {
      writeState(sink, s"${table}_lang", mergeLangState(langSt.state, st),
        batchId, langSt.lastRetireId)
    }
    if (fpSt.lastBatchId < batchId) {
      writeState(sink, s"${table}_fp", mergeFpState(fpSt.state, st, k),
        batchId, fpSt.lastRetireId)
    }
  }

  /** Start the card ingest over a streaming frame. */
  def start(
      docs: DataFrame,
      sink: KVTableSink,
      table: String,
      checkpointDir: String,
      trigger: Trigger,
      sourceCol: String = "source",
      textCol: String = "text",
      k: Int = 256): StreamingQuery =
    docs.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        applyBatch(batch, batchId, sourceCol, textCol, k, sink, table)
      }
      .start()
}
