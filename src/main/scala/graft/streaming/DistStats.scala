package graft.streaming

import graft.functions.TextFunctions
import graft.functions.expressions.KmvSketchAgg
import graft.operators.{HistQuantile, Kmv}
import graft.sinks.KVTableSink
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types._

/** Streaming distribution statistics — the running per-source corpus
  * profile for an unbounded ingest, in bounded state: the token-count
  * log histogram (≤ 64 longs per source, [[HistQuantile]]) and the
  * distinct-token KMV sketch (k longs per source, [[Kmv]]), maintained
  * together per micro-batch in one sink.
  *
  * Merge contracts differ by summary, and the state shapes encode it:
  *
  *  - **histogram**: counts ADD (and subtract — [[retireHist]] is the
  *    exact negation of ingest, the Count-Min/FreqSketch contract), so
  *    state after any batching equals the one-pass histogram;
  *  - **KMV**: union = k smallest of the combined distinct minima —
  *    associative, batching-invariant (spec-pinned), but NOT
  *    subtractable: an evicted minimum is unrecoverable, so retiring
  *    counted documents means rebuilding the sketch from survivors
  *    (the HLL trade; the histogram tier next to it retires exactly).
  *
  * At 100 TB: each batch's summaries partial-aggregate map-side
  * (histogram groupBy; KMV `TypedImperativeAggregate`), the merge
  * touches only state-sized frames (≤ 64 + k rows per source), and
  * profile queries ([[quantiles]], [[distinct]]) never read the
  * corpus — the sketch IS the answer.
  */
object DistStats {

  val histStateSchema: StructType = new StructType()
    .add("source", StringType)
    .add("b", IntegerType, nullable = false)
    .add("c", LongType, nullable = false)

  val kmvStateSchema: StructType = new StructType()
    .add("source", StringType)
    .add("h", LongType, nullable = false)

  /** One batch's docs folded into the histogram state — bucket-wise
    * sum over the (source, bucket) keys, associative and commutative.
    */
  def mergeHistState(
      state: DataFrame,
      batch: DataFrame,
      sourceCol: String,
      textCol: String): DataFrame =
    StateMerge.fullOuterMerge(
      state,
      HistQuantile.histogram(HistQuantile.tokenCounts(batch, sourceCol, textCol)),
      keyCols = Seq("source", "b"),
      valueCombiners = Seq("c" -> StateMerge.addLong))

  /** Histogram retirement: subtract the retired rows' histogram — the
    * exact negation of their ingest (`removedDocs` must be rows as
    * ingested; buckets at zero leave the table).
    */
  def retireHist(
      state: DataFrame,
      removedDocs: DataFrame,
      sourceCol: String,
      textCol: String): DataFrame =
    StateMerge.fullOuterMerge(
      state,
      HistQuantile.histogram(HistQuantile.tokenCounts(removedDocs, sourceCol, textCol))
        .withColumn("c", -col("c")),
      keyCols = Seq("source", "b"),
      valueCombiners = Seq("c" -> StateMerge.addLong))
      .filter(col("c") > 0)

  /** One batch's tokens folded into the KMV state: the batch side is
    * pre-trimmed to its OWN k minima per source by the aggregate
    * (map-side bounded — the full token stream never reaches the
    * merge), then the union of two ≤ k-minima sets re-trims to k.
    */
  def mergeKmvState(
      state: DataFrame,
      batch: DataFrame,
      sourceCol: String,
      textCol: String,
      k: Int): DataFrame = {
    val batchMinima = batch
      .filter(col(textCol).isNotNull)
      .select(col(sourceCol).alias("source"),
        explode(TextFunctions.tokens(col(textCol))).alias("tok"))
      .groupBy("source")
      .agg(KmvSketchAgg.kmvSketch(TextFunctions.md5Hash60(col("tok")), k).alias("kmv"))
      .select(col("source"), explode(col("kmv")).alias("h"))
    state.unionByName(batchMinima)
      .distinct()
      .withColumn("rn", row_number().over(Window.partitionBy("source").orderBy("h")))
      .filter(col("rn") <= k)
      .drop("rn")
  }

  /** Quantile bounds from the persisted histogram alone — no corpus
    * pass ([[HistQuantile.profileFromHistogram]]).
    */
  def quantiles(
      spark: SparkSession,
      sink: KVTableSink,
      table: String,
      pcts: Seq[Int] = Seq(50, 90, 99)): DataFrame =
    HistQuantile.profileFromHistogram(
      sink.read(spark, s"${table}_hist", histStateSchema), pcts)

  /** Distinct-token estimates from the persisted minima alone. */
  def distinct(
      spark: SparkSession,
      sink: KVTableSink,
      table: String,
      k: Int): DataFrame =
    Kmv.estimateFromMinimaRows(
      sink.read(spark, s"${table}_kmv", kmvStateSchema), k)

  /** The per-micro-batch body (factored out for the replay spec).
    * PER-TABLE acks, not one ack over both writes: a crash between the
    * histogram write and the KMV write must not re-add the batch's
    * counts to the histogram on replay — each state table carries its
    * own applied mark, so replay skips exactly the writes that
    * committed (the SearchIndex per-table retireId-ack doctrine; the
    * KMV side is idempotent anyway — re-merging the same minima is a
    * no-op — but the mark keeps the contract uniform and skips work).
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
    if (!DedupIngest.alreadyApplied(spark, sink, s"${table}_hist", batchId)) {
      val hist = sink.read(spark, s"${table}_hist", histStateSchema)
      sink.write(
        mergeHistState(hist, batch, sourceCol, textCol),
        s"${table}_hist", SaveMode.Overwrite)
      DedupIngest.markApplied(spark, sink, s"${table}_hist", batchId)
    }
    if (!DedupIngest.alreadyApplied(spark, sink, s"${table}_kmv", batchId)) {
      val kmv = sink.read(spark, s"${table}_kmv", kmvStateSchema)
      sink.write(
        mergeKmvState(kmv, batch, sourceCol, textCol, k),
        s"${table}_kmv", SaveMode.Overwrite)
      DedupIngest.markApplied(spark, sink, s"${table}_kmv", batchId)
    }
  }

  /** Start the stats ingest: every micro-batch's docs merge into the
    * `<table>_hist` and `<table>_kmv` states.
    */
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
