package graft.streaming

import graft.operators.Templates
import graft.sinks.KVTableSink
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types._

/** Streaming layout-family observer — the live twin of
  * [[graft.operators.Templates.templateFamilies]] (q168): each
  * micro-batch fingerprints its own pages scan-side and folds
  * `(tag_fp, n_pages, first_doc)` into one additive state table, so a
  * crawl watches its template families GROW as it ingests (a layout
  * crossing the `minPages` floor mid-crawl is the "machine-generated
  * family detected" signal — feed the flagged fingerprints to a
  * per-family cap or drop rule). Both statistics are mergeable
  * monoids (counts add, first-doc takes the min), so the state after
  * ANY trigger partitioning equals the batch operator over the union
  * — spec-pinned. Docs are unique across the stream by the ingest
  * contract (the [[DedupIngest]] family's standing assumption).
  *
  * State size: one row per LAYOUT — thousands, not millions (the
  * q168 scaladoc's layout-bound argument), the smallest state table
  * in the streaming family. Per trigger: one fingerprint scan of the
  * batch's own rows + one scalar-keyed q02-shape merge; HTML never
  * leaves the scan. Retirement is deliberately not offered —
  * family-size history follows the [[StreamBoiler]] "refresh is a
  * re-mine" rule.
  *
  * Replay contract: the state merges behind a batch-id ack
  * ([[DedupIngest.alreadyApplied]]'s `__meta` discipline).
  */
object StreamTemplates {

  val stateSchema: StructType = new StructType()
    .add("tag_fp", LongType, nullable = false)
    .add("n_pages", LongType, nullable = false)
    .add("first_doc", LongType, nullable = false)

  /** One batch's layout counts merged into the state. The id column
    * must be integral (the state schema carries `first_doc` as a
    * long): a non-numeric id would silently become NULL under
    * `cast("long")` and `first_doc` would degrade instead of erroring,
    * so the type is checked loudly here — use the batch operator
    * ([[Templates.templateFamilies]]) for non-integral ids.
    */
  /** The integral-id guard every StreamTemplates surface shares: a
    * non-numeric id would silently become NULL under `cast("long")`
    * (degrading `first_doc` in the observer, and hitting the
    * primitive-Long Dataset decode inside [[StreamQuota.admit]] in the
    * admission forms) instead of erroring — fail loud at plan time.
    */
  private def requireIntegralId(df: DataFrame, idCol: String): Unit = {
    val idType = df.schema(idCol).dataType
    val integral = idType match {
      case ByteType | ShortType | IntegerType | LongType => true
      case _ => false
    }
    require(integral,
      s"StreamTemplates requires an integral id column; '$idCol' is $idType")
  }

  def mergeState(
      state: DataFrame,
      batch: DataFrame,
      idCol: String,
      htmlCol: String): DataFrame = {
    requireIntegralId(batch, idCol)
    val delta = batch
      .select(col(idCol).cast("long").alias("__id"),
        Templates.tagFingerprint(col(htmlCol)).alias("tag_fp"))
      .groupBy("tag_fp")
      .agg(count(lit(1)).alias("n_pages"), min(col("__id")).alias("first_doc"))
    StateMerge.fullOuterMerge(
      state, delta,
      keyCols = Seq("tag_fp"),
      valueCombiners = Seq(
        "n_pages" -> StateMerge.addLong,
        "first_doc" -> ((a, b) => least(a, b))))
  }

  private[streaming] def applyBatch(
      batch: DataFrame,
      batchId: Long,
      idCol: String,
      htmlCol: String,
      sink: KVTableSink,
      table: String): Unit = {
    val spark = batch.sparkSession
    if (batch.head(1).isEmpty ||
      DedupIngest.alreadyApplied(spark, sink, table, batchId)) return
    val st = sink.read(spark, table, stateSchema)
    sink.write(
      mergeState(st, batch, idCol, htmlCol), table, SaveMode.Overwrite)
    DedupIngest.markApplied(spark, sink, table, batchId)
  }

  /** The CURRENT family table — exactly the batch operator's output
    * shape `(tag_fp, n_pages, first_doc, is_template)` over the live
    * state.
    */
  def families(
      spark: SparkSession,
      sink: KVTableSink,
      table: String,
      minPages: Long): DataFrame =
    sink.read(spark, table, stateSchema)
      .withColumn("is_template", col("n_pages") >= minPages)

  /** Streaming per-family admission — the live twin of
    * [[graft.operators.Templates.capPerFamily]] (the rung-13
    * ENFORCEMENT the observer above only reports): each layout
    * family's first `cap` pages are admitted in arrival order and the
    * rest drop, so a crawl caps machine-generated families WHILE
    * ingesting. The fingerprint is computed scan-side (HTML never
    * reaches the state operator); admission state is ONE long per
    * family via [[StreamQuota.admit]]'s first-come semantics —
    * layouts are thousands, not millions, the same cardinality
    * contract as the observer's state table.
    *
    * Semantics vs the batch operator (the [[StreamQuota]] rule): the
    * batch cap samples each family by the seeded-hash order over the
    * whole corpus; a stream cannot reorder the future, so admission is
    * first-come — per-family admitted COUNTS always match the batch
    * operator on the same rows, and feeding arrivals in the batch's
    * hash order reproduces its exact membership (spec-pinned both
    * ways). Null-html rows are DROPPED here (a null fingerprint
    * cannot key streaming state) — the batch operator's null-family
    * routing is a batch-only concept; spec-pinned so the divergence
    * is deliberate, not silent.
    *
    * Output: `(tag_fp, doc_id, admitted_rank)` — rank 0-based within
    * the family.
    */
  def admitByFamily(
      stream: DataFrame,
      idCol: String,
      htmlCol: String,
      cap: Long): DataFrame = {
    requireIntegralId(stream, idCol)
    val admitted = StreamQuota.admit(
      stream
        .where(col(htmlCol).isNotNull)
        .withColumn("__tmpl_fp", Templates.tagFingerprint(col(htmlCol))),
      idCol, "__tmpl_fp", cap)
    admitted.toDF().select(
      col("group").cast("long").alias("tag_fp"),
      col("doc_id"),
      col("admitted_rank"))
  }

  /** [[admitByFamily]] carrying the document payload through — the
    * form that CHAINS as a front-door stage (the
    * [[StreamQuota.admitDocs]] shape keyed on the layout fingerprint):
    * admitted docs continue into the boilerplate/C4/gate/ingest
    * stages with their text and embedding, dropped ones never reach
    * any downstream state. Same first-come semantics, fingerprint
    * computed scan-side, one long of state per family.
    */
  def admitDocsByFamily(
      stream: DataFrame,
      idCol: String,
      htmlCol: String,
      textCol: String,
      embCol: String,
      cap: Long): DataFrame = {
    requireIntegralId(stream, idCol)
    val admitted = StreamQuota.admitDocs(
      stream
        .where(col(htmlCol).isNotNull)
        .withColumn("__tmpl_fp", Templates.tagFingerprint(col(htmlCol))),
      idCol, "__tmpl_fp", textCol, embCol, cap)
    admitted.toDF().select(
      col("group").cast("long").alias("tag_fp"),
      col("doc_id"),
      col("admitted_rank"),
      col("text"),
      col("embedding"))
  }

  /** Start the observer over a streaming frame of `(id, html)` rows. */
  def start(
      docs: DataFrame,
      sink: KVTableSink,
      table: String,
      checkpointDir: String,
      trigger: Trigger,
      idCol: String = "doc_id",
      htmlCol: String = "raw"): StreamingQuery =
    docs.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        applyBatch(batch, batchId, idCol, htmlCol, sink, table)
      }
      .start()
}
