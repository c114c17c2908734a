package graft.streaming

import graft.functions.TextFunctions
import graft.sinks.KVTableSink
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types._

/** Streaming boilerplate-profile miner — the live twin of
  * [[graft.operators.Dedup.boilerplateProfile]], completing the
  * intra-domain boilerplate arc: q153 mines-and-cuts in one batch
  * pass, q156 applies a FROZEN profile statelessly, and this tier
  * keeps the profile itself FRESH while a crawl ingests — each
  * micro-batch folds its pages' segment-presence counts into two
  * additive state tables, and [[profile]] reads the current
  * `(domain, fp)` hot list on demand (feed it straight to
  * [[graft.operators.Dedup.applyBoilerplateProfile]]; the
  * miner/applier split is deliberate — the applier must use a
  * FROZEN snapshot per run, never a moving target, or two docs in
  * one corpus get cut under different rules).
  *
  * Counting is page-presence (the q153 rule): each batch dedups
  * `(domain, fp, id)` before counting, and docs are unique across the
  * stream by the ingest contract (the [[DedupIngest]] family's
  * standing assumption), so the state after ANY trigger partitioning
  * equals the batch mine over the union — spec-pinned, including the
  * threshold filter.
  *
  * State size: `(domain, fp)` rows — the distinct segment universe,
  * the same order as the exact-dedup tier's corpus fingerprint table
  * (disk-backed KV state, not executor memory); the per-domain page
  * counts are |domains| rows. Per trigger: one segmentation scan of
  * the batch's own rows, two q02-shape full-outer merges keyed on
  * scalars. Retirement is deliberately NOT offered: the profile is a
  * statistical artifact, and the honest post-takedown move is a
  * re-mine (the TokenizerStats "refresh is a batch decision" rule),
  * not an incremental subtraction that pretends page-presence history
  * is reversible.
  *
  * Replay contract: each state table merges behind its own batch-id
  * ack ([[DedupIngest.alreadyApplied]]'s `__meta` discipline); the
  * residual exposure is the single write-vs-ack rename window per
  * table, the family's documented contract.
  */
object StreamBoiler {

  val segStateSchema: StructType = new StructType()
    .add("domain", StringType)
    .add("fp", LongType, nullable = false)
    .add("pages", LongType, nullable = false)

  val pageStateSchema: StructType = new StructType()
    .add("domain", StringType)
    .add("n_pages", LongType, nullable = false)

  /** One batch's page-presence counts merged into `(domain, fp, pages)`. */
  def mergeSegState(
      state: DataFrame,
      batch: DataFrame,
      idCol: String,
      domainCol: String,
      textCol: String,
      delim: String): DataFrame = {
    val quoted = java.util.regex.Pattern.quote(delim)
    val delta = batch
      .select(
        col(idCol).alias("__id"),
        col(domainCol).cast("string").alias("domain"),
        explode(split(col(textCol), quoted)).alias("seg"))
      .select(col("__id"), col("domain"), TextFunctions.md5Hash60(col("seg")).alias("fp"))
      .distinct() // page presence within the batch
      .groupBy("domain", "fp")
      .agg(count(lit(1)).alias("pages"))
    StateMerge.fullOuterMerge(
      state, delta,
      keyCols = Seq("domain", "fp"),
      valueCombiners = Seq("pages" -> StateMerge.addLong))
  }

  /** One batch's page counts merged into `(domain, n_pages)`. */
  def mergePageState(
      state: DataFrame,
      batch: DataFrame,
      domainCol: String): DataFrame =
    StateMerge.fullOuterMerge(
      state,
      batch.groupBy(col(domainCol).cast("string").alias("domain"))
        .agg(count(lit(1)).alias("n_pages")),
      keyCols = Seq("domain"),
      valueCombiners = Seq("n_pages" -> StateMerge.addLong))

  private[streaming] def applyBatch(
      batch: DataFrame,
      batchId: Long,
      idCol: String,
      domainCol: String,
      textCol: String,
      delim: String,
      sink: KVTableSink,
      table: String): Unit = {
    val spark = batch.sparkSession
    if (batch.head(1).isEmpty ||
      DedupIngest.alreadyApplied(spark, sink, table, batchId)) return
    // ONE segmentation pass feeds both merges
    val b = batch.select(col(idCol), col(domainCol), col(textCol)).localCheckpoint(true)
    if (!DedupIngest.alreadyApplied(spark, sink, s"${table}__segs", batchId)) {
      val st = sink.read(spark, s"${table}__segs", segStateSchema)
      sink.write(
        mergeSegState(st, b, idCol, domainCol, textCol, delim),
        s"${table}__segs", SaveMode.Overwrite)
      DedupIngest.markApplied(spark, sink, s"${table}__segs", batchId)
    }
    if (!DedupIngest.alreadyApplied(spark, sink, s"${table}__pages", batchId)) {
      val st = sink.read(spark, s"${table}__pages", pageStateSchema)
      sink.write(
        mergePageState(st, b, domainCol),
        s"${table}__pages", SaveMode.Overwrite)
      DedupIngest.markApplied(spark, sink, s"${table}__pages", batchId)
    }
    DedupIngest.markApplied(spark, sink, table, batchId)
  }

  /** The CURRENT hot list, `(domain, fp)` — exactly
    * [[graft.operators.Dedup.boilerplateProfile]]'s threshold over the
    * live states (a segment is boilerplate on more than `maxPagePct`%
    * of its domain's pages, domains under `minPages` pages are never
    * profiled). Snapshot it (localCheckpoint / write) before handing
    * it to an applier.
    */
  def profile(
      spark: SparkSession,
      sink: KVTableSink,
      table: String,
      maxPagePct: Int,
      minPages: Long): DataFrame = {
    require(maxPagePct >= 1 && maxPagePct <= 100,
      s"maxPagePct must be in [1, 100], got $maxPagePct")
    require(minPages >= 1L, s"minPages must be >= 1, got $minPages")
    val segs = sink.read(spark, s"${table}__segs", segStateSchema)
    val pages = sink.read(spark, s"${table}__pages", pageStateSchema)
    segs
      .join(pages, Seq("domain"))
      .filter(col("n_pages") >= minPages &&
        col("pages") * lit(100L) > col("n_pages") * lit(maxPagePct.toLong))
      .select("domain", "fp")
  }

  /** Start the miner over a streaming frame. */
  def start(
      docs: DataFrame,
      sink: KVTableSink,
      table: String,
      checkpointDir: String,
      trigger: Trigger,
      idCol: String = "doc_id",
      domainCol: String = "domain",
      textCol: String = "text",
      delim: String = "\n"): StreamingQuery =
    docs.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        applyBatch(batch, batchId, idCol, domainCol, textCol, delim, sink, table)
      }
      .start()
}
