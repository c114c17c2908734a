package graft.streaming

import graft.SparkTestBase
import graft.operators.Cdc
import graft.sinks.{InMemoryKVSink, ParquetKVSink}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import java.nio.file.Files

class CdcIngestSpec extends SparkTestBase {
  import spark.implicits._

  private val trigger = Trigger.ProcessingTime("50 milliseconds")
  private val (w, d) = (8, 16)

  private def fakeText(seed: Int, words: Int): String = {
    val vocab = Vector("key", "agg", "row", "scan", "slow", "fast", "table", "value",
      "batch", "spark", "order", "data", "column", "join")
    (0 until words).map(j => vocab((seed * 31 + j * 7 + j * j) % vocab.size)).mkString(" ")
  }

  test("a single whole-corpus batch equals the batch operator bit-for-bit") {
    val docs = Seq(
      (1L, fakeText(7, 300)),
      (2L, "HEADER >>> " + fakeText(7, 300)),
      (3L, fakeText(42, 150)),
      (4L, "")).toDF("doc_id", "text")
    val sink = new InMemoryKVSink
    CdcIngest.applyBatch(docs, 0L, "doc_id", "text", w, d, 500000L, sink, "cdc")
    val streamed = sink.read(spark, "cdc_decisions", CdcIngest.decisionsSchema)
      .drop("batch").as[(Long, Long, Long, Option[Long], Boolean)].collect().toSet
    val batch = Cdc.containmentDedup(docs, "doc_id", "text", w, d, 500000L)
      .as[(Long, Long, Long, Option[Long], Boolean)].collect().toSet
    assert(streamed === batch)
  }

  test("retained-corpus semantics across batches: kept docs block, dropped docs do not") {
    val base = fakeText(3, 250)
    val sink = new InMemoryKVSink
    // b0: the original (kept) and a re-upload of it (dropped)
    CdcIngest.applyBatch(
      Seq((1L, base), (2L, "RE >>> " + base)).toDF("doc_id", "text"),
      0L, "doc_id", "text", w, d, 500000L, sink, "cdc")
    // b1: another copy of base -> covered by KEPT doc 1 -> drops;
    // fresh doc keeps and accrues ownership
    CdcIngest.applyBatch(
      Seq((3L, "OTHER HEAD ::: " + base), (4L, fakeText(55, 200))).toDF("doc_id", "text"),
      1L, "doc_id", "text", w, d, 500000L, sink, "cdc")
    val dec = sink.read(spark, "cdc_decisions", CdcIngest.decisionsSchema)
      .as[(Long, Long, Long, Option[Long], Boolean, Long)].collect()
      .map(r => r._1 -> r._5).toMap
    assert(dec(1L) && !dec(2L) && !dec(3L) && dec(4L), s"decisions: $dec")
    // state carries ownership for kept docs only
    val owners = sink.read(spark, "cdc_chunks", CdcIngest.chunkStateSchema)
      .select("owner").distinct().as[Long].collect().toSet
    assert(owners === Set(1L, 4L), s"ownership leaked from dropped docs: $owners")
  }

  test("retiring an owner readmits an identical future document") {
    val base = fakeText(9, 220)
    val sink = new InMemoryKVSink
    CdcIngest.applyBatch(Seq((1L, base)).toDF("doc_id", "text"),
      0L, "doc_id", "text", w, d, 500000L, sink, "cdc")
    // sanity: the copy drops while 1 is retained
    CdcIngest.applyBatch(Seq((2L, base)).toDF("doc_id", "text"),
      1L, "doc_id", "text", w, d, 500000L, sink, "cdc")
    // takedown doc 1: its ownership rows leave the state
    val retired = CdcIngest.retire(
      sink.read(spark, "cdc_chunks", CdcIngest.chunkStateSchema),
      Seq(1L).toDF("doc_id"), "doc_id")
    sink.write(retired, "cdc_chunks", org.apache.spark.sql.SaveMode.Overwrite)
    CdcIngest.applyBatch(Seq((5L, base)).toDF("doc_id", "text"),
      2L, "doc_id", "text", w, d, 500000L, sink, "cdc")
    val dec = sink.read(spark, "cdc_decisions", CdcIngest.decisionsSchema)
      .as[(Long, Long, Long, Option[Long], Boolean, Long)].collect()
      .map(r => r._1 -> r._5).toMap
    assert(dec(1L) && !dec(2L) && dec(5L),
      s"post-retirement re-ingest must be admitted fresh: $dec")
    val owners = sink.read(spark, "cdc_chunks", CdcIngest.chunkStateSchema)
      .select("owner").distinct().as[Long].collect().toSet
    assert(owners === Set(5L))
  }

  test("replayed micro-batch is a no-op; decisions are not double-appended") {
    val sink = new InMemoryKVSink
    val b = Seq((1L, fakeText(2, 90)), (2L, fakeText(4, 80))).toDF("doc_id", "text")
    CdcIngest.applyBatch(b, 0L, "doc_id", "text", w, d, 500000L, sink, "cdc")
    val dec1 = sink.read(spark, "cdc_decisions", CdcIngest.decisionsSchema).count()
    val st1 = sink.read(spark, "cdc_chunks", CdcIngest.chunkStateSchema).collect().toSet
    CdcIngest.applyBatch(b, 0L, "doc_id", "text", w, d, 500000L, sink, "cdc")
    assert(sink.read(spark, "cdc_decisions", CdcIngest.decisionsSchema).count() === dec1)
    assert(sink.read(spark, "cdc_chunks", CdcIngest.chunkStateSchema).collect().toSet === st1)
  }

  test("end-to-end over MemoryStream: multi-trigger run matches the per-batch fold") {
    val base = fakeText(6, 260)
    val batches = Seq(
      Seq((1L, base), (2L, fakeText(11, 120))),
      Seq((3L, "COPY " + base), (4L, fakeText(12, 140))))
    val input = MemoryStream[(Long, String)](spark)
    val sink = new ParquetKVSink(Files.createTempDirectory("graft-cdc").toString)
    val ckpt = Files.createTempDirectory("graft-cdc-ckpt").toString
    val q = CdcIngest.start(
      input.toDF().toDF("doc_id", "text"), sink, "cdc", ckpt, trigger)
    batches.foreach { bt => input.addData(bt: _*); q.processAllAvailable() }
    q.stop()
    val dec = sink.read(spark, "cdc_decisions", CdcIngest.decisionsSchema)
      .as[(Long, Long, Long, Option[Long], Boolean, Long)].collect()
      .map(r => r._1 -> r._5).toMap
    assert(dec === Map(1L -> true, 2L -> true, 3L -> false, 4L -> true), s"$dec")
  }
}
