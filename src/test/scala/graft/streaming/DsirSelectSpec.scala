package graft.streaming

import graft.SparkTestBase
import graft.operators.NgramLm
import graft.sinks.{InMemoryKVSink, ParquetKVSink}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger

import java.nio.file.Files

/** The tier's contract is batching invariance against the frozen-LM
  * batch draw: after ANY micro-batch boundaries, the reservoir equals
  * `NgramLm.importanceSelectWith` over everything ingested (selection
  * keys are row-intrinsic — text through the frozen LMs, id through
  * the seeded Gumbel — so the per-batch trim loses nothing).
  */
class DsirSelectSpec extends SparkTestBase {
  import spark.implicits._

  private val trigger = Trigger.ProcessingTime("50 milliseconds")
  private val k = 8

  private def doc(i: Int): (Long, String) = {
    val txt =
      if (i % 3 == 0) s"the cat sat quietly near the window ledge ${i}"
      else s"market prices moved ${i} in afternoon trading today"
    (i.toLong, txt)
  }

  private def trainedLms() = {
    val tgt = NgramLm.train(
      Seq((1000L, "the cat sat on the mat and the cat ran near the window"))
        .toDF("doc_id", "text"), "doc_id", "text")
    val raw = NgramLm.train(
      Seq((2000L, "stock market prices fell sharply in afternoon trading today"))
        .toDF("doc_id", "text"), "doc_id", "text")
    (tgt, raw)
  }

  test("streamed selection equals the frozen-LM batch draw after any batching") {
    val all = (0 until 90).map(doc)
    val batches = Seq(all.slice(0, 40), all.slice(40, 60), all.slice(60, 90))
    val (tgt, raw) = trainedLms()

    // persist the LMs — the tier loads the artifact form at start
    val tgtPath = Files.createTempDirectory("graft-dsir-tgt").toString
    val rawPath = Files.createTempDirectory("graft-dsir-raw").toString
    NgramLm.saveLm(tgt, tgtPath)
    NgramLm.saveLm(raw, rawPath)

    val input = MemoryStream[(Long, String)](spark)
    val sink = new ParquetKVSink(Files.createTempDirectory("graft-dsir").toString)
    val ckpt = Files.createTempDirectory("graft-dsir-ckpt").toString
    val q = DsirSelect.start(
      input.toDF().toDF("doc_id", "text"), tgtPath, rawPath,
      sink, "sel", ckpt, trigger, "doc_id", "text", k)
    batches.foreach { bt => input.addData(bt: _*); q.processAllAvailable() }
    q.stop()

    val streamed = DsirSelect.selection(spark, sink, "sel")
      .select("doc_id", "lw_micro", "key_micro", "rank")
      .as[(Long, Long, Long, Long)].collect().sortBy(_._4)
    val batch = NgramLm.importanceSelectWith(
        all.toDF("doc_id", "text"), "doc_id", "text", tgt, raw, k)
      .select("doc_id", "lw_micro", "key_micro", "rank")
      .as[(Long, Long, Long, Long)].collect().sortBy(_._4)
    assert(streamed.toSeq === batch.toSeq,
      s"streamed selection diverged from the batch draw:\n${streamed.toSeq}\n${batch.toSeq}")
    assert(streamed.length === k)
    // the draw skews toward target-fit docs (positive log-ratio)
    assert(streamed.count(_._2 > 0) >= k / 2, s"selection lost the target skew: ${streamed.toSeq}")
  }

  test("unacked replay is a no-op; retire deletes exactly and refills from the future only") {
    val (tgt, raw) = trainedLms()
    val sink = new InMemoryKVSink
    val rows = (0 until 50).map(doc).toDF("doc_id", "text")
    DsirSelect.applyBatch(rows, 0L, "doc_id", "text", tgt, raw, k, 0.4, 42L, sink, "sel")
    val first = DsirSelect.selection(spark, sink, "sel")
      .select("doc_id", "key_micro").as[(Long, Long)].collect().toSet
    // acked replay: skipped; unacked same-content replay under a new
    // batch id: identical deterministic rows, state unchanged
    DsirSelect.applyBatch(rows, 0L, "doc_id", "text", tgt, raw, k, 0.4, 42L, sink, "sel")
    DsirSelect.applyBatch(rows, 1L, "doc_id", "text", tgt, raw, k, 0.4, 42L, sink, "sel")
    val after = DsirSelect.selection(spark, sink, "sel")
      .select("doc_id", "key_micro").as[(Long, Long)].collect().toSet
    assert(after === first)

    // retirement: the survivors are the top-(k-m) of what remains
    val victims = first.toSeq.sortBy(-_._2).take(3).map(_._1)
    DsirSelect.retire(spark, sink, "sel", victims.map(Tuple1(_)).toDF("doc_id"), "doc_id")
    val survivors = DsirSelect.selection(spark, sink, "sel")
      .select("doc_id").as[Long].collect().toSet
    assert(survivors === first.map(_._1) -- victims)

    // refill only from future batches, and the refilled state is the
    // batch draw over (survivor docs ∪ new docs)
    val more = (100 until 130).map(doc)
    DsirSelect.applyBatch(more.toDF("doc_id", "text"), 2L,
      "doc_id", "text", tgt, raw, k, 0.4, 42L, sink, "sel")
    val refilled = DsirSelect.selection(spark, sink, "sel")
      .select("doc_id").as[Long].collect().toSet
    val survivorDocs = (0 until 50).map(doc).filter(d => survivors.contains(d._1))
    val expect = NgramLm.importanceSelectWith(
        (survivorDocs ++ more).toDF("doc_id", "text"), "doc_id", "text", tgt, raw, k)
      .select("doc_id").as[Long].collect().toSet
    assert(refilled === expect)
  }
}
