package graft.streaming

import graft.SparkTestBase
import graft.operators.Mixture
import graft.sinks.InMemoryKVSink
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.Trigger

/** [[StreamMixture]] — the live learned-mixture twin: per-source
  * sufficient statistics merge exactly under any batching, the
  * re-learned table equals the batch trainer on the same prefix
  * bit-for-bit, the frozen rates reproduce the batch membership, and
  * replays are no-ops.
  */
class StreamMixtureSpec extends SparkTestBase {
  import spark.implicits._

  private val trigger = Trigger.ProcessingTime("50 milliseconds")

  // four sources with quality 1/5..4/5 — both columns derive from the
  // id so the stream and the batch operator see identical signals
  private def doc(i: Int): (Long, String) = (i.toLong, s"s${i % 4}")
  private def positive = col("doc_id") % 5 < col("doc_id") % 4 + 1

  private def ingest(batches: Seq[Seq[(Long, String)]]): InMemoryKVSink = {
    val sink = new InMemoryKVSink
    val input = MemoryStream[(Long, String)](spark)
    val q = StreamMixture.start(
      input.toDF().toDF("doc_id", "source"), positive,
      sink, "mix", java.nio.file.Files.createTempDirectory("sm").toString,
      trigger)
    try batches.foreach { b => input.addData(b); q.processAllAvailable() }
    finally q.stop()
    sink
  }

  test("re-learned table equals the batch trainer on the same prefix, any batching") {
    val docs = (0 until 200).map(doc)
    val batchOut = Mixture.learnedMixture(
      docs.toDF("doc_id", "source"), "doc_id", "source", positive,
      budgetPermille = 500)
    val expectedRates = batchOut
      .select("source", "n_docs", "quality_micro", "weight_micro",
        "n_target", "rate_pm")
      .distinct()
      .as[(String, Long, Long, Long, Long, Long)].collect().toSet
    assert(expectedRates.map(_._6).size > 1,
      "fixture must produce distinct per-source rates")
    for (split <- Seq(Seq(docs),
        Seq(docs.take(7), docs.slice(7, 130), docs.drop(130)))) {
      val sink = ingest(split)
      val live = StreamMixture
        .learnedTable(spark, sink, "mix", budgetPermille = 500)
        .as[(String, Long, Long, Long, Long, Long)].collect().toSet
      assert(live === expectedRates, s"split of ${split.length} batches diverged")
      // the frozen rates reproduce the batch operator's exact membership
      val frozen = StreamMixture.applyFrozen(
          docs.toDF("doc_id", "source"), "doc_id", "source",
          StreamMixture.learnedTable(spark, sink, "mix", budgetPermille = 500))
        .select("doc_id").as[Long].collect().toSet
      val batchKept = batchOut.select("doc_id").as[Long].collect().toSet
      assert(frozen === batchKept)
    }
  }

  test("replay is a no-op behind the ack; a refresh after new arrivals re-learns") {
    val sink = new InMemoryKVSink
    val first = (0 until 80).map(doc).toDF("doc_id", "source")
    StreamMixture.applyBatch(first, 0L, "source", positive, sink, "mix")
    val before = StreamMixture.learnedTable(spark, sink, "mix", 500)
      .as[(String, Long, Long, Long, Long, Long)].collect().toSet
    StreamMixture.applyBatch(first, 0L, "source", positive, sink, "mix")
    val replayed = StreamMixture.learnedTable(spark, sink, "mix", 500)
      .as[(String, Long, Long, Long, Long, Long)].collect().toSet
    assert(replayed === before, "replayed batch double-counted state")
    // a skewed second wave (all-positive docs into one source) shifts
    // that source's quality and weight on re-learn
    val second = (0 until 40).map(i => (1000L + i * 20L, "s0"))
      .toDF("doc_id", "source") // 1000 + 20k ≡ 0 (mod 5) < 1 -> all positive
    StreamMixture.applyBatch(second, 1L, "source", positive, sink, "mix")
    val after = StreamMixture.learnedTable(spark, sink, "mix", 500)
      .as[(String, Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    val beforeMap = before.map(r => r._1 -> r).toMap
    assert(after("s0")._2 === beforeMap("s0")._2 + 40L, "s0 n_docs must grow")
    assert(after("s0")._3 > beforeMap("s0")._3, "s0 quality must rise")
    assert(after("s0")._4 > beforeMap("s0")._4, "s0 learned weight must rise")
  }
}
