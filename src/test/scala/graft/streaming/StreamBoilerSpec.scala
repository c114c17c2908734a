package graft.streaming

import graft.SparkTestBase
import graft.operators.Dedup
import graft.sinks.InMemoryKVSink
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger

/** [[StreamBoiler]] — the live boilerplate-profile miner: the state
  * after any trigger partitioning equals the batch mine over the
  * union (threshold included), replays are no-ops, and the live
  * profile feeds the stateless applier end-to-end.
  */
class StreamBoilerSpec extends SparkTestBase {
  import spark.implicits._

  private val trigger = Trigger.ProcessingTime("50 milliseconds")

  private def doc(i: Int): (Long, String, String) = {
    val dom = s"d${i % 2}"
    val nav = if (i % 2 == 0) "nav foot" else "banner"
    (i.toLong, dom, s"$nav body$i tail${i % 5}")
  }

  private def ingest(batches: Seq[Seq[(Long, String, String)]]): InMemoryKVSink = {
    val sink = new InMemoryKVSink
    val input = MemoryStream[(Long, String, String)](spark)
    val q = StreamBoiler.start(
      input.toDF().toDF("doc_id", "domain", "text"),
      sink, "boiler", java.nio.file.Files.createTempDirectory("sb").toString,
      trigger, delim = " ")
    try batches.foreach { b => input.addData(b); q.processAllAvailable() }
    finally q.stop()
    sink
  }

  test("streamed profile equals the batch mine over the union, any batching") {
    val docs = (0 until 30).map(doc)
    val expected = Dedup.boilerplateProfile(
        docs.toDF("doc_id", "domain", "text"),
        "doc_id", "domain", "text", delim = " ", maxPagePct = 60, minPages = 5L)
      .as[(String, Long)].collect().toSet
    assert(expected.nonEmpty, "fixture mined nothing — weak test")
    for (split <- Seq(Seq(docs), Seq(docs.take(7), docs.slice(7, 8), docs.drop(8)))) {
      val sink = ingest(split)
      val got = StreamBoiler.profile(spark, sink, "boiler", 60, 5L)
        .as[(String, Long)].collect().toSet
      assert(got === expected, s"split of ${split.length} batches diverged")
    }
  }

  test("replayed batch is a no-op behind the ack") {
    val docs = (0 until 12).map(doc)
    val sink = new InMemoryKVSink
    val df = docs.toDF("doc_id", "domain", "text")
    StreamBoiler.applyBatch(df, 0L, "doc_id", "domain", "text", " ", sink, "boiler")
    val first = StreamBoiler.profile(spark, sink, "boiler", 60, 3L)
      .as[(String, Long)].collect().toSet
    StreamBoiler.applyBatch(df, 0L, "doc_id", "domain", "text", " ", sink, "boiler")
    val replayed = StreamBoiler.profile(spark, sink, "boiler", 60, 3L)
      .as[(String, Long)].collect().toSet
    assert(replayed === first)
    // page counts did not double
    val pages = sink.read(spark, "boiler__pages", StreamBoiler.pageStateSchema)
      .as[(String, Long)].collect().toMap
    assert(pages("d0") === 6L && pages("d1") === 6L, pages.toString)
  }

  test("live profile drives the stateless applier end-to-end") {
    val sink = ingest(Seq((0 until 30).map(doc)))
    val profile = StreamBoiler.profile(spark, sink, "boiler", 60, 5L)
      .localCheckpoint(true) // snapshot before applying — the contract
    val today = Seq(
      (100L, "d0", "nav foot fresh"),
      (101L, "d9", "nav foot other")).toDF("doc_id", "domain", "text")
    val out = Dedup.applyBoilerplateProfile(today, profile, "doc_id", "domain", "text", " ")
      .as[(Long, String, String, Long, Long)].collect().map(r => r._1 -> r).toMap
    assert(out(100L)._3 === "fresh", s"mined furniture not cut: ${out(100L)}")
    assert(out(101L)._3 === "nav foot other", "unprofiled domain must pass through")
  }
}
