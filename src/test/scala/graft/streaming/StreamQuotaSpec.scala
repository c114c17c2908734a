package graft.streaming

import graft.SparkTestBase
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** [[StreamQuota]] — streaming per-group admission: cap enforcement
  * within and across triggers, first-come semantics.
  */
class StreamQuotaSpec extends SparkTestBase {
  import spark.implicits._

  private def run(cap: Long, batches: Seq[Seq[(Long, String)]]): Seq[StreamQuota.QuotaOut] = {
    val input = MemoryStream[(Long, String)](spark)
    val out = StreamQuota.admit(
      input.toDF().toDF("doc_id", "domain"), "doc_id", "domain", cap)
    val name = s"sq_out_${System.nanoTime()}"
    val q = out.writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    try {
      batches.foreach { b => input.addData(b); q.processAllAvailable() }
      spark.table(name).as[StreamQuota.QuotaOut].collect().toSeq
    } finally q.stop()
  }

  test("cap binds within a trigger, in (group, id) order") {
    val out = run(2, Seq(Seq(
      (5L, "farm"), (1L, "farm"), (3L, "farm"),
      (7L, "tail"))))
    val farm = out.filter(_.group == "farm").sortBy(_.admitted_rank)
    assert(farm.map(_.doc_id) == Seq(1L, 3L), "lowest ids admitted first within the trigger")
    assert(farm.map(_.admitted_rank) == Seq(0L, 1L))
    assert(out.filter(_.group == "tail").map(_.doc_id) == Seq(7L))
  }

  test("admission count carries across triggers — no reset, no retroactive eviction") {
    val out = run(3, Seq(
      Seq((1L, "a"), (2L, "a")),
      Seq((3L, "a"), (4L, "a"), (5L, "b"))))
    val a = out.filter(_.group == "a").sortBy(_.admitted_rank)
    assert(a.map(_.doc_id) == Seq(1L, 2L, 3L),
      "trigger 2 gets only the remaining quota slot")
    assert(a.map(_.admitted_rank) == Seq(0L, 1L, 2L))
    assert(out.filter(_.group == "b").map(_.doc_id) == Seq(5L))
    // a third trigger for a full group admits nothing
    val out2 = run(1, Seq(Seq((1L, "x")), Seq((2L, "x")), Seq((3L, "x"))))
    assert(out2.map(_.doc_id) == Seq(1L))
  }
}
