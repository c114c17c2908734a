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

  test("admitDocs: payload rides through; admitted ids identical to the scalar form") {
    val docs = Seq(
      (5L, "farm", "text five", Seq(0.5f)),
      (1L, "farm", "text one", Seq(0.1f)),
      (3L, "farm", "text three", Seq(0.3f)),
      (7L, "tail", "text seven", Seq(0.7f)))
    val input = MemoryStream[(Long, String, String, Seq[Float])](spark)
    val out = StreamQuota.admitDocs(
      input.toDF().toDF("doc_id", "domain", "text", "embedding"),
      "doc_id", "domain", "text", "embedding", cap = 2L)
    val name = s"sqd_out_${System.nanoTime()}"
    val q = out.writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    try {
      input.addData(docs)
      q.processAllAvailable()
      val got = spark.table(name).as[StreamQuota.DocOut].collect().toSeq
      // same admissions as the scalar form on the same trigger
      val scalar = run(2, Seq(docs.map(d => (d._1, d._2))))
      assert(got.map(o => (o.group, o.doc_id, o.admitted_rank)).sorted ==
        scalar.map(o => (o.group, o.doc_id, o.admitted_rank)).sorted)
      // the payload is the admitted doc's own, untouched
      val byId = got.map(o => o.doc_id -> o).toMap
      assert(byId(1L).text == "text one" && byId(1L).embedding == Seq(0.1f))
      assert(byId(3L).text == "text three")
      assert(!byId.contains(5L), "over-cap doc leaked through with its payload")
    } finally q.stop()
  }
}
