package graft.streaming

import graft.SparkTestBase
import graft.operators.Templates
import graft.sinks.InMemoryKVSink
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.Trigger

/** [[StreamTemplates]] — the live layout-family observer: the state
  * after any trigger partitioning equals the batch
  * [[Templates.templateFamilies]] over the union (flag included),
  * replays are no-ops, and a family crossing the floor mid-stream
  * flips its flag.
  */
class StreamTemplatesSpec extends SparkTestBase {
  import spark.implicits._

  private val trigger = Trigger.ProcessingTime("50 milliseconds")

  // three layouts: ids % 3 pick the structure, text varies per doc
  private def doc(i: Int): (Long, String) = {
    val body = (i % 3) match {
      case 0 => s"<html><body><p>t$i</p></body></html>"
      case 1 => s"<html><body><h1>h$i</h1><p>t$i</p></body></html>"
      case _ => s"<table><tr><td>c$i</td></tr></table>"
    }
    (i.toLong, body)
  }

  private def ingest(batches: Seq[Seq[(Long, String)]]): InMemoryKVSink = {
    val sink = new InMemoryKVSink
    val input = MemoryStream[(Long, String)](spark)
    val q = StreamTemplates.start(
      input.toDF().toDF("doc_id", "raw"),
      sink, "tmpl", java.nio.file.Files.createTempDirectory("st").toString,
      trigger)
    try batches.foreach { b => input.addData(b); q.processAllAvailable() }
    finally q.stop()
    sink
  }

  test("streamed families equal the batch operator over the union, any batching") {
    val docs = (0 until 31).map(doc)
    val expected = Templates.templateFamilies(
        docs.toDF("doc_id", "raw"), "doc_id", "raw", minPages = 11L)
      .as[(Long, Long, Long, Boolean)].collect().toSet
    assert(expected.exists(_._4) && expected.exists(!_._4),
      "fixture must carry both flagged and unflagged families")
    for (split <- Seq(Seq(docs), Seq(docs.take(5), docs.slice(5, 6), docs.drop(6)))) {
      val sink = ingest(split)
      val got = StreamTemplates.families(spark, sink, "tmpl", minPages = 11L)
        .as[(Long, Long, Long, Boolean)].collect().toSet
      assert(got === expected, s"split of ${split.length} batches diverged")
    }
  }

  test("replayed batch is a no-op behind the ack; a family crossing the floor flips its flag") {
    val sink = new InMemoryKVSink
    val first = (0 until 6).map(doc).filter(_._1 % 3 == 0).toDF("doc_id", "raw")
    StreamTemplates.applyBatch(first, 0L, "doc_id", "raw", sink, "tmpl")
    val before = StreamTemplates.families(spark, sink, "tmpl", minPages = 3L)
      .as[(Long, Long, Long, Boolean)].collect().toSeq
    assert(before.map(_._2).sum === 2L && before.forall(!_._4))
    // replay: no double count
    StreamTemplates.applyBatch(first, 0L, "doc_id", "raw", sink, "tmpl")
    val replayed = StreamTemplates.families(spark, sink, "tmpl", minPages = 3L)
      .as[(Long, Long, Long, Boolean)].collect().toSeq
    assert(replayed.toSet === before.toSet)
    // a second batch pushes the layout over the floor; first_doc stays min
    val second = Seq((100L, doc(0)._2), (101L, doc(3)._2)).toDF("doc_id", "raw")
    StreamTemplates.applyBatch(second, 1L, "doc_id", "raw", sink, "tmpl")
    val after = StreamTemplates.families(spark, sink, "tmpl", minPages = 3L)
      .as[(Long, Long, Long, Boolean)].collect().toSeq
    assert(after === Seq((after.head._1, 4L, 0L, true)))
  }

  test("admitByFamily: count parity under any batching; hash-order feed reproduces batch membership") {
    // two over-cap families (%2 gate) + one tiny family; cap = 5
    def html(i: Long): String =
      if (i >= 90L) "<table><tr><td>t</td></tr></table>"
      else if (i % 2 == 0) s"<div><p>a$i</p></div>"
      else s"<ul><li>b$i</li></ul>"
    val docs = ((0L until 24L) ++ Seq(90L, 91L, 92L)).map(i => (i, html(i)))
    val batch = Templates.capPerFamily(
        docs.toDF("doc_id", "raw"), "doc_id", "raw", cap = 5)
      .select("tag_fp", "doc_id")
      .as[(Long, Long)].collect().toSet
    def run(batches: Seq[Seq[(Long, String)]]): Set[(Long, Long)] = {
      val input = MemoryStream[(Long, String)](spark)
      val out = StreamTemplates.admitByFamily(
        input.toDF().toDF("doc_id", "raw"), "doc_id", "raw", cap = 5L)
      val name = s"stc_out_${System.nanoTime()}"
      val q = out.writeStream.format("memory").queryName(name)
        .outputMode("append").start()
      try {
        batches.foreach { b => input.addData(b); q.processAllAvailable() }
        spark.table(name).select("tag_fp", "doc_id")
          .as[(Long, Long)].collect().toSet
      } finally q.stop()
    }
    // (1) arbitrary batching: per-family admitted COUNTS match the batch cap
    val streamed = run(Seq(docs.take(10), docs.slice(10, 11), docs.drop(11)))
    def counts(s: Set[(Long, Long)]) =
      s.groupBy(_._1).view.mapValues(_.size).toMap
    assert(counts(streamed) === counts(batch))
    // the tiny family bypasses whole in both forms
    val tinyFp = streamed.filter(_._2 >= 90L).map(_._1)
    assert(tinyFp.size === 1 && streamed.count(_._1 == tinyFp.head) === 3)
    // (2) one doc per trigger in the batch's seeded-hash order ->
    // identical MEMBERSHIP, not just counts
    val hashOrder = docs.toDF("doc_id", "raw")
      .withColumn("hk", graft.functions.TextFunctions.seededHash60(42L, col("doc_id")))
      .orderBy(col("hk"), col("doc_id"))
      .select("doc_id", "raw").as[(Long, String)].collect().toSeq
    val streamedOrdered = run(hashOrder.map(Seq(_)))
    assert(streamedOrdered === batch,
      "hash-order feed must reproduce the batch cap's exact membership")
    // (3) null html drops in the stream (documented divergence from
    // the batch operator's null family)
    val withNull = run(Seq(Seq((500L, null.asInstanceOf[String])) ++ docs.take(4)))
    assert(!withNull.exists(_._2 == 500L))
  }

  test("admitDocsByFamily: payload rides through; admissions identical to the scalar form") {
    def html(i: Long): String =
      if (i % 2 == 0) "<div><p>a</p></div>" else "<ul><li>b</li></ul>"
    val docs = (0L until 10L).map(i =>
      (i, html(i), s"text $i", Seq(i.toFloat)))
    val input = MemoryStream[(Long, String, String, Seq[Float])](spark)
    val out = StreamTemplates.admitDocsByFamily(
      input.toDF().toDF("doc_id", "raw", "text", "embedding"),
      "doc_id", "raw", "text", "embedding", cap = 3L)
    val name = s"stdf_out_${System.nanoTime()}"
    val q = out.writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    try {
      input.addData(docs)
      q.processAllAvailable()
      val got = spark.table(name)
        .select("tag_fp", "doc_id", "admitted_rank", "text", "embedding")
        .as[(Long, Long, Long, String, Seq[Float])].collect()
      // same admissions as the scalar form on the same trigger
      val scalarInput = MemoryStream[(Long, String)](spark)
      val scalarOut = StreamTemplates.admitByFamily(
        scalarInput.toDF().toDF("doc_id", "raw"), "doc_id", "raw", cap = 3L)
      val sname = s"stdf_s_${System.nanoTime()}"
      val sq = scalarOut.writeStream.format("memory").queryName(sname)
        .outputMode("append").start()
      try {
        scalarInput.addData(docs.map(d => (d._1, d._2)))
        sq.processAllAvailable()
        val scalar = spark.table(sname)
          .select("tag_fp", "doc_id", "admitted_rank")
          .as[(Long, Long, Long)].collect()
        assert(got.map(o => (o._1, o._2, o._3)).sorted.toSeq ===
          scalar.sorted.toSeq)
      } finally sq.stop()
      // the payload is the admitted doc's own, untouched
      val byId = got.map(o => o._2 -> o).toMap
      assert(byId(0L)._4 === "text 0" && byId(0L)._5 === Seq(0.0f))
      assert(byId(1L)._4 === "text 1")
      // each family admitted exactly cap of its 5 docs
      assert(got.groupBy(_._1).forall(_._2.length === 3))
    } finally q.stop()
  }

  test("non-integral id column fails loudly (no silent NULL first_doc under cast)") {
    val sink = new InMemoryKVSink
    val st = sink.read(spark, "tmpl", StreamTemplates.stateSchema)
    val strIds = Seq(("a", "<p>x</p>"), ("b", "<p>y</p>")).toDF("doc_id", "raw")
    val e = intercept[IllegalArgumentException] {
      StreamTemplates.mergeState(st, strIds, "doc_id", "raw")
    }
    assert(e.getMessage.contains("integral id column"))
    // the ADMISSION forms share the guard (ADVICE r20 #1): without it a
    // string id would cast("long") to NULL inside StreamQuota.admit and
    // hit the primitive-Long Dataset decode instead of erring loudly
    val e2 = intercept[IllegalArgumentException] {
      StreamTemplates.admitByFamily(strIds, "doc_id", "raw", cap = 2L)
    }
    assert(e2.getMessage.contains("integral id column"))
    val strDocs = Seq(("a", "<p>x</p>", "x", Seq(1.0f)))
      .toDF("doc_id", "raw", "text", "embedding")
    val e3 = intercept[IllegalArgumentException] {
      StreamTemplates.admitDocsByFamily(strDocs, "doc_id", "raw", "text",
        "embedding", cap = 2L)
    }
    assert(e3.getMessage.contains("integral id column"))
  }
}
