package graft.streaming

import graft.SparkTestBase
import graft.operators.NgramLm
import graft.sinks.ParquetKVSink
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger

import java.nio.file.Files

/** Live per-source quality histogram (`QualityProfile`): multi-batch
  * ingest against a frozen LM must land on exactly the q104-shape batch
  * rollup over the union, independent of batch partitioning and
  * arrival order; replays are no-ops.
  */
class QualityProfileSpec extends SparkTestBase {
  import spark.implicits._

  private val trigger = Trigger.ProcessingTime("50 milliseconds")

  private val textA = (1 to 30).map(i => s"alpha$i").mkString(" ")
  private val textB = (1 to 30).map(i => s"beta$i").mkString(" ")
  private def junk(seed: Int): String =
    (1 to 30).map(i => s"zz${seed}_$i").mkString(" ")

  private def lmDir(): String = {
    val dir = Files.createTempDirectory("qp-lm").toString
    NgramLm.saveLm(
      NgramLm.train(
        Seq((0L, textA), (1L, textB)).toDF("doc_id", "text"), "doc_id", "text"),
      dir)
    dir
  }

  private type Doc = (Long, String, String)
  private val batches: Seq[Seq[Doc]] = Seq(
    Seq((1L, textA, "web"), (2L, junk(2), "web"), (3L, textB, "books")),
    Seq((4L, junk(4), null), (5L, textA + " alpha1", "web")),
    Seq((6L, junk(6), "books"), (7L, "one", "web"))) // 7: unscorable

  private def expected(lm: String): Set[(String, Long, Long, Double, Double)] = {
    val union = batches.flatten.toDF("doc_id", "text", "source")
    QualityProfile.profileDelta(
        union, "doc_id", "text", "source", NgramLm.loadLm(spark, lm))
      .as[(String, Long, Long, Double, Double)].collect().toSet
  }

  private def runStream(lm: String, order: Seq[Seq[Doc]]): Set[(String, Long, Long, Double, Double)] = {
    val input = MemoryStream[Doc](spark)
    val sink = new ParquetKVSink(Files.createTempDirectory("qp-state").toString)
    val ckpt = Files.createTempDirectory("qp-ckpt").toString
    val q = QualityProfile.start(
      input.toDF().toDF("doc_id", "text", "source"),
      "doc_id", "text", "source", lm, sink, "qp", ckpt, trigger)
    order.foreach { b => input.addData(b: _*); q.processAllAvailable() }
    q.stop()
    sink.read(spark, "qp", QualityProfile.stateSchema)
      .as[(String, Long, Long, Double, Double)].collect().toSet
  }

  test("streamed histogram equals the batch rollup over the union (incl. null source)") {
    val lm = lmDir()
    val got = runStream(lm, batches)
    val exp = expected(lm)
    assert(got === exp)
    assert(exp.nonEmpty)
    // junk and in-domain docs land in different bins
    assert(exp.map(_._2).size >= 2, s"expected spread across bins: $exp")
    // doc 7 (single token) is in no bin: total docs counted = 6
    assert(exp.toSeq.map(_._3).sum === 6L)
  }

  test("arrival order does not change the state") {
    val lm = lmDir()
    assert(runStream(lm, batches.reverse) === expected(lm))
  }

  test("replaying an applied batch id is a no-op") {
    val lm = lmDir()
    val sink = new ParquetKVSink(Files.createTempDirectory("qp-replay").toString)
    def apply(rows: Seq[Doc], id: Long): Unit =
      QualityProfile.applyBatch(
        rows.toDF("doc_id", "text", "source"), id,
        "doc_id", "text", "source", lm, sink, "qp")
    apply(batches.head, 0L)
    val once = sink.read(spark, "qp", QualityProfile.stateSchema)
      .as[(String, Long, Long, Double, Double)].collect().toSet
    apply(batches.head, 0L) // replay
    val twice = sink.read(spark, "qp", QualityProfile.stateSchema)
      .as[(String, Long, Long, Double, Double)].collect().toSet
    assert(once === twice)
  }
}
