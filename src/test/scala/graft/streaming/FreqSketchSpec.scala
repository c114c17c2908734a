package graft.streaming

import graft.SparkTestBase
import graft.operators.CountMin
import graft.sinks.ParquetKVSink
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger

import java.nio.file.Files

/** Additivity is the whole tier: the streamed sketch must EQUAL the
  * batch-mode sketch of the union for any batch boundaries, and
  * retirement must be its exact inverse.
  */
class FreqSketchSpec extends SparkTestBase {
  import spark.implicits._

  private val trigger = Trigger.ProcessingTime("50 milliseconds")
  private val (depth, width) = (3, 64)

  test("streamed sketch state equals the batch sketch of the union; estimates match") {
    val batches = Seq(
      Seq.fill(5)("alpha") ++ Seq.fill(3)("beta"),
      Seq.fill(2)("alpha") ++ Seq("gamma"),
      Seq.fill(7)("delta") ++ Seq("beta"))

    val input = MemoryStream[String](spark)
    val sink = new ParquetKVSink(Files.createTempDirectory("graft-cms").toString)
    val ckpt = Files.createTempDirectory("graft-cms-ckpt").toString
    val q = FreqSketch.start(
      input.toDF().toDF("k"), "k", sink, "sketch", ckpt, trigger, depth, width)
    batches.foreach { bt => input.addData(bt: _*); q.processAllAvailable() }
    q.stop()

    val streamed = sink.read(spark, "sketch", FreqSketch.sketchStateSchema)
      .as[(Int, Long, Long)].collect().toSet
    val whole = CountMin.buildTable(
      batches.flatten.toDF("k"), "k", depth, width)
      .as[(Int, Long, Long)].collect().toSet
    assert(streamed === whole, "streamed state diverged from the batch sketch")

    val est = FreqSketch.estimate(
      spark, sink, "sketch",
      Seq("alpha", "beta", "gamma", "delta", "absent").toDF("k"),
      "k", depth, width)
      .as[(String, Long)].collect().toMap
    assert(est("alpha") >= 7L && est("beta") >= 4L && est("gamma") >= 1L && est("delta") >= 7L)
    // md5 buckets of 4 keys over 3x64 never triple-collide here —
    // deterministic fixture, pin exactness
    assert(est === Map("alpha" -> 7L, "beta" -> 4L, "gamma" -> 1L,
      "delta" -> 7L, "absent" -> 0L))
  }

  test("retire is the exact inverse of ingest; zero buckets leave the state") {
    val b1 = (Seq.fill(4)("x") ++ Seq.fill(2)("y")).toDF("k")
    val b2 = (Seq.fill(3)("x") ++ Seq("z")).toDF("k")
    val sink = new graft.sinks.InMemoryKVSink
    FreqSketch.applyBatch(b1, 0L, "k", depth, width, sink, "s")
    FreqSketch.applyBatch(b2, 1L, "k", depth, width, sink, "s")

    val afterRetire = FreqSketch.retireSketchState(
      sink.read(spark, "s", FreqSketch.sketchStateSchema), b1, "k", depth, width)
      .as[(Int, Long, Long)].collect().toSet
    val onlyB2 = CountMin.buildTable(b2, "k", depth, width)
      .as[(Int, Long, Long)].collect().toSet
    assert(afterRetire === onlyB2, "retire left phantom or missing mass")
  }

  test("replayed micro-batch is a no-op") {
    val sink = new graft.sinks.InMemoryKVSink
    val b = Seq("a", "a", "b").toDF("k")
    FreqSketch.applyBatch(b, 0L, "k", depth, width, sink, "s")
    val first = sink.read(spark, "s", FreqSketch.sketchStateSchema)
      .as[(Int, Long, Long)].collect().toSet
    FreqSketch.applyBatch(b, 0L, "k", depth, width, sink, "s")
    val second = sink.read(spark, "s", FreqSketch.sketchStateSchema)
      .as[(Int, Long, Long)].collect().toSet
    assert(first === second, "replay double-counted")
  }
}
