package graft.streaming

import graft.SparkTestBase
import graft.operators.Sampling
import graft.sinks.{InMemoryKVSink, ParquetKVSink}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import java.nio.file.Files

/** The tier's contract is batching invariance: after ANY micro-batch
  * boundaries, the reservoir equals the one-pass batch
  * `weightedSample` over everything ingested (A-ES priorities are
  * row-intrinsic, so the per-batch trim loses nothing).
  */
class WeightedReservoirSpec extends SparkTestBase {
  import spark.implicits._

  private val trigger = Trigger.ProcessingTime("50 milliseconds")
  private val k = 10

  private def row(i: Int): (String, Long, Double) =
    (s"g${i % 3}", i.toLong, 1.0 + (i % 7))

  test("streamed reservoir equals the one-pass batch weightedSample after any batching") {
    val all = (0 until 120).map(row)
    val batches = Seq(all.slice(0, 50), all.slice(50, 75), all.slice(75, 120))

    val input = MemoryStream[(String, Long, Double)](spark)
    val sink = new ParquetKVSink(Files.createTempDirectory("graft-wres").toString)
    val ckpt = Files.createTempDirectory("graft-wres-ckpt").toString
    val q = WeightedReservoir.start(
      input.toDF().toDF("grp", "id", "w"), sink, "res", ckpt, trigger,
      "grp", "id", "w", k)
    batches.foreach { bt => input.addData(bt: _*); q.processAllAvailable() }
    q.stop()

    val streamed = WeightedReservoir.sample(spark, sink, "res")
      .select("grp", "id", "w", "pri_micro")
      .as[(String, Long, Double, Long)].collect().toSet
    val batch = Sampling.weightedSample(all.toDF("grp", "id", "w"), "grp", "id", "w", k)
      .select("grp", "id", "w", "pri_micro")
      .as[(String, Long, Double, Long)].collect().toSet
    assert(streamed === batch)
    assert(streamed.groupBy(_._1).forall(_._2.size <= k))
  }

  test("unacked replay of the same rows is a no-op (deterministic priorities + key dedup)") {
    val sink = new InMemoryKVSink
    val rows = (0 until 60).map(row).toDF("grp", "id", "w")
    WeightedReservoir.applyBatch(rows, 0L, "grp", "id", "w", k, 42L, sink, "res")
    val first = WeightedReservoir.sample(spark, sink, "res")
      .select("grp", "id", "w", "pri_micro")
      .as[(String, Long, Double, Long)].collect().toSet
    // acked replay: skipped outright
    WeightedReservoir.applyBatch(rows, 0L, "grp", "id", "w", k, 42L, sink, "res")
    // unacked replay of the same content under a NEW batch id: merge of
    // identical rows, state unchanged
    WeightedReservoir.applyBatch(rows, 1L, "grp", "id", "w", k, 42L, sink, "res")
    val after = WeightedReservoir.sample(spark, sink, "res")
      .select("grp", "id", "w", "pri_micro")
      .as[(String, Long, Double, Long)].collect().toSet
    assert(after === first)
  }

  test("retire deletes ids exactly; the reservoir refills only from future batches") {
    val sink = new InMemoryKVSink
    val rows = (0 until 40).map(row).toDF("grp", "id", "w")
    WeightedReservoir.applyBatch(rows, 0L, "grp", "id", "w", k, 42L, sink, "res")
    val before = WeightedReservoir.sample(spark, sink, "res")
      .select("grp", "id", "w", "pri_micro")
      .as[(String, Long, Double, Long)].collect()
    val victims = before.take(3).map(_._2)
    WeightedReservoir.retire(
      spark, sink, "res", victims.map(Tuple1(_)).toSeq.toDF("id"), "id")
    val after = WeightedReservoir.sample(spark, sink, "res")
      .select("grp", "id", "w", "pri_micro")
      .as[(String, Long, Double, Long)].collect()
    assert(after.map(_._2).toSet === before.map(_._2).toSet -- victims)
    // a later batch refills the gap — and the refilled reservoir is the
    // batch sample over (survivors ∪ new rows)
    val more = (100 until 140).map(row).toDF("grp", "id", "w")
    WeightedReservoir.applyBatch(more, 1L, "grp", "id", "w", k, 42L, sink, "res")
    val refilled = WeightedReservoir.sample(spark, sink, "res")
      .select("grp", "id").as[(String, Long)].collect().toSet
    // the contract: the refilled reservoir is the batch sample over
    // (retained state ∪ future rows) — candidates evicted before the
    // retirement are unrecoverable by design, so they are absent from
    // BOTH sides here
    val expect = Sampling.weightedSample(
        after.map(r => (r._1, r._2, r._3)).toSeq.toDF("grp", "id", "w")
          .unionByName(more),
        "grp", "id", "w", k)
      .select("grp", "id").as[(String, Long)].collect().toSet
    assert(refilled === expect)
  }
}
