package graft.streaming

import graft.SparkTestBase
import graft.functions.TextFunctions
import graft.operators.{HistQuantile, Kmv}
import graft.sinks.{InMemoryKVSink, ParquetKVSink}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import java.nio.file.Files

/** Batching invariance is the tier's contract: after any micro-batch
  * boundaries, the histogram state equals the one-pass histogram and
  * the KMV state equals the one-pass minima; profile queries read the
  * state alone.
  */
class DistStatsSpec extends SparkTestBase {
  import spark.implicits._

  private val trigger = Trigger.ProcessingTime("50 milliseconds")
  private val k = 64

  private def doc(i: Int, src: String, words: Int): (Long, String, String) =
    (i.toLong, (0 until words).map(j => s"w${(i * 13 + j * 7) % 50}").mkString(" "), src)

  test("streamed hist+kmv states equal the one-pass build; profiles read state only") {
    val batches = Seq(
      (0 until 30).map(i => doc(i, s"s${i % 2}", 5 + i % 40)),
      (30 until 45).map(i => doc(i, s"s${i % 2}", 1 + i % 25)),
      (45 until 70).map(i => doc(i, s"s${i % 2}", 10 + i % 60)))

    val input = MemoryStream[(Long, String, String)](spark)
    val sink = new ParquetKVSink(Files.createTempDirectory("graft-dist").toString)
    val ckpt = Files.createTempDirectory("graft-dist-ckpt").toString
    val q = DistStats.start(
      input.toDF().toDF("doc_id", "text", "source"), sink, "stats", ckpt, trigger, k = k)
    batches.foreach { bt => input.addData(bt: _*); q.processAllAvailable() }
    q.stop()

    val all = batches.flatten.toDF("doc_id", "text", "source")
    val oneHist = HistQuantile.histogram(HistQuantile.tokenCounts(all, "source", "text"))
      .as[(String, Int, Long)].collect().toSet
    val streamedHist = sink.read(spark, "stats_hist", DistStats.histStateSchema)
      .as[(String, Int, Long)].collect().toSet
    assert(streamedHist === oneHist, "hist state diverged from the one-pass histogram")

    val oneKmv = all
      .select(col("source"), explode(TextFunctions.tokens(col("text"))).alias("tok"))
      .groupBy("source")
      .agg(graft.functions.expressions.KmvSketchAgg.kmvSketch(
        TextFunctions.md5Hash60(col("tok")), k).alias("kmv"))
      .select(col("source"), explode(col("kmv")).alias("h"))
      .as[(String, Long)].collect().toSet
    val streamedKmv = sink.read(spark, "stats_kmv", DistStats.kmvStateSchema)
      .as[(String, Long)].collect().toSet
    assert(streamedKmv === oneKmv, "kmv state diverged from the one-pass minima")

    // profile queries: state-only, and consistent with the batch operators
    val quant = DistStats.quantiles(spark, sink, "stats").collect()
    assert(quant.length === 6, s"2 sources x 3 pcts expected: ${quant.length}")
    val batchBounds = HistQuantile.profileFromHistogram(
      HistQuantile.histogram(HistQuantile.tokenCounts(all, "source", "text")),
      Seq(50, 90, 99)).collect().toSet
    assert(quant.toSet === batchBounds)

    val dist = DistStats.distinct(spark, sink, "stats", k)
      .as[(String, Long)].collect().toMap
    val exact = all.select(col("source"), explode(TextFunctions.tokens(col("text"))).alias("t"))
      .groupBy("source").agg(countDistinct("t").alias("n")).as[(String, Long)].collect().toMap
    for ((s, n) <- exact) {
      val est = dist(s)
      // 50 distinct words < k=64: sketch is exact here
      assert(est === n, s"source $s: est $est vs exact $n")
    }
  }

  test("replayed micro-batch is a no-op for both states; a crash between the writes replays only the missing one") {
    val sink = new InMemoryKVSink
    val b0 = Seq(doc(0, "s", 9), doc(1, "s", 17)).toDF("doc_id", "text", "source")
    val b1 = Seq(doc(2, "s", 33)).toDF("doc_id", "text", "source")
    DistStats.applyBatch(b0, 0L, "source", "text", k, sink, "st")
    DistStats.applyBatch(b1, 1L, "source", "text", k, sink, "st")
    val hist1 = sink.read(spark, "st_hist", DistStats.histStateSchema).collect().toSet
    val kmv1 = sink.read(spark, "st_kmv", DistStats.kmvStateSchema).collect().toSet
    DistStats.applyBatch(b1, 1L, "source", "text", k, sink, "st")
    assert(sink.read(spark, "st_hist", DistStats.histStateSchema).collect().toSet === hist1,
      "replay double-counted the histogram")
    assert(sink.read(spark, "st_kmv", DistStats.kmvStateSchema).collect().toSet === kmv1)

    // crash between the two writes: hist committed+acked, kmv did not —
    // the replay must skip the histogram (per-table ack) and apply kmv
    val b2 = Seq(doc(3, "s", 21)).toDF("doc_id", "text", "source")
    val histPre = sink.read(spark, "st_hist", DistStats.histStateSchema)
    sink.write(DistStats.mergeHistState(histPre, b2, "source", "text"),
      "st_hist", org.apache.spark.sql.SaveMode.Overwrite)
    DedupIngest.markApplied(spark, sink, "st_hist", 2L)
    DistStats.applyBatch(b2, 2L, "source", "text", k, sink, "st")
    val expectHist = HistQuantile.histogram(HistQuantile.tokenCounts(
      Seq(doc(0, "s", 9), doc(1, "s", 17), doc(2, "s", 33), doc(3, "s", 21))
        .toDF("doc_id", "text", "source"), "source", "text")).collect().toSet
    assert(sink.read(spark, "st_hist", DistStats.histStateSchema).collect().toSet === expectHist,
      "per-table ack failed: histogram re-applied or skipped")
    val dist = DistStats.distinct(spark, sink, "st", k).as[(String, Long)].collect().toMap
    assert(dist("s") > 0L)
  }

  test("histogram retirement is the exact inverse; KMV stays a rebuild (documented trade)") {
    val sink = new InMemoryKVSink
    val b0 = Seq(doc(10, "s", 12), doc(11, "s", 30)).toDF("doc_id", "text", "source")
    val b1 = Seq(doc(12, "s", 7)).toDF("doc_id", "text", "source")
    DistStats.applyBatch(b0, 0L, "source", "text", k, sink, "st")
    DistStats.applyBatch(b1, 1L, "source", "text", k, sink, "st")
    val after = DistStats.retireHist(
      sink.read(spark, "st_hist", DistStats.histStateSchema), b0, "source", "text")
      .as[(String, Int, Long)].collect().toSet
    val onlyB1 = HistQuantile.histogram(HistQuantile.tokenCounts(b1, "source", "text"))
      .as[(String, Int, Long)].collect().toSet
    assert(after === onlyB1, "hist retire left phantom or missing mass")
  }
}
