package graft

import graft.classify.TextClassifier
import graft.sinks.InMemoryKVSink
import graft.streaming.StreamingPipeline
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Streaming throughput bench: drives the FULL reference topology (IRC
  * parse → tokenize/stop-words → running word counts AND classify →
  * running category counts, both snapshotting per batch) over an
  * in-memory line stream, and reports end-to-end lines/second.
  *
  * Context for the number: the reference operates on one Twitch
  * channel's PRIVMSG stream — order 1-100 msg/s (BASELINE.md) — so
  * single-node headroom of 4-5 orders of magnitude demonstrates
  * "matches-or-beats" throughput at the same scale with room for
  * thousands of channels.
  *
  * `SPARK_GRAFT_STREAM_LINES` (default 200k) lines are pre-generated,
  * fed in `SPARK_GRAFT_STREAM_BATCHES` (default 20) equal batches;
  * timing spans first-batch start to the final snapshot write. Prints
  * one JSON line: {"metric":"stream_lines_per_sec", ...}.
  */
object StreamBench {
  def main(args: Array[String]): Unit = {
    val nLines = sys.env.getOrElse("SPARK_GRAFT_STREAM_LINES", "200000").toInt
    val nBatches = sys.env.getOrElse("SPARK_GRAFT_STREAM_BATCHES", "20").toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val vocab = Array("hello", "world", "stream", "analytics", "kappa",
      "pogchamp", "great", "play", "again", "chat", "message", "spark")
    def line(i: Int): String = {
      val w1 = vocab(i % vocab.length)
      val w2 = vocab((i / vocab.length) % vocab.length)
      val w3 = vocab((i * 7 + 3) % vocab.length)
      s":user$i!user$i@user$i.tmi.twitch.tv PRIVMSG #bench :$w1 $w2 $w3 msg $i"
    }

    val input = MemoryStream[String](spark)
    val sink = new InMemoryKVSink
    val ckpt = java.nio.file.Files.createTempDirectory("graft-sbench").toString
    val (wc, cc) = StreamingPipeline.start(
      input.toDF(),
      StreamingPipeline.Config(channel = "bench", batchInterval = "0 seconds"),
      TextClassifier.default,
      sink,
      ckpt)

    // warmup: one small batch compiles/initializes both branches
    input.addData((0 until 1000).map(line))
    wc.processAllAvailable(); cc.processAllAvailable()

    val perBatch = nLines / nBatches
    val t0 = System.nanoTime()
    var b = 0
    while (b < nBatches) {
      input.addData((0 until perBatch).map(i => line(1000 + b * perBatch + i)))
      // per-batch drain = the reference's micro-batch cadence (each batch
      // fully processed + snapshotted before the next arrives)
      wc.processAllAvailable(); cc.processAllAvailable()
      b += 1
    }
    val sec = (System.nanoTime() - t0) / 1e9
    val rate = nLines / sec
    wc.stop(); cc.stop()
    println(
      s"""{"metric":"stream_lines_per_sec","value":$rate,"unit":"lines/sec","lines":$nLines,"batches":$nBatches,"sec":$sec}""")
    spark.stop()
  }
}
