package graft.tools

import graft.classify.TextClassifier
import graft.sinks.InMemoryKVSink
import graft.streaming.StreamingPipeline
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import scala.collection.mutable

/** Scratch experiment main (not part of the library surface): profiles
  * WHERE the per-micro-batch fixed cost goes in the full reference
  * topology, explaining the batch-size→throughput knee BASELINE.md
  * records (~2.5k lines/s at 10k-line batches vs ~39k at 125k).
  *
  * For each batch size the full topology (parse → tokenize → running
  * word counts AND classify → running category counts, both
  * snapshotting per batch) runs the same total line count, and the
  * per-trigger `StreamingQueryProgress.durationMs` phases are averaged
  * across both queries' progress events:
  *
  *  - `addBatch`       — plan execution incl. state-store read/commit
  *                       and the foreachBatch snapshot write
  *  - `queryPlanning`  — incremental plan re-analysis per trigger
  *  - `walCommit` / `commitOffsets` — offset-log + commit-log fsyncs
  *  - `getBatch` / `latestOffset`   — source-side bookkeeping
  *
  * The fixed (per-trigger, size-independent) component is what caps
  * small-batch throughput; the variable component scales with lines.
  * Run: `sbt "runMain graft.tools.MicroBatchBench"` (env:
  * SPARK_GRAFT_MB_LINES total lines per size, default 200000;
  * SPARK_GRAFT_MB_PARTITIONS shuffle/state partitions, default = cpus —
  * sweep it to measure how the state-commit floor scales with the
  * number of state-store instances; SPARK_GRAFT_MB_ROCKSDB=1 swaps in
  * the RocksDB state store with changelog checkpointing — the
  * commit-a-delta-not-a-snapshot knob).
  */
object MicroBatchBench {
  def main(args: Array[String]): Unit = {
    val total = sys.env.getOrElse("SPARK_GRAFT_MB_LINES", "200000").toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val parts = sys.env.getOrElse("SPARK_GRAFT_MB_PARTITIONS", cpus)
    val rocks = sys.env.get("SPARK_GRAFT_MB_ROCKSDB").contains("1")
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", parts)
    if (rocks) {
      builder.config("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      builder.config(
        "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled", "true")
    }
    val spark = builder
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val vocab = Array("hello", "world", "stream", "analytics", "kappa",
      "pogchamp", "great", "play", "again", "chat", "message", "spark")
    def line(i: Int): String = {
      val w1 = vocab(i % vocab.length)
      val w2 = vocab((i / vocab.length) % vocab.length)
      val w3 = vocab((i * 7 + 3) % vocab.length)
      s":user$i!user$i@user$i.tmi.twitch.tv PRIVMSG #bench :$w1 $w2 $w3 msg $i"
    }

    val phases = Seq("triggerExecution", "addBatch", "queryPlanning",
      "walCommit", "commitOffsets", "getBatch", "latestOffset")
    println(f"${"batch"}%8s ${"batches"}%7s ${"lines/s"}%9s  " +
      (phases ++ Seq("stateUpdate", "stateCommit"))
        .map(p => f"${p.take(9)}%9s").mkString(" ") + "  (mean ms/trigger)")

    for (batchSize <- Seq(2500, 10000, 50000, 125000)) {
      val nBatches = math.max(1, total / batchSize)
      val input = MemoryStream[String](spark)
      val sink = new InMemoryKVSink
      val ckpt = java.nio.file.Files.createTempDirectory("graft-mbb").toString
      val (wc, cc) = StreamingPipeline.start(
        input.toDF(),
        StreamingPipeline.Config(channel = "bench", batchInterval = "0 seconds"),
        TextClassifier.default,
        sink,
        ckpt)
      // warmup trigger compiles/initializes both branches; its progress
      // events are excluded below by batchId bookkeeping
      input.addData((0 until 1000).map(line))
      wc.processAllAvailable(); cc.processAllAvailable()
      val warmupBatches = Set(wc, cc).map(q => q.lastProgress.batchId)

      val t0 = System.nanoTime()
      var b = 0
      while (b < nBatches) {
        input.addData((0 until batchSize).map(i => line(1000 + b * batchSize + i)))
        wc.processAllAvailable(); cc.processAllAvailable()
        b += 1
      }
      val sec = (System.nanoTime() - t0) / 1e9
      val rate = nBatches.toLong * batchSize / sec

      val agg = mutable.Map.empty[String, Long]
      var events = 0
      for (q <- Seq(wc, cc); p <- q.recentProgress
           if p.batchId > warmupBatches.max && p.numInputRows > 0) {
        events += 1
        p.durationMs.forEach((k, v) => agg(k) = agg.getOrElse(k, 0L) + v)
        // state-store sub-costs inside addBatch: update loop vs commit fsync
        for (so <- p.stateOperators) {
          agg("stateUpdate") = agg.getOrElse("stateUpdate", 0L) + so.allUpdatesTimeMs
          agg("stateCommit") = agg.getOrElse("stateCommit", 0L) + so.commitTimeMs
        }
      }
      wc.stop(); cc.stop()
      val means = (phases ++ Seq("stateUpdate", "stateCommit")).map(p =>
        if (events == 0) 0.0 else agg.getOrElse(p, 0L).toDouble / events)
      println(f"$batchSize%8d $nBatches%7d $rate%9.0f  " +
        means.map(m => f"$m%9.1f").mkString(" "))
    }
    spark.stop()
  }
}
