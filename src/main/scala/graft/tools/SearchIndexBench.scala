package graft.tools

import graft.sinks.ParquetKVSink
import graft.streaming.SearchIndex
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger

/** Scratch experiment main (not part of the library surface): measures
  * the streaming BM25 index's sustained ingest rate at several batch
  * sizes, plus query latency served from the live index BEFORE and
  * AFTER compaction (and the delta-partition count compaction
  * collapses) — the numbers behind BASELINE.md's round-14 search-index
  * table.
  *
  * The synthetic stream reuses the unified-ingest generator's word
  * soup (12-word vocabulary + a unique leading token per doc), so the
  * df table stays Zipf-realistic (a dozen hot terms + a long unique
  * tail) while postings volume grows linearly.
  *
  * Run: `sbt "runMain graft.tools.SearchIndexBench"` (env:
  * SPARK_GRAFT_SB_LINES total docs per size, default 30000).
  */
object SearchIndexBench {
  def main(args: Array[String]): Unit = {
    val total = sys.env.getOrElse("SPARK_GRAFT_SB_LINES", "30000").toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val words = Array("stream", "corpus", "dedup", "vector", "shard", "token",
      "merge", "batch", "index", "probe", "cell", "band")
    def text(seed: Int): String =
      s"doc$seed " + (0 until 19).map(j => words((seed * 31 + j * 7) % words.length)).mkString(" ")
    val query = Seq("dedup", "vector", "doc4242")

    println(f"${"batch"}%8s ${"batches"}%7s ${"docs/s"}%8s ${"search ms"}%10s " +
      f"${"compacted ms"}%13s ${"parts"}%6s ${"->"}%3s ${"parts'"}%7s")
    for (batchSize <- Seq(2500, 10000, 50000)) {
      val nBatches = math.max(1, total / batchSize)
      val input = MemoryStream[(Long, String)](spark)
      val root = java.nio.file.Files.createTempDirectory("graft-sb").toString
      val sink = new ParquetKVSink(s"$root/state")
      val idx = s"$root/postings"
      val q = SearchIndex.start(
        input.toDF().toDF("doc_id", "text"), "doc_id", "text",
        idx, sink, "srch", s"$root/ckpt", Trigger.ProcessingTime("0 seconds"))
      input.addData((0 until 1000).map(i => (i.toLong, text(i))))
      q.processAllAvailable() // warmup trigger excluded from the rate

      val t0 = System.nanoTime()
      var b = 0
      while (b < nBatches) {
        input.addData((0 until batchSize).map { i =>
          val id = 1000 + b * batchSize + i; (id.toLong, text(id))
        })
        q.processAllAvailable()
        b += 1
      }
      val sec = (System.nanoTime() - t0) / 1e9
      q.stop()
      val rate = nBatches.toLong * batchSize / sec

      def searchMs(): Double = {
        val reps = 5
        val t = System.nanoTime()
        (0 until reps).foreach { _ =>
          SearchIndex.search(spark, idx, sink, "srch", query).collect()
        }
        (System.nanoTime() - t) / 1e6 / reps
      }
      def parts(): Int = {
        val p = new org.apache.hadoop.fs.Path(idx)
        p.getFileSystem(spark.sparkContext.hadoopConfiguration)
          .globStatus(new org.apache.hadoop.fs.Path(s"$idx/tb=*/batch=*")).length
      }
      val before = searchMs()
      val p0 = parts()
      SearchIndex.compactPostings(spark, idx)
      val after = searchMs()
      val p1 = parts()
      println(f"$batchSize%8d $nBatches%7d $rate%8.0f $before%10.0f $after%13.0f $p0%6d  -> $p1%6d")
    }
    spark.stop()
  }
}
