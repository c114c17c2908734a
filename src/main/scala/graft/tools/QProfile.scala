package graft.tools

import org.apache.spark.scheduler._
import org.apache.spark.sql.SparkSession

import scala.collection.mutable

/** Scratch stage-level profiler (not part of the library surface): runs
  * one registry query end-to-end (construction + toRdd.count, the bench
  * action) under a listener and prints every job/stage with duration,
  * task count, and shuffle bytes — the local stand-in for the Spark UI
  * (disabled in this sandbox) that guide §1.1 starts from. Run:
  * `sbt "runMain graft.tools.QProfile q77_semantic_dedup /root/testdata/sf0.1 [reps]"`.
  */
object QProfile {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse(sys.error("usage: QProfile <query> [sfDir] [reps]"))
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val reps = if (args.length > 2) args(2).toInt else 2
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.optimizer.excludedRules",
        "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    final case class StageRec(
      id: Int, name: String, tasks: Int, ms: Long,
      shufReadMB: Double, shufWriteMB: Double, inputMB: Double)
    val stages = mutable.ArrayBuffer.empty[StageRec]
    val jobs = mutable.ArrayBuffer.empty[(Int, Long, Int)] // id, ms, nStages
    val jobStart = mutable.Map.empty[Int, Long]
    val listener = new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val ms = (for {s <- si.submissionTime; c <- si.completionTime} yield c - s).getOrElse(-1L)
        val m = si.taskMetrics
        stages += StageRec(si.stageId, si.name.take(90), si.numTasks, ms,
          m.shuffleReadMetrics.totalBytesRead / 1e6,
          m.shuffleWriteMetrics.bytesWritten / 1e6,
          m.inputMetrics.bytesRead / 1e6)
      }
      override def onJobStart(js: SparkListenerJobStart): Unit =
        jobStart(js.jobId) = js.time
      override def onJobEnd(je: SparkListenerJobEnd): Unit =
        jobs += ((je.jobId, je.time - jobStart.getOrElse(je.jobId, je.time), 0))
    }

    // warm pass(es) without listener; caches cleared so the measured
    // pass computes from parquet (graft.Bench's per-query hygiene)
    (1 until reps).foreach { _ =>
      graft.SparkEntry.queries(name)(spark, dir).queryExecution.toRdd.count()
      spark.sharedState.cacheManager.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
    }
    spark.sparkContext.addSparkListener(listener)
    val t0 = System.nanoTime()
    val df = graft.SparkEntry.queries(name)(spark, dir)
    val tCons = System.nanoTime()
    df.queryExecution.toRdd.count()
    val tEnd = System.nanoTime()
    Thread.sleep(500) // let the listener bus drain
    println(f"[qprofile] $name construction ${(tCons - t0) / 1e9}%.3f s, " +
      f"action ${(tEnd - tCons) / 1e9}%.3f s, total ${(tEnd - t0) / 1e9}%.3f s")
    println(f"[qprofile] jobs=${jobs.size} stages=${stages.size} " +
      f"stageMsSum=${stages.map(_.ms).sum} jobMsSum=${jobs.map(_._2).sum}")
    println("[qprofile] top stages by duration:")
    stages.sortBy(-_.ms).take(25).foreach { s =>
      println(f"[qprofile]   stage ${s.id}%4d ${s.ms}%6d ms  tasks=${s.tasks}%3d " +
        f"in=${s.inputMB}%8.1fMB sr=${s.shufReadMB}%8.2fMB sw=${s.shufWriteMB}%8.2fMB  ${s.name}")
    }
    spark.stop()
  }
}
