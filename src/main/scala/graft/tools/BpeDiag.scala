package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Cost split of the apply-BPE family (q93/q95-q97): merge-list
  * training (explode + aggregate + top-50 collect) vs the apply
  * projection (chained replace + parse + stats). Numbers recorded in
  * BASELINE.md.
  *
  * Usage: runMain graft.tools.BpeDiag /root/testdata/sf0.1
  */
object BpeDiag {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]")
      .appName("graft-bpe-diag")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    try {
      val docs = graft.tables.Tables.documents(spark, dir)
      docs.count() // warm the scan
      def time[T](f: => T): (T, Double) = {
        val t0 = System.nanoTime(); val r = f; (r, (System.nanoTime() - t0) / 1e9)
      }
      // two passes, report the second (JIT-warm) like the bench's min-of-2
      var trainSec = 0.0; var applySec = 0.0; var wordSec = 0.0
      var merges: Seq[(String, String)] = Seq.empty
      (1 to 2).foreach { _ =>
        val (m, t1) = time(graft.operators.Bpe.rankedBigramMerges(docs, "text", 50))
        merges = m; trainSec = t1
        val (_, t2) = time(
          graft.operators.Bpe.tokenStats(docs, "doc_id", "text", merges)
            .queryExecution.toRdd.count())
        applySec = t2
        val (_, t3) = time(
          graft.operators.Bpe.tokenizeViaWords(docs, "doc_id", "text", merges)
            .queryExecution.toRdd.count())
        wordSec = t3
      }
      println(s"""{"diag":"bpe_cost_split","dir":"$dir","trainSec":$trainSec,""" +
        s""""applySec":$applySec,"applyViaWordsSec":$wordSec}""")
    } finally spark.stop()
  }
}
