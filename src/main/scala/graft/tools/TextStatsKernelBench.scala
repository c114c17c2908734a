package graft.tools

import graft.functions.TextFunctions
import graft.functions.expressions.{CorpusStatsExpr, LangIdExpr, QualityStatsExpr, RepetitionStatsExpr, TermCountsExpr}
import graft.tables.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scratch experiment main (not part of the library surface): A/B timing
  * for the text-stats scan kernels — closure UDF twins vs native codegen
  * expressions — at fixture row count and at 10× replicated rows (the
  * UDF tax is per ROW — boundary conversion + encoder re-encode — so row
  * fan-out, not text amplification, isolates it).
  * Run: `sbt "runMain graft.tools.TextStatsKernelBench /root/testdata/sf0.1"`.
  */
object TextStatsKernelBench {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val docs = Tables.documents(spark, dir).select("doc_id", "text")
    val replicated = docs
      .select(col("doc_id"), col("text"), explode(lit((0 until 10).toArray)).as("cp"))
      .select("doc_id", "text")
      .repartition(32)
      .localCheckpoint(true) // pin so the fan-out isn't timed

    val pairs: Seq[(String, Column, Column)] = Seq(
      ("lang_id     ",
        TextFunctions.langIdUdf(col("text")),
        LangIdExpr.langId(col("text"))),
      ("quality     ",
        TextFunctions.qualityStatsUdf("english")(col("text")),
        QualityStatsExpr.qualityStats(col("text"), "english")),
      ("corpus_stats",
        TextFunctions.corpusStatsUdf(col("text")),
        CorpusStatsExpr.corpusStats(col("text"))),
      ("term_counts ",
        TextFunctions.termCountsUdf(col("text")),
        TermCountsExpr.termCounts(col("text"))),
      ("repetition  ",
        TextFunctions.repetitionStatsUdf(col("text")),
        RepetitionStatsExpr.repetitionStats(col("text"))))

    def time(label: String, df: DataFrame): Double = {
      df.queryExecution.toRdd.count() // warm
      val best = (1 to 5).map { _ =>
        val t0 = System.nanoTime()
        df.queryExecution.toRdd.count()
        (System.nanoTime() - t0) / 1e9
      }.min
      best
    }

    for ((name, base) <- Seq(("fixture", docs.localCheckpoint(true)), ("rows10x", replicated))) {
      pairs.foreach { case (label, udfCol, exprCol) =>
        val tu = time(label, base.select(udfCol.alias("v")))
        val te = time(label, base.select(exprCol.alias("v")))
        println(f"$name%-8s $label udf=$tu%.3f expr=$te%.3f speedup=${tu / te}%.2fx")
      }
    }
    spark.stop()
  }
}
