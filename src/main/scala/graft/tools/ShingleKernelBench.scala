package graft.tools

import graft.tables.Tables
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch experiment main (not part of the library surface): A/B timing
  * for the scan-side shingle-hash kernel — closure UDF twin vs native
  * codegen expression — at fixture doc length and at ~20× amplified doc
  * length (repeat(text, 20)) approximating real KB-size corpus docs,
  * where BASELINE.md notes scan-side hashing dominates the dedup family.
  * Run: `sbt "runMain graft.tools.ShingleKernelBench /root/testdata/sf0.1"`.
  */
object ShingleKernelBench {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val docs = Tables.documents(spark, dir).select("doc_id", "text")
    val amplified = docs.select(col("doc_id"), repeat(col("text"), 20).alias("text"))
      .localCheckpoint(true) // pin the amplified text so repeat() isn't timed

    def udfSets(df: org.apache.spark.sql.DataFrame) = df.select(
      graft.functions.TextFunctions.distinctShingleHashesUdf(3)(col("text")).alias("hs"))
    def exprSets(df: org.apache.spark.sql.DataFrame) = df.select(
      graft.functions.expressions.ShingleHashSetExpr.shingleHashSet(col("text"), 3).alias("hs"))

    def time(label: String)(f: => Long): Unit = {
      f // warm
      val rounds = (1 to 5).map { _ =>
        val t0 = System.nanoTime(); val n = f; val s = (System.nanoTime() - t0) / 1e9
        (n, s)
      }
      val best = rounds.map(_._2).min
      println(f"$label: rows=${rounds.head._1} best=$best%.3f " +
        rounds.map(r => f"${r._2}%.2f").mkString("all [", ", ", " s]"))
    }

    for ((name, df) <- Seq(("fixture", docs.localCheckpoint(true)), ("amplified20x", amplified))) {
      time(s"$name UDF ") { udfSets(df).queryExecution.toRdd.count() }
      time(s"$name expr") { exprSets(df).queryExecution.toRdd.count() }
    }
    spark.stop()
  }
}
