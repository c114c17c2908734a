package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Diagnostic for the exact AllPairs control (q18): measures the
  * candidate-pair population its runtime is proportional to, per fixture
  * scale. The q18 cost model is `rawCandRows` (prefix-index join fan-out,
  * the shuffle) + `distinctCandPairs` (exact-verify workload); when a
  * fixture regeneration changes corpus density these counts explain a
  * bench delta that would otherwise look like a code regression. Numbers
  * recorded in BASELINE.md.
  *
  * Usage: runMain graft.tools.CandidateDiag /root/testdata/sf0.01 [more dirs]
  */
object CandidateDiag {
  def main(args: Array[String]): Unit = {
    val dirs = if (args.nonEmpty) args.toSeq else Seq("/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]")
      .appName("graft-candidate-diag")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    try dirs.foreach(d => report(spark, d))
    finally spark.stop()
  }

  private def report(spark: SparkSession, dir: String): Unit = {
    val threshold = 0.5 // q18's registry threshold
    val docs = graft.tables.Tables.documents(spark, dir)
    val sets = docs.select(
      col("doc_id").alias("id"),
      graft.functions.expressions.ShingleHashSetExpr
        .shingleHashSet(col("text"), 3).alias("hs"))
      .localCheckpoint(true)
    // Mirrors Dedup.ngramJaccard's AllPairs candidate generation exactly
    // (prefix slice + inverted-index self-join + length filter).
    val prefixLen = (size(col("hs")).cast("double") * (1.0 - threshold) + lit(1e-9))
      .cast("long") + lit(1L)
    val pf = sets.select(
      col("id"),
      size(col("hs")).cast("long").alias("sz"),
      explode(slice(col("hs"), lit(1), prefixLen.cast("int"))).alias("h"))
    val cand = pf.toDF("id_a", "sz_a", "h")
      .join(pf.toDF("id_b", "sz_b", "h"), Seq("h"))
      .filter(
        col("id_a") < col("id_b") &&
          least(col("sz_a"), col("sz_b")).cast("double") >=
            greatest(col("sz_a"), col("sz_b")).cast("double") * threshold - lit(1e-9))
    val rawCandRows = cand.count()
    val distinctPairs = cand.select("id_a", "id_b").distinct().count()
    val nDocs = docs.count()
    val sz = sets.select(size(col("hs")).cast("long").alias("sz"))
    val Seq(avgSz, maxSz) =
      sz.agg(avg("sz"), max("sz")).collect()(0).toSeq.map(_.toString)
    val ex = sets.select(explode(col("hs")).alias("h"))
    val shingleRows = ex.count()
    val distinctShingles = ex.distinct().count()
    println(
      s"""{"diag":"q18_candidates","dir":"$dir","docs":$nDocs,""" +
        s""""rawCandRows":$rawCandRows,"distinctCandPairs":$distinctPairs,""" +
        s""""avgSetSize":$avgSz,"maxSetSize":$maxSz,""" +
        s""""shingleRows":$shingleRows,"distinctShingles":$distinctShingles}""")
  }
}
