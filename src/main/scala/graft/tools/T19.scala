package graft.tools

import graft.tables.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scratch experiment main (not part of the library surface): A/B timing
  * for the AllPairs Jaccard pipeline — recompute the shingle-set table
  * in all three plan positions (current shape; scan-side hashing runs 3x)
  * vs localCheckpoint it once. Run:
  * `sbt "runMain graft.tools.T19 /root/testdata/sf0.1"`.
  */
object T19 {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.optimizer.excludedRules",
        "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = Tables.documents(spark, dir)

    def allPairs(sets: DataFrame): DataFrame = {
      val threshold = 0.5
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
        .select("id_a", "id_b")
        .distinct()
      val c = graft.functions.expressions.SortedIntersectCountLong
        .intersectCountF(col("hs_a"), col("hs_b"))
      val u = size(col("hs_a")).cast("long") + size(col("hs_b")).cast("long") - c
      cand
        .join(sets.toDF("id_a", "hs_a"), Seq("id_a"))
        .join(sets.toDF("id_b", "hs_b"), Seq("id_b"))
        .select(col("id_a"), col("id_b"),
          when(u === 0L, lit(1.0)).otherwise(c.cast("double") / u.cast("double")).alias("jaccard"))
        .filter(col("jaccard") >= 0.5)
    }

    def sets(): DataFrame = docs.select(
      col("doc_id").alias("id"),
      graft.functions.TextFunctions.distinctShingleHashesUdf(3)(col("text")).alias("hs"))

    def time(label: String)(f: => Long): Unit = {
      f // warm
      val rounds = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); val n = f; val s = (System.nanoTime() - t0) / 1e9
        (n, s)
      }
      println(f"$label: rows=${rounds.head._1} " +
        rounds.map(r => f"${r._2}%.2f").mkString("s [", ", ", " s]"))
    }

    time("A recompute-3x") {
      allPairs(sets()).queryExecution.toRdd.count()
    }
    time("B checkpoint-sets") {
      val s = sets().localCheckpoint(true)
      val n = allPairs(s).queryExecution.toRdd.count()
      s.queryExecution.analyzed.collectFirst {
        case l: org.apache.spark.sql.execution.LogicalRDD => l.rdd.unpersist(false)
      }
      n
    }
    time("C persist-sets") {
      val s = sets().persist()
      val n = allPairs(s).queryExecution.toRdd.count()
      s.unpersist(false)
      n
    }
    spark.stop()
  }
}
