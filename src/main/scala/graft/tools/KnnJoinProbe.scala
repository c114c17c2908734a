package graft.tools

import graft.operators.Similarity
import graft.tables.Tables
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measurement main (not part of the library surface): per-query recall
  * of the IVF kNN JOIN (`Similarity.ivfKnnJoin`) against its
  * probe-everything exact twin, across probe counts — the numbers
  * behind q85's recall bound. Run:
  * `sbt "runMain graft.tools.KnnJoinProbe /root/testdata/sf0.01"`.
  */
object KnnJoinProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.optimizer.excludedRules",
        "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val emb = Tables.embeddings(spark, dir)
    val queries = emb.filter(col("vec_id") % 40 === 0)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val k = 10
    val centroids = Similarity.trainCentroids(
      emb, "vec_id", "embedding", nLists = 16, seed = 42L, trainSample = 2048)
    val exact = Similarity.knnJoinWithCentroids(
      emb, "vec_id", "embedding", queries, "qid", "qvec", k, nProbe = 16, centroids)
      .persist()
    exact.count()

    Seq(2, 4, 8, 12, 16).foreach { nProbe =>
      val ann = Similarity.knnJoinWithCentroids(
        emb, "vec_id", "embedding", queries, "qid", "qvec", k, nProbe, centroids)
      // left join from the full QUERY set (not ann's output — a query
      // with zero ann rows must average in at 0, not vanish; same
      // guard as q85)
      val stats = queries.select("qid")
        .join(
          ann.join(exact, Seq("qid", "vec_id"))
            .groupBy("qid").agg(count(lit(1)).as("h")),
          Seq("qid"), "left")
        .select(coalesce(col("h"), lit(0L)).alias("n_hit"))
        .agg(
          count(lit(1)).as("nq"),
          min("n_hit").as("min_hit"),
          avg(col("n_hit").cast("double") / k).as("recall"))
        .head()
      println(f"nProbe=$nProbe%2d  nq=${stats.getLong(0)}%3d  " +
        f"minHits=${stats.getLong(1)}%2d/$k  meanRecall=${stats.getDouble(2)}%.3f")
    }
    exact.unpersist()
    spark.stop()
  }
}
