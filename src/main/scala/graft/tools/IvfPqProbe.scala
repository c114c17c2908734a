package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch experiment main (not part of the library surface): measures
  * IVF-PQ end-to-end recall on the driver fixtures — the number behind
  * q82's pinned bound. For the q22 query vector (vec_id 0), counts how
  * many of the exact cosine top-20 appear in `ivfPqTopK`'s top-20
  * (coarse probe → PQ candidate scan → exact re-rank) across
  * (nLists, nProbe, rerank) settings.
  * Run: `sbt "runMain graft.tools.IvfPqProbe"`.
  */
object IvfPqProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (dir <- Seq("/root/testdata/sf0.01", "/root/testdata/sf0.1");
         norm <- Seq(false, true);
         (nLists, nProbe, rerank) <- Seq((16, 2, 100), (16, 4, 100), (16, 4, 200), (32, 8, 100))) {
      val raw = graft.tables.Tables.embeddings(spark, dir)
      // norm=true approximates SPHERICAL ivf-pq: euclidean routing /
      // training / encoding on unit vectors == cosine routing
      val emb =
        if (!norm) raw
        else raw.select(
          col("vec_id"),
          transform(col("embedding"),
            x => x / sqrt(aggregate(col("embedding"), lit(0.0d), (a, e) => a + e * e)))
            .cast("array<float>").alias("embedding"))
          .localCheckpoint(true)
      val q = emb.filter(col("vec_id") === 0).select("embedding")
        .head().getSeq[Float](0).map(_.toDouble)
      val ivfPqTop = graft.operators.Similarity.ivfPqTopK(
        emb, "vec_id", "embedding", q, k = 20,
        nLists = nLists, nProbe = nProbe, m = 16, nCodes = 64,
        rerank = rerank, trainSample = 2048)
      val exactTop = graft.operators.Similarity.bruteForceTopK(
        raw, "vec_id", "embedding",
        raw.filter(col("vec_id") === 0).select("embedding")
          .head().getSeq[Float](0).map(_.toDouble), k = 20)
      val hits = exactTop.select("vec_id").withColumnRenamed("vec_id", "id")
        .join(ivfPqTop.select("id"), Seq("id")).count()
      println(s"[ivfpqprobe] $dir norm=$norm nLists=$nLists nProbe=$nProbe rerank=$rerank hits=$hits/20")
    }
    spark.stop()
  }
}
