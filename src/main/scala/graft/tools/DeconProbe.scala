package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch experiment main (not part of the library surface): measures
  * `Decontaminate.semanticMatches`' hit recall under clustered probing
  * (nLists > 1, nProbe < nLists) against its own probe-everything twin
  * (nProbe = nLists — exhaustive, the q99 oracle configuration) on the
  * driver fixtures. The number behind BASELINE.md's round-14 recall
  * table. Run: `sbt "runMain graft.tools.DeconProbe"`.
  */
object DeconProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (dir <- Seq("/root/testdata/sf0.01", "/root/testdata/sf0.1");
         t <- Seq(0.3, 0.4, 0.5)) {
      val emb = graft.tables.Tables.embeddings(spark, dir)
      val bench = emb.filter(col("vec_id") % 20 === 0)
      val train = emb.filter(col("vec_id") % 20 =!= 0)
      val nLists = 8
      val centroids = graft.operators.Similarity.trainCentroids(
        train, "vec_id", "embedding", nLists, seed = 42L, trainSample = 1024)
      def hits(nProbe: Int): Long = graft.operators.Decontaminate.semanticMatches(
        train, bench, "vec_id", "embedding", centroids, threshold = t, nProbe = nProbe)
        .count()
      val exact = hits(nLists)
      val perProbe = (1 to 4).map { p =>
        val h = hits(p)
        f"p$p=${if (exact == 0) 1.0 else h.toDouble / exact}%.3f"
      }.mkString(" ")
      println(s"[deconprobe] $dir t=$t nLists=$nLists exact_hits=$exact recall: $perProbe")
    }
    spark.stop()
  }
}
