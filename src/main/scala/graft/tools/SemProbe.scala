package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch experiment main (not part of the library surface): measures
  * `Similarity.semanticDedup`'s pair recall against the exact tier on
  * the driver fixtures, across thresholds — the number behind the
  * scaladoc's "targets near-identical pairs" caveat.
  *
  * Cell-scoped comparison can only find pairs the coarse quantizer
  * co-locates: near-identical vectors (SemDeDup's regime) virtually
  * always share a cell, while semantically DISTANT pairs (low
  * thresholds) straddle cells. Measured on the fixtures (nLists=8):
  * t=0.4 recall ≈ 0.35–0.37 (sf0.01/sf0.1) — the fixture has no pairs
  * above cos 0.6, so the high-threshold regime shows 0 exact pairs and
  * vacuous recall 1.0. Run: `sbt "runMain graft.tools.SemProbe"`.
  */
object SemProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (dir <- Seq("/root/testdata/sf0.01", "/root/testdata/sf0.1");
         t <- Seq(0.4, 0.6, 0.8)) {
      val emb = graft.tables.Tables.embeddings(spark, dir)
      val labeled = graft.operators.Similarity.semanticDedup(
        emb, "vec_id", "embedding", threshold = t, nLists = 8, trainSample = 1024)
        .localCheckpoint(true)
      val exact = graft.operators.Dedup.embeddingNearDupBlocked(
        emb, "vec_id", "embedding", threshold = t, maxBlockRows = 200)
        .select("id_a", "id_b")
      val g = labeled.select(col("id"), col("dup_group"))
      val joined = exact
        .join(g.toDF("id_a", "g_a"), Seq("id_a"))
        .join(g.toDF("id_b", "g_b"), Seq("id_b"))
      val total = joined.count()
      val same = joined.filter(col("g_a") === col("g_b")).count()
      val kept = labeled.agg(sum("kept")).head().getLong(0)
      println(s"[semprobe] $dir t=$t exact_pairs=$total same_group=$same " +
        s"recall=${if (total == 0) 1.0 else same.toDouble / total} kept=$kept")
    }
    spark.stop()
  }
}
