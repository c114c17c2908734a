package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch experiment main (not part of the library surface): measures
  * PQ asymmetric-distance recall on the driver fixtures — the number
  * behind q79's pinned bound. For the q22 query vector (vec_id 0),
  * counts how many of the exact inner-product top-20 appear in the PQ
  * top-50 candidate set, across (m, nCodes) settings.
  * Run: `sbt "runMain graft.tools.PqProbe"`.
  */
object PqProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    for (dir <- Seq("/root/testdata/sf0.01", "/root/testdata/sf0.1");
         (m, nCodes, kc) <- Seq((8, 64, 100), (16, 64, 50), (16, 64, 100), (16, 128, 50), (8, 128, 100))) {
      val emb = graft.tables.Tables.embeddings(spark, dir)
      val q = emb.filter(col("vec_id") === 0).select("embedding")
        .head().getSeq[Float](0).map(_.toDouble)
      val dim = q.length
      val cbs = graft.operators.Similarity.trainProductQuantizer(
        emb, "vec_id", "embedding", dim, m = m, nCodes = nCodes, trainSample = 2048)
      val codes = graft.operators.Similarity.pqEncode(emb, "vec_id", "embedding", cbs)
      val pqTop = graft.operators.Similarity.pqTopK(codes, "id", "code", cbs, q, k = kc)
      val exactTop = emb.select(
        col("vec_id").alias("id"),
        graft.functions.expressions.DotProductFloat
          .dotF(col("embedding"), typedlit(q.map(_.toFloat))).alias("dot"))
        .orderBy(col("dot").desc, col("id").asc).limit(20)
      val hits = exactTop.select("id").join(pqTop.select("id"), Seq("id")).count()
      println(s"[pqprobe] $dir m=$m nCodes=$nCodes k=$kc dim=$dim hits=$hits/20")
    }
    spark.stop()
  }
}
