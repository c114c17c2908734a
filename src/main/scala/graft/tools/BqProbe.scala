package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch experiment main (not part of the library surface): measures
  * what the 32× binary-quantization compression costs in RECALL
  * against the exact cosine top-20, beside the SQ8 (4×) tier at the
  * same candidate depths — the number behind q163's "BQ is the
  * candidate-generation tier, re-rank exactly" recipe. For a panel of
  * query vectors, counts exact-top-20 hits inside the BQ Hamming
  * top-{20,50,100,200} and the SQ8 quantized-cosine top-{20,50}.
  * Run: `sbt "runMain graft.tools.BqProbe"` (env: SPARK_GRAFT_SF_DIR
  * to probe a scaled corpus, e.g. the ScaleBench 10× derivation).
  */
object BqProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dirs = sys.env.get("SPARK_GRAFT_SF_DIR").map(Seq(_))
      .getOrElse(Seq("/root/testdata/sf0.01", "/root/testdata/sf0.1"))
    for (dir <- dirs) {
      val emb = graft.tables.Tables.embeddings(spark, dir)
      val qids = Seq(0L, 7L, 31L, 100L, 250L)
      val results = for (qid <- qids) yield {
        val q = emb.filter(col("vec_id") === qid).select("embedding")
          .head().getSeq[Float](0).toArray
        val exact = graft.operators.Similarity
          .bruteForceTopK(emb, "vec_id", "embedding", q.map(_.toDouble).toSeq, 20)
          .select("vec_id")
        def hits(cand: org.apache.spark.sql.DataFrame): Long =
          exact.join(cand.select("vec_id"), Seq("vec_id")).count()
        val bq = Seq(20, 50, 100, 200).map(k =>
          hits(graft.operators.Similarity.bqTopK(emb, "vec_id", "embedding", q, k)))
        val sq8 = Seq(20, 50).map(k =>
          hits(graft.operators.Similarity.int8TopK(emb, "vec_id", "embedding", q, k)))
        (bq, sq8)
      }
      def mean(xs: Seq[Long]): Double = xs.sum.toDouble / xs.size
      val bqM = (0 until 4).map(i => mean(results.map(_._1(i))))
      val sqM = (0 until 2).map(i => mean(results.map(_._2(i))))
      println(f"[bqprobe] $dir queries=${qids.size} exact-top-20 recall: " +
        f"bq@20=${bqM(0)}%.1f bq@50=${bqM(1)}%.1f bq@100=${bqM(2)}%.1f " +
        f"bq@200=${bqM(3)}%.1f | sq8@20=${sqM(0)}%.1f sq8@50=${sqM(1)}%.1f (of 20)")
    }

    // Dimension dependence: the fixture's 16-dim embeddings give BQ
    // only 16 Hamming levels, so ties (not sign information) dominate
    // its ranking there. Production BQ lives at transformer dims —
    // measure a seeded synthetic panel at 64/256/1024 dims, clustered
    // like real embedding space (shared cluster axes + noise).
    import spark.implicits._
    for (dim <- Seq(64, 256, 1024)) {
      def f(seed: Int, d: Int): Float = {
        // xorshift-mixed deterministic pseudo-noise in [-0.5, 0.5)
        var x = seed.toLong * 6364136223846793005L + d * 1442695040888963407L
        x ^= x >>> 33; x *= 0xff51afd7ed558ccdL; x ^= x >>> 33
        ((x & 0xffff).toFloat / 65536.0f) - 0.5f
      }
      val rows = (0 until 5000).map { i =>
        val axis = i % 16
        (i.toLong, Seq.tabulate(dim)(d =>
          (if (d % 16 == axis) 1.5f else 0.0f) + f(i, d)))
      }
      val emb = rows.toDF("vec_id", "embedding")
        .select(col("vec_id"), col("embedding").cast("array<float>").as("embedding"))
        .localCheckpoint()
      val qids = Seq(0L, 7L, 31L, 100L, 250L)
      val results = for (qid <- qids) yield {
        val q = rows(qid.toInt)._2.toArray
        val exact = graft.operators.Similarity
          .bruteForceTopK(emb, "vec_id", "embedding", q.map(_.toDouble).toSeq, 20)
          .select("vec_id")
        def hits(cand: org.apache.spark.sql.DataFrame): Long =
          exact.join(cand.select("vec_id"), Seq("vec_id")).count()
        Seq(20, 50, 100).map(k =>
          hits(graft.operators.Similarity.bqTopK(emb, "vec_id", "embedding", q, k)))
      }
      def mean(i: Int): Double = results.map(_(i)).sum.toDouble / results.size
      println(f"[bqprobe] synthetic dim=$dim n=5000 exact-top-20 recall: " +
        f"bq@20=${mean(0)}%.1f bq@50=${mean(1)}%.1f bq@100=${mean(2)}%.1f (of 20)")
    }
    spark.stop()
  }
}
