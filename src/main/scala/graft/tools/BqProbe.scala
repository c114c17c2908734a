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

    // Round 20: the SRP-EXPANDED candidate tier (q173) on the real
    // fixture — project through outDim deterministic ±1 hyperplanes
    // first (srp_expand), then Hamming on the angle-preserving sign
    // bits. Measures candidate recall (exact-top-20 hits inside the
    // expanded Hamming top-k) and exact-top-10 coverage at the q173
    // cut depth (50), beside the raw-sign rows above.
    for (dir <- dirs; outDim <- Seq(128, 256)) {
      val emb = graft.tables.Tables.embeddings(spark, dir)
      val qids = Seq(0L, 7L, 31L, 100L, 250L)
      val results = for (qid <- qids) yield {
        val q = emb.filter(col("vec_id") === qid).select("embedding")
          .head().getSeq[Float](0).toArray
        val qx = graft.functions.expressions.SrpExpandExpr
          .expandLocal(q, outDim, "rp")
        val qw = graft.functions.expressions.BinaryQuantExprs.packLocal(qx)
        // one Hamming scan (the deepest cut) and one exact top-20 per
        // query — the shallower cuts and the top-10 derive driver-side
        // from the collected rank order, not from re-scans
        val cand100 = emb
          .select(col("vec_id"),
            graft.functions.expressions.BinaryQuantExprs
              .bqHamming(graft.functions.expressions.SrpExpandExpr
                .srpExpand(col("embedding"), outDim, "rp"), qw)
              .alias("ham"))
          .orderBy(col("ham").asc, col("vec_id").asc)
          .limit(100)
          .select("vec_id")
          .collect().map(_.getLong(0)) // rank order preserved
        val exact20 = graft.operators.Similarity
          .bruteForceTopK(emb, "vec_id", "embedding", q.map(_.toDouble).toSeq, 20)
          .select("vec_id")
          .collect().map(_.getLong(0)) // cos-descending order preserved
        val exact10 = exact20.take(10).toSet
        def hits(exact: Set[Long], k: Int): Long =
          cand100.take(k).count(exact.contains).toLong
        (Seq(20, 50, 100).map(k => hits(exact20.toSet, k)), hits(exact10, 50))
      }
      def mean(xs: Seq[Long]): Double = xs.sum.toDouble / xs.size
      val top20 = (0 until 3).map(i => mean(results.map(_._1(i))))
      val top10at50 = mean(results.map(_._2))
      println(f"[bqprobe] $dir srp-expanded outDim=$outDim exact-top-20 recall: " +
        f"bq@20=${top20(0)}%.1f bq@50=${top20(1)}%.1f bq@100=${top20(2)}%.1f (of 20) | " +
        f"exact-top-10 in ham@50: $top10at50%.1f (of 10)")
    }

    // Dimension dependence: at LOW storage dimension, coordinate-sign
    // BQ rankings are noise-dominated (see the fixture rows above; the
    // round-19 record called the fixture 16-dim — it measures 64-dim
    // at head, and the conclusion direction is unchanged). Production
    // BQ lives at transformer dims — measure a seeded synthetic panel
    // at 64/256/1024 dims, clustered like real embedding space
    // (shared cluster axes + noise).
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
