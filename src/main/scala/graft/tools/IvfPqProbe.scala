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
    // SPARK_GRAFT_PROBE=mog skips the fixture sweep (runs only the
    // mixture-of-Gaussians recall curve below)
    val mode = sys.env.getOrElse("SPARK_GRAFT_PROBE", "all")
    for (dir <- Seq("/root/testdata/sf0.01", "/root/testdata/sf0.1") if mode != "mog";
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

    // ---- mixture-of-Gaussians recall curve (VERDICT r9 #3) ----
    // The fixture embeddings are near-isotropic, so q82's 10-12/20 recall
    // is the data's ceiling (probing 4/16 cells of structureless space
    // finds ~the probed fraction), not the tier's. This sweep generates a
    // DETERMINISTIC mixture of Gaussians — 16 true clusters, unit noise,
    // centers at `sep`·(unit direction) — and shows recall rising with
    // cluster separation at the FIXED q82 probe fraction (4/16 cells,
    // same m/nCodes/rerank/trainSample). Purity = population-weighted
    // majority true-cluster share per trained cell (how well the coarse
    // quantizer recovered the planted structure).
    import spark.implicits._
    val dim = 64; val nClusters = 16; val n = 8192
    for (sep <- Seq(0.0, 2.0, 4.0, 8.0, 16.0)) {
      val rnd = new scala.util.Random(1234)
      val centers = Array.fill(nClusters) {
        val g = Array.fill(dim)(rnd.nextGaussian())
        val nrm = math.sqrt(g.map(x => x * x).sum)
        g.map(x => sep * x / nrm)
      }
      val rows = (0 until n).map { i =>
        val c = i % nClusters
        (i.toLong, centers(c).map(x => (x + rnd.nextGaussian()).toFloat).toSeq)
      }
      val emb = rows.toDF("vec_id", "embedding").repartition(8).localCheckpoint(true)
      val q = rows.head._2.map(_.toDouble)

      val exactTop = graft.operators.Similarity.bruteForceTopK(
        emb, "vec_id", "embedding", q, k = 20)
      // rerank=100 is the q82 setting; rerank=512 (≥ the true-cluster
      // population) isolates ADC rank noise: inside a TIGHT cluster the
      // within-cluster score spread shrinks below PQ quantization error,
      // so the fixed-100 candidate list drops true top-20 members — more
      // re-rank absorbs it, routing is not the limiter
      def hitsAt(rerank: Int): Long = {
        val ivfPqTop = graft.operators.Similarity.ivfPqTopK(
          emb, "vec_id", "embedding", q, k = 20,
          nLists = 16, nProbe = 4, m = 16, nCodes = 64,
          rerank = rerank, trainSample = 2048)
        exactTop.select(col("vec_id").alias("id"))
          .join(ivfPqTop.select("id"), Seq("id")).count()
      }
      val hits = hitsAt(100)
      val hitsWide = hitsAt(512)

      // quantizer purity on the same trained centroids the query used
      val cents = graft.operators.Similarity.trainCentroids(
        emb, "vec_id", "embedding", 16, 42L, 2048)
      val purity = emb.select(
        (col("vec_id") % nClusters).alias("truec"),
        graft.functions.expressions.NearestCellExpr
          .nearestCell(col("embedding"), cents).alias("cell"))
        .groupBy("cell", "truec").count()
        .groupBy("cell").agg(max(col("count")).alias("maj"))
        .agg(sum(col("maj"))).head().getLong(0).toDouble / n
      println(f"[ivfpqprobe-mog] sep=$sep%.0f purity=$purity%.3f hits(rerank=100)=$hits/20 hits(rerank=512)=$hitsWide/20")
    }
    spark.stop()
  }
}
