package graft.tools

import graft.operators.Dedup
import org.apache.spark.sql.SparkSession

/** Scratch experiment main (not part of the library surface): sweeps
  * `maxBlockRows` for [[Dedup.embeddingNearDupBlocked]] on the 10×
  * ScaleBench corpus to locate the cost knee between the two forces the
  * scaladoc's cost model names:
  *
  *  - shuffle volume n·B vector replicas (B = ceil(n / maxBlockRows)) —
  *    favors FEW, LARGE blocks;
  *  - per-task compute m² dot products (m = block rows) over
  *    B·(B+1)/2 tasks — too few blocks means tasks longer than the
  *    cluster has cores to hide, and a 2m·dim·4B working set per task —
  *    favors MANY, SMALL blocks.
  *
  * Total comparisons are n²/2 regardless of B: the sweep measures pure
  * orchestration overhead (replication shuffle + task granularity), so
  * its minimum is the sizing rule BASELINE.md documents.
  *
  * Run: `sbt "runMain graft.tools.BlockSweepBench"` (env:
  * SPARK_GRAFT_SF_DIR base fixture, default /root/testdata/sf0.1;
  * SPARK_GRAFT_SCALE_OUT scaled-corpus dir, default /tmp/graft_scale10;
  * SPARK_GRAFT_SCALE copies, default 10).
  */
object BlockSweepBench {
  def main(args: Array[String]): Unit = {
    val baseDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val outDir = sys.env.getOrElse("SPARK_GRAFT_SCALE_OUT", "/tmp/graft_scale10")
    val copies = sys.env.getOrElse("SPARK_GRAFT_SCALE", "10").toInt
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    if (!new java.io.File(s"$outDir/embeddings.parquet").exists()) {
      println(s"[blocksweep] generating ${copies}x corpus at $outDir from $baseDir")
      ScaleBench.generate(spark, baseDir, outDir, copies)
    }
    val emb = spark.read.parquet(s"$outDir/embeddings.parquet")
    val n = emb.count()

    def run(maxBlockRows: Int): (Long, Double) = {
      val t0 = System.nanoTime()
      val out = Dedup.embeddingNearDupBlocked(
        emb, "vec_id", "embedding", threshold = 0.8, maxBlockRows = maxBlockRows)
      val rows = out.queryExecution.toRdd.count()
      (rows, (System.nanoTime() - t0) / 1e9)
    }

    val sizes = Seq(500, 1000, 2500, 5000, 12500, 25000, 50000)
    run(2500) // JVM warmup
    println(f"${"maxBlockRows"}%12s ${"B"}%5s ${"tasks"}%6s ${"replicas"}%9s ${"pairs"}%6s ${"sec"}%7s")
    sizes.foreach { m =>
      val b = math.max(1, math.ceil(n.toDouble / m).toInt)
      val (pairs, ta) = run(m)
      val (_, tb) = run(m)
      val t = math.min(ta, tb)
      println(f"$m%12d $b%5d ${b * (b + 1) / 2}%6d ${n * b}%9d $pairs%6d $t%7.2f")
    }
    spark.stop()
  }
}
