package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch diagnostic (not part of the library surface): reproduces
  * the UB_C4 composition's gate + dedup tiers as BATCH operators over
  * the same synthetic stream, printing per-tier survivor counts — the
  * numbers behind the round-19 BASELINE note on why the C4 run's
  * sem/ann trigger columns read ~0. Run:
  * `sbt "runMain graft.tools.C4GateDiag"`.
  */
object C4GateDiag {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val words = Array("stream", "corpus", "dedup", "vector", "shard", "token",
      "merge", "batch", "index", "probe", "cell", "band")
    def text(seed: Int): String =
      s"doc$seed " + (0 until 19).map(j => words((seed * 31 + j * 7) % words.length)).mkString(" ")
    def doc(i: Int): (Long, String) = {
      val onDup = i % 5 == 0 || i % 11 == 0
      val t =
        if (!onDup && i % 13 == 0)
          s"junk$i " + (0 until 19).map(j => s"zz${(i * 17 + j * 5) % 997}").mkString(" ")
        else if (!onDup && i % 17 == 0)
          (0 until 20).map(_ => "!#$%" * 3).mkString(" ") + s" $i"
        else if (i % 5 == 0) text((i / 200) * 200)
        else if (i % 11 == 0) text((i / 550) * 550) + s" tail"
        else text(i)
      (i.toLong, t)
    }
    val train = (0 until 5000).map(i => (i.toLong, text(i))).toDF("doc_id", "text")
    val clsW = graft.operators.QualityClassifier.train(
      graft.operators.QualityClassifier.gopherFeatures(
        train, "doc_id", "text", dim = 256, minTokens = 5L, minStopHits = 0L),
      "feats", "y", 256 + 17, iters = 30)
    val docs = (1000 until 11000).map(doc).toDF("doc_id", "text")
    for (c4 <- Seq(false, true)) {
      val paged =
        if (c4) {
          val p = docs.withColumn("text", concat(col("text"), lit(".\n"),
            lit("Please enable JavaScript to continue viewing this page.\n"),
            lit("Home About Contact\n"),
            lit("This supplementary sentence definitely has enough words to pass.")))
          graft.operators.QualityPrune.keepByC4(p, "text", minKeptLines = 2)
        } else docs
      val gated = graft.operators.QualityClassifier
        .keepByScore(paged, "text", clsW, dim = 256)
      val nGate = gated.count()
      // distinct texts = what survives the exact tier and feeds near/sem
      val nUniq = gated.select(md5(col("text"))).distinct().count()
      val sample = gated.limit(3).as[(Long, String)].collect()
        .map { case (id, t) => s"$id:'${t.take(40)}…'" }.mkString(" ")
      println(s"[c4diag] c4=$c4 input=10000 gateKept=$nGate distinctTexts=$nUniq sample: $sample")
    }
    spark.stop()
  }
}
