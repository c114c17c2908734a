package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch profiler (not part of the library surface): breaks the q145
  * trainer's wall time into featurization / localCheckpoint / count /
  * per-iteration gradient cost, so optimization targets the measured
  * component. Run:
  * `sbt "runMain graft.tools.TrainProfile /root/testdata/sf0.1"`.
  */
object TrainProfile {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[profile] $label%-28s ${(System.nanoTime() - t0) / 1e9}%7.3f s")
      r
    }
    // warm
    graft.tables.Tables.documents(spark, dir).count()
    (1 to 2).foreach { round =>
      println(s"--- round $round ---")
      val docs = graft.tables.Tables.documents(spark, dir)
      val feats = t("gopherFeatures+checkpoint") {
        graft.operators.QualityClassifier
          .gopherFeatures(docs, "doc_id", "text", 256,
            minTokens = 25L, minStopHits = 1L)
          .localCheckpoint()
      }
      println(s"[profile] feats partitions = ${feats.rdd.getNumPartitions}")
      val cached = t("train.localCheckpoint") {
        feats.select(col("feats"), col("y")).localCheckpoint()
      }
      val n = t("count")(cached.count())
      println(s"[profile] n = $n")
      val width = 256 + 17
      val w = new Array[Long](width)
      // time iterations in blocks of 10
      var tIter = 0
      (1 to 4).foreach { blk =>
        t(s"iters ${tIter + 1}..${tIter + 10}") {
          var i = 0
          while (i < 10) {
            val wlit = typedLit(w.toSeq)
            val z = graft.functions.expressions.PresenceDotExpr
              .presenceDot(col("feats"), wlit)
            val m = z.cast("double") / lit(1000000.0)
            val pMicro = org.apache.spark.sql.functions.round(
              (lit(0.5) * (lit(1.0) + m / (lit(1.0) + abs(m)))) * lit(1000000.0))
              .cast("long")
            val e = (pMicro - col("y") * lit(1000000L)).as("e")
            val grads = cached
              .select(col("feats"), e)
              .select(explode(col("feats")).as("feat"), col("e"))
              .groupBy("feat")
              .agg(sum("e").as("g"))
              .collect()
            grads.foreach { r =>
              val f = r.getLong(0)
              if (f >= 0L && f < width)
                w(f.toInt) -= graft.operators.QualityClassifier
                  .roundHalfUp(r.getLong(1).toDouble / n.toDouble * 16.0)
            }
            i += 1
          }
          tIter += 10
        }
      }
      // score pass
      t("score+collect-hash") {
        graft.operators.QualityClassifier.score(feats, "feats", w)
          .queryExecution.toRdd.count()
      }
    }
    spark.stop()
  }
}
