package graft.tools

import graft.operators.NgramLm
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** A/B evidence for the q135 design choice: the two LM scorings share
  * ONE gram-frequency table (`scoreGrams` over a common `hb`, whose
  * identical exchange Spark materializes once — ReusedExchange) versus
  * the naive composition of two independent `score()` calls, each
  * re-tokenizing the candidate corpus from the parquet scan up.
  * Selections must be row-identical; wall seconds print per form on
  * the sf fixture and, when present, the ScaleBench-derived 10×
  * corpus (where the tokenize+explode the seam dedups is 10× bigger).
  *
  * Run: `sbt "runMain graft.tools.DsirAB"` (env: SPARK_GRAFT_SF_DIR,
  * default /root/testdata/sf0.1; SPARK_GRAFT_SCALE_OUT, default
  * /tmp/graft_scale10).
  */
object DsirAB {

  /** The naive twin: two independent score() calls (two tokenize
    * passes), then the IDENTICAL ratio/Gumbel/cut arithmetic.
    */
  private def independent(docs: DataFrame, k: Int): DataFrame = {
    val slot = col("doc_id") % 10
    val tgtLm = NgramLm.train(docs.filter(slot === 8), "doc_id", "text")
    val rawLm = NgramLm.train(docs.filter(slot === 9), "doc_id", "text")
    val cand = docs.filter(slot =!= 8 && slot =!= 9)
    val st = NgramLm.score(cand, "doc_id", "text", tgtLm)
      .select(col("doc_id"), col("n_bigrams"),
        col("nll_micro").alias("ll_t_micro"))
    val sr = NgramLm.score(cand, "doc_id", "text", rawLm)
      .select(col("doc_id"), col("nll_micro").alias("ll_r_micro"))
    val u = least(
      (graft.functions.TextFunctions.seededHash60(42L, col("doc_id")).cast("double") +
        lit(0.5)) / pow(lit(2.0), lit(60.0)),
      lit(1.0 - 1e-9))
    val ord = Seq(col("key_micro").desc, col("doc_id").asc)
    st.join(sr, Seq("doc_id"))
      .withColumn("lw_micro",
        round((col("ll_t_micro") - col("ll_r_micro")).cast("double") /
          col("n_bigrams").cast("double")).cast("long"))
      .withColumn("gum_micro",
        round(-log(-log(u)) * lit(1000000L)).cast("long"))
      .withColumn("key_micro", col("lw_micro") + col("gum_micro"))
      .orderBy(ord: _*)
      .limit(k)
  }

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dirs = Seq(
      sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"),
      sys.env.getOrElse("SPARK_GRAFT_SCALE_OUT", "/tmp/graft_scale10"))
      .filter(d => new java.io.File(s"$d/documents.parquet").exists())

    def time(fn: => DataFrame): (Long, Double) = {
      val t0 = System.nanoTime()
      val n = fn.queryExecution.toRdd.count()
      (n, (System.nanoTime() - t0) / 1e9)
    }

    for (dir <- dirs) {
      val docs = graft.tables.Tables.documents(spark, dir)
      val shared = () => NgramLm.importanceSelect(docs, "doc_id", "text", k = 15)
      val indep = () => independent(docs, 15)
      // row-identity first (drop rank — the naive twin omits it)
      val a = shared().drop("rank").collect().map(_.toSeq).toSet
      val b = indep().collect().map(_.toSeq).toSet
      require(a == b, s"selections diverge at $dir")
      time(shared()); time(indep()) // warmup
      val s = Seq.fill(2)(time(shared())).minBy(_._2)
      val i = Seq.fill(2)(time(indep())).minBy(_._2)
      println(f"[dsirab] $dir rows=${s._1} shared=${s._2}%.2fs " +
        f"independent=${i._2}%.2fs ratio=${i._2 / s._2}%.2fx")
    }
    spark.stop()
  }
}
