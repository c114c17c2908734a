package graft
import org.apache.spark.sql.SparkSession

/** Scratch profiling main (not part of the library surface). */
object T19 {
  def time[A](label: String)(f: => A): A = {
    val t0 = System.nanoTime(); val r = f
    println(f"[prof] $label%-24s ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
  }
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.optimizer.excludedRules",
        "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    graft.tables.Tables.documents(spark, dir).count()
    for (q <- Seq("q07_string_clean", "q16_irc_parse", "q21_simhash", "q24_langid",
        "q25_quality", "q26_fingerprint", "q27_multimodal")) {
      val df1 = SparkEntry.queries(q)(spark, dir)
      time(s"$q count")(df1.count())
      val df2 = SparkEntry.queries(q)(spark, dir)
      time(s"$q full")(df2.queryExecution.toRdd.count())
    }
    spark.stop()
  }
}
