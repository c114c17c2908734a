package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.tables.Tables

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
    val docs = Tables.documents(spark, dir)
    time("warm")(docs.count())

    val sets = docs.select(col("doc_id").alias("id"),
      graft.functions.TextFunctions.distinctShingleHashesUdf(3)(col("text")).alias("hs"))
    time("sets_pass")(sets.select(sum(size(col("hs")))).collect())
    val prefixLen = (size(col("hs")).cast("double") * 0.5).cast("long") + lit(1L)
    val pf = sets.select(col("id"), explode(slice(col("hs"), lit(1), prefixLen.cast("int"))).alias("h"))
    time("prefix_rows")(println("pf rows: " + pf.count()))
    val cand = pf.toDF("id_a", "h").join(pf.toDF("id_b", "h"), Seq("h"))
      .filter(col("id_a") < col("id_b")).select("id_a", "id_b").distinct()
    time("cand")(println("cand rows: " + cand.count()))
    time("q18_full")(operators.Dedup.ngramJaccard(docs, "doc_id", "text", 3, 0.5).count())
    time("q18_again")(operators.Dedup.ngramJaccard(docs, "doc_id", "text", 3, 0.5).count())
    spark.stop()
  }
}
