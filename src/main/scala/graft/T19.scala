package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.tables.Tables
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
    time("q20_cold")(operators.Dedup.minHashLsh(docs, "doc_id", "text", 3, 16, 4, 0.5).count())
    time("q20_warm")(operators.Dedup.minHashLsh(docs, "doc_id", "text", 3, 16, 4, 0.5).count())
    time("q20_warm2")(operators.Dedup.minHashLsh(docs, "doc_id", "text", 3, 16, 4, 0.5).count())
    spark.stop()
  }
}
