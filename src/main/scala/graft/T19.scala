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

    val ds = docs.select(col("doc_id").alias("id"),
      explode(graft.functions.TextFunctions.shinglesUdf(3)(col("text"))).alias("sh")).distinct()
    time("index_rows")(println("ds rows: " + ds.count()))
    val a = ds.toDF("id_a", "sh")
    val b = ds.toDF("id_b", "sh")
    val joined = a.join(b, Seq("sh")).filter(col("id_a") < col("id_b"))
    time("join_fanout")(println("join rows: " + joined.count()))
    val common = joined.groupBy("id_a", "id_b").agg(count(lit(1)).alias("common"))
    time("common_pairs")(println("common rows: " + common.count()))

    val q20 = operators.Dedup.minHashLsh(docs, "doc_id", "text", 3, 16, 4, 0.5)
    println(q20.queryExecution.executedPlan.toString.linesIterator
      .filter(l => l.contains("Exchange") || l.contains("Join") || l.contains("Scan") || l.contains("Aggregate"))
      .mkString("\n"))
    spark.stop()
  }
}
