package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.tables.Tables
object T19 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = Tables.documents(spark, "/root/testdata/sf0.1")
    val sets = docs.select(col("doc_id").alias("id"),
      graft.functions.TextFunctions.distinctShingleHashesUdf(3)(col("text")).alias("hs"))
    val ds = sets.select(col("id"), explode(col("hs")).alias("h"))
    val fr = ds.groupBy("h").agg(count(lit(1)).alias("f"))
    val ordered = ds.join(fr, Seq("h")).groupBy("id")
      .agg(sort_array(collect_list(struct(col("f"), col("h")))).alias("fh"))
    val plen = (size(col("fh")).cast("double") * 0.5).cast("long") + lit(1L)
    val pf = ordered.select(col("id"),
      explode(slice(transform(col("fh"), x => x.getField("h")), lit(1), plen.cast("int"))).alias("h"))
    val cand = pf.toDF("id_a", "h").join(pf.toDF("id_b", "h"), Seq("h"))
      .filter(col("id_a") < col("id_b")).select("id_a", "id_b").distinct()
    println("freq-ordered cand: " + cand.count())
    spark.stop()
  }
}
