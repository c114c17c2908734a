package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions._
import graft.tables.Tables
object T19 {
  def time[A](label: String)(f: => A): A = {
    val t0 = System.nanoTime(); val r = f
    println(s"$label: ${(System.nanoTime()-t0)/1e9}"); r
  }
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions","8").config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.001"
    val docs = Tables.documents(spark, dir)
    val hs = docs.select(col("doc_id").alias("id"), shingleHashes(shingles(tokens(col("text")), 3)).alias("hs"))
    time("warm")(hs.count()); time("hs")(hs.count())
    val sig = hs.select(col("id"), minHashFromHashes(col("hs"), 16).alias("sig"))
    time("sig1")(sig.count()); time("sig2")(sig.count())
    val expl = sig.select(col("id"), posexplode(col("sig")).as(Seq("i","sig")))
    time("expl1")(expl.count()); time("expl2")(expl.count())
    expl.explain("formatted")
    spark.stop()
  }
}
