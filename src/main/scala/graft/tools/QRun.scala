package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch runner (not part of the library surface): execute one
  * registry query against a fixture dir and print its rows + oracle SQL
  * — the single-query iteration loop the full `graft.Verify` pass is
  * too slow for. Run:
  * `sbt "runMain graft.tools.QRun q85_knn_join /root/testdata/sf0.01"`.
  */
object QRun {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse(sys.error("usage: QRun <query> [sfDir]"))
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.optimizer.excludedRules",
        "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = graft.SparkEntry.queries(name)(spark, dir)
    val t0 = System.nanoTime()
    df.show(50, truncate = false)
    println(f"rows=${df.count()} in ${(System.nanoTime() - t0) / 1e9}%.2f s")
    graft.SparkEntry.oracleSql.get(name).foreach { sql =>
      println("---- oracle SQL ----"); println(sql)
    }
    spark.stop()
  }
}
