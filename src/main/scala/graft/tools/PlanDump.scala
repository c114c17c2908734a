package graft.tools

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

/** Scratch plan-evidence dumper (not part of the library surface):
  * writes `<outDir>/<query>_<suffix>.txt` with the FORMATTED physical
  * plan of each named registry query — the per-round before/after
  * artifacts (`plans/r22/...`) the optimization brief requires. Run:
  * `sbt "runMain graft.tools.PlanDump q117_hybrid_join,q174_front_door6 before plans/r22 /root/testdata/sf0.01"`.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val names = args.headOption
      .getOrElse(sys.error("usage: PlanDump <q1,q2,...> <suffix> [outDir] [sfDir]"))
      .split(",").toSeq
    val suffix = args.lift(1).getOrElse("before")
    val outDir = args.lift(2).getOrElse("plans/r22")
    val sfDir = args.lift(3).getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.optimizer.excludedRules",
        "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Files.createDirectories(Paths.get(outDir))
    names.foreach { name =>
      val df = graft.SparkEntry.queries(name)(spark, sfDir)
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      Files.writeString(Paths.get(s"$outDir/${name}_$suffix.txt"),
        s"# $name ($suffix) — graft.PlanDump over $sfDir\n\n" + plan)
      println(s"wrote $outDir/${name}_$suffix.txt")
      spark.sharedState.cacheManager.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
    }
    spark.stop()
  }
}
