package graft.tools

import graft.operators.RangeJoin
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** A/B evidence for the q129 claim: the bin-bucketed interval join vs
  * the direct `BETWEEN` theta-join Spark plans for the same semantics.
  * Both forms run the q129 shape (purchase → 1-hour follow window,
  * click/view points, per-user) on the sf fixture and, when present,
  * on the ScaleBench-derived 10× event log; per-pass wall seconds and
  * the matched-pair count (must agree) print per form.
  *
  * Run: `sbt "runMain graft.tools.RangeJoinAB"` (env:
  * SPARK_GRAFT_SF_DIR, default /root/testdata/sf0.1;
  * SPARK_GRAFT_SCALE_OUT, default /tmp/graft_scale10).
  */
object RangeJoinAB {

  private def sides(spark: SparkSession, dir: String): (DataFrame, DataFrame) = {
    val ev = graft.tables.Tables.events(spark, dir)
    val intervals = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id"),
        col("ts").as("w_start"),
        (col("ts") + expr("INTERVAL 1 HOUR")).as("w_end"))
    val points = ev.filter(col("event_type").isin("click", "view"))
      .select(col("user_id"), col("ts"))
    (points, intervals)
  }

  private def bucketed(p: DataFrame, i: DataFrame): DataFrame =
    RangeJoin.intervalJoin(p, "ts", i, "w_start", "w_end", Seq("user_id"),
      binWidthSec = 3600L, lowerInclusive = false, upperInclusive = true)

  private def theta(p: DataFrame, i: DataFrame): DataFrame =
    p.join(i,
      p("user_id") === i("user_id") &&
        p("ts") > i("w_start") && p("ts") <= i("w_end"))

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
      .filter(d => new java.io.File(s"$d/events.parquet").exists())

    def time(fn: => DataFrame): (Long, Double) = {
      val t0 = System.nanoTime()
      val n = fn.queryExecution.toRdd.count()
      (n, (System.nanoTime() - t0) / 1e9)
    }

    for (dir <- dirs; dense <- Seq(1, 15, 50)) {
      // dense > 1 folds users together (user_id % (150/dense) keys):
      // per-key density grows dense-fold while TRUE matches grow only
      // ~dense-fold — the equi-join-with-residual's examined-pair count
      // grows dense^2-fold. This is the regime the bucketing exists
      // for: a real event log's per-key density grows with retention
      // window and traffic, and a theta-join's residual fan-out grows
      // with its square.
      val (p0, i0) = sides(spark, dir)
      val keys = math.max(1, 150 / dense)
      val p = p0.withColumn("user_id", pmod(col("user_id"), lit(keys)))
      val i = i0.withColumn("user_id", pmod(col("user_id"), lit(keys)))
      // warmup then min-of-2 (the bench methodology)
      time(bucketed(p, i)); time(theta(p, i))
      val b = Seq.fill(2)(time(bucketed(p, i))).minBy(_._2)
      val t = Seq.fill(2)(time(theta(p, i))).minBy(_._2)
      require(b._1 == t._1, s"pair counts diverge: bucketed=${b._1} theta=${t._1}")
      println(f"[rjab] $dir dense=${dense}x keys=$keys pairs=${b._1} " +
        f"bucketed=${b._2}%.2fs theta=${t._2}%.2fs ratio=${t._2 / b._2}%.1fx")
    }
    spark.stop()
  }
}
