package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import java.sql.Timestamp

class RangeJoinSpec extends SparkTestBase {
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  private def points(rows: (Long, String, Long)*): DataFrame =
    rows.toSeq
      .map { case (k, t, id) => (k, ts(t), id) }
      .toDF("key", "ts", "pid")

  private def intervals(rows: (Long, String, String, Long)*): DataFrame =
    rows.toSeq
      .map { case (k, s0, e0, id) => (k, ts(s0), ts(e0), id) }
      .toDF("key", "w_start", "w_end", "iid")

  /** The naive theta-join the operator restates — ground truth. */
  private def naive(
      p: DataFrame,
      i: DataFrame,
      lowerInclusive: Boolean,
      upperInclusive: Boolean): Set[(Long, Long)] = {
    val lower = if (lowerInclusive) col("ts") >= col("w_start") else col("ts") > col("w_start")
    val upper = if (upperInclusive) col("ts") <= col("w_end") else col("ts") < col("w_end")
    p.join(i, Seq("key")).filter(lower && upper)
      .select("pid", "iid").as[(Long, Long)].collect().toSet
  }

  private def bucketed(
      p: DataFrame,
      i: DataFrame,
      binSec: Long,
      lowerInclusive: Boolean = true,
      upperInclusive: Boolean = true): Set[(Long, Long)] =
    RangeJoin.intervalJoin(p, "ts", i, "w_start", "w_end", Seq("key"),
        binSec, lowerInclusive, upperInclusive)
      .select("pid", "iid").as[(Long, Long)].collect().toSet

  test("matches the naive theta-join, one row per qualifying pair") {
    val p = points(
      (1L, "2024-01-01 10:00:00", 1L),
      (1L, "2024-01-01 10:30:00", 2L),
      (1L, "2024-01-01 12:00:00", 3L),
      (2L, "2024-01-01 10:30:00", 4L))
    val i = intervals(
      (1L, "2024-01-01 10:00:00", "2024-01-01 11:00:00", 10L),
      (1L, "2024-01-01 10:15:00", "2024-01-01 10:45:00", 11L),
      (2L, "2024-01-01 09:00:00", "2024-01-01 09:59:59", 12L))
    val got = RangeJoin.intervalJoin(p, "ts", i, "w_start", "w_end", Seq("key"), 3600L)
    // each qualifying pair appears EXACTLY once (the point's bin is unique)
    assert(got.count() === got.select("pid", "iid").distinct().count())
    assert(bucketed(p, i, 3600L) === naive(p, i, true, true))
  }

  test("intervals longer than the bin width still match (multi-bin explode)") {
    val p = points((1L, "2024-01-03 00:00:00", 1L), (1L, "2024-01-09 00:00:00", 2L))
    val i = intervals((1L, "2024-01-01 00:00:00", "2024-01-08 00:00:00", 10L))
    assert(bucketed(p, i, 3600L) === Set((1L, 10L)))
  }

  test("boundary semantics: inclusivity flags control ts == start / ts == end") {
    val p = points((1L, "2024-01-01 10:00:00", 1L), (1L, "2024-01-01 11:00:00", 2L))
    val i = intervals((1L, "2024-01-01 10:00:00", "2024-01-01 11:00:00", 10L))
    assert(bucketed(p, i, 3600L, lowerInclusive = true, upperInclusive = true) ===
      Set((1L, 10L), (2L, 10L)))
    assert(bucketed(p, i, 3600L, lowerInclusive = false, upperInclusive = true) ===
      Set((2L, 10L)))
    assert(bucketed(p, i, 3600L, lowerInclusive = true, upperInclusive = false) ===
      Set((1L, 10L)))
    assert(bucketed(p, i, 3600L, lowerInclusive = false, upperInclusive = false) ===
      Set.empty[(Long, Long)])
  }

  test("end < start matches nothing (and does not fabricate descending bins)") {
    val p = points((1L, "2024-01-01 10:30:00", 1L))
    val i = intervals((1L, "2024-01-01 11:00:00", "2024-01-01 10:00:00", 10L))
    assert(bucketed(p, i, 3600L) === Set.empty[(Long, Long)])
  }

  test("randomized parity with the naive join across bin widths") {
    val rnd = new scala.util.Random(42)
    val base = ts("2024-01-01 00:00:00").getTime
    val p = (1L to 120L).map { id =>
      (rnd.nextInt(4).toLong,
        new Timestamp(base + rnd.nextInt(72 * 3600) * 1000L), id)
    }.toDF("key", "ts", "pid")
    val i = (1L to 60L).map { id =>
      val s0 = base + rnd.nextInt(72 * 3600) * 1000L
      (rnd.nextInt(4).toLong, new Timestamp(s0),
        new Timestamp(s0 + rnd.nextInt(8 * 3600) * 1000L), id)
    }.toDF("key", "w_start", "w_end", "iid")
    val truth = naive(p, i, lowerInclusive = true, upperInclusive = true)
    assert(truth.nonEmpty) // the fixture must actually exercise matches
    for (binSec <- Seq(60L, 3600L, 24 * 3600L))
      assert(bucketed(p, i, binSec) === truth, s"binSec=$binSec")
  }

  test("plan shape: equi-join on (key, bin) — no nested-loop, no cartesian") {
    val p = points((1L, "2024-01-01 10:00:00", 1L))
    val i = intervals((1L, "2024-01-01 10:00:00", "2024-01-01 11:00:00", 10L))
    val plan = RangeJoin
      .intervalJoin(p, "ts", i, "w_start", "w_end", Seq("key"), 3600L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("fail-fast on a pathological interval instead of a silent mega-explode") {
    val p = points((1L, "2024-01-01 10:00:00", 1L))
    // a 2-year interval at a 1-second bin: ~63M bins — must raise, not OOM
    val i = intervals((1L, "2024-01-01 00:00:00", "2026-01-01 00:00:00", 10L))
    val ex = intercept[Exception] {
      RangeJoin.intervalJoin(p, "ts", i, "w_start", "w_end", Seq("key"), 1L).collect()
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(ex).exists(_.contains("maxBinsPerInterval")), ex.toString)
    // the same interval passes once the cap is raised deliberately
    val ok = RangeJoin.intervalJoin(p, "ts", i, "w_start", "w_end", Seq("key"),
      binWidthSec = 30 * 24 * 3600L, maxBinsPerInterval = 100)
    assert(ok.count() === 1L)
  }

  test("rejects a non-positive bin width") {
    val p = points((1L, "2024-01-01 10:00:00", 1L))
    val i = intervals((1L, "2024-01-01 10:00:00", "2024-01-01 11:00:00", 10L))
    intercept[IllegalArgumentException] {
      RangeJoin.intervalJoin(p, "ts", i, "w_start", "w_end", Seq("key"), 0L)
    }
  }
}
