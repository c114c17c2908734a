package graft.streaming

import graft.SparkTestBase
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions.{col, expr}
import org.apache.spark.sql.streaming.Trigger

import java.nio.file.Files
import java.sql.Timestamp

class StreamJoinSpec extends SparkTestBase {
  import spark.implicits._

  private def ts(minute: Int, second: Int = 0): Timestamp =
    Timestamp.valueOf(f"2024-01-01 00:$minute%02d:$second%02d")

  test("interval join matches right rows within [t, t+delay] per key") {
    val imps = MemoryStream[(String, Timestamp)](spark)
    val clicks = MemoryStream[(String, Timestamp)](spark)
    val ckpt = Files.createTempDirectory("graft-ssj").toString

    val joined = StreamJoin.intervalJoin(
      imps.toDF().toDF("imp_id", "imp_ts"),
      clicks.toDF().toDF("click_id", "click_ts"),
      "imp_id", "click_id", "imp_ts", "click_ts",
      watermark = "2 minutes", maxDelay = "5 minutes")

    val query = joined
      .selectExpr("imp_id", "imp_ts", "click_ts")
      .writeStream
      .format("memory").queryName("ssj")
      .outputMode("append")
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.ProcessingTime("100 milliseconds"))
      .start()

    imps.addData(("a", ts(0)), ("b", ts(1)))
    // a clicked within 5 min (match); b clicked 9 min later (no match);
    // c clicked with no impression (no match)
    clicks.addData(("a", ts(3)), ("b", ts(10)), ("c", ts(4)))
    query.processAllAvailable()
    val rows = spark.sql("SELECT imp_id FROM ssj").as[String].collect().toSeq
    assert(rows == Seq("a"))

    // a second click for the same impression inside the interval also
    // joins (1:N multiplicity preserved)
    clicks.addData(("a", ts(4)))
    query.processAllAvailable()
    assert(spark.sql("SELECT count(*) FROM ssj").as[Long].head() == 2L)
    query.stop()
  }

  test("left-outer interval join emits unmatched impressions once the watermark closes the interval") {
    val imps = MemoryStream[(String, Timestamp)](spark)
    val clicks = MemoryStream[(String, Timestamp)](spark)
    val ckpt = Files.createTempDirectory("graft-ssjo").toString

    val joined = StreamJoin.intervalJoinLeftOuter(
      imps.toDF().toDF("imp_id", "imp_ts"),
      clicks.toDF().toDF("click_id", "click_ts"),
      "imp_id", "click_id", "imp_ts", "click_ts",
      watermark = "1 minute", maxDelay = "3 minutes")

    val query = joined
      .selectExpr("imp_id", "click_id")
      .writeStream
      .format("memory").queryName("ssjo")
      .outputMode("append")
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.ProcessingTime("100 milliseconds"))
      .start()

    imps.addData(("a", ts(0)), ("b", ts(0)))
    clicks.addData(("a", ts(2)))
    query.processAllAvailable()
    // matched row may emit immediately; b waits for watermark proof
    // advance both watermarks far past 0:00 + 3 min interval
    imps.addData(("z1", ts(30)))
    clicks.addData(("z2", ts(30)))
    query.processAllAvailable()
    // one more microbatch so the outer-null row flushes
    imps.addData(("z3", ts(31)))
    clicks.addData(("z4", ts(31)))
    query.processAllAvailable()

    val got = spark.sql("SELECT imp_id, click_id FROM ssjo")
      .as[(String, Option[String])].collect().toMap
    assert(got("a").contains("a"))
    assert(got.contains("b") && got("b").isEmpty,
      s"unmatched impression should emit with null click, got $got")
    query.stop()
  }

  test("streamed interval join matches the batch RangeJoin pair set (q129's shape)") {
    // random per-user purchase/click history; ground truth = the batch
    // bin-bucketed interval join, itself spec-pinned against the naive
    // theta-join in RangeJoinSpec — this pins the STREAMING surface to
    // the same semantics: same keyed [t, t+delay] containment, 1:N
    // multiplicity, inclusive bounds on both ends
    val rnd = new scala.util.Random(7)
    val base = ts(0).getTime
    val purchases = (1L to 30L).map { id =>
      (id, rnd.nextInt(3).toLong, new Timestamp(base + rnd.nextInt(40 * 60) * 1000L))
    }
    val clicks = (101L to 200L).map { id =>
      (id, rnd.nextInt(3).toLong, new Timestamp(base + rnd.nextInt(50 * 60) * 1000L))
    }

    val batchPairs = graft.operators.RangeJoin.intervalJoin(
        clicks.toDF("click_id", "c_user", "click_ts")
          .withColumnRenamed("c_user", "user"),
        "click_ts",
        purchases.toDF("purchase_id", "p_user", "p_ts")
          .withColumn("w_end", col("p_ts") + expr("INTERVAL 5 MINUTES"))
          .withColumnRenamed("p_user", "user"),
        "p_ts", "w_end", Seq("user"),
        binWidthSec = 300L)
      .select("purchase_id", "click_id")
      .as[(Long, Long)].collect().toSet
    assert(batchPairs.nonEmpty)

    val pSrc = MemoryStream[(Long, Long, Timestamp)](spark)
    val cSrc = MemoryStream[(Long, Long, Timestamp)](spark)
    val ckpt = Files.createTempDirectory("graft-ssjp").toString
    val joined = StreamJoin.intervalJoin(
      pSrc.toDF().toDF("purchase_id", "p_user", "p_ts"),
      cSrc.toDF().toDF("click_id", "c_user", "click_ts"),
      "p_user", "c_user", "p_ts", "click_ts",
      // the delayed second delivery re-winds event time by up to the
      // full 50-minute span; the watermark must cover that disorder or
      // the late rows are (correctly) dropped — which is the semantics
      // under test for ON-TIME data, not what we want to exercise here
      watermark = "1 hour", maxDelay = "5 minutes")
    val query = joined
      .selectExpr("purchase_id", "click_id")
      .writeStream
      .format("memory").queryName("ssjp")
      .outputMode("append")
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.ProcessingTime("100 milliseconds"))
      .start()
    // deliver out of order across two triggers — the join must still
    // find every pair (watermark covers the full disorder span)
    val (p1, p2) = purchases.splitAt(17)
    val (c1, c2) = clicks.splitAt(60)
    pSrc.addData(p2: _*); cSrc.addData(c2: _*)
    query.processAllAvailable()
    pSrc.addData(p1: _*); cSrc.addData(c1: _*)
    query.processAllAvailable()
    val streamed = spark.sql("SELECT purchase_id, click_id FROM ssjp")
      .as[(Long, Long)].collect().toSet
    query.stop()
    assert(streamed === batchPairs)
  }
}
