package graft.streaming

import graft.SparkTestBase
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
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
}
