package graft.streaming

import graft.SparkTestBase
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger

import java.nio.file.Files
import java.sql.Timestamp

class WindowedCountsSpec extends SparkTestBase {
  import spark.implicits._

  private def ts(minute: Int, second: Int = 0): Timestamp =
    Timestamp.valueOf(f"2024-01-01 00:$minute%02d:$second%02d")

  test("tumbling windows finalize after the watermark passes (append mode, late data dropped)") {
    val input = MemoryStream[(Timestamp, String)](spark)
    val ckpt = Files.createTempDirectory("graft-win").toString
    val out = WindowedCounts.tumbling(
      input.toDF().toDF("ts", "chan"), "ts", "chan", "10 minutes", "5 minutes")

    val query = out.writeStream
      .format("memory").queryName("win_counts")
      .outputMode("append")
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.ProcessingTime("100 milliseconds"))
      .start()

    input.addData((ts(1), "a"), (ts(5), "a"), (ts(7), "b"))
    query.processAllAvailable()
    // nothing final yet: watermark is max(7:00) - 5min < window end 10:00
    assert(spark.sql("SELECT * FROM win_counts").count() == 0)

    // event at 00:25 advances watermark to 00:20 → [00:00,00:10) finalizes
    input.addData((ts(25), "a"))
    query.processAllAvailable()
    val rows = spark.sql("SELECT chan, n FROM win_counts").as[(String, Long)].collect().toMap
    assert(rows == Map("a" -> 2L, "b" -> 1L))

    // a late event inside the finalized window is dropped, not re-emitted
    input.addData((ts(3), "a"))
    query.processAllAvailable()
    assert(spark.sql("SELECT count(*) FROM win_counts").as[Long].head() == 2L)
    query.stop()
  }

  test("session windows merge events within the gap") {
    val input = MemoryStream[(Timestamp, String)](spark)
    val ckpt = Files.createTempDirectory("graft-sess").toString
    val out = WindowedCounts.sessions(
      input.toDF().toDF("ts", "user"), "ts", "user", "5 minutes", "1 minute")

    val query = out.writeStream
      .format("memory").queryName("sess_counts")
      .outputMode("append")
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.ProcessingTime("100 milliseconds"))
      .start()

    // u1: events at 00:00 and 00:02 → one session [00:00, 00:07)
    input.addData((ts(0), "u1"), (ts(2), "u1"))
    query.processAllAvailable()
    // push watermark far past the session end
    input.addData((ts(30), "u2"))
    query.processAllAvailable()
    val rows = spark.sql("SELECT user, n_events FROM sess_counts")
      .as[(String, Long)].collect().toMap
    assert(rows == Map("u1" -> 2L))
    query.stop()
  }
}
