package graft.streaming

import graft.SparkTestBase
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger

import java.nio.file.Files

class StatefulCountsSpec extends SparkTestBase {
  import spark.implicits._

  test("flatMapGroupsWithState running counts: update-mode emission per batch") {
    val input = MemoryStream[String](spark)
    val ckpt = Files.createTempDirectory("graft-fmgws").toString
    val out = StatefulCounts.runningCounts(input.toDS())

    val query = out.writeStream
      .format("memory").queryName("fmgws_counts")
      .outputMode("update")
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.ProcessingTime("100 milliseconds"))
      .start()

    def emitted(): Seq[(String, Long)] =
      spark.sql("SELECT key, count FROM fmgws_counts").as[(String, Long)].collect().toSeq

    input.addData("a", "a", "b")
    query.processAllAvailable()
    assert(emitted().groupBy(_._1).view.mapValues(_.map(_._2).max).toMap
      == Map("a" -> 2L, "b" -> 1L))

    // second batch: only updated keys emit; totals accumulate
    input.addData("a", "c")
    query.processAllAvailable()
    val latest = emitted().groupBy(_._1).view.mapValues(_.map(_._2).max).toMap
    assert(latest == Map("a" -> 3L, "b" -> 1L, "c" -> 1L))
    query.stop()
  }

  test("transformWithState (state v2) running counts match the fmgws semantics") {
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set(
      "spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val input = MemoryStream[String](spark)
      val ckpt = Files.createTempDirectory("graft-tws").toString
      val out = StatefulCounts.runningCountsV2(input.toDS())

      val query = out.writeStream
        .format("memory").queryName("tws_counts")
        .outputMode("update")
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.ProcessingTime("100 milliseconds"))
        .start()

      def emitted(): Seq[(String, Long)] =
        spark.sql("SELECT key, count FROM tws_counts").as[(String, Long)].collect().toSeq

      input.addData("a", "a", "b")
      query.processAllAvailable()
      assert(emitted().groupBy(_._1).view.mapValues(_.map(_._2).max).toMap
        == Map("a" -> 2L, "b" -> 1L))

      input.addData("a", "c")
      query.processAllAvailable()
      val latest = emitted().groupBy(_._1).view.mapValues(_.map(_._2).max).toMap
      assert(latest == Map("a" -> 3L, "b" -> 1L, "c" -> 1L))
      query.stop()
    } finally {
      prev match {
        case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }
}
