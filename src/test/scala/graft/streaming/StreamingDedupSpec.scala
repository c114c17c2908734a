package graft.streaming

import graft.SparkTestBase
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger

import java.nio.file.Files

class StreamingDedupSpec extends SparkTestBase {
  import spark.implicits._

  test("exact: duplicates suppressed across batches, normalization-aware") {
    val input = MemoryStream[String](spark)
    val ckpt = Files.createTempDirectory("graft-sdedup").toString
    val query = StreamingDedup.exact(input.toDF().toDF("text"), "text")
      .writeStream
      .format("memory").queryName("dedup_out")
      .outputMode("append")
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.ProcessingTime("100 milliseconds"))
      .start()

    input.addData("hello world", "hello world", "other doc")
    query.processAllAvailable()
    assert(spark.sql("SELECT count(*) FROM dedup_out").as[Long].head() == 2L)

    // later batch: same content (different whitespace) still suppressed;
    // genuinely new content passes
    input.addData("hello   world", "brand new")
    query.processAllAvailable()
    val texts = spark.sql("SELECT text FROM dedup_out").as[String].collect().toSet
    assert(texts == Set("hello world", "other doc", "brand new"))
    query.stop()
  }
}
