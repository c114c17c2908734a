package graft.sinks

import graft.SparkTestBase
import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.types.{LongType, StringType, StructType}

import java.nio.file.Files

class KVTableSinkSpec extends SparkTestBase {
  import spark.implicits._

  private val schema = new StructType().add("k", StringType).add("n", LongType)

  private def roundTrip(sink: KVTableSink): Unit = {
    // read of a missing table → empty frame with the requested schema
    val missing = sink.read(spark, "nope", schema)
    assert(missing.schema == schema && missing.count() == 0)

    sink.write(Seq(("a", 1L), ("b", 2L)).toDF("k", "n"), "t")
    assert(sink.read(spark, "t", schema).as[(String, Long)].collect().toMap
      == Map("a" -> 1L, "b" -> 2L))

    // snapshot overwrite replaces
    sink.write(Seq(("c", 9L)).toDF("k", "n"), "t", SaveMode.Overwrite)
    assert(sink.read(spark, "t", schema).as[(String, Long)].collect().toMap == Map("c" -> 9L))

    // append extends
    sink.write(Seq(("d", 1L)).toDF("k", "n"), "t", SaveMode.Append)
    assert(sink.read(spark, "t", schema).count() == 2)

    // merge = running-total read-modify-write (J1 semantics)
    sink.write(Seq(("x", 1L), ("y", 2L)).toDF("k", "n"), "m")
    sink.merge(spark, "m", Seq(("y", 3L), ("z", 5L)).toDF("k", "n"), "k", "n")
    assert(sink.read(spark, "m", schema).as[(String, Long)].collect().toMap
      == Map("x" -> 1L, "y" -> 5L, "z" -> 5L))
  }

  test("InMemoryKVSink: read-missing/overwrite/append/merge contract") {
    roundTrip(new InMemoryKVSink)
  }

  test("ParquetKVSink: read-missing/overwrite/append/merge contract") {
    roundTrip(new ParquetKVSink(Files.createTempDirectory("graft-kv").toString))
  }

  test("InMemoryKVSink honors TTL on read") {
    val sink = new InMemoryKVSink
    sink.write(Seq(("a", 1L)).toDF("k", "n"), "ttl_t", SaveMode.Overwrite, ttlSeconds = 1)
    assert(sink.read(spark, "ttl_t", schema).count() == 1)
    Thread.sleep(1100)
    assert(sink.read(spark, "ttl_t", schema).count() == 0)
  }

  test("streaming update-mode merge path: sink owns the running totals") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.functions._
    val input = MemoryStream[String](spark)
    val sink = new InMemoryKVSink
    val ckpt = Files.createTempDirectory("graft-ckpt-merge").toString

    // Update output mode: each batch emits only changed keys; the sink
    // merge (RedisInterface.update_table flow) accumulates them. The
    // delta trick: aggregate per-batch counts in foreachBatch, merge into
    // the sink — state lives in the SINK, not the state store.
    val query = input.toDF()
      .writeStream
      .outputMode("append")
      .option("checkpointLocation", ckpt)
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        val counts = batch
          .select(explode(split(lower(col("value")), "\\s+")).alias("k"))
          .groupBy("k").agg(count(lit(1)).alias("n"))
        sink.merge(spark, "words", counts, "k", "n")
      }
      .start()

    input.addData("red blue red")
    query.processAllAvailable()
    input.addData("blue green")
    query.processAllAvailable()
    val got = sink.snapshot("words").map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map("red" -> 2L, "blue" -> 2L, "green" -> 1L))
    query.stop()
  }
}
