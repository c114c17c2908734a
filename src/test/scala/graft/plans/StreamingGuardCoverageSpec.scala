package graft.plans

import graft.SparkTestBase
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQueryException, Trigger}

import java.nio.file.Files

/** Closes the round-17 review's coverage gap: the guards were injected
  * only via `injectQueryStagePrepRule`, which fires under AQE — and
  * streaming micro-batch plans skip AQE, so a USER streaming
  * composition that shuffled corpus text straight into a `writeStream`
  * sink never met the rule. With [[ShuffleGuardColumnarRule]] in
  * [[graft.GraftExtensions]] the checks run in EVERY plan's physical
  * preparations. The session under test registers the extensions the
  * production way (`spark.sql.extensions`, see `SparkTestBase`), so
  * these are end-to-end injection-path proofs, not manual rule calls.
  */
class StreamingGuardCoverageSpec extends SparkTestBase {

  private def withConf[T](kvs: (String, String)*)(body: => T): T = {
    val prev = kvs.map { case (k, _) => k -> spark.conf.getOption(k) }
    kvs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  private def corpusDir(): String = {
    val dir = Files.createTempDirectory("guard-stream").toString
    spark.range(0, 50)
      .selectExpr("id AS doc_id", "concat('body of doc ', id) AS text")
      .write.parquet(s"$dir/corpus")
    dir
  }

  private def textGuardTripped(e: Throwable): Boolean = {
    var c: Throwable = e
    while (c != null) {
      if (c.isInstanceOf[TextShuffleGuardRule.TextShuffleException]) return true
      c = c.getCause
    }
    false
  }

  test("micro-batch sink plan (no AQE, no foreachBatch): fail mode vetoes the un-cut text shuffle") {
    val dir = corpusDir()
    val sch = spark.read.parquet(s"$dir/corpus").schema
    withConf(TextShuffleGuardRule.ModeKey -> "fail") {
      val q = spark.readStream.schema(sch).parquet(s"$dir/corpus")
        .repartition(col("doc_id")) // raw text rides the exchange
        .writeStream.format("parquet")
        .option("path", s"$dir/out")
        .option("checkpointLocation", s"$dir/ckpt")
        .trigger(Trigger.AvailableNow())
        .start()
      val err = intercept[StreamingQueryException] { q.awaitTermination() }
      assert(textGuardTripped(err),
        s"guard did not fire inside the micro-batch plan: ${err.getMessage}")
    }
  }

  test("micro-batch sink plan: a derived-key shuffle passes in fail mode end-to-end") {
    val dir = corpusDir()
    val sch = spark.read.parquet(s"$dir/corpus").schema
    withConf(TextShuffleGuardRule.ModeKey -> "fail") {
      val q = spark.readStream.schema(sch).parquet(s"$dir/corpus")
        .select(col("doc_id"), substring(col("text"), 1, 8).alias("k"))
        .repartition(col("k"))
        .writeStream.format("parquet")
        .option("path", s"$dir/out_ok")
        .option("checkpointLocation", s"$dir/ckpt_ok")
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      assert(spark.read.parquet(s"$dir/out_ok").count() === 50L)
    }
  }

  test("foreachBatch body: ordinary batch planning fires the guard (covered both ways)") {
    val dir = corpusDir()
    import spark.implicits._
    withConf(TextShuffleGuardRule.ModeKey -> "fail") {
      val input = MemoryStream[Long](spark)
      val q = input.toDF().writeStream
        .option("checkpointLocation", s"$dir/ckpt_fb")
        .foreachBatch { (_: org.apache.spark.sql.DataFrame, _: Long) =>
          spark.read.parquet(s"$dir/corpus")
            .repartition(col("doc_id"))
            .write.mode("overwrite").parquet(s"$dir/fb_out")
        }
        .trigger(Trigger.ProcessingTime("0 seconds"))
        .start()
      input.addData(1L)
      val err = intercept[StreamingQueryException] { q.processAllAvailable() }
      assert(textGuardTripped(err),
        s"guard did not fire inside the foreachBatch body: ${err.getMessage}")
    }
  }
}
