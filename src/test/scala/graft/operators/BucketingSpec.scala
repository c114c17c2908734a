package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.DataFrame

import java.nio.file.Files

/** Co-located joins via bucketing — the 100 TB join strategy: both fact
  * tables bucketed by the join key on write, so the join (and the
  * aggregation on the same key) needs NO shuffle at read time. Asserts on
  * the physical plan, not just the result.
  */
class BucketingSpec extends SparkTestBase {
  import spark.implicits._

  /** Count shuffle exchanges in the executed plan (string-matched: after
    * execution the AQE wrapper prints the final plan, and collect() does
    * not descend into adaptive stages).
    */
  private def shuffles(df: DataFrame): Int =
    "Exchange (hash|range)partitioning".r
      .findAllIn(df.queryExecution.executedPlan.toString).length

  test("bucketed-by-key tables join and aggregate with zero shuffle exchanges") {
    val root = Files.createTempDirectory("graft-buckets").toString
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lines")

    (1 to 100).map(i => (i.toLong, s"cust${i % 10}")).toDF("okey", "cust")
      .write.option("path", s"$root/b_orders")
      .bucketBy(8, "okey").sortBy("okey").saveAsTable("b_orders")
    (1 to 300).map(i => ((i % 100 + 1).toLong, i.toDouble)).toDF("okey", "amount")
      .write.option("path", s"$root/b_lines")
      .bucketBy(8, "okey").sortBy("okey").saveAsTable("b_lines")

    val joined = spark.table("b_orders")
      .join(spark.table("b_lines"), "okey")
      .groupBy("okey")
      .agg(org.apache.spark.sql.functions.sum("amount").as("total"))
    assert(joined.count() == 100)
    assert(shuffles(joined) == 0,
      s"expected shuffle-free plan, got:\n${joined.queryExecution.executedPlan}")

    // contrast: the same aggregation over non-bucketed data must shuffle
    val o = (1 to 100).map(i => (i.toLong, s"cust${i % 10}")).toDF("okey", "cust")
    val l = (1 to 300).map(i => ((i % 100 + 1).toLong, i.toDouble)).toDF("okey", "amount")
    val unbucketed = o.join(l, "okey").groupBy("okey")
      .agg(org.apache.spark.sql.functions.sum("amount").as("total"))
    unbucketed.count()
    assert(shuffles(unbucketed) > 0)

    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lines")
  }

  test("incremental dedup against a fp-bucketed corpus shuffles only the batch side") {
    // grounds the BUCKETED alternative to Dedup.incrementalExact's
    // two-step probe: with the corpus stored as a fingerprint table
    // bucketed by fp, even a direct anti join sheds its corpus-side
    // shuffle — only the (small) batch aggregation/join shuffle
    // remains. (The operator itself no longer needs this: its map-side
    // probe shape never exchanges the state regardless of layout.)
    val root = Files.createTempDirectory("graft-fp-corpus").toString
    spark.sql("DROP TABLE IF EXISTS fp_corpus")
    (1 to 1000).map(i => s"stored doc $i").toDF("text")
      .select(org.apache.spark.sql.functions.md5($"text").as("fp"))
      .write.option("path", s"$root/fp_corpus")
      .bucketBy(8, "fp").sortBy("fp").saveAsTable("fp_corpus")

    val batch = ((1 to 20).map(i => (i.toLong, s"new doc $i")) ++
      Seq((100L, "stored doc 7"))).toDF("doc_id", "text")
    val batchFps = batch.select(
      $"doc_id",
      org.apache.spark.sql.functions.md5($"text").as("fp"))
      .groupBy("fp")
      .agg(org.apache.spark.sql.functions.min($"doc_id").as("id"))
      .join(spark.table("fp_corpus"), Seq("fp"), "left_anti")
    assert(batchFps.count() == 20) // the corpus collision is dropped
    val plan = batchFps.queryExecution.executedPlan.toString
    val exchanges = "Exchange (hash|range)partitioning".r.findAllIn(plan).length
    assert(exchanges <= 1,
      s"bucketed corpus must not shuffle (expected at most the batch-side exchange):\n$plan")
    spark.sql("DROP TABLE IF EXISTS fp_corpus")
  }
}
