package graft.plans

import graft.SparkTestBase
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The runtime twin of the CI hint-class sweeps: the guard rule must
  * flag exactly the shape that shipped twice (a corpus vector scan
  * feeding a shuffle with no broadcast cut) and stay silent on pruned
  * plans, non-vector shuffles, and scoped-out patterns.
  */
class VectorShuffleGuardSpec extends SparkTestBase {

  private val emb = "/root/testdata/sf0.001/embeddings.parquet"

  private def withConf[T](kvs: (String, String)*)(body: => T): T = {
    val prev = kvs.map { case (k, _) => k -> spark.conf.getOption(k) }
    kvs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  /** Final physical plan with real ShuffleExchangeExec nodes (AQE off
    * so the rule can be applied to the executed plan directly).
    */
  private def planOf(df: => DataFrame) =
    withConf("spark.sql.adaptive.enabled" -> "false")(df.queryExecution.executedPlan)

  private def offending = planOf(
    spark.read.parquet(emb).repartition(col("vec_id")))

  test("fail mode vetoes an un-pruned corpus-vector shuffle; warn/off do not") {
    val rule = VectorShuffleGuardRule(spark)
    val plan = offending
    withConf(VectorShuffleGuardRule.ModeKey -> "fail") {
      val err = intercept[VectorShuffleGuardRule.VectorShuffleException] { rule(plan) }
      assert(err.getMessage.contains("un-pruned corpus-vector shuffle"), err.getMessage)
      assert(err.getMessage.contains("embeddings.parquet"), err.getMessage)
    }
    withConf(VectorShuffleGuardRule.ModeKey -> "warn") { assert(rule(plan) eq plan) }
    withConf(VectorShuffleGuardRule.ModeKey -> "off") { assert(rule(plan) eq plan) }
    // warn is the default — an unconfigured session must never throw
    assert(rule(plan) eq plan)
  }

  test("a broadcast-bounded cut below the exchange silences the guard") {
    val rule = VectorShuffleGuardRule(spark)
    val ids = spark.range(0, 5).select(col("id").alias("vec_id"))
    val pruned = planOf(
      spark.read.parquet(emb)
        .join(broadcast(ids), Seq("vec_id"), "left_semi")
        .repartition(col("vec_id")))
    withConf(VectorShuffleGuardRule.ModeKey -> "fail") { assert(rule(pruned) eq pruned) }
  }

  test("non-vector shuffles and scoped-out corpus patterns pass in fail mode") {
    val rule = VectorShuffleGuardRule(spark)
    // projecting the vector away before the shuffle is the fix-shape:
    // ids exchange freely
    val scalarOnly = planOf(
      spark.read.parquet(emb).select("vec_id").repartition(col("vec_id")))
    withConf(VectorShuffleGuardRule.ModeKey -> "fail") {
      assert(rule(scalarOnly) eq scalarOnly)
    }
    // a pattern that does not match the scanned path scopes the guard out
    val bad = offending
    withConf(
      VectorShuffleGuardRule.ModeKey -> "fail",
      VectorShuffleGuardRule.PatternKey -> "prod-corpus-only") {
      assert(rule(bad) eq bad)
    }
  }

  test("the extension registers the guard without touching the function surface") {
    // records the builder on a fresh extensions object — the same call
    // path spark.sql.extensions=graft.GraftExtensions runs at session
    // build
    new graft.GraftExtensions().apply(new org.apache.spark.sql.SparkSessionExtensions)
  }
}
