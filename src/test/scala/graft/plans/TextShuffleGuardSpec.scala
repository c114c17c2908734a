package graft.plans

import graft.SparkTestBase
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The text sibling of [[VectorShuffleGuardSpec]]: the rule must flag
  * exactly the un-cut-payload shape (a raw corpus text attribute
  * riding an exchange with no broadcast cut — what a reverted q84/q117
  * broadcast hint produces), and stay silent on derived keys, pruned
  * plans, non-text string columns, and registry plans.
  */
class TextShuffleGuardSpec extends SparkTestBase {

  private val docs = "/root/testdata/sf0.001/documents.parquet"

  private def withConf[T](kvs: (String, String)*)(body: => T): T = {
    val prev = kvs.map { case (k, _) => k -> spark.conf.getOption(k) }
    kvs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  private def planOf(df: => DataFrame) =
    withConf("spark.sql.adaptive.enabled" -> "false")(df.queryExecution.executedPlan)

  private def offending = planOf(
    spark.read.parquet(docs).repartition(col("doc_id")))

  test("fail mode vetoes an un-pruned raw-text shuffle; warn/off do not") {
    val rule = TextShuffleGuardRule(spark)
    val plan = offending
    withConf(TextShuffleGuardRule.ModeKey -> "fail") {
      val err = intercept[TextShuffleGuardRule.TextShuffleException] { rule(plan) }
      assert(err.getMessage.contains("un-pruned corpus-text shuffle"), err.getMessage)
      assert(err.getMessage.contains("text"), err.getMessage)
    }
    withConf(TextShuffleGuardRule.ModeKey -> "warn") { assert(rule(plan) eq plan) }
    withConf(TextShuffleGuardRule.ModeKey -> "off") { assert(rule(plan) eq plan) }
    assert(rule(plan) eq plan) // warn is the default — never throws
  }

  test("derived keys pass: a substring/hash of text is a NEW attribute, not the payload") {
    val rule = TextShuffleGuardRule(spark)
    val derived = planOf(
      spark.read.parquet(docs)
        .select(col("doc_id"), substring(col("text"), 1, 16).alias("k"))
        .repartition(col("k")))
    withConf(TextShuffleGuardRule.ModeKey -> "fail") { assert(rule(derived) eq derived) }
  }

  test("a broadcast-bounded cut below the exchange silences the guard") {
    val rule = TextShuffleGuardRule(spark)
    val ids = spark.range(0, 5).select(col("id").alias("doc_id"))
    val pruned = planOf(
      spark.read.parquet(docs)
        .join(broadcast(ids), Seq("doc_id"), "left_semi")
        .repartition(col("doc_id")))
    withConf(TextShuffleGuardRule.ModeKey -> "fail") { assert(rule(pruned) eq pruned) }
  }

  test("non-text string columns shuffle freely; the column list is configurable") {
    val rule = TextShuffleGuardRule(spark)
    // 'source' and 'lang' are raw scan strings but not payload names
    val scalarStrings = planOf(
      spark.read.parquet(docs)
        .select("doc_id", "source", "lang")
        .repartition(col("source")))
    withConf(TextShuffleGuardRule.ModeKey -> "fail") {
      assert(rule(scalarStrings) eq scalarStrings)
    }
    // ...until the operator opts them in
    withConf(
      TextShuffleGuardRule.ModeKey -> "fail",
      TextShuffleGuardRule.ColumnsKey -> "source") {
      intercept[TextShuffleGuardRule.TextShuffleException] { rule(scalarStrings) }
    }
  }

  test("registry plans pass in fail mode: the text-mover queries are all broadcast-cut") {
    // the queries the r15/r16 hint-class fixes touched — their plans
    // must satisfy the RUNTIME rule, not just the CI sweep
    val names = Seq("q84_incremental_neardup", "q117_hybrid_join", "q74_line_dedup")
    withConf(
      TextShuffleGuardRule.ModeKey -> "fail",
      "spark.sql.adaptive.enabled" -> "false") {
      val rule = TextShuffleGuardRule(spark)
      names.foreach { n =>
        val plan = graft.SparkEntry.queries(n)(spark, "/root/testdata/sf0.001")
          .queryExecution.executedPlan
        assert(rule(plan) eq plan, s"$n trips the text guard")
      }
    }
  }
}
