package graft.operators

import graft.functions.TextFunctions._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The reference's flagship computation — word counting over cleaned,
  * stop-word-filtered tokens (`/root/reference/src/main/scala/TwitchStream/SparkRunner.scala:121-127`)
  * — as a single declarative plan: tokenize → stop-words → explode →
  * length filter → hash aggregate.
  *
  * Scale notes: the explode multiplies rows but Catalyst pushes the
  * `length > minLength` filter into the generate; the count is a partial
  * (map-side) + final hash aggregate, so the shuffle carries one row per
  * distinct word per partition — the natural minimum. The reference did
  * this by hand with `reduceByKey` (`SparkRunner.scala:126`); Catalyst
  * does it automatically.
  */
object WordCount {

  /** tokens column after clean + stop-word removal (U4 parity) — the
    * columnar form, used by the streaming pipeline and parity tests.
    */
  def cleanTokens(text: Column, language: String): Column =
    removeStopWords(tokens(text), language)

  def wordCounts(
      df: DataFrame,
      textCol: String,
      language: String = "english",
      minLength: Int = 3): DataFrame =
    // tokenize + stop-words + length gate in one tight-loop pass as the
    // native codegen `clean_tokens` expression (the columnar HOF form is
    // CodegenFallback — interpreted per token with a linear stop-list
    // scan; the old closure-UDF form broke codegen at its boundary);
    // identical multiset out, explode stays native
    df.select(
      explode(graft.functions.expressions.CleanTokensExpr
        .cleanTokens(col(textCol), language, minLength)).alias("word"))
      .groupBy("word")
      .agg(count(lit(1)).alias("count"))
}
