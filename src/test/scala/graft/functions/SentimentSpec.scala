package graft.functions

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class SentimentSpec extends SparkTestBase {
  import spark.implicits._

  test("score: (pos - neg) / tokens, range and sign") {
    val got = Seq(
      "what a good great day", //        2 pos / 5 tokens = 0.4
      "this is bad and wrong twice", //  2 neg / 6 tokens
      "neutral words only here").toDF("t")
      .select(Sentiment.score(col("t")))
      .as[Double].collect()
    assert(math.abs(got(0) - 0.4) < 1e-12)
    assert(math.abs(got(1) + 2.0 / 6.0) < 1e-12)
    assert(got(2) == 0.0)
  }

  test("scoreUdf twins the columnar score") {
    val texts = Seq(
      "good good bad day", "all terrible awful hate", "", "neutral words only",
      "love Win FUN", "  spaced   out  good ")
    val df = texts.toDF("t")
    val colS = df.select(Sentiment.score(col("t"))).as[Double].collect().toSeq
    val udfS = df.select(Sentiment.scoreUdf(col("t"))).as[Double].collect().toSeq
    assert(udfS == colS)
  }

  test("score of empty text is 0 (no division by zero)") {
    val got = Seq("").toDF("t").select(Sentiment.score(col("t"))).as[Double].head()
    assert(got == 0.0)
  }

  test("mean aggregator: per-group mean over scores, empty-safe merge") {
    val scores = Seq(0.5, -0.5, 1.0).toDS()
    val got = scores.select(Sentiment.mean.toColumn).head()
    assert(math.abs(got - (1.0 / 3.0)) < 1e-12)
  }
}
