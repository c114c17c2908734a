package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Lexicon sentiment scoring — a working replacement for the reference's
  * DEAD sentiment pipeline (`/root/reference/src/main/scala/TwitchStream/pipelines.scala:10-40`,
  * defined but never invoked — SURVEY.md §2.10 U5). Score per text =
  * (positive hits − negative hits) / token count ∈ [−1, 1], all native
  * column expressions; the per-group mean is a typed `Aggregator`.
  */
object Sentiment {

  /** Small public-domain polarity lexicons (subset of the classic
    * Hu-Liu opinion word lists).
    */
  val PositiveWords: Seq[String] = Seq(
    "good", "great", "awesome", "excellent", "love", "nice", "best",
    "amazing", "win", "happy", "fun", "cool", "perfect", "wonderful",
    "fantastic", "like", "brilliant", "beautiful", "enjoy", "strong")

  val NegativeWords: Seq[String] = Seq(
    "bad", "terrible", "awful", "hate", "worst", "sad", "lose", "broken",
    "bug", "fail", "poor", "wrong", "boring", "annoying", "horrible",
    "slow", "ugly", "weak", "problem", "angry")

  /** Signed hit count per token multiset. */
  def hits(toks: Column, words: Seq[String]): Column = {
    val w = typedlit(words)
    size(filter(toks, t => array_contains(w, t)))
  }

  /** Sentiment score of a text column: (pos − neg) / max(tokens, 1) —
    * the columnar (HOF) form, kept as the executable specification.
    */
  def score(text: Column): Column = {
    val toks = TextFunctions.tokens(text)
    (hits(toks, PositiveWords) - hits(toks, NegativeWords)).cast("double") /
      greatest(size(toks), lit(1)).cast("double")
  }

  /** JVM body of [[scoreUdf]] / `SentimentScoreExpr`. */
  def scoreLocal(text: String): Double = {
    val toks = TextFunctions.tokensLocal(text)
    var p = 0; var n = 0
    toks.foreach { t =>
      if (PositiveSet.contains(t)) p += 1
      if (NegativeSet.contains(t)) n += 1
    }
    (p - n).toDouble / math.max(toks.length, 1).toDouble
  }

  private val PositiveSet = PositiveWords.toSet
  private val NegativeSet = NegativeWords.toSet

  /** Tight-loop twin of [[score]] (one tokenize pass, set lookups). */
  val scoreUdf: Column => Column = {
    val f = udf { (text: String) => scoreLocal(text) }
    c => f(c)
  }

  /** Typed mean aggregator over already-computed scores — use as
    * `ds.groupBy(...).agg(Sentiment.mean.toColumn)` on a
    * `Dataset[Double]`, or register with `functions.udaf` for DataFrame
    * use.
    */
  val mean: Aggregator[Double, (Double, Long), Double] =
    new Aggregator[Double, (Double, Long), Double] {
      override def zero: (Double, Long) = (0.0, 0L)
      override def reduce(b: (Double, Long), a: Double): (Double, Long) = (b._1 + a, b._2 + 1)
      override def merge(x: (Double, Long), y: (Double, Long)): (Double, Long) =
        (x._1 + y._1, x._2 + y._2)
      override def finish(r: (Double, Long)): Double = if (r._2 == 0) 0.0 else r._1 / r._2
      override def bufferEncoder: Encoder[(Double, Long)] =
        Encoders.tuple(Encoders.scalaDouble, Encoders.scalaLong)
      override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
    }
}
