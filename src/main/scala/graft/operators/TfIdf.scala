package graft.operators

import graft.functions.TextFunctions
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** TF-IDF term scoring over a document corpus — the classic relevance /
  * keyword-extraction primitive (and the vectorization step feeding
  * classical-ML training pipelines).
  *
  * Shape: term frequency is computed SCAN-SIDE — a one-pass native
  * codegen expression (`TermCountsExpr`) folds each document's tokens
  * into a term→count map, and exploding the map yields the
  * (doc, term, tf) rows directly, so there is no token-level
  * explode and no (doc, term) groupBy shuffle at all (the classic
  * "aggregate before you shuffle" move; at 100 TB the difference
  * between shuffling every token occurrence and shuffling one row per
  * distinct term per doc). Document frequency reuses the SAME tf frame
  * (each (doc, term) row is one distinct document containing the term —
  * no second scan, no count-distinct). The corpus size joins in as a
  * broadcast one-row frame, keeping the whole computation in the plan
  * (no driver-side count round-trip).
  *
  * Scoring uses the RATIO idf variant, `tf · N / df`, rather than a
  * log: integer products below 2^53 divide to bit-identical doubles in
  * every IEEE-754 engine, while `ln` implementations legitimately
  * differ by ulps across libms — determinism is worth more to a data
  * pipeline than the log damping, and the ranking it induces per doc is
  * identical (log is monotone).
  */
object TfIdf {

  /** `(doc_id, term, tf, df, tfidf)` — top-`k` terms per doc by
    * `tf · N / df`, ties broken by term asc (total order ⇒ stable
    * top-k).
    */
  def topTerms(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      k: Int): DataFrame = {
    val tf = docs
      .select(
        col(idCol).alias("doc_id"),
        explode(graft.functions.expressions.TermCountsExpr.termCounts(col(textCol)))
          .as(Seq("term", "tf")))
    val df_ = tf.groupBy("term").agg(count(lit(1)).alias("df"))
    val n = docs.agg(count(lit(1)).alias("n_docs"))
    val w = Window.partitionBy("doc_id").orderBy(col("tfidf").desc, col("term").asc)
    tf
      .join(df_, Seq("term"))
      .crossJoin(broadcast(n))
      .withColumn(
        "tfidf",
        (col("tf") * col("n_docs")).cast("double") / col("df").cast("double"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select("doc_id", "term", "tf", "df", "tfidf")
  }
}
