package graft.operators

import graft.functions.TextFunctions
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** End-to-end training-corpus preparation — the composite pipeline a
  * 100 TB pretraining-data job runs, assembled entirely from this
  * library's column functions so the whole thing is ONE declarative plan:
  *
  *   quality gates (token count bounds) → language filter (n-gram
  *   stop-word language ID) → exact dedup (content fingerprint, keep
  *   lowest id) → clean corpus stats.
  *
  * Everything before the dedup is a scan-side filter (no shuffle); the
  * dedup is the single required shuffle, on the 128-bit fingerprint
  * rather than the document text.
  */
object TrainingPrep {

  def prepare(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      minTokens: Int,
      maxTokens: Int,
      language: String): DataFrame = {
    // one native-codegen pass per document: tokenize once → (n_tokens,
    // lang_pred, fp). The columnar HOF form re-tokenized per derived
    // column in interpreted CodegenFallback — ~5× slower end-to-end; the
    // UDF twin additionally paid a row-boundary encoder conversion.
    val scored = docs.select(
      col(idCol),
      graft.functions.expressions.CorpusStatsExpr.corpusStats(col(textCol)).as("st"))

    scored
      .filter(
        col("st.n_tokens") >= minTokens && col("st.n_tokens") <= maxTokens &&
          col("st.lang_pred") === language)
      .select(col(idCol), col("st.n_tokens").as("n_tokens"), col("st.fp").as("fp"))
      .groupBy("fp")
      .agg(
        min(col(idCol)).as(idCol),
        min(col("n_tokens")).as("n_tokens"),
        count(lit(1)).as("dup_count"))
      .select(idCol, "fp", "n_tokens", "dup_count")
  }
}
