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

  /** The curation FUNNEL the [[prepare]] pipeline implies: how many
    * docs survive each gate — `(stage, n_docs)` for ingest → token
    * bounds → language → canonical-after-dedup. The first artifact any
    * pipeline review asks for ("where did my corpus go?"), and the
    * cheap canary that catches a mis-tuned gate (90% language loss, a
    * dedup collapse) BEFORE the expensive downstream tiers run.
    *
    * One native-codegen scan (the same fused `corpus_stats` pass as
    * [[prepare]]) into ONE aggregate: stages 1–3 are conditional sums,
    * stage 4 a conditional distinct count over the fingerprint — no
    * second scan, no join; the 4-row output is a driver-side unpivot
    * of the single aggregate row.
    */
  def funnelReport(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      minTokens: Int,
      maxTokens: Int,
      language: String): DataFrame = {
    val scored = docs.select(
      graft.functions.expressions.CorpusStatsExpr.corpusStats(col(textCol)).as("st"))
    val inBounds =
      col("st.n_tokens") >= minTokens && col("st.n_tokens") <= maxTokens
    val inLang = inBounds && col("st.lang_pred") === language
    scored
      .agg(
        count(lit(1)).alias("c1"),
        sum(when(inBounds, lit(1L)).otherwise(lit(0L))).alias("c2"),
        sum(when(inLang, lit(1L)).otherwise(lit(0L))).alias("c3"),
        countDistinct(when(inLang, col("st.fp"))).alias("c4"))
      .select(explode(array(
        struct(lit("1_ingest").alias("stage"), col("c1").alias("n_docs")),
        struct(lit("2_token_bounds").alias("stage"), col("c2").alias("n_docs")),
        struct(lit("3_language").alias("stage"), col("c3").alias("n_docs")),
        struct(lit("4_dedup_canonical").alias("stage"), col("c4").alias("n_docs")))))
      .select(col("col.stage").alias("stage"), col("col.n_docs").alias("n_docs"))
  }
}
