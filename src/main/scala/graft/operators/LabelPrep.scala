package graft.operators

import graft.functions.TextFunctions
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Training-set preparation — the reference's batch pipeline
  * (`/root/reference/src/main/scala/TwitchStream/ProcessingWorkSheet.sc:35-134`):
  * clean text → derive label array → drop outlier labels → keep only the
  * K most frequent labels → drop rows left with no labels.
  *
  * Differences from the reference, by design (SURVEY.md §2.11, §4):
  *  - the string-cleaner UDFs become native `regexp_replace`/`translate`
  *    (codegen'd, pushdown-transparent);
  *  - `removeLabels` UDF becomes a **broadcast left-semi join** against
  *    the top-K label set instead of `collect()`-ing labels to the driver
  *    and re-shipping them in a closure — same result, but the pattern
  *    stays distributed and works when K is large;
  *  - top-K uses a deterministic count-desc/label-asc order.
  */
object LabelPrep {

  /** Strip `< br / >` markers, newlines, and `[]"'` junk; lower + trim.
    * (F5/F6 de-UDF'd.)
    */
  def cleanText(df: DataFrame, textCol: String): DataFrame =
    df.withColumn(
      textCol,
      trim(
        regexp_replace(
          regexp_replace(translate(col(textCol), "[]\"'", ""), "< br / >", " "),
          "\\s+",
          " ")))

  /** Full pipeline over a corpus with a text column; labels are the
    * distinct cleaned tokens of the document (the fixtures have no
    * separate label column; the reference's `categories` column played
    * this role). Output: one `(doc_id, label)` row per surviving label.
    */
  def prepare(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      outlierLabels: Seq[String],
      minTextLength: Int = 50,
      maxLabels: Int = 100): DataFrame = {

    val cleaned = cleanText(docs.na.drop(Seq(idCol, textCol)), textCol)
      .filter(length(col(textCol)) > minTextLength)
      // distinct-tokens-minus-outliers in one tight-loop pass (twin of
      // array_except(array_distinct(tokens(..)), outliers))
      .withColumn("label", TextFunctions.distinctTokensUdf(outlierLabels)(col(textCol)))

    val exploded = cleaned.select(col(idCol), explode(col("label")).alias("label"))

    val topLabels = KVTable.topK(
      exploded.groupBy("label").agg(count(lit(1)).alias("label_count")),
      "label", "label_count", maxLabels)

    // broadcast semi-join: keeps only top-K labels without a driver collect
    exploded.join(broadcast(topLabels.select("label")), Seq("label"), "left_semi")
      .select(col(idCol), col("label"))
  }
}
