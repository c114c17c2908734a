package graft.operators

import graft.functions.TextFunctions
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Log-bucket histogram quantiles — the quantile member of the
  * mergeable-summary family (Count-Min frequencies q124, KMV distinct
  * counts q126, Space-Saving heavy hitters q71): per-group value
  * distributions summarized in ≤ 64 power-of-two buckets, from which
  * any percentile resolves to a [2^(b−1), 2^b − 1] bound.
  *
  * Why not `approx_percentile`: like q40's HLL, its estimate is
  * engine-specific. A log histogram is engine-REPRODUCIBLE — the
  * bucket index is the bit length of the value (`length(bin(v))`,
  * exact integer arithmetic DuckDB mirrors verbatim), so the gate
  * hash-checks the derived quantile bounds themselves (q127), and the
  * exact discrete percentile rides beside them as the control — which
  * doubles as the in-data proof of the sketch's guarantee
  * (`est_lo ≤ exact ≤ est_hi` by construction, a boolean column the
  * oracle recomputes).
  *
  * Scale shape: the histogram is a plain `groupBy(group, bucket)`
  * count — Catalyst partial-aggregates it map-side and the exchange
  * carries ≤ 64 rows per group; histograms MERGE by adding counts
  * (associative, subtractable — unlike KMV, retirement subtracts
  * exactly). The exact control is the full per-group sort the sketch
  * replaces; at 100 TB one runs the histogram side alone, or tightens
  * bounds with sub-bucket interpolation off the same counts.
  */
object HistQuantile {

  /** Bucket index: 0 for v ≤ 0, else the bit length of v
    * (`floor(log2 v) + 1`) — exact via `length(bin(v))`.
    */
  def logBucket(v: Column): Column =
    when(v <= 0, lit(0)).otherwise(length(bin(v)))

  private def bucketLo(b: Column): Column =
    when(b === 0, lit(0L)).otherwise(pow(lit(2.0), b - lit(1)).cast("long"))

  private def bucketHi(b: Column): Column =
    when(b === 0, lit(0L)).otherwise(pow(lit(2.0), b).cast("long") - lit(1L))

  /** `(source, v)` per non-null doc, v = token count (empties → 0). */
  def tokenCounts(docs: DataFrame, sourceCol: String, textCol: String): DataFrame =
    docs
      .filter(col(textCol).isNotNull)
      .select(col(sourceCol).alias("source"),
        size(TextFunctions.tokens(col(textCol))).cast("long").alias("v"))

  /** The sketch itself: `(source, b, c)` — ≤ 64 rows per source, built
    * by one map-side partial-aggregated groupBy over the scan.
    */
  def histogram(vals: DataFrame): DataFrame =
    vals.groupBy(col("source"), logBucket(col("v")).alias("b"))
      .agg(count(lit(1)).alias("c"))

  /** Histograms over disjoint batches merge by ADDING counts — exact,
    * associative, and subtractable (a retired batch's histogram
    * subtracts back out, unlike KMV's minima).
    */
  def mergeHistograms(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b).groupBy("source", "b").agg(sum("c").alias("c"))

  /** Quantile bounds from the SKETCH ALONE — the 100 TB query shape
    * (no corpus pass): `(source, pct, n_docs, est_lo, est_hi, r)` with
    * `r = ceil(pct·n/100)` the covered rank. A constant |pcts|-row
    * fan-out over a ≤ 64-rows-per-source frame, nothing corpus-sized.
    */
  def profileFromHistogram(hist: DataFrame, pcts: Seq[Int]): DataFrame = {
    require(pcts.nonEmpty && pcts.forall(p => p >= 1 && p <= 100),
      s"percentiles must be in [1, 100], got $pcts")
    val bySource = Window.partitionBy("source")
    hist
      .withColumn("cum", sum("c").over(bySource.orderBy("b")))
      .withColumn("n", sum("c").over(bySource))
      .select(col("*"), explode(typedlit(pcts)).alias("pct"))
      .withColumn("r",
        floor((col("pct") * col("n") + lit(99)) / lit(100.0)).cast("long"))
      .filter(col("cum") - col("c") < col("r") && col("r") <= col("cum"))
      .select(col("source"), col("pct"), col("n").alias("n_docs"),
        bucketLo(col("b")).alias("est_lo"), bucketHi(col("b")).alias("est_hi"),
        col("r"))
  }

  /** Per-group percentile profile of the per-doc TOKEN COUNT:
    * `(source, pct, n_docs, est_lo, est_hi, exact_len, bounded)` for
    * each requested percentile. `est_lo/est_hi` come from the
    * histogram alone; `exact_len` is the discrete percentile (value at
    * rank `ceil(pct·n/100)` in the sorted values) computed as the
    * control; `bounded` asserts the sketch guarantee in-data.
    */
  def tokenCountProfile(
      docs: DataFrame,
      sourceCol: String,
      textCol: String,
      pcts: Seq[Int] = Seq(50, 90, 99)): DataFrame = {
    require(pcts.nonEmpty && pcts.forall(p => p >= 1 && p <= 100),
      s"percentiles must be in [1, 100], got $pcts")
    val vals = tokenCounts(docs, sourceCol, textCol)
    val sel = profileFromHistogram(histogram(vals), pcts)
    val bySource = Window.partitionBy("source")

    // exact control: the value at rank r of the per-source sort — the
    // full shuffle+sort the histogram replaces (ties collapse to the
    // same value, so the rank's VALUE is deterministic)
    val ranked = vals.withColumn("rn",
      row_number().over(bySource.orderBy("v")))
    // sel is bounded by construction (|sources| · |pcts| rows) and its
    // window lineage carries no stats — broadcast it explicitly so the
    // corpus-sized ranked frame never re-shuffles to meet it (the
    // q115/q117/q84 hint-class rule)
    broadcast(sel)
      .join(ranked, col("rn") === col("r") && sel("source") === ranked("source"))
      .select(sel("source"), col("pct"), col("n_docs"),
        col("est_lo"), col("est_hi"), col("v").alias("exact_len"),
        (col("est_lo") <= col("v") && col("v") <= col("est_hi")).alias("bounded"))
  }
}
