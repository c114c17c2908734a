package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) data layout — the multi-dimensional
  * clustering behind Delta/Iceberg `OPTIMIZE ZORDER BY`: interleave the
  * bits of two dimension keys so rows close in BOTH dimensions land in
  * the same file, making parquet min/max file skipping effective for
  * predicates on EITHER column. (Reference analogue: none;
  * 100 TB-layout extension.)
  *
  * Why this matters at scale: a single-column range layout gives
  * perfect skipping on that column and NONE on any other — at 100 TB a
  * secondary-dimension predicate reads every file. A z-ordered layout
  * bounds every file's extent in both dimensions (each halving of the
  * z-range halves each dimension's extent every other bit), so both
  * predicate shapes skip ~√F of F files instead of one shape skipping
  * F and the other skipping none.
  *
  * Everything here is integer arithmetic on the DataFrame API — the
  * interleave is a codegen'd non-overlapping-bit sum (`+` == `|`), no
  * UDF, no shuffle beyond the one `repartitionByRange` that IS the
  * layout operation.
  */
object Layout {

  /** Morton z-value: the low `bits` bits of `x` and `y` interleaved
    * (x in even positions, y in odd) into a `2*bits`-bit non-negative
    * long. Inputs must be non-negative; callers mask (`& ((1<<bits)-1)`)
    * or bucketize wider domains first.
    */
  def zValue(x: Column, y: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1, 31], got $bits")
    val xs = x.cast("long")
    val ys = y.cast("long")
    (0 until bits).map { i =>
      (shiftright(xs, i).bitwiseAND(lit(1L)) * lit(1L << (2 * i))) +
        (shiftright(ys, i).bitwiseAND(lit(1L)) * lit(1L << (2 * i + 1)))
    }.reduce(_ + _)
  }

  /** The write-path operator: range-partition by z-value into
    * `numFiles` tasks and sort within each — every output file covers
    * one contiguous z-range, i.e. a bounded rectangle-ish region in
    * (x, y). Write the result with any parquet sink; min/max stats per
    * file then serve both dimensions' predicates.
    *
    * `repartitionByRange` samples the z distribution (one extra pass)
    * to build balanced range bounds — skewed dimension values therefore
    * skew file SIZES, not file EXTENTS, which is the correct trade for
    * skipping.
    */
  def clusterByZ(
      df: DataFrame,
      xCol: String,
      yCol: String,
      bits: Int = 16,
      numFiles: Int = 64): DataFrame = {
    require(numFiles >= 1, s"numFiles must be positive, got $numFiles")
    require(!df.columns.contains("__z"),
      "clusterByZ: input already carries a __z column (would be silently clobbered)")
    val mask = (1L << bits) - 1
    df.withColumn("__z",
        zValue(col(xCol).bitwiseAND(lit(mask)), col(yCol).bitwiseAND(lit(mask)), bits))
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
  }

  /** Layout-effectiveness report: mask both dimensions to `bits` bits,
    * bucket rows by the top `bucketBits` bits of the z-value (the
    * deterministic equal-width analogue of `numFiles` range files), and
    * emit each bucket's row count and per-dimension min/max extent —
    * the exact numbers a scan planner reads off parquet footers to
    * decide skipping. Pure integer arithmetic end to end (one hash
    * aggregate on the bucket id; no sort, no sampling) so the report is
    * engine-reproducible.
    */
  def zOrderStats(
      df: DataFrame,
      xCol: String,
      yCol: String,
      bits: Int = 16,
      bucketBits: Int = 6): DataFrame = {
    require(bucketBits >= 1 && bucketBits <= 2 * bits,
      s"bucketBits must be in [1, ${2 * bits}], got $bucketBits")
    val mask = (1L << bits) - 1
    val x = col(xCol).cast("long").bitwiseAND(lit(mask))
    val y = col(yCol).cast("long").bitwiseAND(lit(mask))
    df.select(
        shiftright(zValue(x, y, bits), 2 * bits - bucketBits).alias("bucket"),
        x.alias("x"),
        y.alias("y"))
      .groupBy("bucket")
      .agg(
        count(lit(1)).alias("n"),
        min("x").alias("min_x"), max("x").alias("max_x"),
        min("y").alias("min_y"), max("y").alias("max_y"))
  }

  /** DuckDB twin of [[zValue]] ∘ mask ∘ shift for the oracle: the same
    * non-overlapping-bit sum spelled as SQL (`+` == `|`), kept here so
    * the Spark expression and the SQL string can never drift apart.
    */
  def zValueSql(x: String, y: String, bits: Int): String = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1, 31], got $bits")
    (0 until bits).map { i =>
      s"((($x >> $i) & 1) * ${1L << (2 * i)}) + ((($y >> $i) & 1) * ${1L << (2 * i + 1)})"
    }.mkString("(", " + ", ")")
  }
}
