package graft.operators

import graft.functions.TextFunctions
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Count-Min sketch (Cormode/Muthukrishnan '05) — the point-query
  * frequency sketch that completes the mergeable-summary family next
  * to HLL distinct counts (q40) and the Bloom membership filter
  * (q86): approximate per-key counts in `depth × width` integers of
  * state, REGARDLESS of corpus size or cardinality, with one-sided
  * error (estimates never undercount).
  *
  * Spark-first shape: the sketch IS a tiny DataFrame — `(row, bucket,
  * cnt)`, at most `depth · width` rows — built by ONE map-side
  * partial-aggregated `groupBy` over the hashed occurrences (the
  * constant `depth` fan-out explode stays in the scan stage). Point
  * queries broadcast that table against the (bounded) query set, so
  * estimation never shuffles anything corpus-sized. Two sketches
  * merge by `union → groupBy sum` — the additive property that makes
  * this the right running-total summary for a 1000-executor stream:
  * per-partition sketches combine associatively, exactly like the
  * partial aggregates Catalyst already emits.
  *
  * Hashing is the repo-wide seeded md5 scheme
  * (`TextFunctions.seededHash60`, seed `cms<row>:<key>`), so every
  * bucket index reproduces bit-for-bit in the DuckDB oracle — the
  * gate checks the ESTIMATES, not just row counts (q124).
  */
object CountMin {

  private def bucketOf(row: Column, key: Column, width: Int): Column =
    pmod(
      TextFunctions.md5Hash60(
        concat(lit("cms"), row.cast("string"), lit(":"), key.cast("string"))),
      lit(width.toLong))

  /** Build the sketch table `(row, bucket, cnt)` from one occurrence
    * per input row of `keyCol`. Null keys are ignored (they would
    * never be queryable). At most `depth · width` output rows.
    */
  def buildTable(
      items: DataFrame,
      keyCol: String,
      depth: Int,
      width: Int): DataFrame = {
    require(depth >= 1 && width >= 1, s"need depth/width >= 1, got $depth x $width")
    items
      .select(col(keyCol).alias("__k"))
      .na.drop(Seq("__k"))
      .select(explode(sequence(lit(0), lit(depth - 1))).alias("row"), col("__k"))
      .select(col("row"), bucketOf(col("row"), col("__k"), width).alias("bucket"))
      .groupBy("row", "bucket")
      .agg(count(lit(1)).alias("cnt"))
  }

  /** Merge sketches built with the SAME (depth, width) — additive. */
  def merge(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b).groupBy("row", "bucket").agg(sum("cnt").alias("cnt"))

  /** Point-query a bounded key set: `(key, est)` with
    * `est >= true count` (one-sided). The sketch table is broadcast —
    * it is `depth · width` rows by construction — so the lookup is
    * map-side over the query frame; the only shuffle is the final
    * min-across-rows aggregate on the (bounded) query keys.
    */
  def estimate(
      table: DataFrame,
      queries: DataFrame,
      keyCol: String,
      depth: Int,
      width: Int): DataFrame =
    queries
      .select(col(keyCol).alias("key"))
      .na.drop(Seq("key"))
      .distinct()
      .select(col("key"), explode(sequence(lit(0), lit(depth - 1))).alias("row"))
      .withColumn("bucket", bucketOf(col("row"), col("key"), width))
      .join(broadcast(table), Seq("row", "bucket"), "left")
      .groupBy("key")
      .agg(min(coalesce(col("cnt"), lit(0L))).alias("est"))
}
