package graft.operators

import graft.functions.TextFunctions
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic corpus shuffle + sharding — the "write the training
  * order" step of a pre-training pipeline: break source/temporal
  * correlation with a seeded pseudo-random global order, split the
  * corpus into N equal-expectation shards, and hand the loader a
  * per-shard manifest. (Reference analogue: none;
  * training-data-pipeline extension.)
  *
  * Scale shape: the order key is the 60-bit md5 hash of
  * `"<seed>:<id>"` — pure map-side arithmetic, reproducible across
  * runs, partitionings, and engines (the same keyed-decision family
  * as [[Sampling]]'s keep-rates, so re-running the job or moving it
  * to another cluster yields the SAME training order bit for bit).
  * Shard assignment is `hash % nShards`: uniform by construction, so
  * no shard skew regardless of the corpus's own key distribution.
  * Positioning is a row_number WITHIN each shard — one hash exchange
  * on the shard id plus a per-shard local sort; the corpus is never
  * globally sorted and never range-partitioned. At 100 TB,
  * [[writeShards]] is the deployment surface: repartition by shard,
  * sort within partitions, write `partitionBy(shard)` — every
  * executor sorts only its own shard's slice, and the parquet files
  * themselves carry the training order.
  */
object Sharding {

  /** `"<seed>:<id>"` hashed to a uniform 60-bit long — the shared
    * shuffle key of every function here ([[TextFunctions.seededHash60]],
    * the single-sourced seed format).
    */
  private def sortKey(idCol: String, seed: Long) =
    TextFunctions.seededHash60(seed, col(idCol))

  /** Every input row labeled `(…, shard, sort_key)`: `shard` in
    * `[0, nShards)`, `sort_key` the deterministic pseudo-random order
    * key within the shard. Pure projection — no exchange.
    */
  def assign(df: DataFrame, idCol: String, seed: Long, nShards: Int): DataFrame = {
    require(nShards > 0, s"nShards must be positive, got $nShards")
    // `shard`/`sort_key` are this module's OUTPUT contract (the loader
    // and the oracle key on these names), so they can't be renamed to
    // `__graft_` temps — instead fail loud rather than silently
    // clobbering a caller's same-named columns
    Seq("sort_key", "shard").foreach { c =>
      require(!df.columns.contains(c),
        s"Sharding.assign: input already has a '$c' column — rename it " +
          "first; assign() emits its own shard/sort_key output columns")
    }
    val hk = sortKey(idCol, seed)
    df.withColumn("sort_key", hk)
      .withColumn("shard", (hk % nShards).cast("long"))
  }

  /** `(id, shard, pos)` — the materialized training order: `pos` is
    * the row's 1-based position within its shard under the seeded
    * order (ties on the 60-bit key broken by id, so the order is
    * total). One hash exchange on `shard` + per-shard sort; no global
    * sort (the window partitions by shard).
    */
  def orderedAssignments(
      df: DataFrame,
      idCol: String,
      seed: Long,
      nShards: Int): DataFrame = {
    val w = Window.partitionBy(col("shard")).orderBy(col("sort_key"), col(idCol))
    assign(df, idCol, seed, nShards)
      .select(
        col(idCol),
        col("shard"),
        row_number().over(w).cast("long").alias("pos"))
  }

  /** Per-shard manifest for the loader: doc and token counts per
    * shard. One partial+final aggregate over `(shard, n_tokens)`
    * scalars — text never shuffles.
    */
  def manifest(
      df: DataFrame,
      idCol: String,
      textCol: String,
      seed: Long,
      nShards: Int): DataFrame =
    assign(
      df.select(col(idCol), TextFunctions.tokenCount(col(textCol)).alias("n_tokens")),
      idCol, seed, nShards)
      .groupBy("shard")
      .agg(
        count(lit(1)).alias("n_docs"),
        sum("n_tokens").alias("n_tokens"))

  /** Writes the sharded, seeded-order corpus as parquet partitioned by
    * `shard`: each shard's rows are wholly co-located (repartition on
    * the shard id) and sorted by the seeded key, so the files
    * themselves ARE the training order — a loader streams
    * `shard=<s>/` front to back.
    */
  def writeShards(
      df: DataFrame,
      idCol: String,
      seed: Long,
      nShards: Int,
      path: String): Unit =
    assign(df, idCol, seed, nShards)
      // RANGE repartition on the shard id, not hash: murmur3 over the
      // small 0..nShards-1 domain collides (balls-in-bins: several
      // shards in one task, other tasks empty), which would serialize
      // up to ~3 shards' sort+write in one executor. The range
      // partitioner's sampled bounds split the nShards distinct values
      // 1:1 onto nShards partitions, so every task sorts exactly one
      // shard's slice. (This exchanges on the tiny shard key — the
      // corpus is still never range-partitioned by a data column.)
      .repartitionByRange(nShards, col("shard"))
      .sortWithinPartitions(col("shard"), col("sort_key"), col(idCol))
      .write.mode("overwrite").partitionBy("shard").parquet(path)
}
