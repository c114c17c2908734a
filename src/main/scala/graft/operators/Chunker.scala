package graft.operators

import graft.functions.TextFunctions
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Context-window shaping for training/RAG pipelines: turning variable-
  * length documents into fixed-budget training rows. Two primitives:
  *
  *  - [[packSequences]] — "concat then split at N tokens": documents are
  *    packed greedily, in deterministic order, into chunks whose token
  *    budget is `budget`. The pack assignment is a window cumsum ÷
  *    budget, partitioned by a deterministic shard key, so packing
  *    parallelizes across shards (in production the shard count matches
  *    writer parallelism); no single-partition global window exists at
  *    any scale.
  *
  *  - [[chunkOverlap]] — sliding-window chunking with overlap (RAG /
  *    long-context prep): chunks of ≤ `chunkSize` tokens starting every
  *    `stride`. Row-local `sequence` explode — zero shuffles, and the
  *    generator input is a bounded arithmetic range, never a computed
  *    array (the InferFiltersFromGenerate hazard).
  *
  * Reference analogue: none (the reference preps a classification set,
  * not an LM corpus); training-data-pipeline extension per SURVEY.md §7.8.
  */
object Chunker {

  /** `(shard, chunk_id, doc_id, n_tokens, cum_before)` — one row per doc
    * with its pack assignment. `chunk_id` is the running-token cumsum
    * before the doc, integer-divided by `budget`: docs never reorder
    * within a shard (ordered by id), and a doc straddling a boundary
    * belongs to the chunk its first token falls in (GPT-style
    * concat-split semantics).
    */
  def packSequences(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      budget: Long,
      shards: Int = 32): DataFrame =
    packSequencesByCount(
      docs.select(
        col(idCol).alias("doc_id"),
        size(TextFunctions.tokens(col(textCol))).cast("long").alias("n_tokens")),
      "doc_id", "n_tokens", budget, shards)

  /** [[packSequences]] over a caller-supplied per-doc token count — the
    * tokenizer-agnostic core: whitespace counts (the [[packSequences]]
    * default), `Bpe.tokenStats` subword counts (the real training-loader
    * budget), or any external tokenizer's counts all pack through the
    * same cumsum-÷-budget window.
    */
  def packSequencesByCount(
      counts: DataFrame,
      idCol: String,
      countCol: String,
      budget: Long,
      shards: Int = 32): DataFrame = {
    require(budget > 0 && shards > 0, "budget and shards must be positive")
    val w = Window.partitionBy("shard").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    counts
      .select(
        col(idCol).alias("doc_id"),
        (col(idCol) % shards).alias("shard"),
        col(countCol).cast("long").alias("n_tokens"))
      .withColumn("cum_before", coalesce(sum(col("n_tokens")).over(w), lit(0L)))
      .select(
        col("shard"),
        (col("cum_before") / budget).cast("long").alias("chunk_id"),
        col("doc_id"),
        col("n_tokens"),
        col("cum_before"))
  }

  /** Source-coherent packing — the in-context-pretraining recipe
    * (pack RELATED documents into one context window, instead of
    * whatever interleaving the id order produced): the same
    * cumsum-÷-budget window as [[packSequencesByCount]], but the shard
    * key is the HASH of `groupCol` (every doc of a source/domain lands
    * in ONE shard) and the in-shard order is `(group, id)` — each
    * chunk is a run of one group's documents, crossing into the next
    * group only at a group boundary. Shards stay balanced as long as
    * groups are many (the hash spreads them); ONE group is still one
    * shard's sort, so a corpus dominated by a single source wants the
    * per-domain quota (q147) in front — the documented escalation,
    * same class as `capPerGroup`'s.
    */
  def packSequencesByGroup(
      counts: DataFrame,
      idCol: String,
      countCol: String,
      groupCol: String,
      budget: Long,
      shards: Int = 32): DataFrame = {
    require(budget > 0 && shards > 0, "budget and shards must be positive")
    val w = Window.partitionBy("shard").orderBy(col(groupCol), col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    counts
      .select(
        col(idCol).alias("doc_id"),
        col(groupCol),
        pmod(TextFunctions.md5Hash60(col(groupCol).cast("string")), lit(shards.toLong))
          .alias("shard"),
        col(countCol).cast("long").alias("n_tokens"))
      .withColumn("cum_before", coalesce(sum(col("n_tokens")).over(w), lit(0L)))
      .select(
        col("shard"),
        (col("cum_before") / budget).cast("long").alias("chunk_id"),
        col("doc_id"),
        col(groupCol),
        col("n_tokens"),
        col("cum_before"))
  }

  /** Per-(shard, chunk) pack summary — the row shape a writer consumes. */
  def packSummary(packed: DataFrame): DataFrame =
    packed
      .groupBy("shard", "chunk_id")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("n_tokens_packed"))

  /** `(doc_id, chunk_idx, start, n_chunk_tokens)` — one row per chunk.
    * Chunks start at 0, stride, 2·stride, … while the start is inside
    * the doc; every doc emits at least one chunk (empty docs emit one
    * zero-token chunk), consecutive chunks overlap by
    * `chunkSize - stride` tokens, and every token belongs to ≥ 1 chunk
    * when `stride ≤ chunkSize`.
    */
  def chunkOverlap(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      chunkSize: Int,
      stride: Int): DataFrame = {
    require(chunkSize > 0 && stride > 0, "chunkSize and stride must be positive")
    require(stride <= chunkSize, "stride > chunkSize would leave tokens uncovered")
    docs
      .select(
        col(idCol).alias("doc_id"),
        size(TextFunctions.tokens(col(textCol))).cast("long").alias("n"))
      .select(
        col("doc_id"),
        col("n"),
        explode(sequence(lit(0L), greatest(col("n") - 1L, lit(0L)), lit(stride.toLong)))
          .alias("start"))
      .select(
        col("doc_id"),
        (col("start") / stride).cast("long").alias("chunk_idx"),
        col("start"),
        least(lit(chunkSize.toLong), col("n") - col("start")).alias("n_chunk_tokens"))
  }
}
