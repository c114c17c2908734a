package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming sequence packing — the loader-side twin of
  * [[graft.operators.Chunker.packSequencesByGroup]]: documents arrive
  * on a stream and each one is assigned its `(shard, chunk_id,
  * cum_before)` context-window slot INCREMENTALLY, so a training-data
  * writer can emit packed shards while ingest is still running instead
  * of waiting for a batch pack over the finished corpus.
  *
  * Semantics vs the batch operator: the batch form packs in the global
  * `(group, doc_id)` order; a stream cannot see the future, so the
  * pack order here is ARRIVAL order across triggers with the batch
  * operator's `(group, doc_id)` order applied WITHIN each trigger
  * (deterministic given the trigger composition — replay-safe because
  * the sort is applied per batch before state is touched). The running
  * token cursor carries across triggers in per-shard state, so chunk
  * boundaries are continuous: a chunk can span triggers exactly like a
  * doc stream spans executor batches in a loader.
  *
  * Scale shape: state is ONE long per shard (the token cursor) — the
  * smallest state this engine carries; each trigger shuffles only
  * `(shard, group, id, n_tokens)` scalars into the per-shard groups.
  * A single dominant source concentrates its docs into one shard's
  * group per trigger — the q147 domain quota in front is the
  * documented escalation, same as the batch operator.
  */
object StreamPack {

  final case class PackIn(shard: Long, group: String, docId: Long, nTokens: Long)
  final case class PackOut(
      shard: Long, chunk_id: Long, doc_id: Long, group: String,
      n_tokens: Long, cum_before: Long)

  /** `(doc_id, group, n_tokens)` stream → per-doc pack assignments.
    * `stream` must have exactly those three columns (id long, group
    * string, count long); shard = `md5_hash60(group) % shards`, the
    * batch operator's key, so batch and stream route identically.
    */
  def assignments(
      stream: DataFrame,
      idCol: String,
      groupCol: String,
      countCol: String,
      budget: Long,
      shards: Int): Dataset[PackOut] = {
    require(budget > 0 && shards > 0, "budget and shards must be positive")
    import stream.sparkSession.implicits._
    import org.apache.spark.sql.functions._
    stream
      .select(
        pmod(graft.functions.TextFunctions.md5Hash60(col(groupCol).cast("string")),
          lit(shards.toLong)).as("shard"),
        col(groupCol).cast("string").as("group"),
        col(idCol).cast("long").as("docId"),
        col(countCol).cast("long").as("nTokens"))
      .as[PackIn]
      .groupByKey(_.shard)
      .flatMapGroupsWithState[Long, PackOut](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (shard: Long, rows: Iterator[PackIn], state: GroupState[Long]) =>
          var cum = state.getOption.getOrElse(0L)
          // the batch operator's in-shard order, applied within the
          // trigger (bounded by the trigger's row count by contract)
          val out = rows.toSeq.sortBy(r => (r.group, r.docId)).map { r =>
            val o = PackOut(shard, cum / budget, r.docId, r.group, r.nTokens, cum)
            cum += r.nTokens
            o
          }
          state.update(cum)
          out.iterator
      }
  }
}
