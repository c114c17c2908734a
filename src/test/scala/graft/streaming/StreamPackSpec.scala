package graft.streaming

import graft.SparkTestBase
import graft.operators.Chunker
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** [[StreamPack]] — streaming pack assignments: batch parity when all
  * docs arrive in one trigger, cursor continuity across triggers.
  */
class StreamPackSpec extends SparkTestBase {
  import spark.implicits._

  private def run(batches: Seq[Seq[(Long, String, Long)]]): Seq[StreamPack.PackOut] = {
    val input = MemoryStream[(Long, String, Long)](spark)
    val out = StreamPack.assignments(
      input.toDF().toDF("doc_id", "source", "n_tokens"),
      "doc_id", "source", "n_tokens", budget = 512L, shards = 4)
    val name = s"sp_out_${System.nanoTime()}"
    val q = out.writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    try {
      batches.foreach { b => input.addData(b); q.processAllAvailable() }
      spark.table(name).as[StreamPack.PackOut].collect().toSeq
    } finally q.stop()
  }

  private val docs = Seq(
    (1L, "a", 300L), (2L, "a", 300L), (3L, "a", 300L),
    (4L, "b", 200L), (5L, "b", 200L), (6L, "c", 600L))

  test("single trigger matches the batch operator exactly") {
    val streamed = run(Seq(docs)).map(o =>
      (o.shard, o.chunk_id, o.doc_id, o.group, o.n_tokens, o.cum_before)).toSet
    val batch = Chunker.packSequencesByGroup(
      docs.toDF("doc_id", "source", "n_tokens"),
      "doc_id", "n_tokens", "source", budget = 512L, shards = 4)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3),
        r.getLong(4), r.getLong(5)))
      .toSet
    assert(streamed == batch)
  }

  test("the token cursor carries across triggers — chunks span trigger boundaries") {
    val twoTriggers = run(Seq(docs.take(3), docs.drop(3)))
    val oneTrigger = run(Seq(docs))
    // same shard routing either way
    assert(twoTriggers.map(o => o.group -> o.shard).toSet ==
      oneTrigger.map(o => o.group -> o.shard).toSet)
    // per shard, the cumulative token total is trigger-split-invariant
    def totals(rows: Seq[StreamPack.PackOut]) =
      rows.groupBy(_.shard).view.mapValues(_.map(_.n_tokens).sum).toMap
    assert(totals(twoTriggers) == totals(oneTrigger))
    // continuity: in arrival order, each shard's cum_before is the
    // running sum of everything that shard saw before, across triggers
    twoTriggers.groupBy(_.shard).foreach { case (_, rows) =>
      val inOrder = rows.sortBy(_.cum_before)
      var cum = 0L
      inOrder.foreach { r =>
        assert(r.cum_before == cum)
        assert(r.chunk_id == cum / 512L)
        cum += r.n_tokens
      }
    }
  }
}
