package graft.operators

import graft.SparkTestBase

class ChunkerSpec extends SparkTestBase {
  import spark.implicits._

  private def doc(id: Long, nTokens: Int): (Long, String) =
    (id, Seq.fill(nTokens)("tok").mkString(" "))

  test("chunkOverlap: coverage, overlap, and tail semantics") {
    val df = Seq(doc(1L, 250), doc(2L, 80), doc(3L, 100), doc(4L, 0)).toDF("doc_id", "text")
    val got = Chunker.chunkOverlap(df, "doc_id", "text", chunkSize = 100, stride = 80)
      .as[(Long, Long, Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._2).map(r => (r._3, r._4)).toSeq).toMap

    // 250 tokens → starts 0,80,160,240; sizes 100,100,90,10
    assert(got(1L) == Seq((0L, 100L), (80L, 100L), (160L, 90L), (240L, 10L)))
    // exactly chunkSize-stride overlap between consecutive full chunks,
    // and every token position covered
    val covered = got(1L).flatMap { case (s, n) => s until (s + n) }.toSet
    assert(covered == (0L until 250L).toSet)
    // 80 tokens → single chunk [0, 80)
    assert(got(2L) == Seq((0L, 80L)))
    // exactly chunkSize tokens → one full chunk (start 80 would be past the end)
    assert(got(3L) == Seq((0L, 100L), (80L, 20L)))
    // empty doc → one zero-token chunk (documents never vanish silently)
    assert(got(4L) == Seq((0L, 0L)))

    intercept[IllegalArgumentException] {
      Chunker.chunkOverlap(df, "doc_id", "text", chunkSize = 50, stride = 80)
    }
  }

  test("packSequences matches a local greedy simulation and conserves tokens") {
    val docs = (0L until 200L).map(i => doc(i, (i % 37).toInt + 1))
    val df = docs.toDF("doc_id", "text")
    val budget = 64L
    val shards = 4

    val got = Chunker.packSequences(df, "doc_id", "text", budget, shards)
      .as[(Long, Long, Long, Long, Long)].collect()
      .map(r => r._3 -> ((r._1, r._2, r._4, r._5))).toMap

    // local replication of the same deterministic packing
    val expected = docs
      .map { case (id, text) => (id, id % shards, text.split(" ").length.toLong) }
      .groupBy(_._2)
      .flatMap { case (shard, ds) =>
        var cum = 0L
        ds.sortBy(_._1).map { case (id, _, n) =>
          val row = (id, (shard, cum / budget, n, cum))
          cum += n
          row
        }
      }
    expected.foreach { case (id, exp) => assert(got(id) == exp, s"doc $id") }

    // conservation: packed token totals sum to the corpus total
    val summary = Chunker.packSummary(
      Chunker.packSequences(df, "doc_id", "text", budget, shards))
      .as[(Long, Long, Long, Long)].collect()
    assert(summary.map(_._4).sum == docs.map(_._2.split(" ").length.toLong).sum)
    assert(summary.map(_._3).sum == docs.length.toLong)
  }

  test("packSequencesByGroup: one shard per group, coherent runs, conserved tokens") {
    val counts = Seq(
      (1L, "a", 300L), (2L, "a", 300L), (3L, "a", 300L),
      (4L, "b", 200L), (5L, "b", 200L),
      (6L, "c", 600L)).toDF("doc_id", "source", "n_tokens")
    val packed = Chunker.packSequencesByGroup(
      counts, "doc_id", "n_tokens", "source", budget = 512L, shards = 4)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3),
        r.getLong(4), r.getLong(5)))
    // every group maps to exactly one shard (hash(group) % shards)
    val shardOf = packed.groupBy(_._4).map { case (g, rows) =>
      g -> rows.map(_._1).distinct
    }
    assert(shardOf.values.forall(_.size == 1), s"group split across shards: $shardOf")
    packed.groupBy(_._4).foreach { case (g, rows) =>
      val expect = graft.functions.TextFunctions.md5Hash60Local(g) % 4
      assert(rows.head._1 == expect)
    }
    // within a shard, cum_before follows (group, id) order exactly
    packed.groupBy(_._1).foreach { case (_, rows) =>
      val ordered = rows.sortBy(r => (r._4, r._3))
      var cum = 0L
      ordered.foreach { r =>
        assert(r._6 == cum, s"cum_before mismatch at $r")
        assert(r._2 == cum / 512L)
        cum += r._5
      }
    }
    // conservation
    assert(packed.map(_._5).sum == 1900L && packed.length == 6)
  }
}
