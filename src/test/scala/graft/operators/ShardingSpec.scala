package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** [[Sharding]] — deterministic shuffle + sharding: reproducibility,
  * shard/pos invariants, the manifest, and the partitioned writer's
  * on-disk order (the contract a training loader depends on).
  */
class ShardingSpec extends SparkTestBase {
  import spark.implicits._

  private def docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")

  test("orderedAssignments: a total, seeded permutation — reproducible, seed-sensitive") {
    val a = Sharding.orderedAssignments(docs, "doc_id", seed = 42L, nShards = 8)
      .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
    val b = Sharding.orderedAssignments(docs, "doc_id", seed = 42L, nShards = 8)
      .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(a == b, "same seed must reproduce the identical permutation")

    val c = Sharding.orderedAssignments(docs, "doc_id", seed = 7L, nShards = 8)
      .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(a != c, "different seeds must yield different orders")

    // every doc appears exactly once; shards in range; positions are
    // 1..n_s within each shard with no gaps
    assert(a.map(_._1).distinct.size == docs.count())
    assert(a.forall { case (_, s, _) => s >= 0 && s < 8 })
    a.groupBy(_._2).foreach { case (s, rows) =>
      assert(rows.map(_._3).sorted == (1L to rows.size).toSeq, s"shard $s has position gaps")
    }
  }

  test("manifest: doc and token totals agree with the corpus; shards roughly balanced") {
    val m = Sharding.manifest(docs, "doc_id", "text", seed = 42L, nShards = 8)
      .as[(Long, Long, Long)].collect().toSeq
    assert(m.map(_._2).sum == docs.count(), "manifest doc count != corpus")
    val totalTokens = docs
      .select(sum(graft.functions.TextFunctions.tokenCount(col("text")))).head().getLong(0)
    assert(m.map(_._3).sum == totalTokens, "manifest token count != corpus")
    // md5 keys are uniform: no shard should be empty at 500 docs / 8 shards
    assert(m.size == 8 && m.forall(_._2 > 0), s"empty shard in $m")
  }

  test("writeShards: each shard wholly co-located and sorted by the seeded key on disk") {
    val dir = java.nio.file.Files.createTempDirectory("graft-shards").toString
    Sharding.writeShards(docs, "doc_id", seed = 42L, nShards = 4, path = dir)

    val shardDirs = new java.io.File(dir).listFiles()
      .filter(_.getName.startsWith("shard=")).sortBy(_.getName)
    assert(shardDirs.length == 4, s"expected 4 shard dirs, got ${shardDirs.toSeq}")
    // co-location: one file per shard (the repartition puts a shard's
    // rows in exactly one task)
    shardDirs.foreach { d =>
      assert(d.listFiles().count(_.getName.endsWith(".parquet")) == 1,
        s"${d.getName} split across files — shard not co-located")
    }
    // the files ARE the training order: sort_key ascending within each shard
    shardDirs.foreach { d =>
      val keys = spark.read.parquet(d.toString).select("sort_key")
        .as[Long].collect().toSeq
      assert(keys == keys.sorted, s"${d.getName} not in seeded order")
    }
    // round-trip completeness
    assert(spark.read.parquet(dir).count() == docs.count())
  }
}
