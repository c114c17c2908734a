package graft.operators

import graft.SparkTestBase

class DedupSpec extends SparkTestBase {
  import spark.implicits._

  private val corpus = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "the quick brown fox jumps over the lazy dog"), // exact dup of 1
    (3L, "the quick brown fox jumps over the sleepy dog"), // near dup of 1
    (4L, "completely different content about spark engines and pipelines"),
    (5L, "another unrelated document mentioning databases only")
  ).toDF("doc_id", "text")

  test("exact: groups identical texts, keeps min id, counts dups") {
    val got = Dedup.exact(corpus, "doc_id", "text")
      .select("keep_id", "dup_count")
      .as[(Long, Long)].collect().toSet
    assert(got == Set((1L, 2L), (3L, 1L), (4L, 1L), (5L, 1L)))
  }

  test("ngramJaccard: exact dup pair has jaccard 1.0; near dup scores high; unrelated absent") {
    val pairs = Dedup.ngramJaccard(corpus, "doc_id", "text", n = 2, threshold = 0.5)
      .as[(Long, Long, Double)].collect()
      .map { case (a, b, j) => (a, b) -> j }.toMap
    assert(pairs((1L, 2L)) == 1.0)
    assert(pairs.contains((1L, 3L)) && pairs.contains((2L, 3L)))
    assert(pairs((1L, 3L)) > 0.5 && pairs((1L, 3L)) < 1.0)
    assert(!pairs.keys.exists { case (a, b) => a == 4L || b == 4L })
  }

  test("ngramJaccard with maxShingleFreq uses a consistent universe (identical docs still 1.0)") {
    // every shingle of docs 1/2/3 containing "the" is hot across ≥3 docs;
    // sizes and commons must come from the same filtered set, so the
    // exact-dup pair keeps jaccard exactly 1.0
    val pairs = Dedup
      .ngramJaccard(corpus, "doc_id", "text", n = 2, threshold = 0.9, maxShingleFreq = Some(2))
      .as[(Long, Long, Double)].collect()
      .map { case (a, b, j) => (a, b) -> j }.toMap
    assert(pairs((1L, 2L)) == 1.0)
  }

  test("minHashLsh finds the exact-dup pair with jaccard 1.0 and no false positives") {
    val pairs = Dedup.minHashLsh(corpus, "doc_id", "text", n = 2, k = 16, bands = 8, threshold = 0.8)
      .as[(Long, Long, Double)].collect()
      .map { case (a, b, j) => (a, b) -> j }.toMap
    assert(pairs((1L, 2L)) == 1.0)
    // verification stage guarantees no pair below threshold survives
    assert(pairs.values.forall(_ >= 0.8))
  }

  test("simHashPairs: identical docs at distance 0") {
    val pairs = Dedup.simHashPairs(corpus, "doc_id", "text", maxDistance = 3)
      .as[(Long, Long, Int)].collect()
      .map { case (a, b, d) => (a, b) -> d }.toMap
    assert(pairs((1L, 2L)) == 0)
  }

  test("embeddingNearDup: identical vectors pair at cos 1") {
    val emb = Seq(
      (1L, Seq(1.0f, 0.0f)),
      (2L, Seq(1.0f, 0.0f)),
      (3L, Seq(0.0f, 1.0f))).toDF("id", "vec")
    val got = Dedup.embeddingNearDup(emb, "id", "vec", threshold = 0.99)
      .as[(Long, Long, Double)].collect()
    assert(got.map(p => (p._1, p._2)).toSet == Set((1L, 2L)))
  }

  test("embeddingNearDupBlock produces bit-identical pairs to the join variant") {
    val rnd = new scala.util.Random(7)
    val emb = (1L to 40L).map { i =>
      (i, Seq.fill(8)(rnd.nextGaussian().toFloat))
    }.toDF("id", "vec")
    val joinV = Dedup.embeddingNearDup(emb, "id", "vec", threshold = 0.2)
      .as[(Long, Long, Double)].collect().toSet
    val blockV = Dedup.embeddingNearDupBlock(emb, "id", "vec", threshold = 0.2)
      .as[(Long, Long, Double)].collect().toSet
    assert(blockV == joinV)
    assert(blockV.nonEmpty)
  }
}
