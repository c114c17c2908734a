package graft.operators

import graft.SparkTestBase

class SimilaritySpec extends SparkTestBase {
  import spark.implicits._

  private val emb = Seq(
    (1L, Seq(1.0f, 0.0f, 0.0f)),
    (2L, Seq(0.9f, 0.1f, 0.0f)),
    (3L, Seq(0.0f, 1.0f, 0.0f)),
    (4L, Seq(-1.0f, 0.0f, 0.0f)),
    (5L, Seq(0.7f, 0.7f, 0.0f))).toDF("vec_id", "embedding")

  private val query = Seq(1.0, 0.0, 0.0)

  test("bruteForceTopK returns k best by cosine, ordered desc") {
    val got = Similarity.bruteForceTopK(emb, "vec_id", "embedding", query, 3)
      .as[(Long, Double)].collect()
    assert(got.map(_._1).toSeq == Seq(1L, 2L, 5L))
    assert(got.head._2 == 1.0)
    assert(got.map(_._2).toSeq == got.map(_._2).toSeq.sorted.reverse)
  }

  test("lshTopK returns a subset of brute-force candidates, including the query's bucket-mates") {
    val brute = Similarity.bruteForceTopK(emb, "vec_id", "embedding", query, 5)
      .as[(Long, Double)].collect().toMap
    val lsh = Similarity.lshTopK(emb, "vec_id", "embedding", query, 3, nPlanes = 4)
      .as[(Long, Double)].collect()
    // every LSH hit must carry the same cosine as the exact scan
    lsh.foreach { case (id, cos) =>
      assert(math.abs(brute(id) - cos) < 1e-12)
    }
    // the identical vector always lands in the query's own bucket
    assert(lsh.map(_._1).contains(1L))
  }
}
