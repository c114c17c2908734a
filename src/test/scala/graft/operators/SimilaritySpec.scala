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

  test("ivfTopK probes nearest cells and scores with the exact cosine") {
    val rnd = new scala.util.Random(3)
    // two well-separated clusters around +x and +y
    val vecs = (1L to 30L).map { i =>
      val base = if (i <= 15) Seq(1.0, 0.0, 0.0) else Seq(0.0, 1.0, 0.0)
      (i, base.map(b => (b + rnd.nextGaussian() * 0.05).toFloat))
    }.toDF("vec_id", "embedding")

    val got = Similarity.ivfTopK(vecs, "vec_id", "embedding", Seq(1.0, 0.0, 0.0),
      k = 5, nLists = 2, nProbe = 1)
      .as[(Long, Double)].collect()
    assert(got.length == 5)
    // probing the +x cell: every hit comes from the +x cluster
    assert(got.forall(_._1 <= 15L))
    // scores agree with the exact scan for those ids
    val brute = Similarity.bruteForceTopK(vecs, "vec_id", "embedding", Seq(1.0, 0.0, 0.0), 30)
      .as[(Long, Double)].collect().toMap
    got.foreach { case (id, cos) => assert(math.abs(brute(id) - cos) < 1e-12) }
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
