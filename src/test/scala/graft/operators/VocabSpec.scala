package graft.operators

import graft.SparkTestBase

/** [[Vocab]] — vocabulary construction + BPE pair counting against
  * hand-computed fixtures (the registry q89/q90 hash-check the same
  * operators against DuckDB at corpus scale).
  */
class VocabSpec extends SparkTestBase {
  import spark.implicits._

  test("vocabulary: rank by (count desc, token), coverage accumulates to the kept mass") {
    // token stream: a×5 (incl. the lowercased "A"), b×3, c×2, d×1 → total 11
    val docs = Seq(
      (1L, "a b a c"),
      (2L, "a b d"),
      (3L, "A b c a"))
      .toDF("doc_id", "text")
    val got = Vocab.vocabulary(docs, "text", topV = 3)
      .as[(String, Long, Long, Double)].collect().sortBy(_._3).toSeq
    assert(got == Seq(
      ("a", 5L, 1L, 5.0 / 11),
      ("b", 3L, 2L, 8.0 / 11),
      ("c", 2L, 3L, 10.0 / 11)), s"got $got")
  }

  test("vocabulary: topV past the vocab size returns the whole vocab, coverage ends at 1.0") {
    val docs = Seq((1L, "x y x")).toDF("doc_id", "text")
    val got = Vocab.vocabulary(docs, "text", topV = 100)
      .as[(String, Long, Long, Double)].collect().sortBy(_._3).toSeq
    assert(got.map(_._1) == Seq("x", "y"))
    assert(math.abs(got.last._4 - 1.0) < 1e-12, "full vocab must cover the whole stream")
  }

  test("bpePairCounts: frequency-weighted adjacent pairs; single-char words contribute none") {
    // "ab"×3 and "abc"×1 → ab: 3+1=4, bc: 1; "x" contributes nothing
    val docs = Seq(
      (1L, "ab ab x"),
      (2L, "ab abc")).toDF("doc_id", "text")
    val got = Vocab.bpePairCounts(docs, "text", topPairs = 10)
      .as[(String, Long)].collect().toSeq
    assert(got == Seq(("ab", 4L), ("bc", 1L)), s"got $got")
  }

  test("bpePairCounts: weights come from word frequency, not document frequency") {
    val docs = Seq((1L, "zz zz zz")).toDF("doc_id", "text")
    val got = Vocab.bpePairCounts(docs, "text", topPairs = 5)
      .as[(String, Long)].collect().toSeq
    assert(got == Seq(("zz", 3L)), s"got $got")
  }

  test("sourceDivergence: local-fold KL match; identical-distribution sources score exactly zero") {
    // A is skewed toward x; B is uniform; C and D share one distribution
    val docs = Seq(
      (1L, "A", "x x x x x x y"),
      (2L, "A", "x x x y"),
      (3L, "B", "x y z w"),
      (4L, "B", "w z y x"),
      (5L, "C", "p q"),
      (6L, "D", "q p"),
      (7L, null, "ignored entirely")
    ).toDF("doc_id", "source", "text")
    val got = Vocab.sourceDivergence(docs, "source", "text")
      .as[(String, Long, Long, Double)].collect().map(r => r._1 -> r).toMap

    // local reference with the operator's exact arithmetic
    val corpus = Map(
      "A" -> "x x x x x x y x x x y", "B" -> "x y z w w z y x",
      "C" -> "p q", "D" -> "q p")
      .view.mapValues(_.split("\\s+").toSeq).toMap
    val unis = corpus.view.mapValues(_.groupBy(identity).view.mapValues(_.size.toLong).toMap).toMap
    val nTok = corpus.values.map(_.size).sum.toLong
    val corpusCounts = corpus.values.flatten.groupBy(identity).view.mapValues(_.size.toLong).toMap
    def klNano(s: String): Long = {
      val nS = corpus(s).size.toLong
      unis(s).map { case (w, cSw) =>
        val pSw = cSw.toDouble / nS.toDouble
        val pW = corpusCounts(w).toDouble / nTok.toDouble
        math.round(pSw * math.log(pSw / pW) * 1000000000L)
      }.sum
    }
    assert(got.keySet == Set("A", "B", "C", "D")) // null source excluded
    got.foreach { case (s, (_, n, nano, kl)) =>
      assert(n == corpus(s).size.toLong)
      assert(nano == klNano(s), s"source $s KL mismatch")
      assert(kl == nano.toDouble / 1000000000.0)
    }
    // KL is against the MIXTURE, which A's mass dominates — so the
    // uniform minority source B diverges more than the skewed majority
    // A (the property that makes this the outlier-domain detector);
    // C and D carry one shared distribution and so score identically
    assert(got("B")._3 > got("A")._3)
    assert(got("C")._3 == got("D")._3)
  }
}
