package graft

import graft.functions.TextFunctions
import graft.model.IrcParser
import org.scalacheck.{Gen, Prop}
import org.scalatest.funsuite.AnyFunSuite

/** Property-based coverage (SURVEY.md §5.4): parser totality, hash-range
  * and tokenizer invariants, intersection-count correctness, running-count
  * merge monoid laws. Pure-function properties run at full ScalaCheck
  * volume; Spark round-trips are covered by the unit suites.
  */
class PropertySpec extends AnyFunSuite {

  private def check(p: Prop): Unit = {
    val res = org.scalacheck.Test.check(
      org.scalacheck.Test.Parameters.default.withMinSuccessfulTests(200), p)
    assert(res.passed, res.status.toString)
  }

  test("IrcParser.parseLine is total and structurally stable on arbitrary lines") {
    check(Prop.forAll { (s: String) =>
      IrcParser.parseLine(s) match {
        case None => !s.split(":", 3).drop(2).nonEmpty
        case Some(p) =>
          // text is the lower-cased third segment; channel, if present,
          // always starts with '#'; user never contains '!'
          p.text == p.text.toLowerCase &&
          (p.channel.isEmpty || p.channel.startsWith("#")) &&
          !p.user.contains('!')
      }
    })
  }

  test("tokensLocal: no empties, lowercase, count bounded by input length") {
    check(Prop.forAll { (s: String) =>
      val t = TextFunctions.tokensLocal(s)
      t.forall(w => w.nonEmpty && w == w.toLowerCase(java.util.Locale.ROOT)) &&
      t.length <= s.length
    })
  }

  test("shinglesLocal: exactly max(1, n_tokens - n + 1) shingles") {
    val toksGen = Gen.listOf(Gen.alphaStr.suchThat(_.nonEmpty)).map(_.toArray)
    check(Prop.forAll(toksGen, Gen.choose(1, 5)) { (toks, n) =>
      val sh = TextFunctions.shinglesLocal(toks, n)
      sh.length == math.max(1, toks.length - n + 1)
    })
  }

  test("md5Hash60Local lands in [0, 2^60)") {
    check(Prop.forAll { (s: String) =>
      val h = TextFunctions.md5Hash60Local(s)
      h >= 0L && h < (1L << 60)
    })
  }

  test("sortedIntersectCount equals set-intersection size") {
    val arrGen = Gen.listOf(Gen.choose(0L, 50L)).map(_.distinct.sorted.toArray)
    check(Prop.forAll(arrGen, arrGen) { (a, b) =>
      TextFunctions.sortedIntersectCount(a, b) == a.toSet.intersect(b.toSet).size
    })
  }

  test("minHashCoeffs: a in [1, p), b in [0, p), deterministic per seed") {
    val p = TextFunctions.MinHashPrime
    val cs = TextFunctions.minHashCoeffs(64)
    assert(cs.forall { case (a, b) => a >= 1 && a < p && b >= 0 && b < p })
    assert(cs == TextFunctions.minHashCoeffs(64))
  }

  test("running-count merge is a commutative monoid on count maps") {
    // the value-level law behind KVTable.merge (J1) — merging per-key
    // count tables is fold-order-independent
    val tableGen = Gen.mapOf(Gen.zip(Gen.choose(0, 20), Gen.choose(0L, 100L)))
    def merge(x: Map[Int, Long], y: Map[Int, Long]): Map[Int, Long] =
      (x.keySet ++ y.keySet).map(k => k -> (x.getOrElse(k, 0L) + y.getOrElse(k, 0L))).toMap
    check(Prop.forAll(tableGen, tableGen, tableGen) { (a, b, c) =>
      merge(a, b) == merge(b, a) &&
      merge(merge(a, b), c) == merge(a, merge(b, c)) &&
      merge(a, Map.empty) == a
    })
  }

  test("repetitionStatsLocal matches a naive groupBy recompute on arbitrary token soup") {
    val word = Gen.oneOf("a", "b", "ab", "ba", "x", "yz")
    val textGen = Gen.listOf(word).map(_.mkString(" "))
    check(Prop.forAll(textGen) { s =>
      val (topB, topN, nBigrams, topFrac, dupFrac) = TextFunctions.repetitionStatsLocal(s)
      val toks = TextFunctions.tokensLocal(s).toSeq
      val bigrams = toks.sliding(2).filter(_.size == 2).map(_.mkString(" ")).toSeq
      val counts = bigrams.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val naiveTop = counts.toSeq.sortBy { case (b, n) => (-n, b) }.headOption
      nBigrams == bigrams.size.toLong &&
      naiveTop.forall { case (b, n) => topB == b && topN == n } &&
      (naiveTop.nonEmpty || (topB == null && topN == 0L)) &&
      topFrac == (if (bigrams.isEmpty) 0.0 else topN.toDouble / bigrams.size) &&
      dupFrac == (if (toks.isEmpty) 0.0
                  else (toks.size - toks.distinct.size).toDouble / toks.size)
    })
  }

  test("stratified-sample keep decision is monotone in the rate (nesting) and rate-faithful in expectation") {
    val keyGen = Gen.choose(0L, 1000000L)
    val rateGen = Gen.choose(0, 1000)
    check(Prop.forAll(keyGen, rateGen, rateGen) { (key, r1, r2) =>
      val lo = math.min(r1, r2)
      val hi = math.max(r1, r2)
      val bucket = TextFunctions.md5Hash60Local(key.toString) % 1000
      // kept at the low rate ⇒ kept at every higher rate (nesting)
      !(bucket < lo) || (bucket < hi)
    })
  }
}
