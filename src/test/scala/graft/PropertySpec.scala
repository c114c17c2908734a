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

  test("heavy-hitters buffer: exact when cardinality fits; Space-Saving bounds when it doesn't") {
    val streamGen = Gen.listOf(Gen.choose(0, 30).map(i => s"i$i"))
    val capGen = Gen.choose(1, 40)
    check(Prop.forAll(streamGen, capGen) { (stream, cap) =>
      val buf = new graft.functions.expressions.HeavyHittersBuffer(cap)
      stream.foreach(buf.update)
      val truth = stream.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val summary = buf.topK(cap).map(t => t._1 -> ((t._2, t._3))).toMap
      val exactRegime = truth.size <= cap
      val estsBound = summary.forall { case (item, (est, err)) =>
        val t = truth.getOrElse(item, 0L)
        est >= t && est - err <= t // never undercounts; over by at most err
      }
      val exactness = !exactRegime || summary.forall { case (item, (est, err)) =>
        err == 0L && est == truth(item)
      }
      // pigeonhole: any item with true count > n/cap must be present
      val guarantee = truth.forall { case (item, t) =>
        t <= stream.size / cap || summary.contains(item)
      }
      estsBound && exactness && guarantee && summary.size <= cap
    })
  }

  test("heavy-hitters merge keeps the over-count bound (est <= true + err) across splits") {
    // no-undercount does NOT survive partial-side eviction (a partial may
    // have dropped an item the other side kept); what merging preserves
    // is est_i <= t_i + err_i summed over sides — so est <= true + err —
    // plus exactness whenever total cardinality fits capacity
    val streamGen = Gen.listOf(Gen.choose(0, 20).map(i => s"i$i"))
    val capGen = Gen.choose(2, 24)
    check(Prop.forAll(streamGen, Gen.choose(0, 100), capGen) { (stream, cutPct, cap) =>
      val cut = stream.size * cutPct / 100
      val (s1, s2) = stream.splitAt(cut)
      val a = new graft.functions.expressions.HeavyHittersBuffer(cap)
      val b = new graft.functions.expressions.HeavyHittersBuffer(cap)
      s1.foreach(a.update)
      s2.foreach(b.update)
      a.merge(b)
      val truth = stream.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val summary = a.topK(cap)
      val overBound = summary.forall { case (item, est, err) =>
        est <= truth.getOrElse(item, 0L) + err
      }
      val exactWhenFits = truth.size > cap || summary.forall { case (item, est, err) =>
        err == 0L && est == truth(item)
      }
      overBound && exactWhenFits && summary.length <= cap
    })
  }

  test("chunking arithmetic: full coverage, bounded size, fixed overlap") {
    val nGen = Gen.choose(0L, 5000L)
    val cfgGen = for {
      chunk <- Gen.choose(1, 200)
      stride <- Gen.choose(1, chunk)
    } yield (chunk, stride)
    check(Prop.forAll(nGen, cfgGen) { case (n, (chunk, stride)) =>
      // replicate Chunker.chunkOverlap's start arithmetic
      val starts = 0L.to(math.max(n - 1, 0L), stride.toLong)
      val sizes = starts.map(s => math.min(chunk.toLong, n - s))
      val covered = starts.zip(sizes).flatMap { case (s, len) => s until (s + len) }.toSet
      starts.nonEmpty &&
      sizes.forall(_ <= chunk.toLong) &&
      (n == 0L || covered == (0L until n).toSet) &&
      starts.zip(starts.drop(1)).forall { case (a, b) => b - a == stride.toLong }
    })
  }

  test("vector_micro_sum rounding equals the BigDecimal HALF_UP law on arbitrary magnitudes") {
    val buf = new graft.functions.expressions.VectorSumBuffer
    val vGen = Gen.chooseNum(-10.0, 10.0).flatMap(base =>
      Gen.oneOf(base, base / 1e6, base * 1e3, base + 0.5e-6, base - 0.5e-6))
    check(Prop.forAll(vGen) { v =>
      val s = v * 1e6
      val want = new java.math.BigDecimal(s)
        .setScale(0, java.math.RoundingMode.HALF_UP).longValueExact()
      buf.micro(v) == want
    })
  }

  test("vector_micro_sum buffers form a commutative monoid under merge (any split, any order)") {
    val vecGen = Gen.listOfN(4, Gen.chooseNum(-5.0f, 5.0f)).map(_.toArray)
    val corpusGen = Gen.listOf(vecGen).map(_.take(24))
    def arrData(a: Array[Float]) =
      org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(a)
    def fold(vs: Seq[Array[Float]]): (Long, Seq[Long]) = {
      val b = new graft.functions.expressions.VectorSumBuffer
      vs.foreach(v => b.update(arrData(v)))
      (b.n, Option(b.sums).map(_.toSeq).getOrElse(Seq.empty))
    }
    check(Prop.forAll(corpusGen, Gen.choose(0, 24)) { (vs, cut) =>
      val k = math.min(cut, vs.length)
      val (l, r) = vs.splitAt(k)
      val seq = fold(vs)
      // merge(left, right) and merge(right, left) both equal the
      // sequential fold — integer element sums are order-free
      val b1 = new graft.functions.expressions.VectorSumBuffer
      l.foreach(v => b1.update(arrData(v)))
      val b2 = new graft.functions.expressions.VectorSumBuffer
      r.foreach(v => b2.update(arrData(v)))
      b1.merge(b2)
      val m12 = (b1.n, Option(b1.sums).map(_.toSeq).getOrElse(Seq.empty))
      val b3 = new graft.functions.expressions.VectorSumBuffer
      r.foreach(v => b3.update(arrData(v)))
      val b4 = new graft.functions.expressions.VectorSumBuffer
      l.foreach(v => b4.update(arrData(v)))
      b3.merge(b4)
      val m21 = (b3.n, Option(b3.sums).map(_.toSeq).getOrElse(Seq.empty))
      m12 == seq && m21 == seq
    })
  }

  test("Luhn kernel: the mod-10 detection guarantees hold on arbitrary PANs") {
    import graft.functions.expressions.LuhnScrubExpr
    import org.apache.spark.unsafe.types.UTF8String
    def scrubOne(s: String): (String, Long, Long) = {
      val r = LuhnScrubExpr.run(UTF8String.fromString(s))
      (r.getUTF8String(0).toString, r.getLong(1), r.getLong(2))
    }
    val digitsGen = for {
      n <- Gen.chooseNum(12, 18) // body length; +check digit = 13..19
      ds <- Gen.listOfN(n, Gen.chooseNum(0, 9))
    } yield ds
    check(Prop.forAll(digitsGen) { body =>
      // construct the valid check digit, the way issuers do
      val sumBody = body.reverse.zipWithIndex.map { case (d, i) =>
        if (i % 2 == 0) { val x = d * 2; if (x > 9) x - 9 else x } else d
      }.sum
      val chk = (10 - sumBody % 10) % 10
      val pan = (body :+ chk).mkString
      val (red, cards, rej) = scrubOne(s"pay $pan now")
      val validRedacts = red == "pay [CARD] now" && cards == 1L && rej == 0L

      // any SINGLE-digit corruption must be detected (the property the
      // checksum exists for) — corrupted PAN-length runs count rejected
      val pos = (body.size * 7 + chk) % pan.length
      val orig = pan.charAt(pos) - '0'
      val corrupted = pan.updated(pos, (((orig + 1 + pos) % 10).max(0) + '0').toChar)
      val detected =
        if (corrupted == pan) true
        else {
          val (r2, c2, j2) = scrubOne(s"pay $corrupted now")
          r2 == s"pay $corrupted now" && c2 == 0L && j2 == 1L
        }
      validRedacts && detected
    })
  }

  test("mod-97 kernel: the ISO 7064 detection guarantees hold on arbitrary IBANs") {
    import graft.functions.expressions.Mod97ScrubExpr
    import org.apache.spark.unsafe.types.UTF8String
    def scrubOne(s: String): (String, Long, Long) = {
      val r = Mod97ScrubExpr.run(UTF8String.fromString(s))
      (r.getUTF8String(0).toString, r.getLong(1), r.getLong(2))
    }
    // independent fold (same public-standard arithmetic, separate code)
    def mod97(s: String): Int = {
      var r = 0L
      (s.substring(4) + s.substring(0, 4)).foreach { c =>
        r = if (c.isLetter) (r * 100 + (c - 'A' + 10)) % 97
            else (r * 10 + (c - '0')) % 97
      }
      r.toInt
    }
    val ibanGen = for {
      cc <- Gen.listOfN(2, Gen.choose('A', 'Z'))
      n <- Gen.chooseNum(11, 30)
      body <- Gen.listOfN(n, Gen.oneOf(Gen.choose('A', 'Z'), Gen.choose('0', '9')))
    } yield (cc.mkString, body.mkString)
    check(Prop.forAll(ibanGen) { case (cc, body) =>
      // construct the valid check digits the ISO 13616 way: place 00,
      // compute the remainder, check = 98 - r
      val chk = 98 - mod97(cc + "00" + body)
      val iban = cc + f"$chk%02d" + body
      val (red, ibans, rej) = scrubOne(s"to $iban end")
      val validRedacts = red == "to [IBAN] end" && ibans == 1L && rej == 0L

      // any SINGLE-char substitution must be detected (97 is prime and
      // every weight is invertible) — corrupted shaped runs count rejected
      val pos = 4 + (body.length * 13 + chk) % body.length // body only: shape preserved
      val orig = iban.charAt(pos)
      val subst =
        if (orig.isDigit) (((orig - '0') + 1) % 10 + '0').toChar
        else (((orig - 'A') + 1) % 26 + 'A').toChar
      val corrupted = iban.updated(pos, subst)
      val (r2, i2, j2) = scrubOne(s"to $corrupted end")
      val detected = r2 == s"to $corrupted end" && i2 == 0L && j2 == 1L
      validRedacts && detected
    })
  }

  test("cut_segments_by_fp equals the filter-rebuild reference on arbitrary segment mixes") {
    import graft.functions.expressions.CutSegmentsByFpExpr
    import org.apache.spark.sql.catalyst.util.ArrayData
    import org.apache.spark.unsafe.types.UTF8String
    val segGen = Gen.oneOf(
      Gen.oneOf("nav", "foot", "banner", "", "x", "body"),
      Gen.alphaNumStr.map(_.take(8)))
    val docGen = for {
      n <- Gen.chooseNum(0, 12)
      segs <- Gen.listOfN(n, segGen)
      hot <- Gen.someOf(segs.distinct)
    } yield (segs, hot.toSet)
    check(Prop.forAll(docGen) { case (segs, hot) =>
      val text = segs.mkString(" ")
      val fps = hot.map(TextFunctions.md5Hash60Local).toArray.sorted
      val r = CutSegmentsByFpExpr.run(
        UTF8String.fromString(text),
        ArrayData.toArrayData(fps), " ")
      // reference: split (trailing empties kept), filter, rejoin
      val ref = text.split(java.util.regex.Pattern.quote(" "), -1)
      val kept = ref.filterNot(hot)
      r.getUTF8String(0).toString == kept.mkString(" ") &&
        r.getLong(1) == kept.length.toLong &&
        r.getLong(2) == (ref.length - kept.length).toLong
    })
  }
}
