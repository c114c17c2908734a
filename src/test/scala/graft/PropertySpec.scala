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

  test("secret_scrub: candidate grammar matches the regex; threshold extremes; entropy convention") {
    import graft.functions.expressions.{CharEntropyExpr, SecretScrubExpr}
    import org.apache.spark.unsafe.types.UTF8String
    def scrub(s: String, th: Long): (String, Long, Long, Long) = {
      val r = SecretScrubExpr.run(UTF8String.fromString(s), 20, th)
      (r.getUTF8String(0).toString, r.getLong(1), r.getLong(2), r.getLong(3))
    }
    val b64 = "ABCXYZabcnpz0159+/="
    val chunkGen = Gen.oneOf(
      Gen.chooseNum(1, 40).flatMap(n =>
        Gen.listOfN(n, Gen.oneOf(b64.toSeq)).map(_.mkString)),
      Gen.oneOf(" ", "  ", "!", ".", " the ", "-", "\n"))
    val textGen = Gen.listOf(chunkGen).map(_.mkString)
    val pat = java.util.regex.Pattern.compile("[A-Za-z0-9+/=]{20,}")
    check(Prop.forAll(textGen) { s =>
      // (1) an unreachable threshold redacts nothing: identity text
      val (idTxt, idHits, nCand, maxEnt) = scrub(s, Long.MaxValue)
      val identity = idTxt == s && idHits == 0L
      // (2) candidate count equals an independent regex scan
      val m = pat.matcher(s)
      var runs = List.empty[String]
      while (m.find()) runs = m.group() :: runs
      val grammar = nCand == runs.length.toLong
      // (3) threshold 0 redacts EVERY candidate
      val (zTxt, zHits, zCand, _) = scrub(s, 0L)
      val all = zHits == zCand && zCand == nCand &&
        !pat.matcher(zTxt).find() // no candidate-length run survives
      // (4) max entropy is the max of the q133 convention over the runs
      val entRef =
        if (runs.isEmpty) 0L
        else runs.map(r => CharEntropyExpr.run(UTF8String.fromString(r))).max
      identity && grammar && all && maxEnt == entRef
    })
  }

  test("c4_clean: cleaning is idempotent; kept lines satisfy an independent rule check") {
    import graft.functions.expressions.C4CleanExpr
    import org.apache.spark.unsafe.types.UTF8String
    def clean(s: String): (String, Long, Long) = {
      val r = C4CleanExpr.run(UTF8String.fromString(s), 5, 3)
      (r.getUTF8String(0).toString, r.getLong(1), r.getLong(2))
    }
    // "mid\rcr" pins the interior-CR convention: CR is NOT a word
    // separator (the `[ \t]+` split the oracle uses), only right-trim
    val wordGen = Gen.oneOf("alpha", "beta", "gamma", "JavaScript", "the", "x", "mid\rcr")
    val lineGen = for {
      n <- Gen.chooseNum(0, 8)
      ws <- Gen.listOfN(n, wordGen)
      tail <- Gen.oneOf(".", "!", "?", "\"", "", " ", "\t", "\r", "x")
    } yield ws.mkString(" ") + tail
    val pageGen = Gen.listOf(lineGen).map(_.mkString("\n"))
    check(Prop.forAll(pageGen) { page =>
      val (txt, nLines, nKept) = clean(page)
      // independent rule check over the raw split
      val ref = page.split("\n", -1).map(_.replaceAll("[ \t\r]+$", ""))
        .filter { l =>
          l.nonEmpty && ".!?\"".contains(l.last) &&
            l.split("[ \t]+").count(_.nonEmpty) >= 5 &&
            !l.toLowerCase.contains("javascript")
        }
      val rulesAgree = txt == ref.mkString("\n") && nKept == ref.length.toLong &&
        nLines == page.split("\n", -1).length.toLong
      // cleaning its own output changes nothing
      val (txt2, _, nKept2) = clean(txt)
      val idempotent = txt2 == txt && (nKept2 == nKept || txt.isEmpty)
      rulesAgree && idempotent
    })
  }

  test("bq hamming: metric laws, packing width, fused == packed-xor reference") {
    import graft.functions.expressions.BinaryQuantExprs
    val vGen = Gen.chooseNum(0, 200).flatMap(n =>
      Gen.listOfN(n, Gen.chooseNum(-100, 100).map(_ / 16.0f)).map(_.toArray))
    check(Prop.forAll(vGen, vGen, vGen) { (a, b, c) =>
      def ham(x: Array[Float], y: Array[Float]): Long =
        BinaryQuantExprs.hammingFusedLocal(x, y)
      val codesLen = BinaryQuantExprs.packLocal(a).length == (a.length + 63) / 64
      val reflexive = ham(a, a) == 0L
      val symmetric = ham(a, b) == ham(b, a)
      val triangle = ham(a, c) <= ham(a, b) + ham(b, c)
      // positional reference: sign mismatches with missing = 0 (the
      // oracle's formulation)
      val n = math.max(a.length, b.length)
      val refHam = (0 until n).count { i =>
        (i < a.length && a(i) > 0f) != (i < b.length && b(i) > 0f)
      }.toLong
      codesLen && reflexive && symmetric && triangle && ham(a, b) == refHam
    })
  }

  test("script_stats: class counts partition n_chars; main_script votes only letter classes") {
    import graft.functions.expressions.ScriptStatsExpr
    import org.apache.spark.unsafe.types.UTF8String
    val charGen = Gen.oneOf(
      ('a' to 'z') ++ ('A' to 'Z') ++ ('0' to '9') ++ " \t\n\r!?.{}" ++
        "Éßλωжщمبか中한×÷ €")
    val sGen = Gen.listOf(charGen).map(_.mkString)
    check(Prop.forAll(sGen) { s =>
      val r = ScriptStatsExpr.run(UTF8String.fromString(s))
      val counts = (1 to 10).map(r.getLong) // latin..other
      val partition = counts.sum == r.getLong(0) && r.getLong(0) == s.length.toLong
      val main = r.getUTF8String(11).toString
      val letters = Seq(counts(0), counts(2), counts(3), counts(4), counts(5),
        counts(6), counts(7)) // latin, greek, cyr, arabic, kana, cjk, hangul
      val noneOk = (main == "none") == letters.forall(_ == 0L)
      val mainMax = main == "none" || letters.max == (main match {
        case "latin" => counts(0)
        case "greek" => counts(2)
        case "cyrillic" => counts(3)
        case "arabic" => counts(4)
        case "kana" => counts(5)
        case "cjk" => counts(6)
        case "hangul" => counts(7)
      })
      partition && noneOk && mainMax
    })
  }
}
