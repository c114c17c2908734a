package graft.operators

import graft.SparkTestBase
import graft.functions.expressions.DHash64Expr
import org.apache.spark.sql.functions._

/** The dHash kernel's pinned arithmetic (independent in-test
  * re-derivation), its locality property (the reason a perceptual hash
  * exists), the banding recall guarantee (pigeonhole with
  * `maxDist + 1` bands: EVERY pair within `maxDist` bits is found, so
  * the operator equals the brute-force all-pairs verify exactly), and
  * the hot-bucket guard.
  */
class PerceptualHashSpec extends SparkTestBase {
  import spark.implicits._

  private def refHash(b: Array[Byte]): Long = {
    val n = b.length.toLong
    val px = Array.tabulate(72) { k =>
      val s = (k * n) / 72
      val e = ((k + 1) * n) / 72
      if (e <= s) 0L
      else (s until e).map(i => (b(i.toInt) & 0xff).toLong).sum / (e - s)
    }
    (0 until 8).flatMap(r => (0 until 8).map(c => (r, c))).foldLeft(0L) {
      case (h, (r, c)) =>
        if (px(r * 9 + c + 1) > px(r * 9 + c)) h | (1L << (r * 8 + c)) else h
    }
  }

  private def ham(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)

  test("kernel equals the independent re-derivation on crafted payloads") {
    val cases = Seq(
      Array.empty[Byte],
      "a".getBytes("UTF-8"),
      ("x" * 71).getBytes("UTF-8"),
      ("x" * 72).getBytes("UTF-8"),
      Array.tabulate(300)(i => ((i * 37 + 11) % 256).toByte),
      ("the quick brown fox " * 40).getBytes("UTF-8"))
    cases.foreach { b =>
      assert(DHash64Expr.dhash64(b) === refHash(b), s"len=${b.length}")
    }
    // empty payload: all pixels 0, all gradients false
    assert(DHash64Expr.dhash64(Array.empty[Byte]) === 0L)
  }

  test("locality: a one-byte edit moves few bits; unrelated payloads move many") {
    val base = Array.tabulate(600)(i => ((i * 131 + 7) % 256).toByte)
    val edited = base.clone(); edited(300) = (edited(300) ^ 0x55).toByte
    val d1 = ham(DHash64Expr.dhash64(base), DHash64Expr.dhash64(edited))
    assert(d1 <= 6, s"one-byte edit moved $d1 bits")
    val other = Array.tabulate(600)(i => ((i * i * 53 + 101) % 256).toByte)
    val d2 = ham(DHash64Expr.dhash64(base), DHash64Expr.dhash64(other))
    assert(d2 >= 12, s"unrelated payloads only $d2 bits apart — hash degenerate")
  }

  test("perceptualNearDup equals the brute all-pairs verify: maxDist+1 bands lose nothing") {
    // clusters of light edits + unrelated rows
    val rows = (0 until 40).map { i =>
      val grp = i / 4
      val b = Array.tabulate(500)(j => ((j * 97 + grp * 13 + 3) % 256).toByte)
      if (i % 4 != 0) b(450 + i % 4) = (b(450 + i % 4) ^ (1 << (i % 8))).toByte
      (i.toLong, b)
    }
    val df = rows.toDF("id", "content")
    val hashes = rows.map { case (id, b) => id -> DHash64Expr.dhash64(b) }.toMap
    // pigeonhole recall is complete at EVERY threshold, including the
    // pre-round-18 silent-loss regime maxDist in [4, 64]
    Seq(3, 8, 24).foreach { maxDist =>
      val got = Multimodal.perceptualNearDup(df, "id", "content", maxDist)
        .as[(Long, Long, Long)].collect().toSet
      val want = (for {
        (a, ha) <- hashes; (b, hb) <- hashes if a < b
        d = ham(ha, hb) if d <= maxDist
      } yield (a, b, d.toLong)).toSet
      assert(want.nonEmpty, s"fixture has no pairs within $maxDist — weak test")
      assert(got === want,
        s"maxDist=$maxDist: banding diverged from the exact all-pairs verify")
    }
  }

  test("maxBandFreq: hot buckets drop; survivors subset of the exact run") {
    // 20 byte-identical payloads (one hot bucket per band) + 2 light edits
    val boiler = Array.tabulate(400)(j => ((j * 31 + 5) % 256).toByte)
    def twin(): Array[Byte] = {
      // a RUN edit so at least one 16-bit band provably diverges from
      // the boilerplate bucket (a 1-byte flip can be absorbed by the
      // window-mean floor)
      val b = boiler.clone()
      (100 until 130).foreach(j => b(j) = 0xff.toByte)
      b
    }
    val rows = (0 until 20).map(i => (i.toLong, boiler.clone())) ++ Seq(
      (100L, twin()), (101L, twin()))
    val df = rows.toDF("id", "content")
    val exact = Multimodal.perceptualNearDup(df, "id", "content", 4)
      .as[(Long, Long, Long)].collect().toSet
    val guarded = Multimodal.perceptualNearDup(df, "id", "content", 4, maxBandFreq = Some(10))
      .as[(Long, Long, Long)].collect().toSet
    assert(guarded.subsetOf(exact))
    // the 20-identical boilerplate cluster is suppressed...
    assert(!guarded.exists(p => p._1 < 20 && p._2 < 20),
      s"hot-bucket pairs survived the cap: $guarded")
    // ...while the small twin pair (its own buckets, freq 2) survives
    assert(guarded.contains((100L, 101L, 0L)), s"cold pair lost: $guarded")
  }

  test("maxDist=64 is rejected: 64 one-bit bands cannot cover a bit-complement pair") {
    // the completeness contract needs maxDist+1 bands and the 64-bit
    // hash caps at 64 — a pair differing in ALL 64 bits would share no
    // band, so the operator refuses rather than silently under-recall
    val df = Seq((1L, "x".getBytes("UTF-8"))).toDF("id", "content")
    val e = intercept[IllegalArgumentException] {
      Multimodal.perceptualNearDup(df, "id", "content", 64)
    }
    assert(e.getMessage.contains("[0, 63]"))
    // 63 (the new boundary) still constructs
    Multimodal.perceptualNearDup(df, "id", "content", 63).collect()
  }

  test("null content carries no hash and never pairs") {
    val df = Seq(
      (1L, "payload-payload-payload".getBytes("UTF-8")),
      (2L, "payload-payload-payload".getBytes("UTF-8")),
      (3L, null.asInstanceOf[Array[Byte]])).toDF("id", "content")
    val got = Multimodal.perceptualNearDup(df, "id", "content", 0)
      .as[(Long, Long, Long)].collect().toSet
    assert(got === Set((1L, 2L, 0L)))
  }
}
