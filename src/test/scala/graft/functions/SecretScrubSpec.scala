package graft.functions

import graft.SparkTestBase
import graft.functions.expressions.{CharEntropyExpr, SecretScrubExpr}
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

/** Contract of `secret_scrub`: entropy-gated redaction (high-entropy
  * base64-class runs redact; candidate-length low-entropy runs are
  * counted but left; sub-minLen runs are invisible), the candidate
  * grammar's maximal-run semantics, the exact [[CharEntropyExpr]]
  * fixed-point parity, threshold/minLen parameterization, and null
  * handling.
  */
class SecretScrubSpec extends SparkTestBase {
  import spark.implicits._

  private val hot = "sk9Sx2Qw7Lm4Yd0Vt6Hb1Jn8Rc3Zf5Ka+pE/uGi" // 3,663,543 µnats
  private val pad = "AAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAA" // 0 µnats
  private val pattern = "abcabcabcabcabcabcabcabcabcabc" // 1,098,612 µnats
  private val word = "Pneumonoultramicroscopicsilicovolcanoconiosis" // 2,446,493

  private def scrub(
      texts: Seq[String],
      minLen: Int = 20,
      threshold: Long = 3000000L): Seq[(String, Long, Long, Long)] =
    withStrictCodegen {
      texts.toDF("t")
        .select(SecretScrubExpr.secretScrub(col("t"), minLen, threshold).as("s"))
        .select(col("s.redacted"), col("s.n_secrets"), col("s.n_candidates"),
          col("s.max_ent_micro"))
        .as[(String, Long, Long, Long)].collect().toSeq
    }

  test("entropy rule is CharEntropyExpr's, verbatim (per-term micro rounding, exact sum)") {
    for (s <- Seq(hot, pad, pattern, word, "aAbB019+/=xyz", "z")) {
      assert(
        SecretScrubExpr.entMicro(s, 0, s.length) ===
          CharEntropyExpr.run(UTF8String.fromString(s)),
        s"entropy convention diverged on '$s'")
    }
    // substring form windows correctly (prefix 'xx' excluded)
    assert(SecretScrubExpr.entMicro("xx" + pad, 2, 2 + pad.length) === 0L)
  }

  test("high-entropy candidates redact; low-entropy candidates counted but left in place") {
    val got = scrub(Seq(
      s"key $hot end",
      s"pad $pad end",
      s"rep $pattern end",
      s"word $word end"))
    assert(got === Seq(
      ("key [SECRET] end", 1L, 1L, 3663543L),
      (s"pad $pad end", 0L, 1L, 0L),
      (s"rep $pattern end", 0L, 1L, 1098612L),
      (s"word $word end", 0L, 1L, 2446493L)))
  }

  test("sub-minLen runs are not candidates — even at maximal entropy") {
    val short = "xK9/q2Zp+Aw" // 11 chars, high entropy for its length
    val got = scrub(Seq(s"tmp $short end"))
    assert(got === Seq((s"tmp $short end", 0L, 0L, 0L)))
    // a 20-char all-distinct run maxes at ln 20 = 2.9957 nats — under
    // the default threshold BY DESIGN (the scaladoc's floor argument)
    val max20 = "abcdefghij0123456789"
    assert(SecretScrubExpr.entMicro(max20, 0, 20) === 2995740L)
    assert(scrub(Seq(s"x $max20 y")) === Seq((s"x $max20 y", 0L, 1L, 2995740L)))
  }

  test("maximal-run grammar: separators split; '+', '/', '=' belong to runs; multiple candidates") {
    val got = scrub(Seq(
      s"$hot!$pad", // '!' splits into two candidates
      s"a=$hot", // '=' merges into the run (len 41, still high entropy)
      s"$hot $hot")) // two hits
    assert(got(0)._2 === 1L && got(0)._3 === 2L)
    assert(got(0)._1 === s"[SECRET]!$pad")
    assert(got(1)._2 === 1L && got(1)._3 === 1L)
    assert(got(1)._1 === "[SECRET]") // 'a=' prefixes the same maximal run
    assert(got(2) === (("[SECRET] [SECRET]", 2L, 2L, 3663543L)))
  }

  test("minLen and threshold parameterize: lower both and the decoys fire") {
    // threshold below the pattern's 1,098,612 → pattern redacts too
    val got = scrub(Seq(s"rep $pattern end"), minLen = 20, threshold = 1000000L)
    assert(got === Seq(("rep [SECRET] end", 1L, 1L, 1098612L)))
    // minLen 5: the short fragment becomes a candidate ('tmp'/'end' at
    // 3 chars still are not)
    val short = "xK9/q2Zp+Aw"
    val got2 = scrub(Seq(s"tmp $short end"), minLen = 5, threshold = 2000000L)
    assert(got2 === Seq(("tmp [SECRET] end", 1L, 1L, 2397890L)))
  }

  test("null text yields a null struct; empty and candidate-free text pass through") {
    val got = withStrictCodegen {
      Seq(Some("plain words only"), Some(""), None).toDF("t")
        .select(SecretScrubExpr.secretScrub(col("t")).as("s"))
        .select(col("s").isNull, col("s.redacted"), col("s.n_candidates"))
        .as[(Boolean, Option[String], Option[Long])].collect().toSeq
    }
    assert(got(0) === ((false, Some("plain words only"), Some(0L))))
    assert(got(1) === ((false, Some(""), Some(0L))))
    assert(got(2)._1 === true)
  }
}
