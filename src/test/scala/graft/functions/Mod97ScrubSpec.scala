package graft.functions

import graft.SparkTestBase
import graft.functions.expressions.Mod97ScrubExpr
import org.apache.spark.sql.functions._

/** Contract of `mod97_scrub`: checksum-gated IBAN redaction (valid
  * IBANs in raw and print-grouped forms redact; IBAN-shaped checksum
  * failures are counted but left; non-IBAN-shaped runs untouched), the
  * candidate grammar's edges (uppercase words, digit runs, the
  * documented single-space merge limit, lowercase out of scope), and
  * null handling.
  */
class Mod97ScrubSpec extends SparkTestBase {
  import spark.implicits._

  private def scrub(texts: String*): Seq[(String, Long, Long)] =
    withStrictCodegen {
      texts.toDF("t")
        .select(Mod97ScrubExpr.mod97Scrub(col("t")).as("s"))
        .select(col("s.redacted"), col("s.n_ibans"), col("s.n_rejected"))
        .as[(String, Long, Long)].collect().toSeq
    }

  test("valid IBANs redact in raw and print-grouped forms; 18-27 char lengths") {
    val got = scrub(
      "send to GB82WEST12345698765432 today",
      "send to GB82 WEST 1234 5698 7654 32 today",
      "konto DE89 3704 0044 0532 0130 00 bitte",
      "fr FR1420041010050500013M02606 ok",   // 27 chars, letter in body
      "nl NL91ABNA0417164300 ok")            // 18 chars
    assert(got === Seq(
      ("send to [IBAN] today", 1L, 0L),
      ("send to [IBAN] today", 1L, 0L),
      ("konto [IBAN] bitte", 1L, 0L),
      ("fr [IBAN] ok", 1L, 0L),
      ("nl [IBAN] ok", 1L, 0L)))
  }

  test("false positives rejected: IBAN-shaped checksum failures counted, never redacted") {
    val got = scrub(
      "ref GB82WEST12345698765433 stays",    // last digit bumped
      "ref NL91 ABNA 0417 1643 01 stays")    // grouped invalid
    assert(got === Seq(
      ("ref GB82WEST12345698765433 stays", 0L, 1L),
      ("ref NL91 ABNA 0417 1643 01 stays", 0L, 1L)))
  }

  test("non-IBAN-shaped runs pass untouched and are not 'rejected'") {
    val got = scrub(
      "order 98765432109876543210 shipped",   // digit-only: Luhn's department
      "plan PROJECTX2024PLANB9X go",          // letters in check-digit slots
      "code AB12SHORT end",                   // shape prefix but < 15 chars
      "yell HELLO WORLD THIS IS ALL CAPS NOW") // merged caps words, no digits at 3-4
    assert(got === Seq(
      ("order 98765432109876543210 shipped", 0L, 0L),
      ("plan PROJECTX2024PLANB9X go", 0L, 0L),
      ("code AB12SHORT end", 0L, 0L),
      ("yell HELLO WORLD THIS IS ALL CAPS NOW", 0L, 0L)))
  }

  test("grammar edges: double space splits; lowercase stops the run; punctuation separates") {
    // double space splits the grouped IBAN mid-way: the 16-char prefix
    // half is still IBAN-shaped but checksum-fails (counted rejected,
    // left in place); the digit tail has no shape
    val broken = "GB82 WEST 1234 5698  7654 32"
    assert(scrub(broken) === Seq((broken, 0L, 1L)))
    // lowercase char ends the candidate BEFORE it — the uppercase
    // prefix is still a complete valid candidate and redacts (the
    // maximal-run contract, identical to the oracle regex's behavior)
    assert(scrub("GB82WEST12345698765432x") === Seq(("[IBAN]x", 1L, 0L)))
    // punctuation separates: two IBANs both redact
    assert(scrub("a GB82WEST12345698765432, b NL91ABNA0417164300.") ===
      Seq(("a [IBAN], b [IBAN].", 2L, 0L)))
  }

  test("documented limit: an IBAN merged with a following caps token by ONE space escapes") {
    // the merged 24-char run is still IBAN-shaped, so it lands in the
    // rejected count rather than redacting — the IBAN itself escapes
    val merged = "NL91ABNA0417164300 URGENT"
    assert(scrub(merged) === Seq((merged, 0L, 1L)))
  }

  test("kernel mod-97 equals an independent BigInteger re-derivation on the rotation") {
    val valid = Seq(
      "GB82WEST12345698765432", "DE89370400440532013000",
      "FR1420041010050500013M02606", "ES9121000418450200051332",
      "NL91ABNA0417164300", "IT60X0542811101000000123456")
    val invalid = Seq(
      "GB82WEST12345698765433", "DE89370400440532013001", "NL91ABNA0417164301")
    def bigIntMod97(s: String): Int = {
      val rearranged = s.substring(4) + s.substring(0, 4)
      val expanded = rearranged.flatMap { c =>
        if (c.isLetter) (c - 'A' + 10).toString else c.toString
      }
      new java.math.BigInteger(expanded).mod(java.math.BigInteger.valueOf(97L)).intValue
    }
    (valid ++ invalid).foreach { iban =>
      val want = bigIntMod97(iban) == 1
      val got = scrub(s"x $iban y").head._2 == 1L
      assert(got === want, s"kernel diverged from BigInteger mod 97 on $iban")
    }
    assert(valid.forall(v => bigIntMod97(v) == 1), "rotation sanity")
    assert(invalid.forall(v => bigIntMod97(v) != 1), "decoy sanity")
  }

  test("null text yields a null struct; empty text is empty") {
    val got = withStrictCodegen {
      Seq[(java.lang.Long, String)]((1L, null), (2L, ""))
        .toDF("id", "t")
        .select(col("id"), Mod97ScrubExpr.mod97Scrub(col("t")).as("s"))
        .select(col("id"), col("s.redacted"), col("s.n_ibans"))
        .collect().map(r => (r.getLong(0), r.isNullAt(1), if (r.isNullAt(2)) -1L else r.getLong(2)))
        .toSeq
    }
    assert(got === Seq((1L, true, -1L), (2L, false, 0L)))
  }
}
