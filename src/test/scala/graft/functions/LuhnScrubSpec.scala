package graft.functions

import graft.SparkTestBase
import graft.functions.expressions.LuhnScrubExpr
import org.apache.spark.sql.functions._

/** Contract of `luhn_scrub`: checksum-gated redaction (valid PANs in
  * raw/spaced/dashed forms redact; PAN-length checksum failures are
  * counted but left; non-PAN-length runs untouched), the candidate
  * grammar's edges (single digits, separators, the documented
  * single-space merge limit), and null handling.
  */
class LuhnScrubSpec extends SparkTestBase {
  import spark.implicits._

  private def scrub(texts: String*): Seq[(String, Long, Long)] =
    withStrictCodegen {
      texts.toDF("t")
        .select(LuhnScrubExpr.luhnScrub(col("t")).as("s"))
        .select(col("s.redacted"), col("s.n_cards"), col("s.n_rejected"))
        .as[(String, Long, Long)].collect().toSeq
    }

  test("valid PANs redact in raw, spaced, and dashed forms; 14/15/16-digit lengths") {
    val got = scrub(
      "pay 4111111111111111 now",
      "pay 4111 1111 1111 1111 now",
      "pay 4111-1111-1111-1111 now",
      "amex 340000000000009 ok",      // 15 digits
      "diners 30569309025904 ok")     // 14 digits
    assert(got === Seq(
      ("pay [CARD] now", 1L, 0L),
      ("pay [CARD] now", 1L, 0L),
      ("pay [CARD] now", 1L, 0L),
      ("amex [CARD] ok", 1L, 0L),
      ("diners [CARD] ok", 1L, 0L)))
  }

  test("false positives rejected: PAN-length checksum failures counted, never redacted") {
    val got = scrub(
      "ref 4111111111111112 stays",   // off-by-one check digit
      "ref 9999 9999 9999 9999 stays")
    assert(got === Seq(
      ("ref 4111111111111112 stays", 0L, 1L),
      ("ref 9999 9999 9999 9999 stays", 0L, 1L)))
  }

  test("non-PAN-length digit runs pass untouched and are not 'rejected'") {
    val got = scrub(
      "call 415-555-0123",                  // 10 digits: a phone, q64's department
      "order 98765432109876543210 shipped", // 20 digits: an id
      "room 7, floor 12")                   // short runs and a single digit
    assert(got === Seq(
      ("call 415-555-0123", 0L, 0L),
      ("order 98765432109876543210 shipped", 0L, 0L),
      ("room 7, floor 12", 0L, 0L)))
  }

  test("grammar edges: double space splits candidates; trailing separator excluded") {
    // double space splits: two 8-digit runs, neither PAN-length
    assert(scrub("41111111  11111111") === Seq(("41111111  11111111", 0L, 0L)))
    // a valid PAN followed by '- ' keeps the dash outside the candidate
    assert(scrub("4111111111111111- end") === Seq(("[CARD]- end", 1L, 0L)))
    // multiple cards in one text, separated by punctuation
    assert(scrub("a 4111111111111111, b 5500005555555559.") ===
      Seq(("a [CARD], b [CARD].", 2L, 0L)))
  }

  test("documented limit: two PANs merged by a SINGLE space escape as one >19-digit run") {
    val two = "4111111111111111 5500005555555559"
    assert(scrub(two) === Seq((two, 0L, 0L)))
  }

  test("null text yields a null struct; empty text is empty") {
    val got = withStrictCodegen {
      Seq[(java.lang.Long, String)]((1L, null), (2L, ""))
        .toDF("id", "t")
        .select(col("id"), LuhnScrubExpr.luhnScrub(col("t")).as("s"))
        .select(col("id"), col("s.redacted"), col("s.n_cards"))
        .collect().map(r => (r.getLong(0), r.isNullAt(1), if (r.isNullAt(2)) -1L else r.getLong(2)))
        .toSeq
    }
    assert(got === Seq((1L, true, -1L), (2L, false, 0L)))
  }
}
