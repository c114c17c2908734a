package graft.functions

import graft.SparkTestBase
import graft.functions.expressions.UnicodeNormExprs
import org.apache.spark.sql.functions._

class UnicodeNormExprsSpec extends SparkTestBase {
  import spark.implicits._

  private def nfcOf(s: String): String =
    Seq(s).toDF("t").select(UnicodeNormExprs.nfcNormalize(col("t")).as("r"))
      .as[String].head()

  private def stripOf(s: String): String =
    Seq(s).toDF("t").select(UnicodeNormExprs.stripAccentsCol(col("t")).as("r"))
      .as[String].head()

  test("nfc_normalize composes decomposed sequences; NFC text round-trips") {
    assert(nfcOf("e\u0301") === "\u00e9")
    assert(nfcOf("\u00e9") === "\u00e9")
    assert(nfcOf("plain ascii 123") === "plain ascii 123")
    // Hangul: canonical jamo sequence composes to the syllable
    assert(nfcOf("\u1100\u1161") === "\uac00")
  }

  test("strip_accents drops combining marks from composed and decomposed forms") {
    assert(stripOf("Héllô Çafé") === "Hello Cafe")
    assert(stripOf("e\u0301") === "e")
    assert(stripOf("Élévàtïon") === "Elevation")
  }

  test("strip_accents leaves mark-free lookalikes alone (utf8proc parity)") {
    // ß and the fi ligature decompose only under COMPATIBILITY (NFKD),
    // not canonical NFD — DuckDB's strip_accents keeps them, so we must
    assert(stripOf("ß") === "ß")
    assert(stripOf("ﬁnal") === "ﬁnal")
    assert(stripOf("ø") === "ø") // ø: no canonical decomposition
    assert(stripOf("β") === "β") // Greek beta untouched
  }

  test("ASCII fast path returns the input reference unchanged") {
    val in = org.apache.spark.unsafe.types.UTF8String.fromString("pure ascii")
    assert(graft.functions.expressions.UnicodeNormExprs.nfc(in) eq in)
    assert(graft.functions.expressions.UnicodeNormExprs.stripAccents(in) eq in)
  }

  test("null propagates; expressions fuse under strict codegen") {
    withStrictCodegen {
      val df = Seq(Some("é"), None).toDF("t")
        .select(
          UnicodeNormExprs.nfcNormalize(col("t")).as("n"),
          UnicodeNormExprs.stripAccentsCol(col("t")).as("s"))
      assert(df.collect().map(r => (r.isNullAt(0), r.isNullAt(1))).toSeq ===
        Seq((false, false), (true, true)))
    }
  }

  test("SQL surface: nfc_normalize / strip_accents registered") {
    graft.GraftFunctions.register(spark)
    val r = spark.sql(
      "SELECT strip_accents(nfc_normalize('é Ça')) AS x").as[String].head()
    assert(r === "e Ca")
  }

  test("length arithmetic matches code-point semantics (the q130 columns)") {
    val df = Seq("éx").toDF("t").select(
      length(UnicodeNormExprs.nfcNormalize(col("t"))).as("n"),
      length(UnicodeNormExprs.stripAccentsCol(col("t"))).as("s"))
    val row = df.head()
    assert(row.getInt(0) === 2) // éx
    assert(row.getInt(1) === 2) // ex
  }
}
