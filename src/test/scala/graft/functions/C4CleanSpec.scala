package graft.functions

import graft.SparkTestBase
import graft.functions.expressions.C4CleanExpr
import graft.operators.QualityPrune
import org.apache.spark.sql.functions._

/** Contract of `c4_clean` (Raffel et al. 2020 §2.2): the three line
  * rules (terminal punctuation, ≥ minWords words, no "javascript"),
  * the page vetoes (`{`, "lorem ipsum"), CRLF tolerance, line/kept
  * accounting, parameterization, null handling, and the
  * [[QualityPrune.keepByC4]] enforcement form.
  */
class C4CleanSpec extends SparkTestBase {
  import spark.implicits._

  private def clean(
      texts: Seq[String],
      minWords: Int = 5,
      minKept: Int = 3): Seq[(String, Long, Long, Boolean, Boolean, Boolean)] =
    withStrictCodegen {
      texts.toDF("t")
        .select(C4CleanExpr.c4Clean(col("t"), minWords, minKept).as("c"))
        .select(col("c.clean_text"), col("c.n_lines"), col("c.n_kept"),
          col("c.has_brace"), col("c.has_lorem"), col("c.keep"))
        .as[(String, Long, Long, Boolean, Boolean, Boolean)].collect().toSeq
    }

  test("line rules: terminal punctuation variants keep; nav/short/javascript lines drop") {
    val page = Seq(
      "This first sentence clearly has enough words to pass.",
      "Does this question also have enough words to pass?",
      "What an exciting sentence with enough words to pass!",
      "\"A quoted sentence with enough words also passes.\"",
      "Home About Contact Privacy Terms Careers", // no terminal punct
      "Too short.", // 2 words
      "Please enable JavaScript to view this full page.", // boilerplate
      "Our cookie policy uses jAvAsCrIpT to track you.").mkString("\n")
    val got = clean(Seq(page))
    assert(got.head._2 === 8L)
    assert(got.head._3 === 4L)
    assert(got.head._1 === Seq(
      "This first sentence clearly has enough words to pass.",
      "Does this question also have enough words to pass?",
      "What an exciting sentence with enough words to pass!",
      "\"A quoted sentence with enough words also passes.\"").mkString("\n"))
    assert(got.head._6 === true) // 4 kept >= 3, no vetoes
  }

  test("word counting: exactly minWords keeps, one under drops; runs of spaces/tabs collapse") {
    val got = clean(Seq(
      "one two three four five.",
      "one two three four.",
      "  one\t two   three\tfour  five. ", // leading/multiple whitespace
      "one two three four five."), minKept = 0)
    assert(got(0)._3 === 1L)
    assert(got(1)._3 === 0L)
    assert(got(2)._3 === 1L)
    // the kept line is emitted right-trimmed, leading whitespace intact
    assert(got(2)._1 === "  one\t two   three\tfour  five.")
  }

  test("CRLF input: trailing CR trims before the terminal-punctuation test") {
    val got = clean(Seq(
      "A full sentence that survives the line rules.\r\nAnother full sentence that also survives just fine.\r"),
      minKept = 2)
    assert(got.head._2 === 2L)
    assert(got.head._3 === 2L)
    assert(!got.head._1.contains("\r"))
    assert(got.head._6 === true)
  }

  test("page vetoes: '{' and case-insensitive 'lorem ipsum' veto keep but kept lines still emit") {
    val base = "A full sentence that survives the line rules just fine."
    val got = clean(Seq(
      s"$base\nif (x) { return; }",
      s"$base\nLoReM IpSuM dolor sit amet text here.",
      base), minKept = 1)
    assert(got(0)._4 === true && got(0)._6 === false && got(0)._1 === base)
    // the lorem line itself passes the LINE rules (7 words, '.') —
    // kept-line accounting is independent of the page veto
    assert(got(1)._5 === true && got(1)._6 === false && got(1)._3 === 2L)
    assert(got(2)._4 === false && got(2)._5 === false && got(2)._6 === true)
  }

  test("accounting edges: empty text is one empty line; trailing newline adds an empty line") {
    val got = clean(Seq("", "Ends with a newline right after this sentence.\n"), minKept = 1)
    assert(got(0) === (("", 1L, 0L, false, false, false)))
    assert(got(1)._2 === 2L)
    assert(got(1)._3 === 1L)
    assert(got(1)._6 === true)
  }

  test("null text yields a null struct") {
    val got = withStrictCodegen {
      Seq(Option.empty[String]).toDF("t")
        .select(C4CleanExpr.c4Clean(col("t")).as("c"))
        .select(col("c").isNull).as[Boolean].collect().toSeq
    }
    assert(got === Seq(true))
  }

  test("keepByC4: survivors only, text replaced by the cleaned form; matches c4Clean's keep set") {
    val pages = Seq(
      (1L, "First sentence with enough words to pass easily.\nSecond sentence with enough words to pass easily.\nThird sentence with enough words to pass easily.\nnav bar"),
      (2L, "Only one good sentence with enough words here.\nshort"),
      (3L, "Good sentence number one with plenty of words.\nGood sentence number two with plenty of words.\nGood sentence number three with plenty of words.\nif (x) { y }"))
    val df = pages.toDF("doc_id", "text")
    val kept = QualityPrune.keepByC4(df, "text").as[(Long, String)].collect().toSeq
    assert(kept.map(_._1) === Seq(1L))
    assert(!kept.head._2.contains("nav bar"))
    assert(kept.head._2.split("\n").length === 3)
    val marked = QualityPrune.c4Clean(df, "text")
      .filter(col("keep")).select("doc_id").as[Long].collect().toSeq
    assert(marked === Seq(1L))
  }
}
