package graft.functions

import graft.SparkTestBase
import graft.functions.expressions.HtmlToTextExpr
import org.apache.spark.sql.functions._

/** Semantics of the native `html_to_text` markup-extraction scan
  * (q121's kernel): tag/script/style/comment removal, single-pass
  * entity decode, whitespace collapse, and the malformed-input edges
  * the oracle's regexp-chain twin never sees.
  */
class HtmlToTextSpec extends SparkTestBase {
  import spark.implicits._

  private def strip(s: String): String =
    HtmlToTextExpr.run(org.apache.spark.unsafe.types.UTF8String.fromString(s)).toString

  test("tags become spaces; whitespace collapses; ends trim") {
    assert(strip("<html><body><h1>Title</h1><p>one  two\tthree</p></body></html>")
      == "Title one two three")
    assert(strip("  <p>  padded  </p>  ") == "padded")
    assert(strip("a<br/>b") == "a b")
    assert(strip("") == "")
    assert(strip("<p></p>") == "")
  }

  test("script and style bodies are dropped wholesale, case-insensitively, attributes and all") {
    assert(strip("""before<script>if (2 < 3 && 1 > 0) { var x = "a&b"; }</script>after""")
      == "before after")
    assert(strip("""x<style type="text/css">body { color: #222; }</style>y""") == "x y")
    assert(strip("""x<SCRIPT SRC="a.js">hidden</ScRiPt>y""") == "x y")
    // <scripting> is NOT a script block — name boundary required
    assert(strip("<scripting>kept</scripting>") == "kept")
    // self-closing opener has no body to hide
    assert(strip("a<script/>b") == "a b")
    // unclosed block hides the rest of the input
    assert(strip("a<script>var x = 1; rest never closes") == "a")
    assert(strip("a<style>p{}") == "a")
  }

  test("comments are removed; an unclosed comment hides the rest") {
    assert(strip("a<!-- note <b>bold</b> -->z") == "a z")
    assert(strip("a<!-- never closed <p>x</p>") == "a")
  }

  test("entity decode: named, decimal, hex, single-pass, malformed-literal") {
    assert(strip("&amp; &lt; &gt; &quot; &apos;") == """& < > " '""")
    assert(strip("a&nbsp;b") == "a b")
    assert(strip("&#65;&#x42;&#X43;") == "ABC")
    assert(strip("&#8212;") == "—")
    // single-pass: an escaped entity is NOT double-decoded
    assert(strip("&amp;lt;") == "&lt;")
    assert(strip("&amp;amp;") == "&amp;")
    // unknown/malformed entities are literal text
    assert(strip("&unknown; &noSemi &#; &#xg; & alone") == "&unknown; &noSemi &#; &#xg; & alone")
    // out-of-range / surrogate codepoints stay literal
    assert(strip("&#0; &#1114112; &#55296;") == "&#0; &#1114112; &#55296;")
  }

  test("unterminated tag is literal text (regexp-twin parity)") {
    assert(strip("a < b and a<b") == "a < b and a<b")
    assert(strip("tail<p never closes") == "tail<p never closes")
  }

  test("expression path: codegen scan, null in null out, non-string rejected") {
    val df = Seq(
      (1L, "<p>Hello&nbsp;&amp;&nbsp;goodbye</p>"),
      (2L, null.asInstanceOf[String])
    ).toDF("id", "html")
    val out = df.select(col("id"), HtmlToTextExpr.htmlToText(col("html")).as("t"))
    assert(out.as[(Long, Option[String])].collect().toMap
      == Map(1L -> Some("Hello & goodbye"), 2L -> None))
    // fused into WholeStageCodegen with no UDF boundary: over a real
    // source (a local Seq constant-folds to a LocalTableScan), under
    // strict codegen so a janino failure is fatal, not a silent
    // interpreted fallback
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val planned = docs.select(
      HtmlToTextExpr.htmlToText(
        concat(lit("<p>"), col("text"), lit("</p>"))).alias("t"))
    withStrictCodegen(planned.collect())
    val plan = planned.queryExecution.executedPlan.toString
    assert("\\*\\(\\d+\\) Project \\[html_to_text".r.findFirstIn(plan).isDefined,
      s"expected html_to_text inside a WholeStageCodegen projection:\n$plan")
    assert(!plan.toLowerCase.contains("scalaudf"), plan)
    val err = intercept[org.apache.spark.sql.AnalysisException] {
      df.select(HtmlToTextExpr.htmlToText(col("id"))).collect()
    }
    assert(err.getMessage.contains("html_to_text"))
  }
}
