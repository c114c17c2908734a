package graft.functions.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `html_to_text(html)` — markup extraction for raw-crawl ingestion:
  * one native codegen pass that drops `<script>`/`<style>` blocks and
  * `<!-- -->` comments wholesale, replaces every remaining tag with a
  * space, decodes the core character entities (`&amp; &lt; &gt;
  * &quot; &apos; &nbsp;` plus decimal `&#NNNN;` and hex `&#xHHHH;`
  * numerics), collapses whitespace runs to single spaces, and trims.
  *
  * Every real pretraining pipeline starts from markup, not clean
  * text; this is the Spark-native extraction step the rest of the
  * text family (langid, quality, dedup, tokenization) composes
  * behind. Same preference-ladder argument as [[TextStatsBase]]: a
  * closure UDF would break WholeStageCodegen at the very first
  * operator of every ingest plan — the worst possible place, since
  * EVERYTHING downstream reads its output — while this expression
  * generates a static call inside the fused scan stage.
  *
  * Semantics notes (pinned by `HtmlToTextSpec`):
  *  - single-pass entity decode: `&amp;lt;` yields the literal
  *    `&lt;`, never `<` (double-decoding is the classic injection
  *    bug);
  *  - an unterminated tag/entity is emitted literally (mirrors the
  *    regexp-chain oracle twin, which only rewrites complete
  *    constructs);
  *  - `script`/`style`/closing-tag matching is ASCII-case-insensitive
  *    (`<SCRIPT>` hides its body too); an unclosed block runs to end
  *    of input;
  *  - `&nbsp;` decodes to a plain space and collapses with its
  *    neighbors.
  *
  * The DuckDB oracle twin (q121) is the equivalent
  * `regexp_replace`/`replace` chain over well-formed markup — see
  * `SparkEntry.oracleSql`.
  */
case class HtmlToTextExpr(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${child.dataType.catalogString}")

  override def dataType: DataType = StringType
  override def prettyName: String = "html_to_text"

  override protected def nullSafeEval(input: Any): Any =
    HtmlToTextExpr.run(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.expressions.HtmlToTextExpr.run($c)")

  override protected def withNewChildInternal(newChild: Expression): HtmlToTextExpr =
    copy(child = newChild)
}

object HtmlToTextExpr {

  def htmlToText(c: Column): Column = Bridge.column(HtmlToTextExpr(Bridge.expression(c)))

  private def isWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\r' || c == '\f' || c == '\u000B'

  /** ASCII-case-insensitive region match (markup names are ASCII). */
  private def regionMatchesIc(s: String, at: Int, lit: String): Boolean = {
    if (at + lit.length > s.length) return false
    var j = 0
    while (j < lit.length) {
      val a = s.charAt(at + j); val b = lit.charAt(j)
      if (Character.toLowerCase(a) != b) return false
      j += 1
    }
    true
  }

  /** A tag-name boundary: `<script>` / `<script src=…>` / `<script/>`
    * open a block, `<scripting>` does not.
    */
  private def nameBoundary(s: String, at: Int): Boolean =
    at >= s.length || { val c = s.charAt(at); c == '>' || c == '/' || isWs(c) }

  /** End index (exclusive) of a raw-text block opened at `i`
    * (`i` points at `<`, the name is `script`/`style`): past the
    * matching case-insensitive `</name …>`, or end of input if
    * unclosed. Returns -1 if the opening tag itself never closes.
    */
  private def rawBlockEnd(s: String, i: Int, name: String): Int = {
    val openEnd = s.indexOf('>', i)
    if (openEnd < 0) return -1
    // self-closing opener (`<script/>`) has no body to hide
    if (openEnd > i && s.charAt(openEnd - 1) == '/') return openEnd + 1
    var j = openEnd + 1
    while (j < s.length) {
      if (s.charAt(j) == '<' && j + 1 < s.length && s.charAt(j + 1) == '/' &&
        regionMatchesIc(s, j + 2, name) && nameBoundary(s, j + 2 + name.length)) {
        val close = s.indexOf('>', j)
        return if (close < 0) s.length else close + 1
      }
      j += 1
    }
    s.length
  }

  /** Decodes the entity starting at `i` (which points at `&`).
    * Returns the decoded codepoint and the index just past the `;`,
    * or null when the construct is not a complete known entity (the
    * `&` is then literal text).
    */
  private def decodeEntity(s: String, i: Int): Array[Int] = {
    val semi = s.indexOf(';', i + 1)
    // the longest decodable body is 8 chars (`&#x10FFFF;`)
    if (semi < 0 || semi - i - 1 > 8 || semi == i + 1) return null
    val body = s.substring(i + 1, semi)
    val cp: Int = body match {
      case "amp"  => '&'
      case "lt"   => '<'
      case "gt"   => '>'
      case "quot" => '"'
      case "apos" => '\''
      case "nbsp" => ' '
      case _ =>
        if (body.length > 1 && body.charAt(0) == '#') {
          val hex = body.length > 2 && (body.charAt(1) == 'x' || body.charAt(1) == 'X')
          val digits = if (hex) body.substring(2) else body.substring(1)
          if (digits.isEmpty) -1
          else {
            var v = 0
            var ok = true
            var k = 0
            while (ok && k < digits.length) {
              val d = Character.digit(digits.charAt(k), if (hex) 16 else 10)
              if (d < 0 || v > 0x10FFFF) ok = false else v = v * (if (hex) 16 else 10) + d
              k += 1
            }
            if (ok && v > 0 && v <= 0x10FFFF &&
              !(v >= 0xD800 && v <= 0xDFFF)) v else -1
          }
        } else -1
    }
    if (cp < 0) null else Array(cp, semi + 1)
  }

  /** Called from generated code — must stay a simple static-style method. */
  def run(html: UTF8String): UTF8String = {
    val s = html.toString
    val n = s.length
    val sb = new java.lang.StringBuilder(n)
    var pendingSpace = false
    var i = 0

    def space(): Unit = pendingSpace = true
    def emit(cp: Int): Unit = {
      if (cp == ' ' || (cp < 0x80 && isWs(cp.toChar))) { pendingSpace = true; return }
      if (pendingSpace && sb.length > 0) sb.append(' ')
      pendingSpace = false
      sb.appendCodePoint(cp)
    }

    while (i < n) {
      val c = s.charAt(i)
      if (c == '<') {
        if (regionMatchesIc(s, i, "<!--")) {
          val e = s.indexOf("-->", i + 4)
          // an unclosed comment hides the rest of the input (the
          // oracle template always closes; spec-pinned here)
          i = if (e < 0) n else e + 3
          space()
        } else if (regionMatchesIc(s, i + 1, "script") && nameBoundary(s, i + 7)) {
          val e = rawBlockEnd(s, i, "script")
          if (e < 0) { emit('<'); i += 1 } else { i = e; space() }
        } else if (regionMatchesIc(s, i + 1, "style") && nameBoundary(s, i + 6)) {
          val e = rawBlockEnd(s, i, "style")
          if (e < 0) { emit('<'); i += 1 } else { i = e; space() }
        } else {
          val e = s.indexOf('>', i + 1)
          // `<` with no closing `>` is literal text, exactly like the
          // oracle's `<[^>]*>` pattern
          if (e < 0) { emit('<'); i += 1 } else { i = e + 1; space() }
        }
      } else if (c == '&') {
        val d = decodeEntity(s, i)
        if (d == null) { emit('&'); i += 1 } else { emit(d(0)); i = d(1) }
      } else if (isWs(c)) {
        space(); i += 1
      } else {
        if (pendingSpace && sb.length > 0) sb.append(' ')
        pendingSpace = false
        sb.append(c)
        i += 1
      }
    }
    UTF8String.fromString(sb.toString)
  }
}
