package graft.functions.expressions

import graft.functions.TextFunctions
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{DataType, DoubleType, LongType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** `gopher_stats(text)` — the rule INPUTS of the Gopher repetition-free
  * document-quality heuristics (Rae et al. 2021, "Scaling Language
  * Models: Methods, Analysis & Insights from Training Gopher",
  * Appendix A1.1 — public literature) in one native scan pass:
  *
  *  - `n_tokens`, `mean_token_len` — the word-count and
  *    mean-word-length bounds (tokenizer = the repo-wide
  *    lower+whitespace split, so the same `sqlTokens` oracle fragment
  *    applies);
  *  - `frac_alpha` — fraction of tokens containing at least one
  *    `[a-z]` character (Gopher: ≥ 80 % of words must);
  *  - `n_stop_hits` — how many DISTINCT members of Gopher's fixed
  *    8-word stop set {the, be, to, of, and, that, have, with} occur
  *    (Gopher: ≥ 2);
  *  - `frac_ellipsis_lines` / `frac_bullet_lines` — fraction of
  *    `\n`-lines ending with `...`/`…`, resp. starting (after
  *    space/tab strip) with `-`/`*`/`•` (Gopher: remove when > 30 %
  *    of lines end in an ellipsis or > 90 % START with a bullet —
  *    i.e. the bullet gate only drops near-pure bullet lists);
  *  - `symbol_ratio` — (`#` chars + `…` chars + non-overlapping `...`
  *    runs) per token (Gopher: ≤ 10 %).
  *
  * The kernel emits STATS only; thresholds live in the composing
  * operator ([[graft.operators.QualityPrune.gopherGate]]) as plain
  * comparisons, so one scan supports any threshold profile. Ratios are
  * single divisions by a `max(count, 1)` denominator — one IEEE op,
  * reproduced exactly by the DuckDB oracle. Null text → null struct
  * (the family's null-intolerant contract).
  */
case class GopherStatsExpr(child: Expression) extends TextStatsBase {
  override def dataType: DataType = GopherStatsExpr.schema
  override def prettyName: String = "gopher_stats"

  override protected def nullSafeEval(input: Any): Any =
    GopherStatsExpr.run(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.expressions.GopherStatsExpr.run($c)")

  override protected def withNewChildInternal(newChild: Expression): GopherStatsExpr =
    copy(child = newChild)
}

object GopherStatsExpr {

  val schema: StructType = StructType(Seq(
    StructField("n_tokens", LongType, nullable = false),
    StructField("mean_token_len", DoubleType, nullable = false),
    StructField("frac_alpha", DoubleType, nullable = false),
    StructField("n_stop_hits", LongType, nullable = false),
    StructField("frac_ellipsis_lines", DoubleType, nullable = false),
    StructField("frac_bullet_lines", DoubleType, nullable = false),
    StructField("symbol_ratio", DoubleType, nullable = false)))

  /** Gopher's fixed stop set (Appendix A1.1). */
  val stopSet: IndexedSeq[String] =
    IndexedSeq("the", "be", "to", "of", "and", "that", "have", "with")

  /** Called from generated code — must stay a simple static-style method. */
  def run(text: UTF8String): GenericInternalRow = {
    val s = text.toString
    val toks = TextFunctions.tokensLocal(s)
    val nTok = toks.length.toLong
    var lenSum = 0L
    var alpha = 0L
    var stopMask = 0
    var i = 0
    while (i < toks.length) {
      val t = toks(i)
      // code points, not UTF-16 units — DuckDB's length() counts
      // characters, so supplementary-plane tokens must measure the same
      // (the cleanTokensLocal convention)
      lenSum += t.codePointCount(0, t.length).toLong
      var j = 0
      var hasAlpha = false
      while (j < t.length && !hasAlpha) {
        val c = t.charAt(j)
        if (c >= 'a' && c <= 'z') hasAlpha = true
        j += 1
      }
      if (hasAlpha) alpha += 1L
      val si = stopSet.indexOf(t)
      if (si >= 0) stopMask |= (1 << si)
      i += 1
    }
    val nStop = java.lang.Integer.bitCount(stopMask).toLong

    // line stats over the RAW text (case and leading markers matter)
    val lines = s.split("\n", -1)
    var ell = 0L
    var bul = 0L
    var li = 0
    while (li < lines.length) {
      val l = lines(li)
      if (l.endsWith("...") || l.endsWith("…")) ell += 1L
      var k = 0
      while (k < l.length && (l.charAt(k) == ' ' || l.charAt(k) == '\t')) k += 1
      if (k < l.length) {
        val c = l.charAt(k)
        if (c == '-' || c == '*' || c == '•') bul += 1L
      }
      li += 1
    }
    val nLines = lines.length.toLong

    // symbol counts over the raw text: '#' chars, '…' chars, and
    // NON-OVERLAPPING "..." runs (left-to-right, the same count
    // `replace(text, '...', '')` length arithmetic yields)
    var hashes = 0L
    var hell = 0L
    var ci = 0
    while (ci < s.length) {
      val c = s.charAt(ci)
      if (c == '#') hashes += 1L
      else if (c == '…') hell += 1L
      ci += 1
    }
    var dots = 0L
    var p = s.indexOf("...")
    while (p >= 0) { dots += 1L; p = s.indexOf("...", p + 3) }

    val tokDen = math.max(nTok, 1L).toDouble
    new GenericInternalRow(Array[Any](
      nTok,
      lenSum.toDouble / tokDen,
      alpha.toDouble / tokDen,
      nStop,
      ell.toDouble / nLines.toDouble,
      bul.toDouble / nLines.toDouble,
      (hashes + hell + dots).toDouble / tokDen))
  }

  def gopherStats(c: Column): Column =
    Bridge.column(GopherStatsExpr(Bridge.expression(c)))
}
