package graft.functions.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

import java.text.Normalizer

/** Unicode text-normalization front door — the step between markup
  * extraction ([[HtmlToTextExpr]]) and everything fingerprint-shaped
  * downstream (exact dedup, shingles, token counts): the SAME logical
  * text arrives from the web in many byte encodings (composed vs
  * decomposed accents, ligatures, width variants), and un-normalized
  * corpora silently split dedup groups and vocabulary entries.
  *
  * Two native codegen expressions (no UDF — these sit at the top of
  * every ingest plan, where breaking WholeStageCodegen costs the most;
  * same preference-ladder argument as [[TextStatsBase]]):
  *
  *  - `nfc_normalize(s)` — canonical composition (NFC): `e` +
  *    COMBINING ACUTE collapses to `é`; already-NFC text round-trips
  *    byte-identically. The canonicalization every fingerprint should
  *    run behind; JDK [[java.text.Normalizer]] implements UAX #15
  *    verbatim.
  *  - `strip_accents(s)` — canonical-decompose (NFD), drop every
  *    combining mark (Unicode categories Mn/Mc/Me), re-compose (NFC).
  *    `Héllô Çafé` → `Hello Cafe`; characters whose "accent" is not a
  *    combining mark after canonical decomposition — `ß`, `ø`, the
  *    `ﬁ` ligature (compatibility, not canonical) — pass through
  *    unchanged, exactly the semantics of DuckDB/utf8proc
  *    `strip_accents`, which is the q130 oracle.
  *
  * Cost shape: a fast-path scan first — pure-ASCII input (the
  * overwhelming majority of bytes in a web corpus after extraction)
  * returns the INPUT UTF8String unchanged, zero allocation; only rows
  * containing a non-ASCII char pay the Normalizer pass. Per-row
  * state-free, so the expression fuses into the scan stage and
  * shuffles nothing.
  */
abstract class UnicodeNormBase extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${child.dataType.catalogString}")

  override def dataType: DataType = StringType
}

case class NfcNormalizeExpr(child: Expression) extends UnicodeNormBase {
  override def prettyName: String = "nfc_normalize"

  override protected def nullSafeEval(input: Any): Any =
    UnicodeNormExprs.nfc(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.expressions.UnicodeNormExprs.nfc($c)")

  override protected def withNewChildInternal(newChild: Expression): NfcNormalizeExpr =
    copy(child = newChild)
}

case class StripAccentsExpr(child: Expression) extends UnicodeNormBase {
  override def prettyName: String = "strip_accents"

  override protected def nullSafeEval(input: Any): Any =
    UnicodeNormExprs.stripAccents(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.expressions.UnicodeNormExprs.stripAccents($c)")

  override protected def withNewChildInternal(newChild: Expression): StripAccentsExpr =
    copy(child = newChild)
}

object UnicodeNormExprs {

  def nfcNormalize(c: Column): Column =
    Bridge.column(NfcNormalizeExpr(Bridge.expression(c)))

  def stripAccentsCol(c: Column): Column =
    Bridge.column(StripAccentsExpr(Bridge.expression(c)))

  /** ASCII is closed under NFC and accent stripping: skip all work. */
  private def isAscii(s: UTF8String): Boolean = {
    val n = s.numBytes()
    var i = 0
    while (i < n) {
      if ((s.getByte(i) & 0x80) != 0) return false
      i += 1
    }
    true
  }

  def nfc(s: UTF8String): UTF8String = {
    if (isAscii(s)) return s
    val str = s.toString
    if (Normalizer.isNormalized(str, Normalizer.Form.NFC)) s
    else UTF8String.fromString(Normalizer.normalize(str, Normalizer.Form.NFC))
  }

  private def isMark(cp: Int): Boolean = {
    val t = Character.getType(cp)
    t == Character.NON_SPACING_MARK || t == Character.COMBINING_SPACING_MARK ||
      t == Character.ENCLOSING_MARK
  }

  def stripAccents(s: UTF8String): UTF8String = {
    if (isAscii(s)) return s
    val nfd = Normalizer.normalize(s.toString, Normalizer.Form.NFD)
    val sb = new java.lang.StringBuilder(nfd.length)
    var i = 0
    while (i < nfd.length) {
      val cp = nfd.codePointAt(i)
      if (!isMark(cp)) sb.appendCodePoint(cp)
      i += Character.charCount(cp)
    }
    // re-compose what remains (utf8proc COMPOSEs after the mark strip;
    // without this, Hangul/precomposed survivors would stay decomposed)
    UTF8String.fromString(
      Normalizer.normalize(sb.toString, Normalizer.Form.NFC))
  }
}
