package graft.functions.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** `luhn_scrub(text)` — checksum-validated payment-card redaction, the
  * q64 PII pass's high-precision sibling: a bare digit-run pattern
  * mass-redacts order numbers, timestamps, and hashes, so card
  * scrubbing VALIDATES the Luhn checksum (ISO/IEC 7812 mod-10 — public
  * standard arithmetic) before redacting. One native scan pass per
  * row. (Reference analogue: none; training-data-pipeline extension.)
  *
  * Candidate grammar — exactly the regex `[0-9](?:[ -]?[0-9])+`
  * (maximal digit runs allowing ONE space or dash between digits;
  * single digits are not candidates), hand-scanned here and
  * re-derived verbatim by the DuckDB oracle's
  * `regexp_split_to_array`/`regexp_extract_all` pair, so segments and
  * candidates align one-to-one across engines. A candidate is REDACTED
  * to `[CARD]` iff its digit count is a standard PAN length (13-19)
  * AND the Luhn check passes; a PAN-length run that FAILS the checksum
  * is counted (`n_rejected` — the false-positive mass a naive scrubber
  * would have eaten) but left in place. Runs outside 13-19 digits pass
  * through untouched (phones are q64's department; 20+-digit runs are
  * ids, not cards).
  *
  * Documented grammar limit: two PANs separated by a SINGLE space
  * merge into one >19-digit run and escape — the standard maximal-run
  * scrubber trade (any punctuation or double space separates). The
  * spec pins this case so the behavior is contract, not surprise.
  *
  * Emits `struct(redacted: string, n_cards: long, n_rejected: long)`;
  * null text → null struct (the text-stats family contract).
  */
case class LuhnScrubExpr(child: Expression) extends TextStatsBase {
  override def dataType: DataType = LuhnScrubExpr.schema
  override def prettyName: String = "luhn_scrub"

  override protected def nullSafeEval(input: Any): Any =
    LuhnScrubExpr.run(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.expressions.LuhnScrubExpr.run($c)")

  override protected def withNewChildInternal(newChild: Expression): LuhnScrubExpr =
    copy(child = newChild)
}

object LuhnScrubExpr {

  val schema: StructType = StructType(Seq(
    StructField("redacted", StringType, nullable = false),
    StructField("n_cards", LongType, nullable = false),
    StructField("n_rejected", LongType, nullable = false)))

  private def isDigit(c: Char): Boolean = c >= '0' && c <= '9'
  private def isSep(c: Char): Boolean = c == ' ' || c == '-'

  /** Mod-10 over the digit chars (ISO/IEC 7812): from the right, double
    * every second digit, subtract 9 when the double exceeds 9, total
    * divisible by 10.
    */
  private[expressions] def luhnOk(digits: Array[Int]): Boolean = {
    var sum = 0
    var i = digits.length - 1
    var alt = false
    while (i >= 0) {
      var d = digits(i)
      if (alt) { d *= 2; if (d > 9) d -= 9 }
      sum += d
      alt = !alt
      i -= 1
    }
    sum % 10 == 0
  }

  /** Called from generated code — must stay a simple static-style method. */
  def run(text: UTF8String): GenericInternalRow = {
    val s = text.toString
    val out = new java.lang.StringBuilder(s.length)
    var nCards = 0L
    var nRejected = 0L
    val digits = new Array[Int](32)
    var i = 0
    val n = s.length
    while (i < n) {
      val c = s.charAt(i)
      if (!isDigit(c)) { out.append(c); i += 1 }
      else {
        // scan the maximal [0-9](?:[ -]?[0-9])+ run starting here
        var nd = 0
        if (nd < digits.length) digits(nd) = c - '0'
        nd += 1
        var last = i // index of the last consumed char (always a digit)
        var k = i + 1
        var done = false
        while (!done) {
          if (k < n && isDigit(s.charAt(k))) {
            if (nd < digits.length) digits(nd) = s.charAt(k) - '0'
            nd += 1; last = k; k += 1
          } else if (k + 1 < n && isSep(s.charAt(k)) && isDigit(s.charAt(k + 1))) {
            if (nd < digits.length) digits(nd) = s.charAt(k + 1) - '0'
            nd += 1; last = k + 1; k += 2
          } else done = true
        }
        if (nd >= 2) { // a candidate (single digits are not)
          if (nd >= 13 && nd <= 19 && luhnOk(java.util.Arrays.copyOf(digits, nd))) {
            out.append("[CARD]")
            nCards += 1L
          } else {
            out.append(s, i, last + 1)
            if (nd >= 13 && nd <= 19) nRejected += 1L
          }
        } else out.append(s, i, last + 1)
        i = last + 1
      }
    }
    new GenericInternalRow(Array[Any](
      UTF8String.fromString(out.toString), nCards, nRejected))
  }

  def luhnScrub(c: Column): Column =
    Bridge.column(LuhnScrubExpr(Bridge.expression(c)))
}
