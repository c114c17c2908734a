package graft.functions.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** `mod97_scrub(text)` — checksum-validated IBAN redaction,
  * [[LuhnScrubExpr]]'s sibling for the OTHER big checksummed-identifier
  * family in web text: international bank account numbers (ISO 13616 /
  * ISO/IEC 7064 MOD 97-10 — public standard arithmetic). A bare
  * "2 letters + digits" pattern mass-redacts order codes and product
  * ids, so the scrub VALIDATES the mod-97 checksum before redacting.
  * One native scan pass per row. (Reference analogue: none;
  * training-data-pipeline extension.)
  *
  * Candidate grammar — exactly the regex `[A-Z0-9](?: ?[A-Z0-9])+`
  * (maximal uppercase-alphanumeric runs allowing ONE space between
  * chars — the print-grouped `GB82 WEST 1234 …` form re-joins; single
  * chars are not candidates), hand-scanned here and re-derived
  * verbatim by the DuckDB oracle's `regexp_split_to_array` /
  * `regexp_extract_all` pair. A candidate is REDACTED to `[IBAN]` iff
  * its compact form (separators stripped) has the IBAN shape — 2
  * letters, 2 digits, 15–34 chars total (ISO 13616 length band) — AND
  * the mod-97 check passes (rearrange first 4 chars to the end, map
  * letters A→10…Z→35, big-number mod 97 == 1, computed as the
  * per-char fold both engines replay). A shape-matching candidate that
  * FAILS the checksum is counted (`n_rejected` — the false-positive
  * mass a naive scrubber would have eaten) but left in place. Runs
  * without the shape (all-caps words, digit runs, short codes) pass
  * through untouched — digit-only runs are [[LuhnScrubExpr]]'s
  * department.
  *
  * Documented grammar limits (the maximal-run trade, same contract
  * class as Luhn's single-space PAN merge): an IBAN followed by ONE
  * space and another uppercase-alnum token merges into one run whose
  * shape or checksum fails — the IBAN escapes (any punctuation,
  * lowercase, or double space separates). Lowercase IBANs are out of
  * scope (ISO 13616 canonical form is uppercase; normalize upstream if
  * a corpus carries them).
  *
  * Emits `struct(redacted: string, n_ibans: long, n_rejected: long)`;
  * null text → null struct (the text-stats family contract).
  */
case class Mod97ScrubExpr(child: Expression) extends TextStatsBase {
  override def dataType: DataType = Mod97ScrubExpr.schema
  override def prettyName: String = "mod97_scrub"

  override protected def nullSafeEval(input: Any): Any =
    Mod97ScrubExpr.run(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.expressions.Mod97ScrubExpr.run($c)")

  override protected def withNewChildInternal(newChild: Expression): Mod97ScrubExpr =
    copy(child = newChild)
}

object Mod97ScrubExpr {

  val schema: StructType = StructType(Seq(
    StructField("redacted", StringType, nullable = false),
    StructField("n_ibans", LongType, nullable = false),
    StructField("n_rejected", LongType, nullable = false)))

  private def isAl(c: Char): Boolean =
    (c >= 'A' && c <= 'Z') || (c >= '0' && c <= '9')

  /** ISO 7064 MOD 97-10 over the compact candidate: first 4 chars moved
    * to the end, letters expanded to two digits (A=10…Z=35), the big
    * number reduced char-by-char — `(r·100 + v) % 97` for letters,
    * `(r·10 + v) % 97` for digits. Valid iff the remainder is 1.
    */
  private[expressions] def mod97Ok(chars: Array[Char], len: Int): Boolean = {
    var r = 0L
    var k = 0
    while (k < len) {
      val c = chars((k + 4) % len)
      if (c >= 'A' && c <= 'Z') r = (r * 100L + (c - 'A' + 10)) % 97L
      else r = (r * 10L + (c - '0')) % 97L
      k += 1
    }
    r == 1L
  }

  /** Called from generated code — must stay a simple static-style method. */
  def run(text: UTF8String): GenericInternalRow = {
    val s = text.toString
    val out = new java.lang.StringBuilder(s.length)
    var nIbans = 0L
    var nRejected = 0L
    val buf = new Array[Char](40)
    var i = 0
    val n = s.length
    while (i < n) {
      val c = s.charAt(i)
      if (!isAl(c)) { out.append(c); i += 1 }
      else {
        // scan the maximal [A-Z0-9](?: ?[A-Z0-9])+ run starting here
        var nc = 0
        if (nc < buf.length) buf(nc) = c
        nc += 1
        var last = i // index of the last consumed char (always alnum)
        var k = i + 1
        var done = false
        while (!done) {
          if (k < n && isAl(s.charAt(k))) {
            if (nc < buf.length) buf(nc) = s.charAt(k)
            nc += 1; last = k; k += 1
          } else if (k + 1 < n && s.charAt(k) == ' ' && isAl(s.charAt(k + 1))) {
            if (nc < buf.length) buf(nc) = s.charAt(k + 1)
            nc += 1; last = k + 1; k += 2
          } else done = true
        }
        if (nc >= 2) { // a candidate (single chars are not)
          // IBAN shape: 2 letters + 2 digits + 15..34 compact chars.
          // nc <= 34 < buf.length, so every shape-eligible run is fully
          // buffered; longer runs only need the count (never redact).
          val shaped = nc >= 15 && nc <= 34 &&
            buf(0) >= 'A' && buf(0) <= 'Z' && buf(1) >= 'A' && buf(1) <= 'Z' &&
            buf(2) >= '0' && buf(2) <= '9' && buf(3) >= '0' && buf(3) <= '9'
          if (shaped && mod97Ok(buf, nc)) {
            out.append("[IBAN]")
            nIbans += 1L
          } else {
            out.append(s, i, last + 1)
            if (shaped) nRejected += 1L
          }
        } else out.append(s, i, last + 1)
        i = last + 1
      }
    }
    new GenericInternalRow(Array[Any](
      UTF8String.fromString(out.toString), nIbans, nRejected))
  }

  def mod97Scrub(c: Column): Column =
    Bridge.column(Mod97ScrubExpr(Bridge.expression(c)))
}
