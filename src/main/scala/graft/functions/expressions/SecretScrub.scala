package graft.functions.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** `secret_scrub(text)` — entropy-validated credential redaction, the
  * third member of the checksum/validation scrub family (q64 pattern
  * PII, q155 Luhn cards, q162 mod-97 IBANs): API keys, tokens, and
  * key material have no check digit, so the validator is SHANNON
  * ENTROPY — the detect-secrets/trufflehog recipe, restated on this
  * library's fixed-point conventions. One native scan pass per row.
  * (Reference analogue: none; training-data-pipeline extension.)
  *
  * Candidate grammar — maximal runs of the base64 charset
  * `[A-Za-z0-9+/=]` of length ≥ `minLen` (default 20), exactly the
  * regex `[A-Za-z0-9+/=]{20,}`, hand-scanned here and re-derived
  * verbatim by the DuckDB oracle's `regexp_split_to_array` /
  * `regexp_extract_all` interleave (the q155 pattern), so segments
  * and candidates align one-to-one across engines. A candidate is
  * REDACTED to `[SECRET]` iff its unigram character entropy reaches
  * `thresholdMicroNats` (default 3,000,000 µnats ≈ 4.33 bits — the
  * ceiling for a 20-char run is ln 20 ≈ 2.9957 nats, so minimum-length
  * candidates never fire; real key material runs 32–64 chars over a
  * 30+-symbol alphabet and lands 3.3–4.1 nats, while English words,
  * repeated-char padding, and short-period patterns sit ≤ 2.8).
  * Entropy uses the [[CharEntropyExpr]] fixed-point rule verbatim —
  * `Σ_c round(1e6 · (n_c/n) · ln(n/n_c))` per distinct char, each term
  * rounded row-locally, summed as an exact integer — so the oracle
  * reproduces every decision bit-for-bit. Low-entropy candidates are
  * counted (`n_candidates` minus `n_secrets` — the false-positive mass
  * a bare length rule would have eaten) but left in place, the q155
  * ledger discipline.
  *
  * Emits `struct(redacted: string, n_secrets: long, n_candidates:
  * long, max_ent_micro: long)` (`max_ent_micro` = the largest
  * candidate entropy seen, 0 when no candidates — the calibration
  * column); null text → null struct (the text-stats family contract).
  */
case class SecretScrubExpr(
    child: Expression,
    minLen: Int = 20,
    thresholdMicroNats: Long = 3000000L)
    extends TextStatsBase {
  require(minLen >= 2, s"secret_scrub minLen must be >= 2, got $minLen")

  override def dataType: DataType = SecretScrubExpr.schema
  override def prettyName: String = "secret_scrub"

  override protected def nullSafeEval(input: Any): Any =
    SecretScrubExpr.run(input.asInstanceOf[UTF8String], minLen, thresholdMicroNats)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.expressions.SecretScrubExpr.run($c, $minLen, ${thresholdMicroNats}L)")

  override protected def withNewChildInternal(newChild: Expression): SecretScrubExpr =
    copy(child = newChild)
}

object SecretScrubExpr {

  val schema: StructType = StructType(Seq(
    StructField("redacted", StringType, nullable = false),
    StructField("n_secrets", LongType, nullable = false),
    StructField("n_candidates", LongType, nullable = false),
    StructField("max_ent_micro", LongType, nullable = false)))

  private def isB64(c: Char): Boolean =
    (c >= 'A' && c <= 'Z') || (c >= 'a' && c <= 'z') ||
      (c >= '0' && c <= '9') || c == '+' || c == '/' || c == '='

  /** The [[CharEntropyExpr]] fixed-point rule over a substring run:
    * per-distinct-char micro-nat terms rounded individually, exact
    * integer sum (order-free).
    */
  private[graft] def entMicro(s: String, from: Int, until: Int): Long = {
    val n = (until - from).toLong
    if (n <= 0L) return 0L
    val counts = new java.util.HashMap[Character, Long]()
    var i = from
    while (i < until) {
      counts.merge(s.charAt(i), 1L, (a, b) => a + b)
      i += 1
    }
    var ent = 0L
    val it = counts.values().iterator()
    while (it.hasNext) {
      val c = it.next()
      ent += Math.round(
        1000000.0 * (c.toDouble / n.toDouble) * Math.log(n.toDouble / c.toDouble))
    }
    ent
  }

  /** Called from generated code — must stay a simple static-style method. */
  def run(text: UTF8String, minLen: Int, threshold: Long): GenericInternalRow = {
    val s = text.toString
    val out = new java.lang.StringBuilder(s.length)
    var nSecrets = 0L
    var nCandidates = 0L
    var maxEnt = 0L
    var i = 0
    val n = s.length
    while (i < n) {
      if (!isB64(s.charAt(i))) { out.append(s.charAt(i)); i += 1 }
      else {
        var j = i + 1
        while (j < n && isB64(s.charAt(j))) j += 1
        if (j - i >= minLen) {
          nCandidates += 1L
          val ent = entMicro(s, i, j)
          if (ent > maxEnt) maxEnt = ent
          if (ent >= threshold) { out.append("[SECRET]"); nSecrets += 1L }
          else out.append(s, i, j)
        } else out.append(s, i, j)
        i = j
      }
    }
    new GenericInternalRow(Array[Any](
      UTF8String.fromString(out.toString), nSecrets, nCandidates, maxEnt))
  }

  def secretScrub(
      c: Column,
      minLen: Int = 20,
      thresholdMicroNats: Long = 3000000L): Column =
    Bridge.column(SecretScrubExpr(Bridge.expression(c), minLen, thresholdMicroNats))
}
