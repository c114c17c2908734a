package graft.functions.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** `dedup_segments(text)` — WITHIN-document repeated-segment collapse,
  * the self-repetition scrub (C4-class rule family — public
  * literature): split on the compile-time `delim`, keep each distinct
  * segment's FIRST occurrence, preserve order, rebuild. The row-local
  * complement of the corpus-level passes: [[graft.operators.Dedup
  * .lineDedup]] drops segments hot across the CORPUS,
  * `domainBoilerplate` across a DOMAIN's pages — this drops a
  * segment repeated inside ONE document (navigation loops, scraper
  * stutter, copy-paste runs), which q59's repetition stats only
  * SCORE. Exact string equality, order-preserving — a pure per-row
  * kernel, so the operator is one codegen scan (no exchange), chains
  * in batch and streaming alike, and the DuckDB oracle replays it
  * with a min-position window over the identical split.
  *
  * Null text → null struct (the text-stats family rule). Split
  * semantics are Spark's `split(str, regex)` with limit -1 (trailing
  * empty segments kept — and an empty segment deduplicates like any
  * other: consecutive delimiters collapse to one).
  *
  * Emits `struct(clean_text: string, n_kept: long, n_removed: long)`.
  */
case class DedupSegmentsExpr(child: Expression, delim: String) extends TextStatsBase {
  override def dataType: DataType = DedupSegmentsExpr.schema
  override def prettyName: String = "dedup_segments"

  override protected def nullSafeEval(input: Any): Any =
    DedupSegmentsExpr.run(input.asInstanceOf[UTF8String], delim)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val d = ctx.addReferenceObj("dsDelim", delim, "java.lang.String")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.expressions.DedupSegmentsExpr.run($c, $d)")
  }

  override protected def withNewChildInternal(newChild: Expression): DedupSegmentsExpr =
    copy(child = newChild)
}

object DedupSegmentsExpr {

  val schema: StructType = StructType(Seq(
    StructField("clean_text", StringType, nullable = false),
    StructField("n_kept", LongType, nullable = false),
    StructField("n_removed", LongType, nullable = false)))

  /** Called from generated code — must stay a simple static-style method. */
  def run(text: UTF8String, delim: String): GenericInternalRow = {
    val segs = text.toString.split(java.util.regex.Pattern.quote(delim), -1)
    val seen = new java.util.HashSet[String](math.max(16, segs.length * 2))
    val out = new java.lang.StringBuilder(text.numChars())
    var kept = 0L
    var i = 0
    while (i < segs.length) {
      if (seen.add(segs(i))) {
        if (kept > 0L) out.append(delim)
        out.append(segs(i))
        kept += 1L
      }
      i += 1
    }
    new GenericInternalRow(Array[Any](
      UTF8String.fromString(out.toString), kept, segs.length - kept))
  }

  def dedupSegments(c: Column, delim: String): Column =
    Bridge.column(DedupSegmentsExpr(Bridge.expression(c), delim))
}
