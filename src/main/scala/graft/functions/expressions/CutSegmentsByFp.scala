package graft.functions.expressions

import graft.functions.TextFunctions
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** `cut_segments_by_fp(text, sorted_fps)` — apply a FROZEN boilerplate
  * profile to one document, statelessly: split the text on the
  * compile-time `delim`, drop every segment whose `md5_hash60` is in
  * the given SORTED fingerprint array (binary search, no per-row set
  * allocation), rebuild. The row-local half of
  * [[graft.operators.Dedup.applyBoilerplateProfile]]: the profile is
  * mined once per domain by the batch pass
  * ([[graft.operators.Dedup.boilerplateProfile]]) and rides in as a
  * per-row array via a broadcast join — so the apply is a pure
  * projection, which is what makes it STREAMING-safe (no aggregation,
  * no state, chains in front of any ingest like the quality gates).
  *
  * Contract: `fps` MUST be sorted ascending (the composing operator
  * sorts; an unsorted array silently misses members — binary search
  * is the whole point of the shape). Null text → null struct (the
  * text-stats family rule); a null/empty fps array cuts nothing.
  * Split semantics are Spark's `split(str, regex)` with limit -1
  * (trailing empty segments KEPT), matching the oracle's
  * `string_split`.
  *
  * Emits `struct(clean_text: string, n_kept: long, n_removed: long)`.
  */
case class CutSegmentsByFpExpr(left: Expression, right: Expression, delim: String)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType &&
      (right.dataType match {
        case ArrayType(LongType, _) => true
        case _ => false
      })) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (string, array<bigint>), got " +
        s"${left.dataType.catalogString}, ${right.dataType.catalogString}")

  override def dataType: DataType = CutSegmentsByFpExpr.schema
  override def prettyName: String = "cut_segments_by_fp"

  override protected def nullSafeEval(text: Any, fps: Any): Any =
    CutSegmentsByFpExpr.run(
      text.asInstanceOf[UTF8String], fps.asInstanceOf[ArrayData], delim)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val d = ctx.addReferenceObj("csfDelim", delim, "java.lang.String")
    defineCodeGen(ctx, ev, (t, f) =>
      s"graft.functions.expressions.CutSegmentsByFpExpr.run($t, $f, $d)")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CutSegmentsByFpExpr =
    copy(left = newLeft, right = newRight)
}

object CutSegmentsByFpExpr {

  val schema: StructType = StructType(Seq(
    StructField("clean_text", StringType, nullable = false),
    StructField("n_kept", LongType, nullable = false),
    StructField("n_removed", LongType, nullable = false)))

  /** Called from generated code — must stay a simple static-style method. */
  def run(text: UTF8String, fps: ArrayData, delim: String): GenericInternalRow = {
    val segs = text.toString.split(java.util.regex.Pattern.quote(delim), -1)
    val n = fps.numElements()
    val out = new java.lang.StringBuilder(text.numChars())
    var kept = 0L
    var removed = 0L
    var i = 0
    while (i < segs.length) {
      val h = TextFunctions.md5Hash60Local(segs(i))
      // binary search over the sorted fp array
      var lo = 0
      var hi = n - 1
      var hit = false
      while (lo <= hi && !hit) {
        val mid = (lo + hi) >>> 1
        val v = fps.getLong(mid)
        if (v == h) hit = true
        else if (v < h) lo = mid + 1
        else hi = mid - 1
      }
      if (hit) removed += 1L
      else {
        if (kept > 0L) out.append(delim)
        out.append(segs(i))
        kept += 1L
      }
      i += 1
    }
    new GenericInternalRow(Array[Any](
      UTF8String.fromString(out.toString), kept, removed))
  }

  def cutSegmentsByFp(text: Column, fps: Column, delim: String): Column =
    Bridge.column(CutSegmentsByFpExpr(
      Bridge.expression(text), Bridge.expression(fps), delim))
}
