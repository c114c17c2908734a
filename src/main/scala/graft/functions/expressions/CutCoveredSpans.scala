package graft.functions.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}

/** `cut_covered_spans(tokens, starts, k)` — remove every token whose
  * position lies inside some `[s, s + k)` window for a start `s` in
  * `starts`, keeping the rest in order: the doc-local CUT step of
  * duplicate-span removal ([[graft.operators.Dedup.duplicateSpans]]).
  *
  * Why an `Expression` and not `explode`-space relational algebra: the
  * obvious plan (`explode(sequence(pos, pos + k - 1))` → `distinct` →
  * positions anti-join → `collect_list` rebuild) amplifies every
  * duplicated gram into `k` position rows through a shuffle — a k-times
  * row amplification of the duplicated volume on a high-dup corpus —
  * and then pays two more shuffles to cut and reassemble. The interval
  * union is a doc-LOCAL computation: with the start positions gathered
  * per doc, one O(tokens + starts) merge pass cuts the tokens with zero
  * additional shuffles and no k factor anywhere.
  *
  * Contract: `starts` need not be pre-sorted (the kernel sorts a
  * primitive copy — starts arrays are small relative to the text) and
  * may contain duplicates; token positions beyond the token count are
  * ignored. Null semantics: null if either array is null (the caller
  * coalesces; default null-intolerant `BinaryExpression` contract).
  */
case class CutCoveredSpansExpr(left: Expression, right: Expression, k: Int)
    extends BinaryExpression {

  // analysis-time validation, NOT a constructor require (same
  // java-deserialization rationale as ShingleHashesBase)
  override def checkInputDataTypes(): TypeCheckResult =
    if (k < 1) TypeCheckResult.TypeCheckFailure(
      s"$prettyName window width must be >= 1, got $k")
    else (left.dataType, right.dataType) match {
      case (ArrayType(StringType, _), ArrayType(IntegerType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (ARRAY<STRING>, ARRAY<INT>), got " +
          s"${l.catalogString} and ${r.catalogString}")
    }

  override def dataType: DataType = left.dataType
  override def prettyName: String = "cut_covered_spans"

  override protected def nullSafeEval(toks: Any, starts: Any): Any =
    CutCoveredSpansExpr.compute(
      toks.asInstanceOf[ArrayData], starts.asInstanceOf[ArrayData], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (t, s) =>
      s"graft.functions.expressions.CutCoveredSpansExpr.compute($t, $s, $k)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CutCoveredSpansExpr =
    copy(left = newLeft, right = newRight)
}

object CutCoveredSpansExpr {

  /** Called from generated code — must stay a simple static-style method.
    * One forward pass: starts are sorted ascending, so the covered
    * region's exclusive end only ever moves right; a token survives iff
    * its index has passed every window opened at or before it.
    */
  def compute(toks: ArrayData, starts: ArrayData, k: Int): ArrayData = {
    val m = starts.numElements()
    if (m == 0) return toks
    val n = toks.numElements()
    val s = new Array[Int](m)
    var i = 0
    while (i < m) { s(i) = starts.getInt(i); i += 1 }
    java.util.Arrays.sort(s)
    val out = new Array[Any](n)
    var w = 0
    var j = 0
    var coverEnd = -1
    i = 0
    while (i < n) {
      while (j < m && s(j) <= i) {
        val e = s(j) + k
        if (e > coverEnd) coverEnd = e
        j += 1
      }
      if (i >= coverEnd) { out(w) = toks.getUTF8String(i); w += 1 }
      i += 1
    }
    new GenericArrayData(
      if (w == n) out
      else {
        val r = new Array[Any](w)
        System.arraycopy(out, 0, r, 0, w)
        r
      })
  }

  def cutCoveredSpans(toks: Column, starts: Column, k: Int): Column =
    Bridge.column(CutCoveredSpansExpr(Bridge.expression(toks), Bridge.expression(starts), k))
}
