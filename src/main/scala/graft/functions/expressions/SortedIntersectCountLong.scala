package graft.functions.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native Catalyst sorted-merge intersection count over two sorted
  * `ARRAY<BIGINT>` columns — the verify kernel of every shingle-set
  * dedup pipeline (exact Jaccard = `c / (|A| + |B| - c)` with `c` from
  * this expression).
  *
  * Why an `Expression` (preference rung (b) of the custom-operator
  * ladder) and not a UDF: the verify stage evaluates once per CANDIDATE
  * PAIR — at 100 TB that is billions of rows — and a Scala UDF pays a
  * per-row `ArrayData → Array[Long]` copy plus boxing at the boundary
  * and blocks WholeStageCodegen for the surrounding join stage. This
  * expression runs the same two-pointer merge directly over the columnar
  * `ArrayData` (primitive `getLong` offset reads, no copies) inline in
  * the fused stage.
  *
  * Inputs must be sorted ascending (the per-doc hash-set arrays from
  * `distinctShingleHashesUdf` are sorted by construction); duplicates —
  * absent for distinct sets — would count once per aligned occurrence,
  * exactly like the UDF twin `TextFunctions.sortedIntersectCount`.
  * Null semantics: null if either side is null.
  */
case class SortedIntersectCountLong(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(LongType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"sorted_intersect_count requires ARRAY<BIGINT> arguments, got " +
        s"${left.dataType.catalogString} and ${right.dataType.catalogString}")
  }

  override def dataType: DataType = LongType
  override def prettyName: String = "sorted_intersect_count"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    SortedIntersectCountLong.count(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.expressions.SortedIntersectCountLong.count($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedIntersectCountLong =
    copy(left = newLeft, right = newRight)
}

object SortedIntersectCountLong {

  /** Called from generated code. Long arrays in Tungsten rows are
    * primitive-backed; `getLong` is a direct offset read (no boxing).
    */
  def count(a: ArrayData, b: ArrayData): Long = {
    val na = a.numElements()
    val nb = b.numElements()
    var i = 0
    var j = 0
    var c = 0L
    while (i < na && j < nb) {
      val x = a.getLong(i)
      val y = b.getLong(j)
      if (x == y) { c += 1L; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    c
  }

  def intersectCountF(a: Column, b: Column): Column =
    Bridge.column(SortedIntersectCountLong(Bridge.expression(a), Bridge.expression(b)))
}
