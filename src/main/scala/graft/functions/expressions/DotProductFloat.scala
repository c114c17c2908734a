package graft.functions.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native Catalyst dot product over two `ARRAY<FLOAT>` columns:
  * left-to-right accumulation of element-wise double products — the
  * same fold order as `VectorFunctions.dot` (zip_with + aggregate), the
  * tight-loop pair UDFs, and the DuckDB oracle's `list_reduce`, so
  * results stay bit-identical across all four forms.
  *
  * Why an `Expression` (preference rung (b) of the custom-operator
  * ladder) and not the HOF chain or a UDF:
  *
  *  - the HOF form is CodegenFallback — interpreted dispatch + boxing
  *    per element, catastrophic on O(pairs) scoring paths;
  *  - a Scala UDF pays per-row array conversion at the UDF boundary and
  *    blocks WholeStageCodegen for the surrounding operators;
  *  - this expression generates a primitive loop over the columnar
  *    `ArrayData` (no copies, no boxing) inline inside the fused stage.
  *
  * Null semantics: null if either side is null (standard
  * `BinaryExpression` null-intolerant behavior). Lengths may differ —
  * the loop runs over the shorter prefix, matching the UDF twins.
  */
case class DotProductFloat(left: Expression, right: Expression) extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(FloatType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"dot_f requires ARRAY<FLOAT> arguments, got " +
        s"${left.dataType.catalogString} and ${right.dataType.catalogString}")
  }

  override def dataType: DataType = DoubleType
  override def prettyName: String = "dot_f"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    DotProductFloat.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.expressions.DotProductFloat.dot($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProductFloat =
    copy(left = newLeft, right = newRight)
}

object DotProductFloat {

  /** Called from generated code — keep it a simple static-style method.
    * Float arrays in Tungsten rows are primitive-backed; `getFloat` is a
    * direct offset read (no boxing).
    */
  def dot(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var s = 0.0
    var i = 0
    while (i < n) { s += a.getFloat(i).toDouble * b.getFloat(i).toDouble; i += 1 }
    s
  }

  def dotF(a: Column, b: Column): Column =
    Bridge.column(DotProductFloat(Bridge.expression(a), Bridge.expression(b)))
}
