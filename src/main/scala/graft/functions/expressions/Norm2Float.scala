package graft.functions.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native Catalyst L2 norm over an `ARRAY<FLOAT>` column: sqrt of the
  * left-to-right sum of squared element doubles — the same fold order as
  * `VectorFunctions.norm2` (transform + aggregate) and the DuckDB
  * oracle's `sqrt(list_reduce(list_transform(...)))`, so values are
  * bit-identical. Companion to [[DotProductFloat]]: together they make
  * the ANN scan-side cosine a fully codegen'd projection.
  */
case class Norm2Float(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"norm2_f requires an ARRAY<FLOAT> argument, got ${other.catalogString}")
  }

  override def dataType: DataType = DoubleType
  override def prettyName: String = "norm2_f"

  override protected def nullSafeEval(a: Any): Any =
    Norm2Float.norm2(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.functions.expressions.Norm2Float.norm2($a)")

  override protected def withNewChildInternal(newChild: Expression): Norm2Float =
    copy(child = newChild)
}

object Norm2Float {

  /** Called from generated code — keep it a simple static-style method. */
  def norm2(a: ArrayData): Double = {
    val n = a.numElements()
    var s = 0.0
    var i = 0
    while (i < n) { val v = a.getFloat(i).toDouble; s += v * v; i += 1 }
    math.sqrt(s)
  }

  def norm2F(a: Column): Column = Bridge.column(Norm2Float(Bridge.expression(a)))
}
