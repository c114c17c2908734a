package graft.functions.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for the engine's 60-bit md5-derived hash:
  * `md5Hash60(s) = first 60 bits of md5(utf8(s))` as a non-negative
  * long. Semantically identical to the composed
  * `conv(substring(md5(s), 1, 15), 16, 10)` form (and to the DuckDB
  * oracle's `CAST('0x' || substring(md5(s),1,15) AS BIGINT)`), but:
  *
  *  - no hex-string materialization and re-parse;
  *  - real `doGenCode` (a static call), so it participates in
  *    WholeStageCodegen instead of falling back to interpreted eval
  *    like higher-order-function pipelines do.
  *
  * This is preference rung (b) of the custom-operator ladder — a scalar
  * `Expression` — where a UDF would hide the null semantics and block
  * codegen.
  */
case class Md5Hash60Expr(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"md5_hash60 requires a string argument, got ${child.dataType.catalogString}")

  override def dataType: DataType = LongType
  override def prettyName: String = "md5_hash60"

  override protected def nullSafeEval(input: Any): Any =
    Md5Hash60Expr.hash60(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.expressions.Md5Hash60Expr.hash60($c)")

  override protected def withNewChildInternal(newChild: Expression): Md5Hash60Expr =
    copy(child = newChild)
}

object Md5Hash60Expr {

  private val digests = ThreadLocal.withInitial[java.security.MessageDigest](() =>
    java.security.MessageDigest.getInstance("MD5"))

  /** First 60 bits of md5 (7 bytes + high nibble of byte 7) — called from
    * generated code; must stay a simple static-style method.
    */
  def hash60(s: UTF8String): Long = {
    val md = digests.get()
    md.reset()
    // packing shared with md5Hash60Local so the arithmetic can't drift
    graft.functions.TextFunctions.pack60(md.digest(s.getBytes))
  }

  /** Column-level entry point (Spark 4's Column wraps a ColumnNode; the
    * bridge converts to/from catalyst expressions).
    */
  def md5Hash60Native(c: Column): Column =
    Bridge.column(Md5Hash60Expr(Bridge.expression(c)))
}
