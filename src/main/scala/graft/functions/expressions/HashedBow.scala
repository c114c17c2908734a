package graft.functions.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native scan kernels for hashed bag-of-words features — the feature
  * extractor of the fastText/CCNet-class linear quality classifier
  * ([[graft.operators.QualityClassifier]]). (Reference analogue: none;
  * training-data-pipeline extension.)
  *
  * [[HashedBowExpr]]`(text, dim)` = sorted DISTINCT `md5_hash60(token)
  * % dim` per document — the presence feature set of the hashing
  * trick. One codegen pass: tokenize (the `tokens()` convention:
  * lower-case root locale, split on whitespace runs, drop empties),
  * hash each token's UTF-8 bytes (the [[ShingleKernel]] digest, so
  * the DuckDB oracle reproduces features with
  * `md5_hash60(token) % dim` string ops), mod into the bucket space,
  * sort + dedup. Zero tokens → EMPTY array (no features), matching
  * `list_distinct(list_transform(tokens, …))` on an empty list —
  * deliberately NOT the shingle-identity convention where empty text
  * hashes to one sentinel gram. Null text behaves as empty text and
  * the output is non-nullable, like the other members of this family.
  *
  * [[PresenceDotExpr]]`(feats, weights)` = `Σ weights[f] for f in
  * feats` — the sparse-presence dot product that turns a per-document
  * feature array plus a broadcast-literal weight vector into the
  * classifier margin WITHOUT a join or an interpreted `aggregate()`
  * HOF (higher-order functions run interpreted; the training loop
  * scans the corpus once per iteration, which is exactly the hot path
  * the q125 measurement showed must stay in codegen). Out-of-range
  * feature ids contribute 0 (they cannot arise from [[HashedBowExpr]]
  * plus the operator's engineered-feature ranges, but a defensive
  * bound beats generated-code array-index crashes).
  */
case class HashedBowExpr(child: Expression, dim: Int) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (dim < 1) TypeCheckResult.TypeCheckFailure(
      s"$prettyName dim must be >= 1, got $dim")
    else if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${child.dataType.catalogString}")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "hashed_bow"

  override def eval(input: InternalRow): Any = {
    val t = child.eval(input)
    HashedBowExpr.compute(if (t == null) null else t.asInstanceOf[UTF8String], dim)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    val resultCode =
      code"""
         ${c.code}
         org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} =
           graft.functions.expressions.HashedBowExpr.compute(
             ${c.isNull} ? null : ${c.value}, $dim);
       """
    ev.copy(code = resultCode, isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): HashedBowExpr =
    copy(child = newChild)
}

object HashedBowExpr {

  /** Called from generated code — must stay a simple static-style method. */
  def compute(text: UTF8String, dim: Int): ArrayData = {
    val hs = ShingleKernel.tokenHash60s(if (text == null) null else text.toString)
    var i = 0
    while (i < hs.length) { hs(i) = hs(i) % dim; i += 1 }
    java.util.Arrays.sort(hs)
    var w = 0
    i = 0
    while (i < hs.length) {
      if (w == 0 || hs(i) != hs(w - 1)) { hs(w) = hs(i); w += 1 }
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(
      if (w == hs.length) hs else java.util.Arrays.copyOf(hs, w))
  }

  def hashedBow(c: Column, dim: Int): Column =
    Bridge.column(HashedBowExpr(Bridge.expression(c), dim))
}

/** `presence_dot(feats, weights)` — Σ weights[f] over the feature ids. */
case class PresenceDotExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  private def isLongArray(dt: DataType): Boolean = dt match {
    case ArrayType(LongType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (isLongArray(left.dataType) && isLongArray(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<bigint> arguments, got " +
        s"${left.dataType.catalogString}, ${right.dataType.catalogString}")

  override def dataType: DataType = LongType
  override def prettyName: String = "presence_dot"

  override protected def nullSafeEval(feats: Any, weights: Any): Any =
    PresenceDotExpr.compute(
      feats.asInstanceOf[ArrayData], weights.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (f, w) =>
      s"graft.functions.expressions.PresenceDotExpr.compute($f, $w)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PresenceDotExpr =
    copy(left = newLeft, right = newRight)
}

object PresenceDotExpr {

  /** Called from generated code — must stay a simple static-style method. */
  def compute(feats: ArrayData, weights: ArrayData): Long = {
    val n = feats.numElements()
    val d = weights.numElements()
    var acc = 0L
    var i = 0
    while (i < n) {
      val f = feats.getLong(i)
      if (f >= 0L && f < d) acc += weights.getLong(f.toInt)
      i += 1
    }
    acc
  }

  def presenceDot(feats: Column, weights: Column): Column =
    Bridge.column(PresenceDotExpr(
      Bridge.expression(feats), Bridge.expression(weights)))
}
