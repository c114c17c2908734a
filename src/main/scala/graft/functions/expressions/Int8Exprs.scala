package graft.functions.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, ByteType, DataType, DoubleType, FloatType}

/** Symmetric max-abs int8 scalar quantization of embedding vectors —
  * the 4× storage/bandwidth lever BETWEEN raw float32 and PQ codes
  * (the standard "SQ8" tier in FAISS terms): per vector,
  * `scale = max|x| / 127`, `code_i = round(x_i / scale)` ∈ [-127, 127].
  * Uniform per-vector scaling preserves COSINE exactly in the limit —
  * cosine over the codes needs no dequantization and no scale at all,
  * so quantized search is pure small-integer arithmetic.
  *
  * Native codegen expressions (rung (b): the HOF chain for this is
  * interpreted per element; a UDF boxes every array):
  *
  *  - `int8_codes(vec)`: ARRAY<FLOAT> → ARRAY<TINYINT> — the persisted
  *    artifact form.
  *  - `int8_cos(vec, qcodes)`: fused quantize + integer dot + norm
  *    divide against a driver-quantized query — one pass over the
  *    float array, no code array ever materialized.
  *  - `int8_cos_codes(codes, qcodes)`: the same score over a STORED
  *    codes column (the artifact read path).
  *
  * Determinism: rounding is HALF AWAY FROM ZERO (Spark SQL `round` /
  * DuckDB `round` semantics — NOT `Math.round`, whose half-up differs
  * on negative halves), the integer dot is exact, and the final
  * `idot / (nq * nd)` is one fixed IEEE evaluation order — so the
  * DuckDB oracle reproduces every score bit-for-bit. Zero vectors
  * quantize to all-zero codes and score 0 against anything.
  */
object Int8Exprs {

  /** Half-away-from-zero rounding to a clamped int8 value. */
  @inline private def rnd(d: Double): Byte = {
    val r = if (d >= 0) math.floor(d + 0.5) else math.ceil(d - 0.5)
    val c = if (r > 127.0) 127.0 else if (r < -127.0) -127.0 else r
    c.toByte
  }

  /** Called from generated code. */
  def codes(a: ArrayData): ArrayData =
    UnsafeArrayData.fromPrimitiveArray(codesOf(a))

  private def codesOf(a: ArrayData): Array[Byte] = {
    val n = a.numElements()
    val out = new Array[Byte](n)
    var mx = 0.0
    var i = 0
    while (i < n) {
      val v = math.abs(a.getFloat(i).toDouble)
      if (v > mx) mx = v
      i += 1
    }
    if (mx > 0.0) {
      val scale = mx / 127.0
      i = 0
      while (i < n) { out(i) = rnd(a.getFloat(i).toDouble / scale); i += 1 }
    }
    out
  }

  /** Driver-side twin for quantizing the query vector (and the spec's
    * local reference).
    */
  def quantizeLocal(v: Array[Float]): Array[Byte] = {
    var mx = 0.0
    var i = 0
    while (i < v.length) {
      val x = math.abs(v(i).toDouble)
      if (x > mx) mx = x
      i += 1
    }
    val out = new Array[Byte](v.length)
    if (mx > 0.0) {
      val scale = mx / 127.0
      i = 0
      while (i < v.length) { out(i) = rnd(v(i).toDouble / scale); i += 1 }
    }
    out
  }

  /** Called from generated code: fused quantize + cosine vs the query
    * codes. One pass computes the doc's max-abs, a second computes the
    * integer dot and norms directly from the rescaled floats — the doc
    * code array never exists.
    */
  def cosFused(a: ArrayData, q: Array[Byte]): Double = {
    val n = math.min(a.numElements(), q.length)
    var mx = 0.0
    var i = 0
    val full = a.numElements()
    while (i < full) {
      val v = math.abs(a.getFloat(i).toDouble)
      if (v > mx) mx = v
      i += 1
    }
    if (mx == 0.0) return 0.0
    val scale = mx / 127.0
    var idot = 0L
    var dd = 0L
    var qq = 0L
    i = 0
    while (i < n) {
      val cd = rnd(a.getFloat(i).toDouble / scale).toLong
      val cq = q(i).toLong
      idot += cd * cq
      dd += cd * cd
      qq += cq * cq
      i += 1
    }
    // tail codes beyond the common prefix still count toward their
    // side's norm (identical rule in cosCodes, so the fused and
    // stored-artifact paths agree on unequal lengths too)
    while (i < full) {
      val cd = rnd(a.getFloat(i).toDouble / scale).toLong
      dd += cd * cd
      i += 1
    }
    var j = n
    while (j < q.length) { val cq = q(j).toLong; qq += cq * cq; j += 1 }
    if (dd == 0L || qq == 0L) 0.0
    else idot.toDouble / (math.sqrt(dd.toDouble) * math.sqrt(qq.toDouble))
  }

  /** Called from generated code: cosine between a stored codes column
    * and the query codes.
    */
  def cosCodes(a: ArrayData, q: Array[Byte]): Double = {
    val n = math.min(a.numElements(), q.length)
    var idot = 0L
    var dd = 0L
    var qq = 0L
    var i = 0
    while (i < n) {
      val cd = a.getByte(i).toLong
      val cq = q(i).toLong
      idot += cd * cq
      dd += cd * cd
      qq += cq * cq
      i += 1
    }
    val full = a.numElements()
    while (i < full) { val cd = a.getByte(i).toLong; dd += cd * cd; i += 1 }
    var j = n
    while (j < q.length) { val cq = q(j).toLong; qq += cq * cq; j += 1 }
    if (dd == 0L || qq == 0L) 0.0
    else idot.toDouble / (math.sqrt(dd.toDouble) * math.sqrt(qq.toDouble))
  }

  /** Called from generated code: exact integer dot of a codes column
    * against a micro-weight vector — the [[graft.operators
    * .EmbeddingProbe]] margin kernel (weights ride in the expression,
    * codes never widen to longs; order-free exact long arithmetic, so
    * the DuckDB oracle replays it bit-for-bit). Tail elements on
    * either side contribute 0 (missing weight / missing code).
    */
  def dotCodes(a: ArrayData, w: Array[Long]): Long = {
    val n = math.min(a.numElements(), w.length)
    var s = 0L
    var i = 0
    while (i < n) { s += a.getByte(i).toLong * w(i); i += 1 }
    s
  }

  def int8Codes(c: Column): Column = Bridge.column(Int8CodesExpr(Bridge.expression(c)))

  def int8Dot(c: Column, weights: Array[Long]): Column =
    Bridge.column(Int8DotExpr(Bridge.expression(c), weights.toIndexedSeq))

  def int8Cos(c: Column, qCodes: Array[Byte]): Column =
    Bridge.column(Int8CosExpr(Bridge.expression(c), qCodes.toIndexedSeq))

  def int8CosCodes(c: Column, qCodes: Array[Byte]): Column =
    Bridge.column(Int8CosCodesExpr(Bridge.expression(c), qCodes.toIndexedSeq))
}

case class Int8CodesExpr(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"int8_codes requires ARRAY<FLOAT>, got ${t.catalogString}")
  }

  override def dataType: DataType = ArrayType(ByteType, containsNull = false)
  override def prettyName: String = "int8_codes"

  override protected def nullSafeEval(a: Any): Any =
    Int8Exprs.codes(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.functions.expressions.Int8Exprs.codes($a)")

  override protected def withNewChildInternal(newChild: Expression): Int8CodesExpr =
    copy(child = newChild)
}

/** Shared shape of the two query-scoring expressions: the quantized
  * query rides in the expression (IndexedSeq for value equality — an
  * Array field would break canonicalization; see NearestCellExpr),
  * referenced from generated code through a class-level field.
  */
abstract class Int8QueryScoreExpr extends UnaryExpression {
  def qCodes: IndexedSeq[Byte]

  @transient protected lazy val qArr: Array[Byte] = qCodes.toArray

  override def dataType: DataType = DoubleType

  protected def elemType: DataType
  protected def staticMethod: String

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(t, _) if t == elemType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires ARRAY<${elemType.catalogString}>, got ${t.catalogString}")
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val qRef = ctx.addReferenceObj("int8q", qArr, "byte[]")
    defineCodeGen(ctx, ev, a =>
      s"graft.functions.expressions.Int8Exprs.$staticMethod($a, $qRef)")
  }
}

/** `int8_dot(codes, weights)` — Σ codes[i]·weights[i], exact longs.
  * The weight vector rides in the expression as an IndexedSeq (value
  * equality for canonicalization, the [[Int8QueryScoreExpr]] rule) and
  * reaches generated code as one referenced `long[]`.
  */
case class Int8DotExpr(child: Expression, weights: IndexedSeq[Long])
    extends UnaryExpression {

  @transient private lazy val wArr: Array[Long] = weights.toArray

  override def prettyName: String = "int8_dot"
  override def dataType: DataType = org.apache.spark.sql.types.LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(ByteType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires ARRAY<TINYINT>, got ${t.catalogString}")
  }

  override protected def nullSafeEval(a: Any): Any =
    Int8Exprs.dotCodes(a.asInstanceOf[ArrayData], wArr)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val wRef = ctx.addReferenceObj("int8w", wArr, "long[]")
    defineCodeGen(ctx, ev, a =>
      s"graft.functions.expressions.Int8Exprs.dotCodes($a, $wRef)")
  }

  override protected def withNewChildInternal(newChild: Expression): Int8DotExpr =
    copy(child = newChild)
}

case class Int8CosExpr(child: Expression, qCodes: IndexedSeq[Byte])
    extends Int8QueryScoreExpr {
  override def prettyName: String = "int8_cos"
  override protected def elemType: DataType = FloatType
  override protected def staticMethod: String = "cosFused"
  override protected def nullSafeEval(a: Any): Any =
    Int8Exprs.cosFused(a.asInstanceOf[ArrayData], qArr)
  override protected def withNewChildInternal(newChild: Expression): Int8CosExpr =
    copy(child = newChild)
}

case class Int8CosCodesExpr(child: Expression, qCodes: IndexedSeq[Byte])
    extends Int8QueryScoreExpr {
  override def prettyName: String = "int8_cos_codes"
  override protected def elemType: DataType = ByteType
  override protected def staticMethod: String = "cosCodes"
  override protected def nullSafeEval(a: Any): Any =
    Int8Exprs.cosCodes(a.asInstanceOf[ArrayData], qArr)
  override protected def withNewChildInternal(newChild: Expression): Int8CosCodesExpr =
    copy(child = newChild)
}
