package graft.functions.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, LongType}

/** Binary (1-bit) embedding quantization — the coarsest rung of the
  * vector storage ladder: float32 (exact) → SQ8 ([[Int8Exprs]], 4×) →
  * PQ ([[PqExprs]], ~16×) → BQ (this, 32×). Each float keeps only its
  * SIGN bit (`x > 0` → 1), packed 64 bits per BIGINT word, and
  * similarity becomes HAMMING DISTANCE — one XOR + popcount per word,
  * the cheapest candidate-generation arithmetic that exists (this is
  * the "binary quantization" tier of production vector stores, used
  * as a first-pass filter in front of an exact re-rank; cf. the SRP
  * sketch family in [[SrpBandBucketsExpr]], whose random-plane signs
  * this replaces with coordinate signs).
  * (Reference analogue: none; training-data-pipeline extension.)
  *
  * Native codegen expressions (the [[Int8Exprs]] layout):
  *
  *  - `bq_codes(vec)`: ARRAY<FLOAT> → ARRAY<BIGINT> — the persisted
  *    artifact form (dim/64 words, last word zero-padded).
  *  - `bq_hamming(vec, qWords)`: fused pack + XOR/popcount against a
  *    driver-packed query — one pass over the float array, no word
  *    array ever materialized.
  *  - `bq_hamming_codes(codes, qWords)`: the same distance over a
  *    STORED codes column (the artifact read path).
  *
  * Determinism: the sign test is strict (`x > 0`; zeros and negatives
  * map to 0), XOR/popcount is exact integer arithmetic, so the DuckDB
  * oracle reproduces every distance by counting sign mismatches
  * positionally — the packing is an encoding detail the oracle need
  * not repeat. Unequal lengths: the common prefix compares
  * positionally and tail positions on EITHER side count their set
  * bits as differences (missing = 0 bits — the [[Int8Exprs]] tail
  * rule), so fused and stored-artifact paths agree by construction.
  */
object BinaryQuantExprs {

  /** Driver-side packing twin (query vectors and the spec's local
    * reference): bit `i % 64` of word `i / 64` is set iff `v(i) > 0`.
    */
  def packLocal(v: Array[Float]): Array[Long] = {
    val words = new Array[Long]((v.length + 63) / 64)
    var i = 0
    while (i < v.length) {
      if (v(i) > 0f) words(i / 64) |= (1L << (i % 64))
      i += 1
    }
    words
  }

  /** Driver-side Hamming twin over two float vectors (packs both and
    * applies the tail rule — the spec's reference and the local check
    * for driver-held pairs).
    */
  def hammingFusedLocal(v: Array[Float], q: Array[Float]): Long = {
    val a = packLocal(v)
    val b = packLocal(q)
    var ham = 0L
    var w = 0
    val n = math.max(a.length, b.length)
    while (w < n) {
      val aw = if (w < a.length) a(w) else 0L
      val bw = if (w < b.length) b(w) else 0L
      ham += java.lang.Long.bitCount(aw ^ bw)
      w += 1
    }
    ham
  }

  /** Called from generated code. */
  def codes(a: ArrayData): ArrayData = {
    val n = a.numElements()
    val words = new Array[Long]((n + 63) / 64)
    var i = 0
    while (i < n) {
      if (a.getFloat(i) > 0f) words(i / 64) |= (1L << (i % 64))
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(words)
  }

  /** Called from generated code: fused pack + Hamming vs the packed
    * query — the doc word array never exists.
    */
  def hammingFused(a: ArrayData, q: Array[Long]): Long = {
    val n = a.numElements()
    var ham = 0L
    var w = 0
    val nWords = (n + 63) / 64
    while (w < nWords) {
      var word = 0L
      var i = w * 64
      val end = math.min(i + 64, n)
      while (i < end) {
        if (a.getFloat(i) > 0f) word |= (1L << (i % 64))
        i += 1
      }
      val qw = if (w < q.length) q(w) else 0L
      ham += java.lang.Long.bitCount(word ^ qw)
      w += 1
    }
    while (w < q.length) { ham += java.lang.Long.bitCount(q(w)); w += 1 }
    ham
  }

  /** Called from generated code: Hamming between a stored codes column
    * and the packed query.
    */
  def hammingCodes(a: ArrayData, q: Array[Long]): Long = {
    val n = a.numElements()
    var ham = 0L
    var w = 0
    while (w < n) {
      val qw = if (w < q.length) q(w) else 0L
      ham += java.lang.Long.bitCount(a.getLong(w) ^ qw)
      w += 1
    }
    while (w < q.length) { ham += java.lang.Long.bitCount(q(w)); w += 1 }
    ham
  }

  def bqCodes(c: Column): Column = Bridge.column(BqCodesExpr(Bridge.expression(c)))

  def bqHamming(c: Column, qWords: Array[Long]): Column =
    Bridge.column(BqHammingExpr(Bridge.expression(c), qWords.toIndexedSeq))

  def bqHammingCodes(c: Column, qWords: Array[Long]): Column =
    Bridge.column(BqHammingCodesExpr(Bridge.expression(c), qWords.toIndexedSeq))
}

case class BqCodesExpr(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"bq_codes requires ARRAY<FLOAT>, got ${t.catalogString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "bq_codes"

  override protected def nullSafeEval(a: Any): Any =
    BinaryQuantExprs.codes(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.functions.expressions.BinaryQuantExprs.codes($a)")

  override protected def withNewChildInternal(newChild: Expression): BqCodesExpr =
    copy(child = newChild)
}

/** Shared shape of the two Hamming expressions: the packed query rides
  * in the expression (IndexedSeq for value equality — the
  * [[Int8QueryScoreExpr]] canonicalization rule) and reaches generated
  * code as one referenced `long[]`.
  */
abstract class BqHammingBase extends UnaryExpression {
  def qWords: IndexedSeq[Long]

  @transient protected lazy val qArr: Array[Long] = qWords.toArray

  override def dataType: DataType = LongType

  protected def elemType: DataType
  protected def staticMethod: String

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(t, _) if t == elemType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires ARRAY<${elemType.catalogString}>, got ${t.catalogString}")
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val qRef = ctx.addReferenceObj("bqq", qArr, "long[]")
    defineCodeGen(ctx, ev, a =>
      s"graft.functions.expressions.BinaryQuantExprs.$staticMethod($a, $qRef)")
  }
}

case class BqHammingExpr(child: Expression, qWords: IndexedSeq[Long])
    extends BqHammingBase {
  override def prettyName: String = "bq_hamming"
  override protected def elemType: DataType = FloatType
  override protected def staticMethod: String = "hammingFused"
  override protected def nullSafeEval(a: Any): Any =
    BinaryQuantExprs.hammingFused(a.asInstanceOf[ArrayData], qArr)
  override protected def withNewChildInternal(newChild: Expression): BqHammingExpr =
    copy(child = newChild)
}

case class BqHammingCodesExpr(child: Expression, qWords: IndexedSeq[Long])
    extends BqHammingBase {
  override def prettyName: String = "bq_hamming_codes"
  override protected def elemType: DataType = LongType
  override protected def staticMethod: String = "hammingCodes"
  override protected def nullSafeEval(a: Any): Any =
    BinaryQuantExprs.hammingCodes(a.asInstanceOf[ArrayData], qArr)
  override protected def withNewChildInternal(newChild: Expression): BqHammingCodesExpr =
    copy(child = newChild)
}
