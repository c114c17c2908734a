package graft.functions.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, LongType}

/** Native SRP (signed-random-projection) band-bucket sketch over an
  * `ARRAY<FLOAT>` embedding: for each of `nBands` bands, projects the
  * vector onto `rowsPerBand` Rademacher hyperplanes and packs the signs
  * into a long bucket key — the candidate-generation kernel of
  * `Similarity.srpNearDup`.
  *
  * The ±1 hyperplane matrix is precomputed driver-side (md5-derived, so
  * the DuckDB oracle rebuilds it bit-identically) and rides the plan as
  * a flat `double[]` reference object — `rowsPerBand·nBands·dim`
  * doubles, a few KB, shipped once per executor with the generated
  * class, not per row.
  *
  * Same preference-ladder argument as [[DotProductFloat]]: the scan-side
  * sketch was the last per-row closure UDF on the similarity hot path —
  * this expression reads the columnar `ArrayData` in place inside the
  * fused stage (no per-row array conversion, no codegen break).
  * Arithmetic (ascending-index double fold per plane, `d >= 0` sets bit
  * k) is bit-identical to the UDF it replaces, so q56's oracle is
  * unchanged.
  */
case class SrpBandBucketsExpr(
    child: Expression,
    // IndexedSeq, not Array: case-class equality on an Array field is by
    // reference, which would defeat canonicalization / common-subexpression
    // elimination for structurally identical sketches
    signs: IndexedSeq[Double],
    nBands: Int,
    rowsPerBand: Int,
    dim: Int)
    extends UnaryExpression {

  @transient private lazy val signsArr: Array[Double] = signs.toArray

  // Plan transforms / canonicalization compare expressions repeatedly, and
  // the signs matrix is nBands·rowsPerBand·dim doubles (easily 10k+): the
  // cached 128-bit content digest is computed ONCE lazily, and equality
  // compares digests only — O(1) per comparison, never an element-wise
  // walk (see ContentDigest for why digest equality IS content equality
  // for planning purposes; structurally equal sketches still unify for
  // CSE because equal content ⇒ equal digest).
  @transient private lazy val signsDigest: (Long, Long) = ContentDigest.of(signsArr)

  override def hashCode(): Int =
    java.util.Objects.hash(child, Integer.valueOf(nBands),
      Integer.valueOf(rowsPerBand), Integer.valueOf(dim),
      java.lang.Long.valueOf(signsDigest._1))

  override def equals(obj: Any): Boolean = obj match {
    case o: SrpBandBucketsExpr =>
      (this eq o) || (nBands == o.nBands && rowsPerBand == o.rowsPerBand && dim == o.dim &&
        signsDigest == o.signsDigest && child == o.child)
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (nBands < 1 || rowsPerBand < 1 || rowsPerBand > 62)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName needs nBands >= 1 and 1 <= rowsPerBand <= 62, got ($nBands, $rowsPerBand)")
    else if (signs.length != nBands * rowsPerBand * dim)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName signs length ${signs.length} != nBands*rowsPerBand*dim = " +
          s"${nBands * rowsPerBand * dim}")
    else child.dataType match {
      case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires ARRAY<FLOAT>, got ${other.catalogString}")
    }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "srp_band_buckets"

  override protected def nullSafeEval(input: Any): Any =
    SrpBandBucketsExpr.compute(
      input.asInstanceOf[ArrayData], signsArr, nBands, rowsPerBand, dim)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val sref = ctx.addReferenceObj("srpSigns", signsArr, "double[]")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.expressions.SrpBandBucketsExpr.compute(" +
        s"$c, $sref, $nBands, $rowsPerBand, $dim)")
  }

  override protected def withNewChildInternal(newChild: Expression): SrpBandBucketsExpr =
    copy(child = newChild)
}

object SrpBandBucketsExpr {

  /** Called from generated code — must stay a simple static-style method.
    * Plane p's signs live at `signs[p*dim ..< p*dim+dim]`; vectors longer
    * than `dim` are truncated (callers verify with full vectors).
    */
  def compute(
      vec: ArrayData,
      signs: Array[Double],
      nBands: Int,
      rowsPerBand: Int,
      dim: Int): ArrayData = {
    val out = new Array[Long](nBands)
    val n = math.min(vec.numElements(), dim)
    var b = 0
    while (b < nBands) {
      var bucket = 0L
      var k = 0
      while (k < rowsPerBand) {
        val base = (b * rowsPerBand + k) * dim
        var d = 0.0
        var i = 0
        while (i < n) { d += vec.getFloat(i).toDouble * signs(base + i); i += 1 }
        if (d >= 0) bucket |= 1L << k
        k += 1
      }
      out(b) = bucket
      b += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  def srpBandBuckets(
      c: Column,
      signs: Array[Double],
      nBands: Int,
      rowsPerBand: Int,
      dim: Int): Column =
    // clone before wrapping: unsafeWrapArray would alias the caller's
    // mutable array, so post-hoc mutation would silently change the
    // expression's semantics (and its cached content hash)
    Bridge.column(SrpBandBucketsExpr(
      Bridge.expression(c),
      scala.collection.immutable.ArraySeq.unsafeWrapArray(signs.clone()),
      nBands, rowsPerBand, dim))
}
