package graft.functions.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, DoubleType, FloatType}

/** Native product-quantization scan kernels — twins of the closure UDFs
  * they replace in `Similarity.pqEncode` / `Similarity.pqTopK`:
  *
  *  - [[PqEncodeExpr]] — vector → `m` one-byte nearest-centroid codes
  *    (the WHOLE-CORPUS encode pass a 100 TB PQ deployment runs once
  *    per ingest — exactly the scan whose UDF boundary tax matters);
  *  - [[PqAdcScoreExpr]] — byte codes → asymmetric-distance score via
  *    the query's `m × nCodes` lookup table (the query-time scan over
  *    the code table).
  *
  * Same preference-ladder argument as [[SrpBandBucketsExpr]]: the
  * codebooks/LUT are precomputed driver-side and ride the generated
  * class as flat reference arrays (shipped once per executor, not per
  * row), and the kernels read the columnar data in place inside the
  * fused stage. Arithmetic (ascending-index double folds, strict `<`
  * improvement) is bit-identical to the UDFs, so q79's oracle is
  * unchanged.
  *
  * Codebook layout: subspace `s` holds `(offsets(s+1)-offsets(s))/subDim`
  * centroids (per-subspace counts may differ when Lloyd training
  * degenerates), centroid `c` of subspace `s` at
  * `flat[offsets(s) + c·subDim ..< +subDim]`. Null-element caveat
  * (shared with [[NearestCellExpr]]): `ArrayData.getFloat` on a null
  * slot yields 0.0f on both eval paths — null vector elements behave
  * as zeros, deterministically.
  */
case class PqEncodeExpr(
    child: Expression,
    // IndexedSeq, not Array: case-class field equality on an Array is by
    // reference; real equality is via the cached content digest below
    flat: IndexedSeq[Double],
    offsets: IndexedSeq[Int],
    subDim: Int)
    extends UnaryExpression {

  @transient private lazy val flatArr: Array[Double] = flat.toArray
  @transient private lazy val offArr: Array[Int] = offsets.toArray
  @transient private lazy val flatDigest: (Long, Long) = ContentDigest.of(flatArr)

  override def hashCode(): Int =
    java.util.Objects.hash(child, offsets, Integer.valueOf(subDim),
      java.lang.Long.valueOf(flatDigest._1))

  override def equals(obj: Any): Boolean = obj match {
    case o: PqEncodeExpr =>
      (this eq o) || (subDim == o.subDim && offsets == o.offsets &&
        flatDigest == o.flatDigest && child == o.child)
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (subDim < 1 || offsets.length < 2 || offsets.head != 0 ||
      offsets.last != flat.length ||
      offsets.sliding(2).exists(w => w(1) <= w(0) || (w(1) - w(0)) % subDim != 0 ||
        (w(1) - w(0)) / subDim > 256))
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName malformed codebook layout (offsets=$offsets, " +
          s"flat=${flat.length} doubles, subDim=$subDim)")
    else child.dataType match {
      case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires ARRAY<FLOAT>, got ${other.catalogString}")
    }

  override def dataType: DataType = BinaryType
  override def prettyName: String = "pq_encode"

  override protected def nullSafeEval(input: Any): Any =
    PqEncodeExpr.compute(input.asInstanceOf[ArrayData], flatArr, offArr, subDim)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val fref = ctx.addReferenceObj("pqCodebooks", flatArr, "double[]")
    val oref = ctx.addReferenceObj("pqOffsets", offArr, "int[]")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.expressions.PqEncodeExpr.compute($c, $fref, $oref, $subDim)")
  }

  override protected def withNewChildInternal(newChild: Expression): PqEncodeExpr =
    copy(child = newChild)
}

object PqEncodeExpr {

  /** Called from generated code — must stay a simple static-style method.
    * Per-subspace nearest centroid (squared euclidean, ascending-index
    * fold, strict `<` improvement — ties to the lowest code), identical
    * to the UDF twin.
    */
  def compute(
      vec: ArrayData,
      flat: Array[Double],
      offsets: Array[Int],
      subDim: Int): Array[Byte] = {
    val m = offsets.length - 1
    // fail loud on malformed (too-short) vectors: UnsafeArrayData.getFloat
    // past numElements() reads silent garbage, so a truncated corpus row
    // would otherwise encode to garbage codes instead of erroring
    if (vec.numElements() < m * subDim)
      throw new IllegalArgumentException(
        s"pq_encode: vector has ${vec.numElements()} elements, " +
          s"codebook expects >= ${m * subDim} (m=$m, subDim=$subDim)")
    val out = new Array[Byte](m)
    var s = 0
    while (s < m) {
      val vOff = s * subDim
      var best = 0
      var bd = Double.MaxValue
      var cbase = offsets(s)
      var c = 0
      while (cbase < offsets(s + 1)) {
        var d2 = 0.0
        var j = 0
        while (j < subDim) {
          val d = vec.getFloat(vOff + j).toDouble - flat(cbase + j)
          d2 += d * d
          j += 1
        }
        if (d2 < bd) { bd = d2; best = c }
        cbase += subDim
        c += 1
      }
      out(s) = best.toByte
      s += 1
    }
    out
  }

  /** Flattens `codebooks(s)(c)(j)` into the expression's layout. */
  def pqEncode(c: Column, codebooks: Array[Array[Array[Double]]]): Column = {
    require(codebooks.nonEmpty && codebooks.head.nonEmpty, "empty codebooks")
    val subDim = codebooks.head.head.length
    val offsets = codebooks.scanLeft(0)((acc, cb) => acc + cb.length * subDim)
    val flat = new Array[Double](offsets.last)
    var s = 0
    while (s < codebooks.length) {
      var cdx = 0
      while (cdx < codebooks(s).length) {
        require(codebooks(s)(cdx).length == subDim, "ragged codebook")
        System.arraycopy(codebooks(s)(cdx), 0, flat, offsets(s) + cdx * subDim, subDim)
        cdx += 1
      }
      s += 1
    }
    Bridge.column(PqEncodeExpr(
      Bridge.expression(c),
      scala.collection.immutable.ArraySeq.unsafeWrapArray(flat),
      scala.collection.immutable.ArraySeq.unsafeWrapArray(offsets),
      subDim))
  }
}

/** `pq_adc_score(code)` — asymmetric-distance score: `m` LUT lookups +
  * adds per row, the query-time scan kernel over the PQ code table.
  * LUT layout: subspace `s`'s centroid contributions at
  * `lut[offsets(s) ..< offsets(s+1)]`.
  */
case class PqAdcScoreExpr(
    child: Expression,
    lut: IndexedSeq[Double],
    offsets: IndexedSeq[Int])
    extends UnaryExpression {

  @transient private lazy val lutArr: Array[Double] = lut.toArray
  @transient private lazy val offArr: Array[Int] = offsets.toArray
  @transient private lazy val lutDigest: (Long, Long) = ContentDigest.of(lutArr)

  override def hashCode(): Int =
    java.util.Objects.hash(child, offsets, java.lang.Long.valueOf(lutDigest._1))

  override def equals(obj: Any): Boolean = obj match {
    case o: PqAdcScoreExpr =>
      (this eq o) || (offsets == o.offsets && lutDigest == o.lutDigest && child == o.child)
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (offsets.length < 2 || offsets.head != 0 || offsets.last != lut.length ||
      offsets.sliding(2).exists(w => w(1) <= w(0) || w(1) - w(0) > 256))
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName malformed LUT layout (offsets=$offsets, lut=${lut.length})")
    else if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires BINARY codes, got ${child.dataType.catalogString}")

  override def dataType: DataType = DoubleType
  override def prettyName: String = "pq_adc_score"

  override protected def nullSafeEval(input: Any): Any =
    PqAdcScoreExpr.compute(input.asInstanceOf[Array[Byte]], lutArr, offArr)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val lref = ctx.addReferenceObj("pqLut", lutArr, "double[]")
    val oref = ctx.addReferenceObj("pqLutOffsets", offArr, "int[]")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.expressions.PqAdcScoreExpr.compute($c, $lref, $oref)")
  }

  override protected def withNewChildInternal(newChild: Expression): PqAdcScoreExpr =
    copy(child = newChild)
}

object PqAdcScoreExpr {

  /** Called from generated code — must stay a simple static-style method. */
  def compute(code: Array[Byte], lut: Array[Double], offsets: Array[Int]): Double = {
    val m = offsets.length - 1
    var s = 0.0
    var i = 0
    while (i < m) {
      s += lut(offsets(i) + (code(i) & 0xff))
      i += 1
    }
    s
  }

  /** Flattens the per-subspace LUT `lut(s)(c)` into the expression's
    * layout.
    */
  def pqAdcScore(c: Column, lut: Array[Array[Double]]): Column = {
    require(lut.nonEmpty, "empty LUT")
    val offsets = lut.scanLeft(0)((acc, t) => acc + t.length)
    val flat = new Array[Double](offsets.last)
    var s = 0
    while (s < lut.length) {
      System.arraycopy(lut(s), 0, flat, offsets(s), lut(s).length)
      s += 1
    }
    Bridge.column(PqAdcScoreExpr(
      Bridge.expression(c),
      scala.collection.immutable.ArraySeq.unsafeWrapArray(flat),
      scala.collection.immutable.ArraySeq.unsafeWrapArray(offsets)))
  }
}
