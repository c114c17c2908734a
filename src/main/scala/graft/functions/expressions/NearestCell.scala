package graft.functions.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, IntegerType}

/** Native nearest-centroid assignment over an `ARRAY<FLOAT>` embedding:
  * the index of the squared-euclidean-closest centroid, ties to the
  * lowest index — the scan-side cell assignment of
  * `Similarity.semanticDedup` / `incrementalSemanticDedup`.
  *
  * The centroid matrix is precomputed driver-side (sample-trained
  * Lloyd) and rides the plan as a flat `double[]` reference object —
  * `k·dim` doubles shipped once per executor with the generated class,
  * not per row. Same preference-ladder argument as [[SrpBandBucketsExpr]]:
  * the assignment was the last per-row closure UDF on the
  * embedding-dedup scan path; this expression reads the columnar
  * `ArrayData` in place inside the fused stage (no per-row array
  * conversion, no codegen break). Arithmetic (per-cell ascending-index
  * squared-distance double fold, strict `<` improvement) is
  * bit-identical to the UDF it replaces, so q78/q80's oracles are
  * unchanged.
  *
  * Null vector ELEMENTS (parquet arrays analyze as `containsNull =
  * true` even when no element is null): `ArrayData.getFloat` on a null
  * slot yields 0.0f on BOTH eval paths (`UnsafeArrayData` reads the
  * zeroed slot; `GenericArrayData` unboxes null to 0.0f), so a null
  * element deterministically behaves as 0.0 — pinned by spec. The
  * closure UDF this replaced would instead have thrown on conversion;
  * treating nulls as zeros is the deliberate, documented semantics for
  * the whole vector-kernel family ([[DotProductFloat]], [[Norm2Float]],
  * [[SrpBandBucketsExpr]], the PQ kernels).
  */
case class NearestCellExpr(
    child: Expression,
    // IndexedSeq, not Array: case-class equality on an Array field is by
    // reference, which would defeat canonicalization / CSE
    centroids: IndexedSeq[Double],
    k: Int,
    dim: Int)
    extends UnaryExpression {

  @transient private lazy val centroidsArr: Array[Double] = centroids.toArray

  // plan transforms compare expressions repeatedly; equality compares
  // the cached 128-bit content digest only — O(1) per comparison, never
  // an element-wise walk (same scheme as SrpBandBucketsExpr; see
  // ContentDigest for the collision argument)
  @transient private lazy val centroidsDigest: (Long, Long) = ContentDigest.of(centroidsArr)

  override def hashCode(): Int =
    java.util.Objects.hash(child, Integer.valueOf(k), Integer.valueOf(dim),
      java.lang.Long.valueOf(centroidsDigest._1))

  override def equals(obj: Any): Boolean = obj match {
    case o: NearestCellExpr =>
      (this eq o) || (k == o.k && dim == o.dim &&
        centroidsDigest == o.centroidsDigest && child == o.child)
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (k < 1 || dim < 1)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName needs k >= 1 and dim >= 1, got ($k, $dim)")
    else if (centroids.length != k * dim)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName centroids length ${centroids.length} != k*dim = ${k * dim}")
    else child.dataType match {
      case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires ARRAY<FLOAT>, got ${other.catalogString}")
    }

  override def dataType: DataType = IntegerType
  override def prettyName: String = "nearest_cell"

  override protected def nullSafeEval(input: Any): Any =
    NearestCellExpr.compute(input.asInstanceOf[ArrayData], centroidsArr, k, dim)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cref = ctx.addReferenceObj("cellCentroids", centroidsArr, "double[]")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.expressions.NearestCellExpr.compute($c, $cref, $k, $dim)")
  }

  override protected def withNewChildInternal(newChild: Expression): NearestCellExpr =
    copy(child = newChild)
}

object NearestCellExpr {

  /** Called from generated code — must stay a simple static-style method.
    * Centroid c lives at `centroids[c*dim ..< c*dim+dim]`; vectors longer
    * than `dim` are truncated, shorter ones compared on their prefix —
    * identical to the UDF this replaces.
    */
  def compute(vec: ArrayData, centroids: Array[Double], k: Int, dim: Int): Int = {
    val n = math.min(vec.numElements(), dim)
    var best = 0
    var bd = Double.MaxValue
    var c = 0
    while (c < k) {
      val base = c * dim
      var s = 0.0
      var i = 0
      while (i < n) {
        val d = vec.getFloat(i).toDouble - centroids(base + i)
        s += d * d
        i += 1
      }
      if (s < bd) { bd = s; best = c }
      c += 1
    }
    best
  }

  def nearestCell(c: Column, centroids: Array[Array[Double]]): Column = {
    val k = centroids.length
    val dim = centroids.head.length
    val flat = new Array[Double](k * dim)
    var i = 0
    while (i < k) {
      require(centroids(i).length == dim, "ragged centroid matrix")
      System.arraycopy(centroids(i), 0, flat, i * dim, dim)
      i += 1
    }
    Bridge.column(NearestCellExpr(
      Bridge.expression(c),
      scala.collection.immutable.ArraySeq.unsafeWrapArray(flat), // flat is private here
      k, dim))
  }
}

/** Native top-`p` nearest-centroid routing over an `ARRAY<FLOAT>`
  * embedding: the indices of the `p` squared-euclidean-closest
  * centroids, ascending by distance, distance ties to the lowest cell
  * index — the DISTRIBUTED twin of `Similarity.nearestCentroids`
  * (driver-side stable `sortBy(dist).take(n)`), for query sets too
  * large to route on the driver.
  *
  * `p = 1` reduces to `[nearest_cell(vec)]` — pinned by spec, since the
  * kNN-join probe side and the dedup assignment side must agree on cell
  * 0's membership. Selection keeps a size-`p` insertion-sorted buffer
  * with strict `<` comparisons while scanning cells in ascending index
  * order, which reproduces the stable-sort tie behavior exactly.
  *
  * Same centroid-matrix plumbing, digest equality and null-element
  * (read-as-0.0) contract as [[NearestCellExpr]].
  */
case class NearestCellsExpr(
    child: Expression,
    centroids: IndexedSeq[Double],
    k: Int,
    dim: Int,
    p: Int)
    extends UnaryExpression {

  @transient private lazy val centroidsArr: Array[Double] = centroids.toArray

  @transient private lazy val centroidsDigest: (Long, Long) = ContentDigest.of(centroidsArr)

  override def hashCode(): Int =
    java.util.Objects.hash(child, Integer.valueOf(k), Integer.valueOf(dim),
      Integer.valueOf(p), java.lang.Long.valueOf(centroidsDigest._1))

  override def equals(obj: Any): Boolean = obj match {
    case o: NearestCellsExpr =>
      (this eq o) || (k == o.k && dim == o.dim && p == o.p &&
        centroidsDigest == o.centroidsDigest && child == o.child)
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (k < 1 || dim < 1)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName needs k >= 1 and dim >= 1, got ($k, $dim)")
    else if (p < 1 || p > k)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName needs 1 <= p <= k, got p=$p with k=$k")
    else if (centroids.length != k * dim)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName centroids length ${centroids.length} != k*dim = ${k * dim}")
    else child.dataType match {
      case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires ARRAY<FLOAT>, got ${other.catalogString}")
    }

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "nearest_cells"

  override protected def nullSafeEval(input: Any): Any =
    NearestCellsExpr.compute(
      input.asInstanceOf[ArrayData], centroidsArr, k, dim, p)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cref = ctx.addReferenceObj("cellCentroids", centroidsArr, "double[]")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.expressions.NearestCellsExpr.compute($c, $cref, $k, $dim, $p)")
  }

  override protected def withNewChildInternal(newChild: Expression): NearestCellsExpr =
    copy(child = newChild)
}

object NearestCellsExpr {

  /** Called from generated code — must stay a simple static-style
    * method. Per-cell distance arithmetic is [[NearestCellExpr.compute]]'s
    * exact fold (prefix over `min(vec.length, dim)` elements), so the
    * head of the returned array always equals `nearest_cell(vec)`.
    */
  def compute(
      vec: ArrayData,
      centroids: Array[Double],
      k: Int,
      dim: Int,
      p: Int): ArrayData = {
    val n = math.min(vec.numElements(), dim)
    val bestD = new Array[Double](p)
    val bestI = new Array[Int](p)
    var filled = 0
    var c = 0
    while (c < k) {
      val base = c * dim
      var s = 0.0
      var i = 0
      while (i < n) {
        val d = vec.getFloat(i).toDouble - centroids(base + i)
        s += d * d
        i += 1
      }
      if (filled < p || s < bestD(filled - 1)) {
        // insertion point: first j with s < bestD(j); strict `<` keeps
        // earlier (lower-index) cells ahead on exact distance ties
        var j = math.min(filled, p - 1)
        while (j > 0 && s < bestD(j - 1)) {
          bestD(j) = bestD(j - 1); bestI(j) = bestI(j - 1); j -= 1
        }
        bestD(j) = s
        bestI(j) = c
        if (filled < p) filled += 1
      }
      c += 1
    }
    val out = new Array[Int](filled)
    System.arraycopy(bestI, 0, out, 0, filled)
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  def nearestCells(c: Column, centroids: Array[Array[Double]], p: Int): Column = {
    val k = centroids.length
    val dim = centroids.head.length
    val flat = new Array[Double](k * dim)
    var i = 0
    while (i < k) {
      require(centroids(i).length == dim, "ragged centroid matrix")
      System.arraycopy(centroids(i), 0, flat, i * dim, dim)
      i += 1
    }
    Bridge.column(NearestCellsExpr(
      Bridge.expression(c),
      scala.collection.immutable.ArraySeq.unsafeWrapArray(flat),
      k, dim, p))
  }
}
