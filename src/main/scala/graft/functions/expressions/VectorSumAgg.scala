package graft.functions.expressions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._

/** Element-wise vector-sum buffer in fixed-point MICROS: `sums(j)` is
  * the BIGINT sum of `round(v_j · 1e6)` over the vectors seen, `n` the
  * vector count. Integer accumulation is order-independent, so partial
  * aggregation, shuffle-merge order, and thread scheduling cannot
  * change any result — the property a cross-row DOUBLE vector sum can
  * never have.
  */
final class VectorSumBuffer {
  var n: Long = 0L
  var sums: Array[Long] = null

  /** Half-away-from-zero micro rounding — matches both engines' `round`
    * (Spark's HALF_UP BigDecimal, DuckDB's C `round`), unlike
    * `Math.round`'s toward-positive-infinity ties. Computed by exact
    * truncate-and-compare rather than `±0.5`-then-truncate: for
    * |s| < 2^52 the fraction `s - trunc(s)` is an EXACT double, so the
    * half-way comparison cannot be perturbed by the addition rounding
    * that `(s + 0.5).toLong` admits near tie boundaries.
    */
  @inline def micro(v: Double): Long = {
    val s = v * 1e6
    val t = s.toLong
    val frac = s - t.toDouble
    if (frac >= 0.5) t + 1L
    else if (frac <= -0.5) t - 1L
    else t
  }

  def update(vec: ArrayData): Unit = {
    val d = vec.numElements()
    if (sums == null) sums = new Array[Long](d)
    require(d == sums.length,
      s"vector_micro_sum: ragged input (dim $d vs ${sums.length})")
    var j = 0
    while (j < d) {
      // fail loud like the ragged case: ArrayData.getFloat reads a null
      // slot as 0.0f, which would silently fold bad data into the sum
      // (and diverge from a NULL-propagating SQL oracle)
      require(!vec.isNullAt(j), s"vector_micro_sum: null element at index $j")
      sums(j) += micro(vec.getFloat(j).toDouble); j += 1
    }
    n += 1L
  }

  def merge(other: VectorSumBuffer): Unit = {
    if (other.sums != null) {
      if (sums == null) sums = new Array[Long](other.sums.length)
      require(other.sums.length == sums.length,
        s"vector_micro_sum: ragged merge (dim ${other.sums.length} vs ${sums.length})")
      var j = 0
      while (j < sums.length) { sums(j) += other.sums(j); j += 1 }
    }
    n += other.n
  }
}

/** Group-wise element-wise vector sum as a native
  * `TypedImperativeAggregate` — the chunk→document embedding roll-up
  * (mean-pool chunk embeddings into one doc vector, centroid per
  * cluster/source, per-group embedding drift): `(n, micro-sum array)`
  * per group, mean derived outside as `micro_j / n / 1e6`.
  *
  * Why an aggregate and not `posexplode → groupBy(group, dim)`: the
  * buffer partial-aggregates map-side like any aggregate, so ONE
  * `(count, dim longs)` buffer per group per partition crosses the
  * shuffle instead of `rows × dim` exploded element rows — at 100 TB
  * with dim 1024 that is three orders of magnitude less exchange
  * volume, and the accumulator is integer micros, so the result is
  * bit-identical under any partitioning (a distributed DOUBLE mean
  * is neither).
  *
  * Null vectors are skipped (they contribute to neither `n` nor the
  * sums); ragged dimensions fail loud.
  */
case class VectorSumAgg(
    child: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[VectorSumBuffer] with UnaryLike[Expression] {

  override def createAggregationBuffer(): VectorSumBuffer = new VectorSumBuffer

  override def update(buf: VectorSumBuffer, input: InternalRow): VectorSumBuffer = {
    val v = child.eval(input)
    if (v != null) buf.update(v.asInstanceOf[ArrayData])
    buf
  }

  override def merge(buf: VectorSumBuffer, other: VectorSumBuffer): VectorSumBuffer = {
    buf.merge(other)
    buf
  }

  override def eval(buf: VectorSumBuffer): Any = {
    val arr =
      if (buf.sums == null) new GenericArrayData(Array.empty[Any])
      else new GenericArrayData(buf.sums.map(x => x: Any))
    InternalRow(buf.n, arr)
  }

  override def serialize(buf: VectorSumBuffer): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeLong(buf.n)
    val d = if (buf.sums == null) -1 else buf.sums.length
    out.writeInt(d)
    var j = 0
    while (j < d) { out.writeLong(buf.sums(j)); j += 1 }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): VectorSumBuffer = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buf = new VectorSumBuffer
    buf.n = in.readLong()
    val d = in.readInt()
    if (d >= 0) {
      buf.sums = new Array[Long](d)
      var j = 0
      while (j < d) { buf.sums(j) = in.readLong(); j += 1 }
    }
    buf
  }

  override def dataType: DataType = VectorSumAgg.resultType
  override def nullable: Boolean = false
  override def prettyName: String = "vector_micro_sum"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"vector_micro_sum requires ARRAY<FLOAT>, got ${other.catalogString}")
    }

  override def withNewMutableAggBufferOffset(offset: Int): VectorSumAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): VectorSumAgg =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildInternal(newChild: Expression): VectorSumAgg =
    copy(child = newChild)
}

object VectorSumAgg {

  val resultType: DataType = StructType(Seq(
    StructField("n", LongType, nullable = false),
    StructField("micro", ArrayType(LongType, containsNull = false), nullable = false)))

  /** Aggregate column: `(n, micro-sum array)` of a group's vectors in
    * fixed-point micros (order-independent integer accumulation).
    */
  def vectorMicroSum(vec: Column): Column =
    Bridge.column(VectorSumAgg(Bridge.expression(vec)).toAggregateExpression())
}
