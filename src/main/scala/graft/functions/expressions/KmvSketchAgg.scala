package graft.functions.expressions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._

/** KMV (k-minimum-values) distinct-count sketch buffer: the k smallest
  * DISTINCT hash values seen. Inserts and merges keep the invariant
  * "sorted set of ≤ k minima"; everything downstream (the estimator,
  * union merges) derives from it.
  */
final class KmvBuffer(val k: Int) {
  val minima = new mutable.TreeSet[Long]

  def update(h: Long): Unit = {
    if (minima.size < k) {
      minima.add(h)
    } else if (h < minima.last && minima.add(h)) {
      minima.remove(minima.last)
    }
    ()
  }

  /** Union of two sketches = sketch of the union stream (exactly: the
    * k smallest of the combined distinct minima) — associative and
    * commutative, so map-side partials compose like any aggregate.
    */
  def merge(other: KmvBuffer): Unit = other.minima.foreach(update)
}

/** Per-group distinct-count sketch (`kmv_sketch(hash60, k)`) as a
  * native `TypedImperativeAggregate` — the way to count distinct items
  * per group at 100 TB WITHOUT shuffling the distinct (group, item)
  * universe: the buffer is k longs per group per partition, partials
  * aggregate map-side, and only sketches cross the shuffle. Bar-Yossef
  * et al.'s k-minimum-values estimator (public literature): for
  * uniform 60-bit hashes, `(k−1) · 2^60 / h_(k)` estimates the distinct
  * count with ~1/√k relative error; fewer than k distinct values means
  * the sketch IS the distinct set and the count is exact.
  *
  * The input is the HASH (the engine's md5-60 scheme), not the item —
  * deliberate: the DuckDB oracle reproduces every minimum bit-for-bit
  * from the same md5 arithmetic, and the caller chooses what identity
  * to count (token, fingerprint, chunk hash) with the hashing it
  * already has on the scan. Everything about the output is exact
  * integers (the sorted minima); the estimate is a downstream
  * projection ([[graft.operators.Kmv.estimateFromSketch]]), so the
  * only floating-point step is one IEEE division both engines perform
  * on identical operands.
  *
  * Unlike Count-Min (q124), a KMV sketch is NOT subtractable: an
  * evicted value is unrecoverable, so retirement means rebuild — the
  * operator doc says so, and the streaming twin keeps per-source
  * sketches in Complete mode where replacement is the semantics.
  */
case class KmvSketchAgg(
    child: Expression,
    k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[KmvBuffer] with UnaryLike[Expression] {

  override def createAggregationBuffer(): KmvBuffer = new KmvBuffer(k)

  override def update(buf: KmvBuffer, input: InternalRow): KmvBuffer = {
    val v = child.eval(input)
    if (v != null) buf.update(v.asInstanceOf[Long])
    buf
  }

  override def merge(buf: KmvBuffer, other: KmvBuffer): KmvBuffer = {
    buf.merge(other)
    buf
  }

  override def eval(buf: KmvBuffer): Any =
    UnsafeArrayData.fromPrimitiveArray(buf.minima.toArray)

  override def serialize(buf: KmvBuffer): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.minima.size)
    buf.minima.foreach(out.writeLong)
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): KmvBuffer = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buf = new KmvBuffer(k)
    val n = in.readInt()
    var i = 0
    while (i < n) { buf.minima.add(in.readLong()); i += 1 }
    buf
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "kmv_sketch"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (k < 2)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"kmv_sketch needs k >= 2, got $k")
    else if (child.dataType == LongType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"kmv_sketch requires a BIGINT hash column, got ${child.dataType.catalogString}")

  override def withNewMutableAggBufferOffset(offset: Int): KmvSketchAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): KmvSketchAgg =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildInternal(newChild: Expression): KmvSketchAgg =
    copy(child = newChild)
}

object KmvSketchAgg {

  /** Aggregate column: the sorted k smallest distinct 60-bit hashes of
    * a group — feed [[graft.operators.Kmv.estimateFromSketch]] for the
    * distinct-count estimate.
    */
  def kmvSketch(hash: Column, k: Int): Column =
    Bridge.column(KmvSketchAgg(Bridge.expression(hash), k).toAggregateExpression())
}
