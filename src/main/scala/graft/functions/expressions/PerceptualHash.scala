package graft.functions.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{BinaryType, DataType, LongType}

/** `dhash64(bytes)` — 64-bit difference hash of an opaque media
  * payload: box-downsample the byte stream to a 9×8 grid of mean
  * "pixels" (cell k averages bytes `[k·n/72, (k+1)·n/72)` — integer
  * floor bounds, empty cells are 0), then one bit per horizontal
  * gradient (`bit(r,c) = px(r,9c+…+1) > px(r,c)`, row-major bits 0–63).
  *
  * This is the dHash recipe from the perceptual-hashing literature
  * applied to a 1-D stream: with a real image decoder the grid comes
  * from luma resampling; here the stream IS the pixel source, which
  * keeps the property that matters — LOCALITY (small payload edits
  * move few window means, so near-identical payloads land at small
  * Hamming distance) — while staying bit-reproducible in DuckDB
  * integer ops (the q144 oracle re-derives grid, gradients, and hash
  * from `hex(encode(...))`). Swap [[graft.operators.Multimodal]]'s
  * decoder in front to hash real decoded luma planes; the banding and
  * verify downstream are unchanged.
  *
  * Null bytes → null hash (an item without content has no perceptual
  * identity — unlike empty bytes, which hash to 0 deterministically).
  */
case class DHash64Expr(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a binary argument, got ${child.dataType.catalogString}")

  override def dataType: DataType = LongType
  override def prettyName: String = "dhash64"

  override protected def nullSafeEval(input: Any): Any =
    DHash64Expr.dhash64(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.expressions.DHash64Expr.dhash64($c)")

  override protected def withNewChildInternal(newChild: Expression): DHash64Expr =
    copy(child = newChild)
}

object DHash64Expr {

  def dhash64Col(c: Column): Column = Bridge.column(DHash64Expr(Bridge.expression(c)))

  /** Called from generated code — must stay a simple static-style method. */
  def dhash64(bytes: Array[Byte]): Long = {
    val n = bytes.length.toLong
    val px = new Array[Long](72)
    var k = 0
    while (k < 72) {
      val s = (k * n) / 72
      val e = ((k + 1) * n) / 72
      if (e > s) {
        var sum = 0L
        var i = s
        while (i < e) {
          sum += (bytes(i.toInt) & 0xff)
          i += 1
        }
        px(k) = sum / (e - s)
      }
      k += 1
    }
    var h = 0L
    var r = 0
    while (r < 8) {
      var c = 0
      while (c < 8) {
        if (px(r * 9 + c + 1) > px(r * 9 + c)) h |= 1L << (r * 8 + c)
        c += 1
      }
      r += 1
    }
    h
  }
}
