package graft.functions.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native scan kernel for content-defined chunking
  * ([[graft.operators.Cdc]]): `cdc_chunk_hashes(text, window, divisor)`
  * → the per-chunk 60-bit md5 fingerprints, boundaries cut wherever the
  * trailing `window`-char md5-60 hash ≡ 0 (mod `divisor`).
  *
  * Why an `Expression` and not the higher-order-function chain it
  * replaces: HOF lambdas evaluate INTERPRETED (no whole-stage codegen),
  * and because the boundary array is referenced from inside the
  * chunk-transform lambda, the interpreted evaluator re-derives the
  * whole cut-position filter — one md5 per character position — once
  * PER CHUNK: an O(len · chunks) md5 blow-up that measured ~40 ms/doc
  * on 300-char fixture rows. This kernel is the one-pass O(len)
  * definition — one digest per position plus one per chunk, a reused
  * `MessageDigest`, byte-offset slices of the raw UTF-8 buffer (no
  * per-position substring allocation) — and it participates in
  * WholeStageCodegen via a static call, like every other scan kernel in
  * this package (rung (b) of the custom-operator ladder).
  *
  * Semantics are bit-identical to the composed form
  * (`Cdc.chunkHashesComposed`, parity spec-pinned) and to the DuckDB
  * oracle: positions/lengths are CODE POINTS (Spark `length`/`substr`
  * and DuckDB `substr` semantics), hashes are md5 over the slice's
  * UTF-8 bytes, null text → SQL NULL, payloads shorter than the window
  * → the whole payload as one chunk, a cut at the very end produces no
  * empty tail chunk.
  */
case class CdcChunkHashesExpr(child: Expression, window: Int, divisor: Int)
    extends UnaryExpression {

  // analysis-time validation, NOT a constructor require: a constructor
  // check would run during java deserialization on executors before the
  // subclass fields are populated and kill the task
  override def checkInputDataTypes(): TypeCheckResult =
    if (window < 1 || divisor < 1) TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs window/divisor >= 1, got $window/$divisor")
    else if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${child.dataType.catalogString}")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "cdc_chunk_hashes"

  override protected def nullSafeEval(input: Any): Any =
    CdcChunkHashesExpr.compute(input.asInstanceOf[UTF8String], window, divisor)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.expressions.CdcChunkHashesExpr.compute($c, $window, $divisor)")

  override protected def withNewChildInternal(newChild: Expression): CdcChunkHashesExpr =
    copy(child = newChild)
}

object CdcChunkHashesExpr {

  private val digests = ThreadLocal.withInitial[java.security.MessageDigest](() =>
    java.security.MessageDigest.getInstance("MD5"))
  private val outBuf = ThreadLocal.withInitial[Array[Byte]](() => new Array[Byte](16))

  /** Called from generated code — must stay a simple static-style method. */
  def compute(text: UTF8String, window: Int, divisor: Int): ArrayData = {
    val bytes = text.getBytes
    // code-point starts: offs(i) = byte offset where the i-th character
    // begins, offs(nChars) = bytes.length (ASCII ⇒ identity, one walk)
    val offs = new Array[Int](bytes.length + 1)
    var nChars = 0
    var b = 0
    while (b < bytes.length) {
      offs(nChars) = b
      b += UTF8String.numBytesForFirstByte(bytes(b))
      nChars += 1
    }
    offs(nChars) = bytes.length

    val md = digests.get()
    val out16 = outBuf.get()
    def hash60(fromChar: Int, untilChar: Int): Long = {
      md.reset()
      md.update(bytes, offs(fromChar), offs(untilChar) - offs(fromChar))
      md.digest(out16, 0, 16)
      graft.functions.TextFunctions.pack60(out16)
    }

    // one pass over the positions: emit a chunk the moment a boundary
    // closes it (cuts are strictly increasing, so no boundary array)
    var chunks = new Array[Long](math.max(4, nChars / math.max(1, divisor) + 2))
    var nOut = 0
    def emit(h: Long): Unit = {
      if (nOut == chunks.length) chunks = java.util.Arrays.copyOf(chunks, chunks.length * 2)
      chunks(nOut) = h
      nOut += 1
    }
    var prev = 0
    var i = window
    while (i <= nChars) {
      if (hash60(i - window, i) % divisor == 0) {
        if (i > prev) emit(hash60(prev, i))
        prev = i
      }
      i += 1
    }
    if (nChars > prev) emit(hash60(prev, nChars))
    UnsafeArrayData.fromPrimitiveArray(
      if (nOut == chunks.length) chunks else java.util.Arrays.copyOf(chunks, nOut))
  }

  def cdcChunkHashes(c: Column, window: Int, divisor: Int): Column =
    Bridge.column(CdcChunkHashesExpr(Bridge.expression(c), window, divisor))
}
