package graft.functions.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native scan kernels for `text → word-n-gram hash sets` — the single
  * pass feeding every dedup/decontamination pipeline (SURVEY §7: on a
  * real corpus, scan-side shingle hashing dominates those queries'
  * runtime, so this is the hot loop of the whole dedup family).
  *
  * Two forms, twins of the UDFs in `TextFunctions`:
  *
  *  - [[ShingleHashSetExpr]] — sorted DISTINCT 60-bit md5 hashes (the
  *    shingle-set identity: Jaccard numerators/denominators and bloom
  *    probes run off it);
  *  - [[ShingleModHashesExpr]] — per-shingle `hash60 % MinHashPrime`,
  *    order-preserving with multiplicity (MinHash signature input).
  *
  * Why an `Expression` rather than the UDF twins they replace: a Scala
  * UDF breaks WholeStageCodegen at its boundary and pays a
  * catalyst↔Scala conversion per row; these generate a static call over
  * `UTF8String` inline in the fused stage and return an
  * `UnsafeArrayData` wrapping the primitive long array (no boxing).
  * Tokenization/hashing are byte-identical to the UDFs (see
  * [[ShingleKernel]] — the digest is fed token bytes directly, which
  * encodes to exactly the same md5 input as the UDFs' shingle strings),
  * so oracle results are unchanged; the parity spec pins this.
  *
  * Null semantics (deliberately matching the UDF twins, which receive
  * the raw `null` reference): null text behaves as empty text — it
  * yields the single hash of the empty shingle, never SQL NULL — so the
  * output is non-nullable and downstream `size(hs)` arithmetic needs no
  * null guards.
  */
abstract class ShingleHashesBase extends UnaryExpression {
  def n: Int

  // analysis-time validation, NOT a constructor require: a constructor
  // check on `n` would run during java deserialization on executors
  // before the subclass field is populated (n = 0) and kill the task
  override def checkInputDataTypes(): TypeCheckResult =
    if (n < 1) TypeCheckResult.TypeCheckFailure(
      s"$prettyName shingle width must be >= 1, got $n")
    else if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${child.dataType.catalogString}")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false

  /** Static entry point for both interpreted eval and generated code. */
  def computeName: String

  override def eval(input: InternalRow): Any = {
    val t = child.eval(input)
    evalCompute(if (t == null) null else t.asInstanceOf[UTF8String])
  }

  // NOT named `compute`: a class member named `compute` would suppress
  // the companion object's static forwarder, and the generated code's
  // static call `<class>.compute(value, n)` would fail to janino-compile
  // (silent whole-stage-codegen fallback to interpreted eval)
  protected def evalCompute(text: UTF8String): ArrayData

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    val resultCode =
      code"""
         ${c.code}
         org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} =
           $computeName(${c.isNull} ? null : ${c.value}, $n);
       """
    ev.copy(code = resultCode, isNull = FalseLiteral)
  }
}

/** `shingle_hash_set(text, n)` — sorted distinct 60-bit shingle hashes. */
case class ShingleHashSetExpr(child: Expression, n: Int) extends ShingleHashesBase {
  override def prettyName: String = "shingle_hash_set"
  override def computeName: String =
    "graft.functions.expressions.ShingleHashSetExpr.compute"
  override protected def evalCompute(text: UTF8String): ArrayData =
    ShingleHashSetExpr.compute(text, n)
  override protected def withNewChildInternal(newChild: Expression): ShingleHashSetExpr =
    copy(child = newChild)
}

/** Shared byte-level shingle-hash loop. Byte-identical to
  * `md5Hash60Local(shinglesLocal(tokensLocal(text), n))` — the shingle
  * string `toks.slice(i, i+n).mkString(" ")` UTF-8-encodes to exactly
  * the tokens' UTF-8 bytes joined by 0x20, so the digest can be fed
  * token bytes directly: no per-shingle String build, no re-encoding
  * each token n times. On hashing-dominated corpora (KB-size docs) the
  * encode/allocate traffic this removes is a constant factor on the
  * whole dedup family's scan stage.
  */
private[expressions] object ShingleKernel {
  private val ws = java.util.regex.Pattern.compile("\\s+")
  private val digests = ThreadLocal.withInitial[java.security.MessageDigest](() =>
    java.security.MessageDigest.getInstance("MD5"))
  private val outBuf = ThreadLocal.withInitial[Array[Byte]](() => new Array[Byte](16))

  // single shared definition of the 60-bit packing (drift-proof)
  private def pack60(d: Array[Byte]): Long = graft.functions.TextFunctions.pack60(d)

  /** 60-bit md5 hash per word n-gram, in shingle order (multiplicity
    * kept). `tokensLocal`'s exact tokenizer: lower-case root locale,
    * split on whitespace runs, drop empties; fewer than n tokens → the
    * single shingle of all tokens joined.
    */
  def shingleHash60s(text: String, n: Int): Array[Long] = {
    val raw = ws.split(if (text == null) "" else text.toLowerCase(java.util.Locale.ROOT))
    var nTok = 0
    var i = 0
    while (i < raw.length) { if (raw(i).nonEmpty) nTok += 1; i += 1 }
    val tb = new Array[Array[Byte]](nTok)
    i = 0
    var w = 0
    while (i < raw.length) {
      if (raw(i).nonEmpty) {
        tb(w) = raw(i).getBytes(java.nio.charset.StandardCharsets.UTF_8)
        w += 1
      }
      i += 1
    }
    val md = digests.get()
    val out16 = outBuf.get()
    def digestJoined(from: Int, until: Int): Long = {
      md.reset()
      var j = from
      while (j < until) {
        if (j > from) md.update(' '.toByte)
        md.update(tb(j))
        j += 1
      }
      md.digest(out16, 0, 16)
      pack60(out16)
    }
    if (nTok < n) Array(digestJoined(0, nTok))
    else {
      val m = nTok - n + 1
      val out = new Array[Long](m)
      var s = 0
      while (s < m) { out(s) = digestJoined(s, s + n); s += 1 }
      out
    }
  }

  /** Per-TOKEN 60-bit md5 hashes, in token order with multiplicity —
    * [[shingleHash60s]] at n=1 EXCEPT for the zero-token case: a doc
    * with no tokens yields an EMPTY array here (the bag-of-words
    * contract: no tokens, no features), not the single hash of the
    * empty string the shingle-identity convention needs.
    */
  def tokenHash60s(text: String): Array[Long] = {
    val raw = ws.split(if (text == null) "" else text.toLowerCase(java.util.Locale.ROOT))
    val md = digests.get()
    val out16 = outBuf.get()
    var nTok = 0
    var i = 0
    while (i < raw.length) { if (raw(i).nonEmpty) nTok += 1; i += 1 }
    val out = new Array[Long](nTok)
    i = 0
    var w = 0
    while (i < raw.length) {
      if (raw(i).nonEmpty) {
        md.reset()
        md.update(raw(i).getBytes(java.nio.charset.StandardCharsets.UTF_8))
        md.digest(out16, 0, 16)
        out(w) = pack60(out16)
        w += 1
      }
      i += 1
    }
    out
  }
}

object ShingleHashSetExpr {

  /** Called from generated code — must stay a simple static-style method. */
  def compute(text: UTF8String, n: Int): ArrayData = {
    val hs = ShingleKernel.shingleHash60s(if (text == null) null else text.toString, n)
    java.util.Arrays.sort(hs)
    var w = 0
    var i = 0
    while (i < hs.length) {
      if (w == 0 || hs(i) != hs(w - 1)) { hs(w) = hs(i); w += 1 }
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(
      if (w == hs.length) hs else java.util.Arrays.copyOf(hs, w))
  }

  def shingleHashSet(c: Column, n: Int): Column =
    Bridge.column(ShingleHashSetExpr(Bridge.expression(c), n))
}

/** `shingle_hash60s(text, n)` — raw 60-bit shingle hashes in shingle
  * order, multiplicity kept (no sort, no dedup, no mod): the
  * position-indexed gram stream that duplicate-SPAN detection
  * ([[graft.operators.Dedup.duplicateSpans]]) `posexplode`s, where the
  * array index IS the gram's token start position.
  */
case class ShingleHash60sExpr(child: Expression, n: Int) extends ShingleHashesBase {
  override def prettyName: String = "shingle_hash60s"
  override def computeName: String =
    "graft.functions.expressions.ShingleHash60sExpr.compute"
  override protected def evalCompute(text: UTF8String): ArrayData =
    ShingleHash60sExpr.compute(text, n)
  override protected def withNewChildInternal(newChild: Expression): ShingleHash60sExpr =
    copy(child = newChild)
}

object ShingleHash60sExpr {

  /** Called from generated code — must stay a simple static-style method. */
  def compute(text: UTF8String, n: Int): ArrayData =
    UnsafeArrayData.fromPrimitiveArray(
      ShingleKernel.shingleHash60s(if (text == null) null else text.toString, n))

  def shingleHash60s(c: Column, n: Int): Column =
    Bridge.column(ShingleHash60sExpr(Bridge.expression(c), n))
}

/** `shingle_mod_hashes(text, n)` — per-shingle `hash60 % MinHashPrime`,
  * order-preserving, multiplicity kept (MinHash signature input).
  */
case class ShingleModHashesExpr(child: Expression, n: Int) extends ShingleHashesBase {
  override def prettyName: String = "shingle_mod_hashes"
  override def computeName: String =
    "graft.functions.expressions.ShingleModHashesExpr.compute"
  override protected def evalCompute(text: UTF8String): ArrayData =
    ShingleModHashesExpr.compute(text, n)
  override protected def withNewChildInternal(newChild: Expression): ShingleModHashesExpr =
    copy(child = newChild)
}

object ShingleModHashesExpr {
  import graft.functions.TextFunctions.MinHashPrime

  /** Called from generated code — must stay a simple static-style method. */
  def compute(text: UTF8String, n: Int): ArrayData = {
    val hs = ShingleKernel.shingleHash60s(if (text == null) null else text.toString, n)
    var i = 0
    while (i < hs.length) { hs(i) = hs(i) % MinHashPrime; i += 1 }
    UnsafeArrayData.fromPrimitiveArray(hs)
  }

  def shingleModHashes(c: Column, n: Int): Column =
    Bridge.column(ShingleModHashesExpr(Bridge.expression(c), n))
}
