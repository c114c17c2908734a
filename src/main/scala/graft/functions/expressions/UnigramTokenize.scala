package graft.functions.expressions

import graft.functions.TextFunctions
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `unigram_tokenize(text)` — Viterbi segmentation of every whitespace
  * token under a unigram-LM piece vocabulary
  * ([[graft.operators.Unigram]]): the APPLY half of the
  * SentencePiece-style tokenizer family, as ONE native scan expression
  * (null text → empty array; the [[TokensExpr]] contract).
  *
  * Whole-text (not per-word-in-a-lambda) on purpose: Spark's
  * higher-order functions (`transform`) are CodegenFallback, and an
  * interpreted per-word kernel in the hot path is exactly the q125
  * trap (measured 206 s there). This expression tokenizes with the
  * SAME static kernel as `tokens` ([[TextFunctions.tokensLocal]]) and
  * runs the per-word DP in-JVM, so the whole tokenization stays one
  * fused scan projection.
  *
  * DP contract (mirrored verbatim by the q143 DuckDB oracle and the
  * driver-side trainer): positions are CODE POINTS; `dp[j]` maximizes
  * the micro-logprob sum over segmentations of the first `j` code
  * points; ties prefer the LONGEST last piece; a code point absent
  * from the vocabulary becomes its own piece at
  * [[graft.operators.Unigram.UnkMicro]] (never taken when the
  * vocabulary covers the corpus alphabet, which the trainer
  * guarantees for its own corpus).
  */
case class UnigramTokenizeExpr(
    child: Expression,
    vocab: Seq[(String, Long)],
    maxPieceLen: Int)
  extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${child.dataType.catalogString}")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "unigram_tokenize"

  @transient private lazy val table: UnigramTokenizeExpr.VocabTable =
    UnigramTokenizeExpr.buildTable(vocab, maxPieceLen)

  override def eval(input: InternalRow): Any = {
    val t = child.eval(input)
    UnigramTokenizeExpr.run(if (t == null) null else t.asInstanceOf[UTF8String], table)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("unigramVocab", table,
      classOf[UnigramTokenizeExpr.VocabTable].getName)
    val c = child.genCode(ctx)
    val resultCode =
      code"""
         ${c.code}
         org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} =
           graft.functions.expressions.UnigramTokenizeExpr.run(
             ${c.isNull} ? null : ${c.value}, $ref);
       """
    ev.copy(code = resultCode, isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): UnigramTokenizeExpr =
    copy(child = newChild)
}

object UnigramTokenizeExpr {

  /** Plan-time-built lookup table riding the generated class. */
  final class VocabTable(
      val lp: java.util.HashMap[String, java.lang.Long],
      val maxPieceLen: Int) extends Serializable

  def buildTable(vocab: Seq[(String, Long)], maxPieceLen: Int): VocabTable = {
    require(maxPieceLen >= 1, s"maxPieceLen must be >= 1, got $maxPieceLen")
    val m = new java.util.HashMap[String, java.lang.Long](vocab.size * 2)
    vocab.foreach { case (p, v) => m.put(p, v) }
    new VocabTable(m, maxPieceLen)
  }

  def unigramTokenize(c: Column, vocab: Seq[(String, Long)], maxPieceLen: Int): Column =
    Bridge.column(UnigramTokenizeExpr(Bridge.expression(c), vocab, maxPieceLen))

  /** Called from generated code — must stay a simple static-style method. */
  def run(text: UTF8String, table: VocabTable): ArrayData = {
    val toks = TextFunctions.tokensLocal(if (text == null) null else text.toString)
    val out = new java.util.ArrayList[Any]()
    var i = 0
    while (i < toks.length) {
      segmentWord(toks(i), table, out)
      i += 1
    }
    new GenericArrayData(out.toArray)
  }

  /** The shared Viterbi DP over one word's code points; appends the
    * chosen pieces (as UTF8String) to `out`. Exposed for the
    * driver-side trainer, which must take the IDENTICAL path.
    */
  private[graft] def segmentWord(
      word: String,
      table: VocabTable,
      out: java.util.ArrayList[Any]): Unit = {
    // code-point boundaries: off(k) = UTF-16 index of code point k
    val n = word.codePointCount(0, word.length)
    val off = new Array[Int](n + 1)
    var k = 0
    var ci = 0
    while (k < n) {
      off(k) = ci
      ci += Character.charCount(word.codePointAt(ci))
      k += 1
    }
    off(n) = word.length

    val dp = new Array[Long](n + 1)
    val bp = new Array[Int](n + 1)
    var j = 1
    while (j <= n) {
      var best = Long.MinValue
      var bestL = 0
      var l = 1
      val lmax = math.min(table.maxPieceLen, j)
      while (l <= lmax) {
        val piece = word.substring(off(j - l), off(j))
        val v = table.lp.get(piece)
        if (v != null) {
          val sc = dp(j - l) + v.longValue()
          // ties prefer the LONGEST piece (l ascending with >=)
          if (sc >= best) {
            if (sc > best || l > bestL) { best = sc; bestL = l }
          }
        }
        l += 1
      }
      if (bestL == 0) {
        // code point not in vocabulary: its own UNK piece
        best = dp(j - 1) + graft.operators.Unigram.UnkMicro
        bestL = 1
      }
      dp(j) = best
      bp(j) = bestL
      j += 1
    }
    // walk back, then emit in order
    var pos = n
    var count = 0
    while (pos > 0) { count += 1; pos -= bp(pos) }
    val start = out.size()
    var idx = start + count
    out.ensureCapacity(idx)
    var fill = 0
    while (fill < count) { out.add(null); fill += 1 }
    pos = n
    while (pos > 0) {
      val l = bp(pos)
      idx -= 1
      out.set(idx, UTF8String.fromString(word.substring(off(pos - l), off(pos))))
      pos -= l
    }
  }
}
