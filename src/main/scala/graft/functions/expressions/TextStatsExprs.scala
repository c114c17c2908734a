package graft.functions.expressions

import graft.functions.TextFunctions
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, GenericArrayData, MapData}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native codegen twins of the text-analysis scan UDFs (`langIdUdf`,
  * `qualityStatsUdf`, `corpusStatsUdf`, `termCountsUdf`) — the last
  * closure UDFs on the corpus-statistics hot paths (q24/q25/q35/q52).
  *
  * Same preference-ladder argument as [[ShingleHashesBase]]: a Scala
  * UDF breaks WholeStageCodegen at its boundary and pays a
  * catalyst↔Scala conversion per row (here: UTF8String→String→result
  * →Catalyst re-encode through an encoder); these expressions generate
  * a static call inline in the fused stage and build the internal
  * representation (InternalRow / MapData) directly. The per-row kernels
  * are the SAME JVM functions the UDFs call (`tokensLocal`,
  * `langIdLocal`, `qualityStatsLocal`, `termCountsLocal`,
  * `md5HexLocal`), so values — and the DuckDB oracle hashes — are
  * unchanged by construction.
  *
  * Null semantics match the UDF twins: null text → null result (the
  * default null-intolerant `UnaryExpression` contract; the UDFs
  * returned `None`/null for null text).
  */
abstract class TextStatsBase extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${child.dataType.catalogString}")
}

/** `lang_id(text)` — stop-word-overlap argmax language code with the
  * fixed en > fr > de > es tie-break ([[TextFunctions.langIdLocal]]).
  */
case class LangIdExpr(child: Expression) extends TextStatsBase {
  override def dataType: DataType = StringType
  override def prettyName: String = "lang_id"

  override protected def nullSafeEval(input: Any): Any =
    LangIdExpr.run(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.expressions.LangIdExpr.run($c)")

  override protected def withNewChildInternal(newChild: Expression): LangIdExpr =
    copy(child = newChild)
}

object LangIdExpr {

  /** Called from generated code — must stay a simple static-style method. */
  def run(text: UTF8String): UTF8String =
    UTF8String.fromString(
      TextFunctions.langIdLocal(TextFunctions.tokensLocal(text.toString)))

  def langId(c: Column): Column = Bridge.column(LangIdExpr(Bridge.expression(c)))
}

/** `quality_stats(text)` for a plan-time language — one-pass quality
  * metrics `(n_tokens, n_subtokens, punct_ratio, stopword_ratio,
  * mean_token_len)` ([[TextFunctions.qualityStatsLocal]]).
  */
case class QualityStatsExpr(child: Expression, language: String) extends TextStatsBase {
  // the stop-word set is derived from `language` once per plan and rides
  // the generated class as a reference object, not a per-row lookup
  @transient private lazy val sw: Set[String] =
    TextFunctions.stopWords(language).toSet

  override def dataType: DataType = QualityStatsExpr.schema
  override def prettyName: String = "quality_stats"

  override protected def nullSafeEval(input: Any): Any =
    QualityStatsExpr.run(input.asInstanceOf[UTF8String], sw)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val swRef = ctx.addReferenceObj("qualitySw", sw, "scala.collection.immutable.Set")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.expressions.QualityStatsExpr.run($c, $swRef)")
  }

  override protected def withNewChildInternal(newChild: Expression): QualityStatsExpr =
    copy(child = newChild)
}

object QualityStatsExpr {

  val schema: StructType = StructType(Seq(
    StructField("n_tokens", LongType, nullable = false),
    StructField("n_subtokens", LongType, nullable = false),
    StructField("punct_ratio", DoubleType, nullable = false),
    StructField("stopword_ratio", DoubleType, nullable = false),
    StructField("mean_token_len", DoubleType, nullable = false)))

  /** Called from generated code — must stay a simple static-style method. */
  def run(text: UTF8String, sw: Set[String]): GenericInternalRow = {
    val (nTok, nSub, punct, stop, mean) =
      TextFunctions.qualityStatsLocal(text.toString, sw)
    new GenericInternalRow(Array[Any](nTok, nSub, punct, stop, mean))
  }

  def qualityStats(c: Column, language: String): Column =
    Bridge.column(QualityStatsExpr(Bridge.expression(c), language))
}

/** `corpus_stats(text)` — the training-prep gate triple `(n_tokens,
  * lang_pred, fp)`: tokenize once, language-ID, md5 fingerprint of the
  * normalized token join.
  */
case class CorpusStatsExpr(child: Expression) extends TextStatsBase {
  override def dataType: DataType = CorpusStatsExpr.schema
  override def prettyName: String = "corpus_stats"

  override protected def nullSafeEval(input: Any): Any =
    CorpusStatsExpr.run(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.expressions.CorpusStatsExpr.run($c)")

  override protected def withNewChildInternal(newChild: Expression): CorpusStatsExpr =
    copy(child = newChild)
}

object CorpusStatsExpr {

  val schema: StructType = StructType(Seq(
    StructField("n_tokens", LongType, nullable = false),
    StructField("lang_pred", StringType, nullable = false),
    StructField("fp", StringType, nullable = false)))

  /** Called from generated code — must stay a simple static-style method. */
  def run(text: UTF8String): GenericInternalRow = {
    val toks = TextFunctions.tokensLocal(text.toString)
    new GenericInternalRow(Array[Any](
      toks.length.toLong,
      UTF8String.fromString(TextFunctions.langIdLocal(toks)),
      UTF8String.fromString(TextFunctions.md5HexLocal(toks.mkString(" ")))))
  }

  def corpusStats(c: Column): Column = Bridge.column(CorpusStatsExpr(Bridge.expression(c)))
}

/** `repetition_stats(text)` — Gopher-style repetition quality signals
  * `(top_bigram, top_bigram_n, n_bigrams, top_bigram_frac,
  * dup_token_frac)` in one pass ([[TextFunctions.repetitionStatsLocal]]),
  * the q59 hot-path kernel and the last registry scan UDF promoted to a
  * native expression.
  *
  * Null semantics deliberately DIFFER from the [[TextStatsBase]]
  * siblings: the closure UDF it replaces received the raw `null`
  * reference and returned the zeros struct (`top_bigram = null`,
  * counts 0), so this expression does the same — null text behaves as
  * the empty document and the output struct is never SQL NULL.
  */
case class RepetitionStatsExpr(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${child.dataType.catalogString}")

  override def dataType: DataType = RepetitionStatsExpr.schema
  override def nullable: Boolean = false
  override def prettyName: String = "repetition_stats"

  override def eval(input: InternalRow): Any = {
    val t = child.eval(input)
    RepetitionStatsExpr.run(if (t == null) null else t.asInstanceOf[UTF8String])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    val resultCode =
      code"""
         ${c.code}
         InternalRow ${ev.value} =
           graft.functions.expressions.RepetitionStatsExpr.run(
             ${c.isNull} ? null : ${c.value});
       """
    ev.copy(code = resultCode, isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): RepetitionStatsExpr =
    copy(child = newChild)
}

object RepetitionStatsExpr {

  val schema: StructType = StructType(Seq(
    StructField("top_bigram", StringType, nullable = true),
    StructField("top_bigram_n", LongType, nullable = false),
    StructField("n_bigrams", LongType, nullable = false),
    StructField("top_bigram_frac", DoubleType, nullable = false),
    StructField("dup_token_frac", DoubleType, nullable = false)))

  /** Called from generated code — must stay a simple static-style method. */
  def run(text: UTF8String): GenericInternalRow = {
    val (topB, topN, nBigrams, topFrac, dupFrac) =
      TextFunctions.repetitionStatsLocal(if (text == null) null else text.toString)
    new GenericInternalRow(Array[Any](
      if (topB == null) null else UTF8String.fromString(topB),
      topN, nBigrams, topFrac, dupFrac))
  }

  def repetitionStats(c: Column): Column =
    Bridge.column(RepetitionStatsExpr(Bridge.expression(c)))
}

/** `term_counts(text)` — token → count map, the scan-side
  * pre-aggregation that makes the TF-IDF term-frequency shuffle
  * disappear ([[TextFunctions.termCountsLocal]]).
  */
case class TermCountsExpr(child: Expression) extends TextStatsBase {
  override def dataType: DataType =
    MapType(StringType, LongType, valueContainsNull = false)
  override def prettyName: String = "term_counts"

  override protected def nullSafeEval(input: Any): Any =
    TermCountsExpr.run(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.expressions.TermCountsExpr.run($c)")

  override protected def withNewChildInternal(newChild: Expression): TermCountsExpr =
    copy(child = newChild)
}

object TermCountsExpr {

  /** Called from generated code — must stay a simple static-style method. */
  def run(text: UTF8String): MapData = {
    val m = TextFunctions.termCountsLocal(text.toString)
    val keys = new Array[Any](m.size)
    val values = new Array[Long](m.size)
    var i = 0
    m.foreach { case (k, v) =>
      keys(i) = UTF8String.fromString(k)
      values(i) = v
      i += 1
    }
    new ArrayBasedMapData(
      new GenericArrayData(keys), UnsafeArrayData.fromPrimitiveArray(values))
  }

  def termCounts(c: Column): Column = Bridge.column(TermCountsExpr(Bridge.expression(c)))
}

/** `char_entropy(text)` — unigram character entropy in integer
  * MICRO-nats: `Σ_c round(1e6 · (n_c/n) · ln(n/n_c))` over the
  * distinct code points, each term rounded row-locally and summed as
  * an exact integer (the q101 fixed-point rule: the ONLY doubles are
  * per-term, from exact integer counts, so the oracle reproduces the
  * value bit-for-bit; a cross-term double sum would depend on
  * summation order). The gibberish/compressibility quality signal:
  * natural text sits ~3.0–4.5 nats-equivalent; base64 blobs, key
  * dumps and repeated-char padding land far outside, in BOTH
  * directions — the quality family's member for "statistically wrong
  * character distribution" that token-level stats miss.
  *
  * Empty text → 0 (a zero-length doc has no distribution, not an
  * error); null → null.
  */
case class CharEntropyExpr(child: Expression) extends TextStatsBase {
  override def dataType: DataType = LongType
  override def prettyName: String = "char_entropy"

  override protected def nullSafeEval(input: Any): Any =
    CharEntropyExpr.run(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.expressions.CharEntropyExpr.run($c)")

  override protected def withNewChildInternal(newChild: Expression): CharEntropyExpr =
    copy(child = newChild)
}

object CharEntropyExpr {

  def charEntropy(c: Column): Column = Bridge.column(CharEntropyExpr(Bridge.expression(c)))

  /** Called from generated code — per-term micro rounding, exact
    * integer total (order-independent by construction).
    */
  def run(s: UTF8String): Long = {
    val str = s.toString
    if (str.isEmpty) return 0L
    val counts = new java.util.HashMap[Integer, Long]()
    var i = 0
    var n = 0L
    while (i < str.length) {
      val cp = str.codePointAt(i)
      counts.merge(cp, 1L, (a, b) => a + b)
      n += 1L
      i += Character.charCount(cp)
    }
    var total = 0L
    val it = counts.values().iterator()
    while (it.hasNext) {
      val c = it.next()
      total += Math.round(
        1000000.0 * (c.toDouble / n.toDouble) * Math.log(n.toDouble / c.toDouble))
    }
    total
  }
}
