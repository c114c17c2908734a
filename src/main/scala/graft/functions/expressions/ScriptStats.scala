package graft.functions.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** `script_stats(text)` — Unicode-script composition of a document,
  * the multilingual front door's FIRST routing signal: [[LangIdExpr]]
  * separates languages that share an alphabet (stop-word overlap is
  * Latin-centric by construction), but a CC-class corpus must first
  * split by SCRIPT — CJK, Cyrillic, Arabic, Greek, Hangul, Kana —
  * before any per-language model sees a byte. One native scan pass
  * per row, exact integer counts (the oracle reproduces every column
  * bit-for-bit from the same code-point ranges).
  * (Reference analogue: none; training-data-pipeline extension.)
  *
  * Classification is by DOCUMENTED code-point ranges — deliberately a
  * compact, engine-portable subset of the full Unicode Scripts.txt
  * (the BMP blocks that cover the overwhelming mass of web text), not
  * a claim of completeness:
  *  - `latin`: A-Z, a-z, and Latin-1/Extended U+00C0–U+024F
  *    (U+00D7 × and U+00F7 ÷ excluded — they are math signs in the
  *    Latin-1 block);
  *  - `digit`: 0-9;
  *  - `greek` U+0370–U+03FF; `cyrillic` U+0400–U+04FF;
  *  - `arabic` U+0600–U+06FF;
  *  - `kana` U+3040–U+30FF (Hiragana + Katakana);
  *  - `cjk` U+4E00–U+9FFF (URO); `hangul` U+AC00–U+D7A3 (syllables);
  *  - `space`: exactly { SP, TAB, LF, CR };
  *  - `other`: everything else (punctuation, symbols, all remaining
  *    blocks).
  *
  * `main_script` is the argmax over the seven LETTER classes (digits,
  * spaces, and `other` never vote), ties broken by the fixed priority
  * latin > greek > cyrillic > arabic > kana > cjk > hangul, `none`
  * when no letter of any classified script occurs. Emits
  * `struct(n_chars, n_latin, n_digit, n_greek, n_cyrillic, n_arabic,
  * n_kana, n_cjk, n_hangul, n_space, n_other: long, main_script:
  * string)`; empty text → zeros + `none`; null → null struct (the
  * text-stats family contract). Counts are CODE POINTS (supplementary
  * planes count once, into `other`).
  */
case class ScriptStatsExpr(child: Expression) extends TextStatsBase {
  override def dataType: DataType = ScriptStatsExpr.schema
  override def prettyName: String = "script_stats"

  override protected def nullSafeEval(input: Any): Any =
    ScriptStatsExpr.run(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.expressions.ScriptStatsExpr.run($c)")

  override protected def withNewChildInternal(newChild: Expression): ScriptStatsExpr =
    copy(child = newChild)
}

object ScriptStatsExpr {

  val schema: StructType = StructType(Seq(
    StructField("n_chars", LongType, nullable = false),
    StructField("n_latin", LongType, nullable = false),
    StructField("n_digit", LongType, nullable = false),
    StructField("n_greek", LongType, nullable = false),
    StructField("n_cyrillic", LongType, nullable = false),
    StructField("n_arabic", LongType, nullable = false),
    StructField("n_kana", LongType, nullable = false),
    StructField("n_cjk", LongType, nullable = false),
    StructField("n_hangul", LongType, nullable = false),
    StructField("n_space", LongType, nullable = false),
    StructField("n_other", LongType, nullable = false),
    StructField("main_script", StringType, nullable = false)))

  /** Letter-class names in tie-break priority order (the argmax scans
    * left to right with strict `>`).
    */
  private val priority = Array("latin", "greek", "cyrillic", "arabic", "kana", "cjk", "hangul")

  /** Called from generated code — must stay a simple static-style method. */
  def run(text: UTF8String): GenericInternalRow = {
    val s = text.toString
    var nChars = 0L
    var latin = 0L; var digit = 0L; var greek = 0L; var cyr = 0L
    var arabic = 0L; var kana = 0L; var cjk = 0L; var hangul = 0L
    var space = 0L; var other = 0L
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      nChars += 1L
      if ((cp >= 'A' && cp <= 'Z') || (cp >= 'a' && cp <= 'z') ||
          (cp >= 0xC0 && cp <= 0x24F && cp != 0xD7 && cp != 0xF7)) latin += 1L
      else if (cp >= '0' && cp <= '9') digit += 1L
      else if (cp >= 0x370 && cp <= 0x3FF) greek += 1L
      else if (cp >= 0x400 && cp <= 0x4FF) cyr += 1L
      else if (cp >= 0x600 && cp <= 0x6FF) arabic += 1L
      else if (cp >= 0x3040 && cp <= 0x30FF) kana += 1L
      else if (cp >= 0x4E00 && cp <= 0x9FFF) cjk += 1L
      else if (cp >= 0xAC00 && cp <= 0xD7A3) hangul += 1L
      else if (cp == ' ' || cp == '\t' || cp == '\n' || cp == '\r') space += 1L
      else other += 1L
      i += Character.charCount(cp)
    }
    val letters = Array(latin, greek, cyr, arabic, kana, cjk, hangul)
    var best = -1
    var bestN = 0L
    var k = 0
    while (k < letters.length) {
      if (letters(k) > bestN) { best = k; bestN = letters(k) }
      k += 1
    }
    val main = if (best < 0) "none" else priority(best)
    new GenericInternalRow(Array[Any](
      nChars, latin, digit, greek, cyr, arabic, kana, cjk, hangul, space, other,
      UTF8String.fromString(main)))
  }

  def scriptStats(c: Column): Column =
    Bridge.column(ScriptStatsExpr(Bridge.expression(c)))
}
