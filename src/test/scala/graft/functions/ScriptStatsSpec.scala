package graft.functions

import graft.SparkTestBase
import graft.functions.expressions.ScriptStatsExpr
import org.apache.spark.sql.functions._

/** Contract of `script_stats`: the documented code-point ranges (incl.
  * the ×/÷ Latin-1 exclusions), code-point (not char) counting across
  * a supplementary-plane character, the priority-ordered `main_script`
  * argmax and its tie-breaks, and the empty/null edges.
  */
class ScriptStatsSpec extends SparkTestBase {
  import spark.implicits._

  private case class S(
      nChars: Long, latin: Long, digit: Long, greek: Long, cyr: Long,
      arabic: Long, kana: Long, cjk: Long, hangul: Long, space: Long,
      other: Long, main: String)

  private def stats(texts: String*): Seq[S] =
    withStrictCodegen {
      texts.toDF("t")
        .select(ScriptStatsExpr.scriptStats(col("t")).as("s"))
        .select(col("s.n_chars"), col("s.n_latin"), col("s.n_digit"),
          col("s.n_greek"), col("s.n_cyrillic"), col("s.n_arabic"),
          col("s.n_kana"), col("s.n_cjk"), col("s.n_hangul"),
          col("s.n_space"), col("s.n_other"), col("s.main_script"))
        .as[(Long, Long, Long, Long, Long, Long, Long, Long, Long, Long, Long, String)]
        .collect().toSeq
        .map(t => S(t._1, t._2, t._3, t._4, t._5, t._6, t._7, t._8, t._9, t._10, t._11, t._12))
    }

  test("range classification: one character of each class, ×/÷ excluded from latin") {
    val got = stats("aÉ5 β ж م か 中 한 !×÷").head
    assert(got.nChars === 19L)
    assert(got.latin === 2L) // a, É — NOT × or ÷
    assert(got.digit === 1L)
    assert(got.greek === 1L)
    assert(got.cyr === 1L)
    assert(got.arabic === 1L)
    assert(got.kana === 1L)
    assert(got.cjk === 1L)
    assert(got.hangul === 1L)
    assert(got.space === 7L)
    assert(got.other === 3L) // !, ×, ÷
    assert(got.main === "latin")
  }

  test("main_script: majority wins; digits/spaces/other never vote; priority breaks ties") {
    assert(stats("你好世界 abc").head.main === "cjk") // 4 cjk > 3 latin
    assert(stats("12345 !!!").head.main === "none") // no letters at all
    // 2-2 tie latin/cyrillic → latin (priority order)
    assert(stats("abжж").head.main === "latin")
    // 2-2 tie cyrillic/hangul → cyrillic (earlier in priority)
    assert(stats("жж한한").head.main === "cyrillic")
  }

  test("counts are code points: a supplementary-plane char counts once, as other") {
    val emoji = new String(Character.toChars(0x1F600))
    val got = stats(s"a$emoji").head
    assert(got.nChars === 2L)
    assert(got.latin === 1L)
    assert(got.other === 1L)
  }

  test("whitespace class is exactly {SP, TAB, LF, CR}; NBSP is other") {
    val got = stats(" \t\n\r\u00a0").head
    assert(got.space === 4L)
    assert(got.other === 1L)
  }

  test("empty text is all zeros + none; null text is a null struct") {
    assert(stats("").head === S(0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, "none"))
    val nulls = withStrictCodegen {
      Seq(Option.empty[String]).toDF("t")
        .select(ScriptStatsExpr.scriptStats(col("t")).isNull)
        .as[Boolean].collect().toSeq
    }
    assert(nulls === Seq(true))
  }
}
