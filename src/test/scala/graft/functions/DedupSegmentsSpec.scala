package graft.functions

import graft.SparkTestBase
import graft.functions.expressions.DedupSegmentsExpr
import org.apache.spark.sql.functions._

/** Contract of `dedup_segments`: first occurrence kept, order
  * preserved, empty segments deduplicate like any other, null text →
  * null struct.
  */
class DedupSegmentsSpec extends SparkTestBase {
  import spark.implicits._

  private def run(texts: String*): Seq[(String, Long, Long)] =
    withStrictCodegen {
      texts.toDF("t")
        .select(DedupSegmentsExpr.dedupSegments(col("t"), " ").as("d"))
        .select(col("d.clean_text"), col("d.n_kept"), col("d.n_removed"))
        .as[(String, Long, Long)].collect().toSeq
    }

  test("first occurrence kept, order preserved") {
    assert(run("a b a c b a") === Seq(("a b c", 3L, 3L)))
    assert(run("nav body nav nav tail") === Seq(("nav body tail", 3L, 2L)))
    assert(run("x") === Seq(("x", 1L, 0L)))
    assert(run("a b c") === Seq(("a b c", 3L, 0L)))
  }

  test("consecutive delimiters collapse through empty-segment dedup; trailing kept once") {
    // 'a  b ' splits to [a, '', b, ''] — the empty segment keeps its
    // first slot and later empties drop
    assert(run("a  b ") === Seq(("a  b", 3L, 1L)))
    assert(run("") === Seq(("", 1L, 0L))) // one empty segment, kept
  }

  test("null text yields a null struct") {
    val got = withStrictCodegen {
      Seq[(java.lang.Long, String)]((1L, null)).toDF("id", "t")
        .select(DedupSegmentsExpr.dedupSegments(col("t"), " ").as("d"))
        .collect().head.isNullAt(0)
    }
    assert(got)
  }

  test("SQL-free parity with a reference fold on mixed inputs") {
    val texts = Seq(
      "the cat the cat sat", "one", "a a a a a a",
      "p q r p q r p q r tail", "z  z  z")
    val got = run(texts: _*)
    texts.zip(got).foreach { case (t, (c, k, r)) =>
      val segs = t.split(java.util.regex.Pattern.quote(" "), -1)
      val kept = segs.foldLeft(Vector.empty[String]) {
        (acc, s) => if (acc.contains(s)) acc else acc :+ s
      }
      assert(c === kept.mkString(" "), t)
      assert(k === kept.length.toLong && r === (segs.length - kept.length).toLong, t)
    }
  }
}
