package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Pins the r21 native BPE apply kernel
  * ([[graft.functions.expressions.BpeApplyExpr]]) row-identical to the
  * r20 chained-replace tokenize it replaced, across the shapes that
  * could break the per-word == whole-document argument: multilevel
  * merges (merge outputs merging again), overlapping pairs inside one
  * word, multi-code-point (supplementary plane) characters, repeated
  * words (the cache path), empty and null text.
  */
class BpeKernelSpec extends SparkTestBase {
  import spark.implicits._

  private def compare(rows: Seq[(Long, String)], merges: Seq[(String, String)]): Unit = {
    val df = rows.toDF("doc_id", "text")
    val got = withStrictCodegen {
      Bpe.tokenize(df, "doc_id", "text", merges)
        .select(col("id"), concat_ws("|", col("toks")).as("s"))
        .as[(Long, String)].collect().toMap
    }
    val ref = Bpe.tokenizeViaReplaceChain(df, "doc_id", "text", merges)
      .select(col("id"), concat_ws("|", col("toks")).as("s"))
      .as[(Long, String)].collect().toMap
    assert(got === ref)
  }

  test("kernel == replace chain: multilevel merges, overlap runs, cache reuse") {
    val merges = Seq(("a", "a"), ("aa", "a"), ("s", "p"), ("sp", "ark"),
      ("a", "r"), ("ar", "k"))
    val rows = Seq(
      (1L, "aaaa aaa aa a spark park ark"),
      (2L, "spark spark spark aaaaaaa"),
      (3L, "s p a r k"),
      (4L, ""),
      (5L, "   "),
      (6L, "aaaaa")) ++
      (7L to 30L).map(i => (i, "spark aaaa " * (i % 4).toInt))
    compare(rows, merges)
  }

  test("kernel == replace chain: supplementary-plane code points and case folding") {
    // U+1D400 MATHEMATICAL BOLD CAPITAL A (surrogate pair) + emoji
    val bold = new String(Character.toChars(0x1D400))
    val emoji = new String(Character.toChars(0x1F600))
    val merges = Seq((emoji, emoji), ("x", emoji))
    val rows = Seq(
      (1L, s"x$emoji$emoji$emoji $bold$bold xx$emoji"),
      (2L, s"$emoji $emoji$emoji"))
    compare(rows, merges)
  }

  test("kernel == replace chain: null text yields an empty token array") {
    val df = Seq((1L, Option("a b")), (2L, Option.empty[String])).toDF("doc_id", "text")
    val merges = Seq(("a", "b"))
    val got = Bpe.tokenize(df, "doc_id", "text", merges)
      .select(col("id"), col("toks")).as[(Long, Seq[String])].collect().toMap
    val ref = Bpe.tokenizeViaReplaceChain(df, "doc_id", "text", merges)
      .select(col("id"), col("toks")).as[(Long, Seq[String])].collect().toMap
    assert(got === ref)
    assert(got(2L) === Seq.empty)
  }

  test("kernel == replace chain on the q100 configuration (trained multilevel merges)") {
    val docs = (1L to 120L).map { i =>
      (i, s"the quick brown fox ${"ab" * (i % 5).toInt} jumps over the lazy dog " +
        s"pack my box with five dozen liquor jugs ${i % 7}")
    }
    val df = docs.toDF("doc_id", "text")
    val merges = Bpe.trainMergesFromCorpus(df, "text", numMerges = 24)
    compare(docs, merges)
  }
}
