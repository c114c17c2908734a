package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Contract of [[Dedup.domainBoilerplate]]: page-frequency (not
  * occurrence) counting, the minPages floor, per-domain scoping
  * (the same segment hot in one domain survives in another), order
  * preservation in the rebuild, and the all-boilerplate document.
  */
class DomainBoilerplateSpec extends SparkTestBase {
  import spark.implicits._

  private def run(rows: Seq[(Long, String, String)], pct: Int, minPages: Long) =
    Dedup.domainBoilerplate(
      rows.toDF("id", "dom", "txt"), "id", "dom", "txt",
      delim = " ", maxPagePct = pct, minPages = minPages)
      .as[(Long, String, String, Long, Long)]
      .collect().map(r => r._1 -> r).toMap

  test("a segment on >pct% of a domain's pages is cut from every page; below-pct survives") {
    // domain A (4 pages): 'nav' on all 4 (100%), 'mid' on 2 (50%), unique tails
    val rows = Seq(
      (1L, "A", "nav mid u1"),
      (2L, "A", "nav mid u2"),
      (3L, "A", "nav u3"),
      (4L, "A", "nav u4"))
    val out = run(rows, pct = 75, minPages = 2L)
    assert(out(1L) === ((1L, "A", "mid u1", 2L, 1L)))
    assert(out(3L) === ((3L, "A", "u3", 1L, 1L)))
  }

  test("page-presence counting: 50 repeats inside ONE page do not make a segment hot") {
    val rows = Seq(
      (1L, "A", Seq.fill(50)("spam").mkString(" ") + " tail1"),
      (2L, "A", "tail2 x"),
      (3L, "A", "tail3 y"))
    val out = run(rows, pct = 50, minPages = 2L)
    // 'spam' is on 1 of 3 pages (33%) — repetition is not boilerplate
    assert(out(1L)._4 === 51L, s"spam was cut: ${out(1L)}")
    assert(out(1L)._5 === 0L)
  }

  test("minPages floor: a 2-page domain's shared header survives") {
    val rows = Seq(
      (1L, "tiny", "header body1"),
      (2L, "tiny", "header body2"))
    val out = run(rows, pct = 50, minPages = 3L)
    assert(out(1L) === ((1L, "tiny", "header body1", 2L, 0L)))
    // ...and with the floor met, the same data cuts
    val cut = run(rows, pct = 50, minPages = 2L)
    assert(cut(1L) === ((1L, "tiny", "body1", 1L, 1L)))
  }

  test("scoping: a segment hot in domain A is untouched in domain B") {
    val rows = Seq(
      (1L, "A", "promo a1"), (2L, "A", "promo a2"), (3L, "A", "promo a3"),
      (4L, "B", "promo b1"), (5L, "B", "x b2"), (6L, "B", "y b3"))
    val out = run(rows, pct = 60, minPages = 3L)
    assert(out(1L)._3 === "a1") // cut in A (3/3 pages)
    assert(out(4L)._3 === "promo b1") // 1/3 pages in B — survives
  }

  test("all-boilerplate page survives as an empty document; order preserved elsewhere") {
    val rows = Seq(
      (1L, "A", "nav foot"),
      (2L, "A", "nav foot"),
      (3L, "A", "nav one two foot"),
      (4L, "A", "keep nav foot keep2"))
    val out = run(rows, pct = 90, minPages = 2L)
    assert(out(1L) === ((1L, "A", "", 0L, 2L)))
    assert(out(3L)._3 === "one two") // interior order intact
    assert(out(4L)._3 === "keep keep2") // non-adjacent cuts stitch in order
  }
}
