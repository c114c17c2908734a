package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Contract of the tag-structure fingerprint: text and attributes are
  * invisible, tag order and closing tags are not; doctype/comments
  * never count; family aggregation and the minPages flag; the
  * broadcast markTemplated enforcement form.
  */
class TemplatesSpec extends SparkTestBase {
  import spark.implicits._

  private def fp(htmls: String*): Seq[Long] =
    htmls.toDF("h")
      .select(Templates.tagFingerprint(col("h")))
      .as[Long].collect().toSeq

  test("fingerprint sees structure only: text and attributes are invisible") {
    val Seq(a, b, c) = fp(
      "<html><body><p>one text</p></body></html>",
      "<html><body   ><p class=\"x\" id='7'>совсем другой текст</p></body></html>",
      "<html><body><div>one text</div></body></html>")
    assert(a === b, "text/attribute changes must not move the fingerprint")
    assert(a !== c, "a different tag must move the fingerprint")
  }

  test("closing tags, order, and repetition distinguish; doctype and comments never count") {
    val Seq(open, closed, twice, doc) = fp(
      "<div><p>",
      "<div><p></p></div>",
      "<div><p></p><p></p></div>",
      "<!DOCTYPE html><!-- note --><div><p>")
    assert(Seq(open, closed, twice).distinct.size === 3)
    assert(doc === open, "doctype/comments must not count as tags")
    // tag names are case-folded
    assert(fp("<DIV><P>").head === open)
  }

  test("tagless and empty inputs share the 'no structure' family") {
    val Seq(a, b, c) = fp("", "plain text, no markup", "x < y and y > z")
    assert(a === b && b === c)
  }

  test("templateFamilies aggregates per layout; minPages flags; markTemplated joins back") {
    // two big families (40 pages each, varying text) + one small (3)
    val docs = ((0 until 40).map(i => (i.toLong, s"<html><body><p>t$i</p></body></html>")) ++
      (0 until 40).map(i => (100L + i, s"<html><body><h1>h$i</h1></body></html>")) ++
      (0 until 3).map(i => (200L + i, s"<table><tr><td>c$i</td></tr></table>")))
      .toDF("doc_id", "raw")
    val fams = Templates.templateFamilies(docs, "doc_id", "raw", minPages = 10L)
      .as[(Long, Long, Long, Boolean)].collect().toSeq.sortBy(_._3)
    assert(fams.map(f => (f._2, f._3, f._4)) ===
      Seq((40L, 0L, true), (40L, 100L, true), (3L, 200L, false)))
    val marked = Templates.markTemplated(docs, "doc_id", "raw", minPages = 10L)
    assert(marked.count() === 83L)
    assert(marked.filter(col("is_template")).count() === 80L)
    assert(marked.filter(!col("is_template")).select("doc_id")
      .as[Long].collect().toSet === Set(200L, 201L, 202L))
  }

  test("capPerFamily: per-family bound holds and samples are NESTED across caps") {
    // two big families + one small; the seeded-hash sample must be
    // monotone in the cap (the Sampling family's nesting guarantee)
    val docs = ((0 until 30).map(i => (i.toLong,
        if (i % 2 == 0) "<div><p>a</p></div>" else "<ul><li>b</li></ul>")) ++
      (0 until 2).map(i => (100L + i, "<table><tr><td>c</td></tr></table>")))
      .toDF("doc_id", "raw")
    def kept(cap: Int): Set[Long] =
      Templates.capPerFamily(docs, "doc_id", "raw", cap)
        .select("doc_id").as[Long].collect().toSet
    val k3 = kept(3); val k5 = kept(5); val k8 = kept(8)
    // bound: no family over cap
    def famCounts(s: Set[Long]) =
      s.groupBy(id => if (id >= 100L) 2 else (id % 2).toInt).view.mapValues(_.size)
    assert(famCounts(k3).forall { case (f, n) => n <= (if (f == 2) 2 else 3) })
    assert(famCounts(k5).forall { case (f, n) => n <= (if (f == 2) 2 else 5) })
    // nesting: the cap-3 sample is a subset of cap-5, cap-5 of cap-8
    assert(k3.subsetOf(k5) && k5.subsetOf(k8),
      "seeded-hash family samples must be nested in the cap")
    // under-cap family bypasses whole at every cap
    assert(Seq(k3, k5, k8).forall(s => s.contains(100L) && s.contains(101L)))
  }

  test("null html rows form the null family in BOTH forms (null-safe mark join)") {
    val docs = ((0 until 12).map(i => (i.toLong, Some(s"<p>x$i</p>"))) ++
      Seq((100L, None), (101L, None), (102L, None)))
      .toDF("doc_id", "raw")
    val fams = Templates.templateFamilies(docs, "doc_id", "raw", minPages = 3L)
    // the null fingerprint is a family like any other
    assert(fams.filter(col("tag_fp").isNull)
      .select("n_pages", "first_doc", "is_template")
      .as[(Long, Long, Boolean)].collect().toSeq === Seq((3L, 100L, true)))
    // markTemplated keeps every input row — including the null-html ones
    val marked = Templates.markTemplated(docs, "doc_id", "raw", minPages = 3L)
    assert(marked.count() === 15L)
    assert(marked.filter(col("tag_fp").isNull).select("doc_id")
      .as[Long].collect().toSet === Set(100L, 101L, 102L))
    assert(marked.filter(col("tag_fp").isNull).filter(col("is_template")).count() === 3L)
  }
}
