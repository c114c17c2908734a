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

  // ==== frozen profile: mine once, apply statelessly =======================

  private val mineRows = Seq(
    (1L, "A", "nav body1 foot"),
    (2L, "A", "nav body2 foot"),
    (3L, "A", "nav body3 foot"),
    (4L, "B", "nav tail1"),
    (5L, "B", "x tail2"),
    (6L, "B", "y tail3"))

  test("boilerplateProfile mines per-domain fps; applyBoilerplateProfile cuts by them") {
    import org.apache.spark.sql.functions._
    val docs = mineRows.toDF("id", "dom", "txt")
    val profile = Dedup.boilerplateProfile(
      docs, "id", "dom", "txt", delim = " ", maxPagePct = 60, minPages = 3L)
    // A (3 pages): nav+foot on 100% -> hot; B: nav on 1/3 only
    val fps = profile.as[(String, Long)].collect().toSet
    assert(fps.map(_._1) === Set("A"))
    assert(fps.size === 2)
    val applied = Dedup.applyBoilerplateProfile(
        docs, profile, "id", "dom", "txt", delim = " ")
      .as[(Long, String, String, Long, Long)].collect().map(r => r._1 -> r).toMap
    assert(applied(1L)._3 === "body1" && applied(1L)._5 === 2L)
    assert(applied(4L)._3 === "nav tail1", "B's nav must survive — the profile is per-domain")
  }

  test("the frozen profile applies to docs the mine never saw — including unseen domains") {
    val docs = mineRows.toDF("id", "dom", "txt")
    val profile = Dedup.boilerplateProfile(
      docs, "id", "dom", "txt", delim = " ", maxPagePct = 60, minPages = 3L)
    val today = Seq(
      (10L, "A", "nav fresh foot"), // new page of a mined domain: cut applies
      (11L, "C", "nav foot other")) // domain with no profile: untouched
      .toDF("id", "dom", "txt")
    val out = Dedup.applyBoilerplateProfile(today, profile, "id", "dom", "txt", " ")
      .as[(Long, String, String, Long, Long)].collect().map(r => r._1 -> r).toMap
    assert(out(10L)._3 === "fresh")
    assert(out(11L)._3 === "nav foot other" && out(11L)._5 === 0L)
  }

  test("streaming parity: the apply is a stateless projection and chains on a stream") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val docs = mineRows.toDF("id", "dom", "txt")
    val profile = Dedup.boilerplateProfile(
      docs, "id", "dom", "txt", delim = " ", maxPagePct = 60, minPages = 3L)
      .localCheckpoint(true) // the frozen artifact
    val today = Seq(
      (10L, "A", "nav fresh foot"),
      (11L, "C", "nav foot other"),
      (12L, "A", "nav foot"))
    val input = MemoryStream[(Long, String, String)](spark)
    val streamed = Dedup.applyBoilerplateProfile(
      input.toDF().toDF("id", "dom", "txt"), profile, "id", "dom", "txt", " ")
    val name = s"bp_out_${System.nanoTime()}"
    val q = streamed.writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    try {
      input.addData(today.take(2)); q.processAllAvailable()
      input.addData(today.drop(2)); q.processAllAvailable()
      val got = spark.table(name)
        .as[(Long, String, String, Long, Long)].collect().toSet
      val batch = Dedup.applyBoilerplateProfile(
          today.toDF("id", "dom", "txt"), profile, "id", "dom", "txt", " ")
        .as[(Long, String, String, Long, Long)].collect().toSet
      assert(got === batch, "stream and batch apply diverged")
    } finally q.stop()
  }

  test("reserved output/internal names are rejected up front, payload columns ride through") {
    val docs = mineRows.toDF("id", "dom", "txt")
    val profile = Dedup.boilerplateProfile(
      docs, "id", "dom", "txt", delim = " ", maxPagePct = 60, minPages = 3L)
    // an input already carrying an appended-output name would be
    // silently shadowed (or die as an ambiguous reference) — caller
    // error, surfaced as such
    Seq("clean_text", "n_kept", "n_removed", "__graft_bp_fps").foreach { bad =>
      val withBad = docs.withColumn(bad,
        org.apache.spark.sql.functions.lit(1L))
      val e = intercept[IllegalArgumentException] {
        Dedup.applyBoilerplateProfile(withBad, profile, "id", "dom", "txt", " ")
      }
      assert(e.getMessage.contains(bad))
    }
    // the ride-through promise itself: an arbitrary payload column
    // (incl. one named like the PROFILE's own output, 'fps') survives
    val payload = docs
      .withColumn("fps", org.apache.spark.sql.functions.lit(7L))
      .withColumn("meta", org.apache.spark.sql.functions.lit("m"))
    val out = Dedup.applyBoilerplateProfile(payload, profile, "id", "dom", "txt", " ")
    assert(out.columns.toSeq ===
      Seq("id", "dom", "fps", "meta", "clean_text", "n_kept", "n_removed"))
    assert(out.filter(out("fps") =!= 7L).count() === 0L)
  }
}
