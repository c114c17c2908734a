package graft.operators

import graft.SparkTestBase

class SnapshotSpec extends SparkTestBase {
  import spark.implicits._

  private val oldSnap = Seq(
    (1L, Option("alpha"), Option("src0")), // unchanged
    (2L, Option("beta"), Option("src0")),  // text changes
    (3L, Option("gamma"), Option("src1")), // removed in new
    (5L, None: Option[String], Option("src2")), // null text -> '' fingerprint
    (6L, Option(""), Option("src3"))       // source changes
  ).toDF("doc_id", "text", "source")

  private val newSnap = Seq(
    (1L, Option("alpha"), Option("src0")),
    (2L, Option("beta v2"), Option("src0")),
    (4L, Option("delta"), Option("src1")), // added
    (5L, Option(""), Option("src2")),      // '' vs old null -> SAME fingerprint
    (6L, Option(""), Option("src9"))
  ).toDF("doc_id", "text", "source")

  test("diff classifies added/removed/changed, drops unchanged, never emits null fingerprints") {
    val got = Snapshot.diff(oldSnap, newSnap, "doc_id", Seq("source", "text"))
      .as[(Long, String, String, String)].collect()
      .map(r => r._1 -> r).toMap

    assert(got.keySet == Set(2L, 3L, 4L, 6L))
    assert(got(2L)._2 == "changed" && got(3L)._2 == "removed" && got(4L)._2 == "added")
    assert(got(6L)._2 == "changed") // content change in a non-text column
    // absent-side fingerprints are empty strings, not nulls
    assert(got(3L)._4 == "" && got(4L)._3 == "")
    // present-side fingerprints are real 32-hex md5s
    assert(got(2L)._3.length == 32 && got(2L)._4.length == 32 && got(2L)._3 != got(2L)._4)
    // doc 5: null text and empty text fingerprint identically (documented
    // coalesce trade) -> unchanged, filtered
    assert(!got.contains(5L))
    // doc 1 untouched -> filtered
    assert(!got.contains(1L))
  }

  test("fingerprint is order-sensitive in its column list and separator-safe against aliasing") {
    val df = Seq(("ab", "c"), ("a", "bc")).toDF("x", "y")
    val fps = df.select(Snapshot.fingerprint(Seq("x", "y")).as("fp"))
      .as[String].collect()
    // 'ab'+sep+'c' must not collide with 'a'+sep+'bc'
    assert(fps.distinct.length == 2)
    val fwd = df.limit(1).select(Snapshot.fingerprint(Seq("x", "y"))).as[String].head()
    val rev = df.limit(1).select(Snapshot.fingerprint(Seq("y", "x"))).as[String].head()
    assert(fwd != rev)
  }

  test("diff of a snapshot against itself is empty") {
    assert(Snapshot.diff(oldSnap, oldSnap, "doc_id", Seq("source", "text")).count() == 0L)
  }
}
