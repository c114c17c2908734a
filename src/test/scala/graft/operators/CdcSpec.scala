package graft.operators

import graft.SparkTestBase
import graft.functions.TextFunctions
import org.apache.spark.sql.functions._

class CdcSpec extends SparkTestBase {
  import spark.implicits._

  private val (w, d) = (8, 16)

  /** Slow single-pass reference — the executable definition the
    * columnar HOF chain is parity-checked against.
    */
  private def refChunks(s: String): Seq[Long] = {
    val cuts = (w to s.length).filter(i =>
      TextFunctions.md5Hash60Local(s.substring(i - w, i)) % d == 0)
    (0 +: cuts :+ s.length).sliding(2).collect {
      case Seq(a, b) if b > a => TextFunctions.md5Hash60Local(s.substring(a, b))
    }.toSeq
  }

  private def fakeText(seed: Int, words: Int): String = {
    val vocab = Vector("key", "agg", "row", "scan", "slow", "fast", "table", "value",
      "batch", "spark", "order", "data", "column", "join")
    (0 until words).map(j => vocab((seed * 31 + j * 7 + j * j) % vocab.size)).mkString(" ")
  }

  private def sparkChunks(s: String): Seq[Long] =
    Seq(Tuple1(s)).toDF("t")
      .select(Cdc.chunkHashes(col("t"), w, d).alias("hs"))
      .as[Seq[Long]].collect().head

  test("columnar chunker matches the single-pass reference on varied payloads") {
    val payloads = (0 until 30).map(i => fakeText(i, 10 + i * 7)) ++
      Seq("", "ab", "x" * (w - 1), "y" * w, fakeText(99, 400))
    for (p <- payloads)
      assert(sparkChunks(p) === refChunks(p), s"parity broke on ${p.take(40)}…(len ${p.length})")
  }

  test("cuts are content-defined: a prefix insertion preserves every chunk after the first boundary") {
    val base = fakeText(7, 200)
    val shifted = "INSERTED-PREFIX-" + base
    val a = refChunks(base)
    val b = refChunks(shifted)
    assert(a.nonEmpty && a.size >= 5, s"fixture too short: ${a.size} chunks")
    // all of base's chunks except (at most) its first survive in the
    // shifted payload — the fixed-size-blocking counterexample
    val survived = a.tail.count(b.contains)
    assert(survived === a.tail.size,
      s"only $survived/${a.tail.size} post-boundary chunks survived the shift")
    assert(sparkChunks(shifted) === b)
  }

  test("dupChunkProfile: twin docs share all chunks, a unique doc shares none, empty reports 0/0") {
    val t1 = fakeText(3, 120)
    val docs = Seq(
      (1L, t1), (2L, t1),
      (3L, "totally unrelated payload nothing in common with the twins whatsoever here"),
      (4L, "")).toDF("doc_id", "text")
    val got = Cdc.dupChunkProfile(docs, "doc_id", "text", w, d)
      .as[(Long, Long, Long, Option[Long])].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    val n1 = refChunks(t1).size.toLong
    assert(got(1L) === ((n1, n1, Some(1000000L))), s"twin profile ${got(1L)}")
    assert(got(2L) === ((n1, n1, Some(1000000L))))
    assert(got(3L)._2 === 0L && got(3L)._3 === Some(0L))
    assert(got(4L) === ((0L, 0L, None)))
  }

  test("native kernel matches the composed HOF form, multi-byte payloads included") {
    // the HOF chain is the readable executable spec; the registry runs
    // the codegen kernel — pin them equal, with code-point (not byte)
    // window/slice semantics exercised by the non-ASCII payloads
    val payloads = (0 until 12).map(i => fakeText(i * 5 + 1, 20 + i * 13)) ++
      Seq("", "short", "héllo wörld " * 40, "データの重複排除 " * 30, "x" * w)
    val df = payloads.zipWithIndex.map(_.swap).toDF("i", "t")
    val both = df.select(
      Cdc.chunkHashes(col("t"), w, d).alias("kernel"),
      Cdc.chunkHashesComposed(col("t"), w, d).alias("hof"))
      .as[(Seq[Long], Seq[Long])].collect()
    for (((k, h), i) <- both.zipWithIndex)
      assert(k === h, s"kernel/HOF divergence on payload $i: ${payloads(i).take(40)}…")
  }

  test("containmentDedup: a prepended-header re-upload is dropped, fresh content survives") {
    val base = fakeText(7, 300)
    val reupload = "RE-UPLOADED WITH HEADER >>> " + base
    val fresh = fakeText(42, 150)
    val halfNew = base.take(base.length / 4) + " " + fakeText(77, 200)
    val docs = Seq(
      (1L, base), (2L, reupload), (3L, fresh), (4L, halfNew), (5L, "")
    ).toDF("doc_id", "text")
    val got = Cdc.containmentDedup(docs, "doc_id", "text", w, d)
      .as[(Long, Long, Long, Option[Long], Boolean)].collect()
      .map(r => r._1 -> r).toMap
    assert(got(1L)._5, "the original must be kept (owns its chunks)")
    assert(got(1L)._3 === 0L)
    assert(!got(2L)._5,
      s"the re-upload shares all post-boundary chunks and must drop: ${got(2L)}")
    assert(got(3L)._5 && got(3L)._3 === 0L, s"fresh doc wrongly flagged: ${got(3L)}")
    // empty payload: no chunks, null ratio, kept
    assert(got(5L) === ((5L, 0L, 0L, None, true)))
    // ratio arithmetic: borrowed/total matches a direct recount
    val baseChunks = refChunks(base).toSet
    val huChunks = refChunks(halfNew)
    val borrowed = huChunks.count(baseChunks.contains)
    assert(got(4L)._2 === huChunks.size.toLong && got(4L)._3 === borrowed.toLong)
  }

  test("containmentDedup ownership is by smallest id: reordering ids flips which twin survives") {
    val t = fakeText(3, 120)
    val out = Seq((9L, t), (2L, t)).toDF("doc_id", "text")
    val got = Cdc.containmentDedup(out, "doc_id", "text", w, d)
      .as[(Long, Long, Long, Option[Long], Boolean)].collect().map(r => r._1 -> r._5).toMap
    assert(got(2L) && !got(9L), s"keep-best must retain the smallest id: $got")
  }

  test("null payloads yield a null chunk array") {
    val out = Seq((1L, null.asInstanceOf[String]), (2L, "some payload text"))
      .toDF("id", "t")
      .select(col("id"), Cdc.chunkHashes(col("t"), w, d).alias("hs"))
      .as[(Long, Option[Seq[Long]])].collect().toMap
    assert(out(1L).isEmpty && out(2L).nonEmpty)
  }
}
