package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class HistQuantileSpec extends SparkTestBase {
  import spark.implicits._

  private def docsOf(lens: Map[String, Seq[Int]]) =
    lens.toSeq.flatMap { case (src, ls) =>
      ls.zipWithIndex.map { case (l, i) => (s"$src-$i".hashCode.toLong, ("w " * l).trim, src) }
    }.toDF("doc_id", "text", "source")

  test("logBucket is the bit length: powers of two land on bucket edges") {
    val got = Seq(0L, 1L, 2L, 3L, 4L, 7L, 8L, 1023L, 1024L).toDF("v")
      .select(HistQuantile.logBucket(col("v")).alias("b")).as[Int].collect()
    assert(got === Seq(0, 1, 2, 2, 3, 3, 4, 10, 11))
  }

  test("histogram bounds always contain the exact percentile, and ranks follow ceil(p*n/100)") {
    val lens = Map(
      "a" -> (1 to 100),            // uniform 1..100
      "b" -> Seq.fill(50)(7),       // constant
      "c" -> (Seq.fill(90)(3) ++ Seq.fill(10)(500))) // heavy tail
      .view.mapValues(_.toSeq).toMap
    val out = HistQuantile.tokenCountProfile(docsOf(lens), "source", "text")
      .as[(String, Int, Long, Long, Long, Long, Boolean)].collect()
    assert(out.length === 9, s"3 sources x 3 pcts expected, got ${out.length}")
    assert(out.forall(_._7), s"bound violated: ${out.filterNot(_._7).mkString(";")}")
    val byKey = out.map(r => (r._1, r._2) -> r).toMap
    // exact checks: source a rank ceil(50*100/100)=50 -> len 50; p99 -> rank 99 -> 99
    assert(byKey(("a", 50))._6 === 50L)
    assert(byKey(("a", 99))._6 === 99L)
    // constant source: every percentile is 7, bucket [4,7]
    for (p <- Seq(50, 90, 99)) {
      val r = byKey(("b", p))
      assert(r._6 === 7L && r._4 === 4L && r._5 === 7L)
    }
    // heavy tail: p50/p90 in the head (3), p99 in the tail (500)
    assert(byKey(("c", 50))._6 === 3L)
    assert(byKey(("c", 90))._6 === 3L)
    assert(byKey(("c", 99))._6 === 500L)
  }

  test("null and empty texts: nulls dropped, empties count as zero-token docs in bucket 0") {
    val docs = Seq(
      (1L, "one two three", "s"),
      (2L, "", "s"),
      (3L, null.asInstanceOf[String], "s")).toDF("doc_id", "text", "source")
    val out = HistQuantile.tokenCountProfile(docs, "source", "text", Seq(50))
      .as[(String, Int, Long, Long, Long, Long, Boolean)].collect()
    // null doc excluded -> n=2; rank ceil(0.5*2)=1 -> the empty doc, bucket 0
    assert(out.length === 1)
    assert(out.head._3 === 2L && out.head._6 === 0L && out.head._4 === 0L && out.head._5 === 0L)
  }

  test("histograms merge by adding counts: per-batch sketches sum to the one-pass sketch") {
    val all = (1 to 200).map(i => (i.toLong, ("w " * (i % 37)).trim, s"s${i % 2}"))
    val (b1, b2) = all.splitAt(120)
    def hist(rows: Seq[(Long, String, String)]) = HistQuantile.histogram(
      HistQuantile.tokenCounts(rows.toDF("doc_id", "text", "source"), "source", "text"))
    val onePass = hist(all).as[(String, Int, Long)].collect().toSet
    val merged = HistQuantile.mergeHistograms(hist(b1), hist(b2))
      .as[(String, Int, Long)].collect().toSet
    assert(merged === onePass)
    // and subtraction retires a batch exactly: merged minus b2 = b1
    val negB2 = hist(b2).withColumn("c", -col("c"))
    val back = HistQuantile.mergeHistograms(HistQuantile.mergeHistograms(hist(b1), hist(b2)), negB2)
      .filter(col("c") =!= 0)
      .as[(String, Int, Long)].collect().toSet
    assert(back === hist(b1).as[(String, Int, Long)].collect().toSet)
  }
}
