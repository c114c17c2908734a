package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class CountMinSpec extends SparkTestBase {
  import spark.implicits._

  // deterministic zipf-ish multiset: key i appears ~60/(i+1) times
  private def occurrences(nKeys: Int) =
    (0 until nKeys).flatMap(i => Seq.fill(60 / (i + 1) + 1)(s"key$i"))
      .toDF("k")

  test("estimates are one-sided: never below the true count, exact at generous width") {
    val items = occurrences(40).cache()
    val exact = items.groupBy("k").agg(count(lit(1)).alias("c"))
      .as[(String, Long)].collect().toMap
    val queries = items.select("k").distinct()
    // tight sketch: overcounts allowed, undercounts never
    val tight = CountMin.estimate(
      CountMin.buildTable(items, "k", depth = 3, width = 16),
      queries, "k", depth = 3, width = 16)
      .as[(String, Long)].collect().toMap
    assert(tight.keySet === exact.keySet)
    for ((k, est) <- tight) assert(est >= exact(k), s"$k undercounted: $est < ${exact(k)}")
    assert(tight.exists { case (k, est) => est > exact(k) },
      "width=16 over 40 keys should collide somewhere — fixture too weak")
    // generous sketch: md5 buckets of 40 keys across 3x4096 rarely
    // triple-collide; this fixture is deterministic, so pin exactness
    val wide = CountMin.estimate(
      CountMin.buildTable(items, "k", depth = 3, width = 4096),
      queries, "k", depth = 3, width = 4096)
      .as[(String, Long)].collect().toMap
    assert(wide === exact)
  }

  test("merge of two sketches equals the sketch of the union") {
    val a = occurrences(25)
    val b = occurrences(40).filter(col("k") =!= "key0")
    val merged = CountMin.merge(
      CountMin.buildTable(a, "k", 3, 32),
      CountMin.buildTable(b, "k", 3, 32))
      .as[(Int, Long, Long)].collect().toSet
    val whole = CountMin.buildTable(a.unionByName(b), "k", 3, 32)
      .as[(Int, Long, Long)].collect().toSet
    assert(merged === whole)
  }

  test("absent keys estimate 0 when their buckets are empty; nulls are dropped") {
    val items = Seq("a", "a", "b").toDF("k")
    val queries = Seq("a", "zzz-not-there", null).toDF("k")
    val est = CountMin.estimate(
      CountMin.buildTable(items, "k", 4, 4096), queries, "k", 4, 4096)
      .as[(String, Long)].collect().toMap
    assert(est("a") === 2L)
    assert(est("zzz-not-there") === 0L)
    assert(est.size === 2)
  }
}
