package graft.functions

import graft.SparkTestBase
import graft.functions.expressions.{HeavyHittersAgg, HeavyHittersBuffer}
import org.apache.spark.sql.functions._

class HeavyHittersSpec extends SparkTestBase {
  import spark.implicits._

  test("exact regime: equals true per-group top-k, stable under repartitioning (merge path)") {
    val rows = for {
      g <- Seq("a", "b")
      (item, n) <- Seq("x" -> 5, "y" -> 3, "z" -> 3, "w" -> 1)
      i <- 1 to n
    } yield (g, item + i.toString.take(0), item) // (group, _, item)
    val df = rows.map { case (g, _, item) => (g, item) }.toDF("g", "item")

    def run(d: org.apache.spark.sql.DataFrame) = d
      .groupBy("g")
      .agg(HeavyHittersAgg.heavyHitters(col("item"), capacity = 16, k = 3).as("hh"))
      .select(col("g"), explode(col("hh")).as("h"))
      .select(col("g"), col("h.item"), col("h.est_count"), col("h.max_err"))
      .as[(String, String, Long, Long)].collect().toSet

    val expected = Seq("a", "b").flatMap(g =>
      Seq((g, "x", 5L, 0L), (g, "y", 3L, 0L), (g, "z", 3L, 0L))).toSet
    assert(run(df) == expected)
    // shuffle-merged partials produce the identical exact summary
    assert(run(df.repartition(7)) == expected)
  }

  test("approximate regime: frequent items survive eviction with bounded error") {
    // single buffer, deterministic stream: 1000 'hot' + 1 each of 200 tail
    // items, capacity 64 — the tail overflows the summary, the hot item
    // must survive with est - err <= true <= est
    val buf = new HeavyHittersBuffer(64)
    (1 to 500).foreach(_ => buf.update("hot"))
    (1 to 200).foreach(i => buf.update(f"tail$i%03d"))
    (1 to 500).foreach(_ => buf.update("hot"))
    val top = buf.topK(1)
    assert(top.head._1 == "hot")
    val (_, est, err) = top.head
    assert(est >= 1000L, s"underestimate: $est") //   Space-Saving never undercounts
    assert(est - err <= 1000L, s"bound violated: est=$est err=$err")
  }

  test("merge sums union counts and truncates to capacity deterministically") {
    val a = new HeavyHittersBuffer(4)
    val b = new HeavyHittersBuffer(4)
    Seq("x", "x", "y").foreach(a.update)
    Seq("x", "z", "z", "w").foreach(b.update)
    a.merge(b)
    assert(a.counts("x") == ((3L, 0L)))
    assert(a.counts("z") == ((2L, 0L)))
    assert(a.counts("y") == ((1L, 0L)))
    assert(a.counts("w") == ((1L, 0L)))

    // overflowing merge keeps the largest counts
    val c = new HeavyHittersBuffer(2)
    val d = new HeavyHittersBuffer(2)
    Seq("p", "p", "q").foreach(c.update)
    Seq("r", "r", "r", "s").foreach(d.update)
    c.merge(d)
    assert(c.counts.keySet == Set("r", "p"))
  }
}
