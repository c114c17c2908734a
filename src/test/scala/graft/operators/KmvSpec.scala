package graft.operators

import graft.SparkTestBase
import graft.functions.TextFunctions
import graft.functions.expressions.{KmvBuffer, KmvSketchAgg}
import org.apache.spark.sql.functions._

class KmvSpec extends SparkTestBase {
  import spark.implicits._

  private def refMinima(items: Seq[String], k: Int): Seq[Long] =
    items.map(TextFunctions.md5Hash60Local).distinct.sorted.take(k)

  test("sketch holds the k smallest distinct hashes, bit-for-bit with the sort-based reference") {
    val items = (0 until 500).map(i => s"item-${i % 230}") // dups on purpose
    val got = items.toDF("x")
      .agg(KmvSketchAgg.kmvSketch(TextFunctions.md5Hash60(col("x")), 64).alias("kmv"))
      .as[Seq[Long]].head()
    assert(got === refMinima(items, 64))
    assert(got.size === 64)
  }

  test("below k the sketch IS the distinct set and the estimate is exact") {
    val items = (0 until 40).map(i => s"only-$i") ++ (0 until 40).map(i => s"only-$i")
    val df = items.toDF("x")
      .agg(KmvSketchAgg.kmvSketch(TextFunctions.md5Hash60(col("x")), 256).alias("kmv"))
      .select(Kmv.estimateFromSketch(col("kmv"), 256).alias("est"), size(col("kmv")).alias("n"))
    val (est, n) = df.as[(Long, Int)].head()
    assert(n === 40 && est === 40L)
  }

  test("estimator accuracy: within ~3/sqrt(k) of truth at 20x k distinct items") {
    val k = 256
    val truth = 5000
    val items = (0 until truth).flatMap(i => Seq.fill(1 + i % 3)(s"tok-$i"))
    val est = items.toDF("x")
      .agg(KmvSketchAgg.kmvSketch(TextFunctions.md5Hash60(col("x")), k).alias("kmv"))
      .select(Kmv.estimateFromSketch(col("kmv"), k).alias("est"))
      .as[Long].head()
    val relErr = math.abs(est - truth).toDouble / truth
    assert(relErr < 3.0 / math.sqrt(k), s"est $est vs $truth (relErr $relErr)")
  }

  test("merge is the sketch of the union: buffer-level associativity and spark partial parity") {
    val a = (0 until 300).map(i => s"a-$i")
    val b = (0 until 300).map(i => if (i % 2 == 0) s"a-$i" else s"b-$i") // overlap
    val bufA = new KmvBuffer(128)
    val bufB = new KmvBuffer(128)
    a.foreach(s => bufA.update(TextFunctions.md5Hash60Local(s)))
    b.foreach(s => bufB.update(TextFunctions.md5Hash60Local(s)))
    bufA.merge(bufB)
    assert(bufA.minima.toSeq === refMinima(a ++ b, 128))
    // spark side: many partitions force partial-buffer merges through
    // the same code path; result must equal the single-pass reference
    val got = (a ++ b).toDF("x").repartition(13)
      .agg(KmvSketchAgg.kmvSketch(TextFunctions.md5Hash60(col("x")), 128).alias("kmv"))
      .as[Seq[Long]].head()
    assert(got === refMinima(a ++ b, 128))
  }

  test("distinctTokensPerSource: exact control beside a hash-reproducible estimate") {
    val docs = Seq(
      (1L, "alpha beta gamma delta", "s1"),
      (2L, "alpha beta epsilon", "s1"),
      (3L, "zeta eta theta iota kappa", "s2"),
      (4L, null.asInstanceOf[String], "s2")).toDF("doc_id", "text", "source")
    val got = Kmv.distinctTokensPerSource(docs, "source", "text", 256)
      .as[(String, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    // below k on both sources: estimate must equal the exact count, err 0
    assert(got("s1") === (("s1", 5L, 5L, 0L)))
    assert(got("s2") === (("s2", 5L, 5L, 0L)))
  }

  test("sketch aggregation partial-aggregates map-side (ObjectHashAggregate partial before the exchange)") {
    val docs = (0 until 200).map(i => (i.toLong, s"tok${i % 17} tok${i % 31}", s"s${i % 3}"))
      .toDF("doc_id", "text", "source")
    val sk = docs.select(col("source"),
      explode(TextFunctions.tokens(col("text"))).alias("tok"))
      .groupBy("source")
      .agg(KmvSketchAgg.kmvSketch(TextFunctions.md5Hash60(col("tok")), 64).alias("kmv"))
    sk.collect()
    val plan = sk.queryExecution.executedPlan.toString
    val firstAgg = plan.linesIterator.filter(_.contains("ObjectHashAggregate")).toSeq.lastOption
    assert(firstAgg.exists(_.contains("partial_kmv_sketch")),
      s"sketch build lost its map-side partial:\n$plan")
  }
}
