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

  test("keyOverlap: below k every estimate is exact and matches the controls") {
    val a = (1L to 40L).map(i => Tuple1(i)).toDF("ka")
    val b = (21L to 70L).map(i => Tuple1(i)).toDF("kb")
    val r = Kmv.keyOverlap(a, "ka", b, "kb", k = 128).head()
    assert(r.getAs[Long]("est_a") === 40L)
    assert(r.getAs[Long]("n_exact_a") === 40L)
    assert(r.getAs[Long]("est_b") === 50L)
    assert(r.getAs[Long]("n_exact_b") === 50L)
    assert(r.getAs[Long]("est_union") === 70L)
    assert(r.getAs[Long]("est_intersect") === 20L)
    assert(r.getAs[Long]("n_exact_intersect") === 20L)
    assert(r.getAs[Long]("containment_a_permille") === 500L)
  }

  test("keyOverlap: merged-array union estimate equals the sketch OF the union") {
    val a = (1L to 4000L).map(i => Tuple1(i)).toDF("ka")
    val b = (2000L to 7000L).map(i => Tuple1(i)).toDF("kb")
    val k = 64
    val r = Kmv.keyOverlap(a, "ka", b, "kb", k).head()
    // sketch the union DIRECTLY and apply the estimator — must equal
    // the merged-array derivation inside keyOverlap (KMV merge is the
    // sketch of the union, exactly)
    val direct = a.select(col("ka").cast("string").alias("s"))
      .union(b.select(col("kb").cast("string").alias("s")))
      .agg(KmvSketchAgg.kmvSketch(TextFunctions.md5Hash60(col("s")), k).alias("kmv"))
      .select(Kmv.estimateFromSketch(col("kmv"), k).alias("e"))
      .head().getAs[Long]("e")
    assert(r.getAs[Long]("est_union") === direct)
    // inclusion-exclusion consistency, and the clamp keeps it non-negative
    assert(r.getAs[Long]("est_intersect") ===
      math.max(r.getAs[Long]("est_a") + r.getAs[Long]("est_b") -
        r.getAs[Long]("est_union"), 0L))
  }

  test("keyOverlap: disjoint sides estimate ~zero intersection (clamped at 0)") {
    val a = (1L to 3000L).map(i => Tuple1(i)).toDF("ka")
    val b = (100000L to 103000L).map(i => Tuple1(i)).toDF("kb")
    val r = Kmv.keyOverlap(a, "ka", b, "kb", k = 64).head()
    assert(r.getAs[Long]("n_exact_intersect") === 0L)
    assert(r.getAs[Long]("est_intersect") >= 0L)
    // a disjoint estimate may be slightly positive (sketch noise) but
    // must stay well under either side's cardinality
    assert(r.getAs[Long]("est_intersect") < 1000L)
  }

  test("keyOverlap: null keys are ignored on both sides") {
    val a = Seq[Option[Long]](Some(1L), Some(2L), None).map(Tuple1(_)).toDF("ka")
    val b = Seq[Option[Long]](Some(2L), None).map(Tuple1(_)).toDF("kb")
    val r = Kmv.keyOverlap(a, "ka", b, "kb", k = 16).head()
    assert(r.getAs[Long]("n_exact_a") === 2L)
    assert(r.getAs[Long]("n_exact_b") === 1L)
    assert(r.getAs[Long]("est_intersect") === 1L)
  }
}
