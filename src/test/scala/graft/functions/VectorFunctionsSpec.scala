package graft.functions

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class VectorFunctionsSpec extends SparkTestBase {
  import spark.implicits._

  test("dot, norm2, cosine match local math") {
    val a = Seq(1.0f, 2.0f, 3.0f)
    val b = Seq(-1.0f, 0.5f, 2.0f)
    val row = Seq((a, b)).toDF("a", "b")
      .select(
        VectorFunctions.dot(col("a"), col("b")).as("d"),
        VectorFunctions.norm2(col("a")).as("na"),
        VectorFunctions.cosineSimilarity(col("a"), col("b")).as("c"))
      .collect()
      .head
    val d = a.zip(b).map { case (x, y) => x.toDouble * y.toDouble }.sum
    val na = math.sqrt(a.map(x => x.toDouble * x.toDouble).sum)
    val nb = math.sqrt(b.map(x => x.toDouble * x.toDouble).sum)
    assert(math.abs(row.getDouble(0) - d) < 1e-12)
    assert(math.abs(row.getDouble(1) - na) < 1e-12)
    assert(math.abs(row.getDouble(2) - d / (na * nb)) < 1e-12)
  }

  test("cosine of a vector with itself is 1") {
    val v = Seq(0.3f, -0.7f, 0.1f, 2.0f)
    val c = Seq((v, v)).toDF("a", "b")
      .select(VectorFunctions.cosineSimilarity(col("a"), col("b")))
      .as[Double].head()
    assert(math.abs(c - 1.0) < 1e-12)
  }

  test("hyperplaneBucket: deterministic, equal vectors same bucket, seeded planes reproducible") {
    val planes = VectorFunctions.randomPlanes(8, 4, seed = 7L)
    assert(planes == VectorFunctions.randomPlanes(8, 4, seed = 7L))
    assert(planes.size == 8 && planes.head.size == 4)
    // unit norm
    planes.foreach(p => assert(math.abs(p.map(x => x * x).sum - 1.0) < 1e-9))

    val v1 = Seq(1.0f, 0.0f, 0.0f, 0.0f)
    val buckets = Seq(v1, v1, Seq(-1.0f, 0.0f, 0.0f, 0.0f)).toDF("v")
      .select(VectorFunctions.hyperplaneBucket(col("v"), planes))
      .as[Long].collect()
    assert(buckets(0) == buckets(1))
    // opposite vector flips every sign bit → complementary bucket
    assert(buckets(0) + buckets(2) == (1L << 8) - 1)
  }
}
