package graft.functions

import graft.SparkTestBase
import graft.functions.expressions.{NearestCellExpr, PqAdcScoreExpr, PqEncodeExpr, SrpBandBucketsExpr}
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The native PQ scan kernels (`pq_encode`, `pq_adc_score`): parity with
  * local reference loops, codegen shape, digest-based expression
  * equality, and the vector-kernel family's null-element semantics.
  */
class PqExprsSpec extends SparkTestBase {
  import spark.implicits._

  private val rnd = new scala.util.Random(31)
  // 3 subspaces of 2 dims with UNEQUAL codebook sizes (2, 3, 4 words) —
  // exercises the offsets layout, not just the uniform-nCodes case
  private val codebooks: Array[Array[Array[Double]]] = Array(
    Array.fill(2, 2)(rnd.nextGaussian()),
    Array.fill(3, 2)(rnd.nextGaussian()),
    Array.fill(4, 2)(rnd.nextGaussian()))

  private def encodeLocal(vec: Seq[Float]): Seq[Byte] =
    codebooks.zipWithIndex.map { case (cb, s) =>
      var best = 0; var bd = Double.MaxValue
      for (c <- cb.indices) {
        var d2 = 0.0
        for (j <- 0 until 2) { val d = vec(s * 2 + j).toDouble - cb(c)(j); d2 += d * d }
        if (d2 < bd) { bd = d2; best = c }
      }
      best.toByte
    }.toSeq

  test("pq_encode matches the reference loop on ragged codebooks; pq_adc_score sums the LUT") {
    val vecs = (1L to 30L).map(i => (i, Seq.fill(6)(rnd.nextGaussian().toFloat)))
    val got = vecs.toDF("id", "vec")
      .select(col("id"), PqEncodeExpr.pqEncode(col("vec"), codebooks).as("code"))
      .as[(Long, Array[Byte])].collect().toMap
    vecs.foreach { case (id, v) =>
      assert(got(id).toSeq == encodeLocal(v), s"vec $id encode diverged")
    }

    // ADC score = sum of per-subspace LUT entries at the code indices
    val lut: Array[Array[Double]] =
      codebooks.map(_.map(cc => cc.sum * 0.5 + rnd.nextGaussian()))
    val scores = vecs.toDF("id", "vec")
      .select(col("id"), PqEncodeExpr.pqEncode(col("vec"), codebooks).as("code"))
      .select(col("id"), PqAdcScoreExpr.pqAdcScore(col("code"), lut).as("s"))
      .as[(Long, Double)].collect().toMap
    vecs.foreach { case (id, v) =>
      val expect = encodeLocal(v).zipWithIndex.map { case (c, s) => lut(s)(c & 0xff) }.sum
      assert(math.abs(scores(id) - expect) < 1e-12, s"vec $id score diverged")
    }
  }

  test("pq kernels stay inside whole-stage codegen over parquet (strict fallback)") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val dim = emb.select(size(col("embedding"))).head().getInt(0)
    val m = 4
    val cbs = Array.fill(m, 8, dim / m)(rnd.nextGaussian())
    val lut = cbs.map(_.map(_.sum))
    val planned = emb.select(
      PqAdcScoreExpr.pqAdcScore(
        PqEncodeExpr.pqEncode(col("embedding"), cbs), lut).as("score"))
    withStrictCodegen(planned.collect())
    val plan = planned.queryExecution.executedPlan.toString
    assert("\\*\\(\\d+\\) Project \\[pq_adc_score\\(pq_encode".r.findFirstIn(plan).isDefined, plan)
    assert(!plan.toLowerCase.contains("scalaudf"), plan)
  }

  test("digest equality: equal content unifies, different content does not, O(1) after first digest") {
    import org.apache.spark.sql.graftbridge.Bridge
    val child = Bridge.expression(col("v"))
    def srp(scale: Double) = SrpBandBucketsExpr(
      child,
      scala.collection.immutable.ArraySeq.unsafeWrapArray(
        Array.tabulate(2 * 3 * 4)(i => scale * (if (i % 2 == 0) 1.0 else -1.0))),
      2, 3, 4)
    // distinct instances, identical content → equal, same hashCode (CSE unifies)
    assert(srp(1.0) == srp(1.0))
    assert(srp(1.0).hashCode == srp(1.0).hashCode)
    assert(srp(1.0) != srp(2.0))

    def cells(shift: Double) = NearestCellExpr(
      child,
      scala.collection.immutable.ArraySeq.unsafeWrapArray(
        Array.tabulate(6)(_ + shift)),
      3, 2)
    assert(cells(0.0) == cells(0.0))
    assert(cells(0.0).hashCode == cells(0.0).hashCode)
    assert(cells(0.0) != cells(0.5))

    def pqe(x: Double) = PqEncodeExpr(
      child,
      scala.collection.immutable.ArraySeq.unsafeWrapArray(Array(x, 1.0, 2.0, 3.0)),
      scala.collection.immutable.ArraySeq.unsafeWrapArray(Array(0, 2, 4)),
      2)
    assert(pqe(0.0) == pqe(0.0))
    assert(pqe(0.0) != pqe(9.0))
  }

  test("null vector elements read as 0.0 across EVERY vector kernel (parameterized family pin)") {
    val schema = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("vec", ArrayType(FloatType, containsNull = true), nullable = false)))
    val withNull = spark.createDataFrame(
      java.util.Arrays.asList(
        Row(1L, Seq[Any](1.0f, null, 3.0f)), // null element
        Row(2L, Seq[Any](1.0f, 0.0f, 3.0f))), // explicit zero — must behave identically
      schema)
    val cents = Array(Array(1.0, 0.0, 3.0), Array(-1.0, -1.0, -1.0))
    val cbs = Array(Array(Array(1.0, 0.0, 3.0), Array(0.0, 9.0, 0.0)))
    val srpSigns = Array.tabulate(2 * 2 * 3)(i => if (i % 3 == 0) -1.0 else 1.0)
    // one column per kernel in the family — adding a kernel without a row
    // here is the review flag this spec exists to raise
    val kernels: Seq[(String, org.apache.spark.sql.Column)] = Seq(
      "nearest_cell" ->
        graft.functions.expressions.NearestCellExpr.nearestCell(col("vec"), cents),
      "dot_product_float" ->
        graft.functions.expressions.DotProductFloat
          .dotF(col("vec"), typedlit(Seq(2.0f, 2.0f, 2.0f))),
      "norm2_float" ->
        graft.functions.expressions.Norm2Float.norm2F(col("vec")),
      "pq_encode" -> PqEncodeExpr.pqEncode(col("vec"), cbs),
      "pq_adc_score(pq_encode)" ->
        PqAdcScoreExpr.pqAdcScore(
          PqEncodeExpr.pqEncode(col("vec"), cbs), cbs.map(_.map(_.sum))),
      "srp_band_buckets" ->
        SrpBandBucketsExpr.srpBandBuckets(col("vec"), srpSigns, 2, 2, 3))
    kernels.foreach { case (name, kcol) =>
      val out = withNull.select(col("id"), kcol.as("k"))
        .collect()
        .map { r =>
          val v = r.get(1) match {
            case b: Array[Byte] => b.toSeq
            case s: scala.collection.Seq[_] => s.toSeq
            case other => other
          }
          r.getLong(0) -> v
        }
        .toMap
      assert(out(1L) == out(2L),
        s"$name: null element diverged from 0.0: ${out(1L)} vs ${out(2L)}")
    }
  }

  test("pq_encode fails loud on a too-short vector instead of reading garbage") {
    val err = intercept[Exception] {
      Seq((1L, Seq(1.0f))).toDF("id", "vec")
        .select(PqEncodeExpr.pqEncode(col("vec"), codebooks))
        .collect()
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(err).exists(_.contains("pq_encode: vector has 1 elements")),
      messages(err).mkString(" | "))
  }
}
