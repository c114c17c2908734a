package graft.functions

import graft.SparkTestBase
import graft.functions.expressions.BinaryQuantExprs
import graft.operators.Similarity
import org.apache.spark.sql.functions._

/** Contract of the binary (1-bit) quantization tier: the packing rule
  * (strict sign test, 64 bits per word, zero-padded tail), fused ≡
  * stored-artifact Hamming, the unequal-length tail rule, and the
  * rerank mode's ≡-brute-force invariant at full depth.
  */
class BinaryQuantSpec extends SparkTestBase {
  import spark.implicits._

  /** Reference Hamming: positional sign mismatches with missing = 0. */
  private def refHam(a: Array[Float], b: Array[Float]): Long = {
    val n = math.max(a.length, b.length)
    (0 until n).count { i =>
      val sa = i < a.length && a(i) > 0f
      val sb = i < b.length && b(i) > 0f
      sa != sb
    }.toLong
  }

  private def vec(seed: Int, dim: Int): Array[Float] =
    Array.tabulate(dim)(d => ((seed * 131 + d * 17) % 19 - 9) / 10.0f)

  test("packLocal: strict sign test, bit order, zero-padded tail word") {
    // bits 0 and 2 set; zero and negative do NOT set
    assert(BinaryQuantExprs.packLocal(Array(1.0f, 0.0f, 0.5f, -2.0f)).toSeq === Seq(5L))
    // bit 64 lands in word 1; 130-dim → 3 words
    val v = new Array[Float](130)
    v(64) = 1f
    v(129) = 1f
    assert(BinaryQuantExprs.packLocal(v).toSeq === Seq(0L, 1L, 2L))
    assert(BinaryQuantExprs.packLocal(Array.empty[Float]).toSeq === Seq.empty)
  }

  test("bq_codes expression equals packLocal; fused hamming equals stored-codes hamming") {
    val vs = (0 until 40).map(i => (i.toLong, vec(i, 130).toSeq))
    val df = vs.toDF("id", "v").select(col("id"), col("v").cast("array<float>").as("v"))
    val q = vec(999, 130)
    val qw = BinaryQuantExprs.packLocal(q)
    val got = withStrictCodegen {
      df.select(
          col("id"),
          BinaryQuantExprs.bqCodes(col("v")).as("codes"),
          BinaryQuantExprs.bqHamming(col("v"), qw).as("ham_fused"))
        .withColumn("ham_stored", BinaryQuantExprs.bqHammingCodes(col("codes"), qw))
        .as[(Long, Seq[Long], Long, Long)].collect().toSeq.sortBy(_._1)
    }
    got.foreach { case (id, codes, hamF, hamS) =>
      val v = vec(id.toInt, 130)
      assert(codes === BinaryQuantExprs.packLocal(v).toSeq, s"codes mismatch id=$id")
      assert(hamF === refHam(v, q), s"fused hamming mismatch id=$id")
      assert(hamS === hamF, s"stored != fused id=$id")
    }
  }

  test("unequal lengths: tail positions on either side count their set bits as differences") {
    val doc = Array(1.0f, -1.0f, 1.0f) // 3-dim, bits {0, 2}
    val qLong = Array(1.0f, -1.0f, 1.0f, 1.0f, -1.0f, 1.0f) // bits {0, 2, 3, 5}
    val qShort = Array(-1.0f) // no bits
    assert(BinaryQuantExprs.hammingFusedLocal(doc, qLong) === 2L) // bits 3, 5
    assert(BinaryQuantExprs.hammingFusedLocal(doc, qShort) === 2L) // bits 0, 2
    // doc longer than query across a word boundary
    val doc70 = new Array[Float](70)
    doc70(0) = 1f
    doc70(69) = 1f
    assert(BinaryQuantExprs.hammingFusedLocal(doc70, Array(1.0f)) === 1L) // bit 69
  }

  test("bqTopK: ham is the sign-mismatch count; rerank at full depth equals brute force") {
    val vs = (0 until 60).map(i => (i.toLong, vec(i, 16).toSeq))
    val df = vs.toDF("vec_id", "embedding")
      .select(col("vec_id"), col("embedding").cast("array<float>").as("embedding"))
    val q = vec(7, 16)
    val plain = withStrictCodegen {
      Similarity.bqTopK(df, "vec_id", "embedding", q, 10)
        .as[(Long, Long, Double)].collect().toSeq
    }
    plain.foreach { case (id, ham, _) =>
      assert(ham === refHam(vec(id.toInt, 16), q), s"ham mismatch id=$id")
    }
    // ordering: ham asc then id asc
    assert(plain === plain.sortBy(r => (r._2, r._1)))
    val reranked = Similarity.bqTopK(df, "vec_id", "embedding", q, 10, rerank = 60)
      .as[(Long, Double)].collect().toSeq
    val brute = Similarity
      .bruteForceTopK(df, "vec_id", "embedding", q.map(_.toDouble).toSeq, 10)
      .as[(Long, Double)].collect().toSeq
    assert(reranked === brute, "full-depth rerank must equal exact brute force")
  }

  test("bqTopKExpanded: expanded Hamming matches the local expand+pack reference; full depth equals brute force") {
    import graft.functions.expressions.SrpExpandExpr
    val vs = (0 until 60).map(i => (i.toLong, vec(i, 16).toSeq))
    val df = vs.toDF("vec_id", "embedding")
      .select(col("vec_id"), col("embedding").cast("array<float>").as("embedding"))
    val q = vec(7, 16)
    // the candidate tier's metric is Hamming between EXPANDED sign
    // patterns — checked against the driver-side twin per row
    val qx = SrpExpandExpr.expandLocal(q, 48, "rp")
    val cand = df.select(col("vec_id"),
        graft.functions.expressions.BinaryQuantExprs.bqHamming(
          SrpExpandExpr.srpExpand(col("embedding"), 48, "rp"),
          BinaryQuantExprs.packLocal(qx)).as("ham"))
      .as[(Long, Long)].collect().toMap
    vs.foreach { case (id, v) =>
      val vx = SrpExpandExpr.expandLocal(v.toArray, 48, "rp")
      assert(cand(id) === refHam(vx, qx), s"expanded ham mismatch id=$id")
    }
    // at full candidate depth the exact re-rank IS brute force — the
    // expansion can only change the candidate ORDER, never the result
    val expanded = Similarity.bqTopKExpanded(
        df, "vec_id", "embedding", q, 10, rerank = 60, outDim = 48)
      .as[(Long, Double)].collect().toSeq
    val brute = Similarity
      .bruteForceTopK(df, "vec_id", "embedding", q.map(_.toDouble).toSeq, 10)
      .as[(Long, Double)].collect().toSeq
    assert(expanded === brute, "full-depth expanded rerank must equal exact brute force")
  }

  test("bqTopKFromCodes equals the fused path over the quantized artifact") {
    val vs = (0 until 50).map(i => (i.toLong, vec(i + 3, 40).toSeq))
    val df = vs.toDF("vec_id", "embedding")
      .select(col("vec_id"), col("embedding").cast("array<float>").as("embedding"))
    val q = vec(11, 40)
    val codes = Similarity.binaryQuantize(df, "vec_id", "embedding")
    val fromCodes = Similarity.bqTopKFromCodes(codes, "vec_id", "codes", q, 8)
      .as[(Long, Long)].collect().toSeq
    val fused = Similarity.bqTopK(df, "vec_id", "embedding", q, 8)
      .select("vec_id", "ham").as[(Long, Long)].collect().toSeq
    assert(fromCodes === fused)
  }

  test("null vector yields null codes and null hamming") {
    val df = Seq((1L, Some(Seq(1.0f, -1.0f))), (2L, None))
      .toDF("id", "v").select(col("id"), col("v").cast("array<float>").as("v"))
    val got = df.select(
        col("id"),
        BinaryQuantExprs.bqCodes(col("v")).as("c"),
        BinaryQuantExprs.bqHamming(col("v"), Array(1L)).as("h"))
      .as[(Long, Option[Seq[Long]], Option[Long])].collect().toSeq.sortBy(_._1)
    assert(got(0)._2.isDefined && got(0)._3.isDefined)
    assert(got(1)._2.isEmpty && got(1)._3.isEmpty)
  }

  test("srp_expand: null vector -> null; mixed input dims and null ELEMENTS fail loud") {
    import graft.functions.expressions.SrpExpandExpr
    // null vector passes through as null (the family contract)
    val dfNull = Seq((1L, Some(Seq(1.0f, -1.0f, 0.5f, 2.0f))), (2L, None))
      .toDF("id", "v").select(col("id"), col("v").cast("array<float>").as("v"))
    val gotNull = dfNull
      .select(col("id"), SrpExpandExpr.srpExpand(col("v"), 8, "t0").as("x"))
      .as[(Long, Option[Seq[Float]])].collect().toSeq.sortBy(_._1)
    assert(gotNull(0)._2.isDefined && gotNull(1)._2.isEmpty)
    // mixed dimensions in ONE column: the sign matrix is a function of
    // inDim, so differing lengths would silently project through
    // different matrices — must error (ADVICE r20 #3)
    val dfMixed = Seq((1L, Seq(1.0f, -1.0f)), (2L, Seq(1.0f, -1.0f, 0.5f)))
      .toDF("id", "v").select(col("id"), col("v").cast("array<float>").as("v"))
    val eMixed = intercept[Exception] {
      dfMixed.select(SrpExpandExpr.srpExpand(col("v"), 8, "t1")).collect()
    }
    assert(eMixed.getMessage.contains("mixed input dimensions"),
      s"unexpected: ${eMixed.getMessage}")
    // a null ELEMENT would read as 0.0 through getFloat — outside the
    // null-vector contract, must error (ADVICE r20 #4)
    val dfElemNull = Seq((1L, Seq(Some(1.0f), None, Some(0.5f))))
      .toDF("id", "v").select(col("id"), col("v").cast("array<float>").as("v"))
    val eElem = intercept[Exception] {
      dfElemNull.select(SrpExpandExpr.srpExpand(col("v"), 8, "t2")).collect()
    }
    assert(eElem.getMessage.contains("null vector element"),
      s"unexpected: ${eElem.getMessage}")
  }
}
