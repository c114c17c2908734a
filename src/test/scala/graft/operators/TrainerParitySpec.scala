package graft.operators

import graft.SparkTestBase
import graft.functions.expressions.{Int8Exprs, PresenceDotExpr}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Pins the r21 trainer restructure (per-iteration Catalyst plan +
  * explode/groupBy exchange + collect → one persisted primitive RDD +
  * treeAggregate) to BIT-IDENTICAL weights: each test re-runs the r20
  * DataFrame loop verbatim (inlined here as the reference) next to the
  * production [[QualityClassifier.train]] / [[EmbeddingProbe.train]]
  * and compares whole weight arrays. Also pins the [[QualityClassifier
  * .errMicro]] Scala twin against the in-plan expression it replaces,
  * over margins chosen to stress the round() boundary.
  */
class TrainerParitySpec extends SparkTestBase {
  import spark.implicits._

  /** The r20 QualityClassifier.train loop, verbatim (the reference). */
  private def trainPresenceR20(
      feats: DataFrame,
      featsCol: String,
      labelCol: String,
      width: Int,
      iters: Int,
      lr: Double): Array[Long] = {
    val cached = feats.select(col(featsCol), col(labelCol)).localCheckpoint()
    val n = cached.count()
    val w = new Array[Long](width)
    if (n == 0L) return w
    var t = 0
    while (t < iters) {
      val wlit = typedLit(w.toSeq)
      val z = PresenceDotExpr.presenceDot(col(featsCol), wlit)
      val m = z.cast("double") / lit(1000000.0)
      val pMicro = round(
        (lit(0.5) * (lit(1.0) + m / (lit(1.0) + abs(m)))) * lit(1000000.0))
        .cast("long")
      val e = (pMicro - col(labelCol) * lit(1000000L)).as("e")
      val grads = cached
        .select(col(featsCol), e)
        .select(explode(col(featsCol)).as("feat"), col("e"))
        .groupBy("feat")
        .agg(sum("e").as("g"))
        .collect()
      grads.foreach { r =>
        val f = r.getLong(0)
        if (f >= 0L && f < width)
          w(f.toInt) -= QualityClassifier.roundHalfUp(
            r.getLong(1).toDouble / n.toDouble * lr)
      }
      t += 1
    }
    w
  }

  /** The r20 EmbeddingProbe.train loop, verbatim (the reference). */
  private def trainInt8R20(
      feats: DataFrame,
      codesCol: String,
      labelCol: String,
      width: Int,
      iters: Int,
      lr: Double): Array[Long] = {
    val cached = feats.select(col(codesCol), col(labelCol)).localCheckpoint()
    val n = cached.count()
    val w = new Array[Long](width)
    if (n == 0L) return w
    var t = 0
    while (t < iters) {
      val z = Int8Exprs.int8Dot(col(codesCol), w)
      val m = z.cast("double") / lit(1000000.0)
      val pMicro = round(
        (lit(0.5) * (lit(1.0) + m / (lit(1.0) + abs(m)))) * lit(1000000.0))
        .cast("long")
      val e = (pMicro - col(labelCol) * lit(1000000L)).as("e")
      val grads = cached
        .select(col(codesCol), e)
        .select(posexplode(col(codesCol)).as(Seq("j", "c")), col("e"))
        .groupBy("j")
        .agg(sum(col("e") * col("c").cast("long")).alias("g"))
        .collect()
      grads.foreach { r =>
        val j = r.getInt(0)
        if (j >= 0 && j < width)
          w(j) -= QualityClassifier.roundHalfUp(
            r.getLong(1).toDouble / n.toDouble * lr)
      }
      t += 1
    }
    w
  }

  test("errMicro matches the in-plan round((0.5*(1+m/(1+|m|)))*1e6) chain " +
    "across boundary margins") {
    // margins that put (0.5*(1+m/(1+|m|)))*1e6 near .5 boundaries, the
    // zero margin, large |z|, and both signs
    val zs: Seq[Long] = Seq(
      0L, 1L, -1L, 3L, -3L, 500000L, -500000L, 999999L, -999999L,
      1000000L, -1000000L, 1000001L, 2000000L, -2000000L, 3000000L,
      333333L, -333333L, 666667L, 123456789L, -123456789L,
      Long.MaxValue / 1000, Long.MinValue / 1000) ++
      (-2000L to 2000L by 7).map(_.toLong)
    val ys = Seq(0L, 1L)
    val rows = for (z <- zs; y <- ys) yield (z, y)
    val df = rows.toDF("z", "y")
    val m = col("z").cast("double") / lit(1000000.0)
    val pMicro = round(
      (lit(0.5) * (lit(1.0) + m / (lit(1.0) + abs(m)))) * lit(1000000.0))
      .cast("long")
    val got = withStrictCodegen {
      df.select(col("z"), col("y"),
        (pMicro - col("y") * lit(1000000L)).as("e")).collect()
    }
    got.foreach { r =>
      assert(r.getLong(2) === QualityClassifier.errMicro(r.getLong(0), r.getLong(1)),
        s"z=${r.getLong(0)} y=${r.getLong(1)}")
    }
  }

  test("presence trainer: r21 treeAggregate loop == r20 DataFrame loop, " +
    "bit for bit (incl. out-of-range features, empty arrays, null rows)") {
    val dim = 16
    val width = dim + 1 + QualityClassifier.LenBuckets
    val rows: Seq[(Seq[java.lang.Long], java.lang.Long)] =
      (0 until 97).map { i =>
        val feats: Seq[java.lang.Long] =
          if (i % 19 == 7) Seq.empty
          else Seq[java.lang.Long](
            (i % dim).toLong, ((i * 7) % dim).toLong, dim.toLong,
            (dim + 1 + (i % 16)).toLong) ++
            (if (i % 11 == 3) Seq[java.lang.Long](-1L, 9999L) else Seq.empty) ++
            (if (i % 5 == 0) Seq[java.lang.Long]((i % dim).toLong) else Seq.empty)
        (feats, java.lang.Long.valueOf((i % 3 == 0).compareTo(false).toLong))
      } ++ Seq((null: Seq[java.lang.Long], java.lang.Long.valueOf(1L)),
        (Seq[java.lang.Long](1L, 2L), null: java.lang.Long))
    val df = rows.toDF("feats", "y")
      .repartition(5) // multiple partitions: combine order must not matter
    val expected = trainPresenceR20(df, "feats", "y", width, iters = 12, lr = 16.0)
    val got = QualityClassifier.train(df, "feats", "y", width, iters = 12, lr = 16.0)
    assert(got.toSeq === expected.toSeq)
  }

  test("int8 trainer: r21 treeAggregate loop == r20 DataFrame loop, bit for bit") {
    val width = 9
    val rows: Seq[(Seq[Byte], java.lang.Long)] =
      (0 until 83).map { i =>
        val codes: Seq[Byte] =
          if (i % 17 == 5) Seq.empty
          else (0 until (if (i % 13 == 2) 12 else width)).map { j =>
            (((i * 31 + j * 7) % 255) - 127).toByte
          }
        (codes, java.lang.Long.valueOf((i % 2).toLong))
      } ++ Seq((null: Seq[Byte], java.lang.Long.valueOf(0L)))
    val df = rows.toDF("codes", "y").repartition(4)
    val expected = trainInt8R20(df, "codes", "y", width, iters = 12, lr = 0.001)
    val got = EmbeddingProbe.train(df, "codes", "y", width, iters = 12, lr = 0.001)
    assert(got.toSeq === expected.toSeq)
  }

  test("trainers: empty input returns all-zero weights") {
    val dfP = Seq.empty[(Seq[Long], Long)].toDF("feats", "y")
    assert(QualityClassifier.train(dfP, "feats", "y", 5, 3, 16.0).toSeq ===
      Seq.fill(5)(0L))
    val dfI = Seq.empty[(Seq[Byte], Long)].toDF("codes", "y")
    assert(EmbeddingProbe.train(dfI, "codes", "y", 5, 3, 0.001).toSeq ===
      Seq.fill(5)(0L))
  }
}
