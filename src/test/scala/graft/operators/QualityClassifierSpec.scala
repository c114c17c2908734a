package graft.operators

import graft.SparkTestBase
import graft.functions.expressions.{HashedBowExpr, PresenceDotExpr}
import org.apache.spark.sql.functions._

/** [[QualityClassifier]] — the hashed-BoW linear distillation trainer.
  * Pins (1) the native feature kernel against its composed-column twin,
  * (2) the driver-side HALF_UP rounding edge cases the oracle depends
  * on, (3) partitioning-independence of the whole trainer (the
  * long-micro design's entire point), (4) that fixed-budget training
  * actually learns (beats the majority class on a separable teacher),
  * and (5) the empty/degenerate inputs.
  */
class QualityClassifierSpec extends SparkTestBase {
  import spark.implicits._

  private def toks(s: String): Seq[String] =
    s.toLowerCase.split("\\s+").filter(_.nonEmpty).toSeq

  test("hashed_bow matches md5_hash60 % dim of the distinct tokens, sorted") {
    withStrictCodegen {
      val df = Seq(
        (1L, "The quick brown fox the QUICK"),
        (2L, "  "),
        (3L, "one")).toDF("id", "text")
      val got = df
        .select(col("id"), HashedBowExpr.hashedBow(col("text"), 64).as("f"))
        .collect()
        .map(r => r.getLong(0) -> r.getSeq[Long](1))
        .toMap
      def expect(s: String): Seq[Long] =
        toks(s).map(t =>
          graft.functions.TextFunctions.md5Hash60Local(t) % 64).distinct.sorted
      assert(got(1L) == expect("The quick brown fox the QUICK"))
      assert(got(2L) == Seq.empty, "zero tokens must yield NO features")
      assert(got(3L) == expect("one"))
    }
  }

  test("hashed_bow null text behaves as empty text (no features, non-null)") {
    val df = Seq((1L, Option.empty[String]), (2L, Some("word"))).toDF("id", "text")
    val rows = df
      .select(col("id"), HashedBowExpr.hashedBow(col("text"), 16).as("f"))
      .orderBy("id")
      .collect()
    assert(rows(0).getSeq[Long](1) == Seq.empty)
    assert(rows(1).getSeq[Long](1).length == 1)
  }

  test("presence_dot sums weights at feature ids, ignoring out-of-range") {
    withStrictCodegen {
      val w = Seq(10L, 20L, 30L)
      val df = Seq(
        (1L, Seq(0L, 2L)),
        (2L, Seq(1L, 1L)), // multiplicity counts twice
        (3L, Seq.empty[Long]),
        (4L, Seq(0L, 99L, -1L))).toDF("id", "f")
      val got = df
        .select(col("id"), PresenceDotExpr.presenceDot(col("f"), typedLit(w)).as("z"))
        .collect()
        .map(r => r.getLong(0) -> r.getLong(1))
        .toMap
      assert(got == Map(1L -> 40L, 2L -> 40L, 3L -> 0L, 4L -> 10L))
    }
  }

  test("roundHalfUp is half-away-from-zero on the exact double (not Math.round)") {
    assert(QualityClassifier.roundHalfUp(2.5) == 3L)
    assert(QualityClassifier.roundHalfUp(-2.5) == -3L, "Math.round would give -2")
    assert(QualityClassifier.roundHalfUp(0.49999999999999994) == 0L,
      "floor(x+0.5) misrounds the double just below one half")
    assert(QualityClassifier.roundHalfUp(-0.49999999999999994) == 0L)
    assert(QualityClassifier.roundHalfUp(7.0) == 7L)
  }

  /** Deterministic synthetic teacher corpus: "good" docs carry stopwords
    * and >= 25 tokens; "bad" docs are either stopword-free or too short
    * — the two failure classes the sf fixtures exhibit.
    */
  private def corpus(n: Int) = {
    val filler = Seq("alpha", "beta", "gamma", "delta", "epsilon", "zeta")
    (0 until n).map { i =>
      val text =
        if (i % 3 == 0) // good: stopword + 30 tokens
          ("the " + (0 until 29).map(j => filler((i + j) % filler.length)).mkString(" "))
        else if (i % 3 == 1) // bad: no stopwords, 30 tokens
          (0 until 30).map(j => filler((i * 7 + j) % filler.length)).mkString(" ")
        else // bad: stopword but only 5 tokens
          "the " + (0 until 4).map(j => filler(j)).mkString(" ")
      (i.toLong, text)
    }
  }

  test("distillGopher learns past the majority class and is partition-invariant") {
    val base = corpus(120)
    val out1 = QualityClassifier
      .distillGopher(base.toDF("doc_id", "text").repartition(1),
        "doc_id", "text", dim = 64, iters = 30, lr = 16.0,
        minTokens = 25L, minStopHits = 1L)
      .orderBy("doc_id")
      .collect()
    val out7 = QualityClassifier
      .distillGopher(base.toDF("doc_id", "text").repartition(7),
        "doc_id", "text", dim = 64, iters = 30, lr = 16.0,
        minTokens = 25L, minStopHits = 1L)
      .orderBy("doc_id")
      .collect()
    assert(out1.map(_.toSeq).toSeq == out7.map(_.toSeq).toSeq,
      "long-micro training must not depend on partitioning")
    val n = out1.length
    val pos = out1.count(_.getBoolean(1))
    val majority = math.max(pos, n - pos)
    val agree = out1.count(_.getBoolean(4))
    assert(n == 120 && pos == 40)
    assert(agree > majority,
      s"student must beat the majority class: agree=$agree majority=$majority")
  }

  test("score margins are the presence-dot of the trained weights") {
    val df = corpus(30).toDF("doc_id", "text")
    val feats = QualityClassifier.gopherFeatures(
      df, "doc_id", "text", dim = 64, minTokens = 25L, minStopHits = 1L)
    val w = QualityClassifier.train(feats, "feats", "y", 64 + 17, iters = 5)
    val scored = QualityClassifier.score(feats, "feats", w)
      .select("doc_id", "feats", "score_micro")
      .collect()
    scored.foreach { r =>
      val expect = r.getSeq[Long](1).map(f => w(f.toInt)).sum
      assert(r.getLong(2) == expect)
    }
  }

  test("train-on-sample generalizes: held-out agreement beats the majority class") {
    val base = corpus(150)
    val feats = QualityClassifier.gopherFeatures(
      base.toDF("doc_id", "text"), "doc_id", "text", dim = 64,
      minTokens = 25L, minStopHits = 1L).localCheckpoint()
    val w = QualityClassifier.train(
      feats.filter(col("doc_id") % 5 === 0), "feats", "y", 64 + 17, iters = 30)
    val heldOut = QualityClassifier.score(feats, "feats", w)
      .filter(col("doc_id") % 5 =!= 0)
      .select(col("y"), col("pred"))
      .collect()
    val n = heldOut.length
    val pos = heldOut.count(_.getLong(0) == 1L)
    val majority = math.max(pos, n - pos)
    val agree = heldOut.count(r => (r.getLong(0) == 1L) == r.getBoolean(1))
    assert(n == 120)
    assert(agree > majority,
      s"held-out agreement must beat majority: agree=$agree majority=$majority n=$n")
  }

  test("saveWeights/loadWeights round-trips; keepByScore enforces the width contract") {
    val dir = java.nio.file.Files.createTempDirectory("graft-qc-w").toString
    val w = Array.tabulate(64 + 17)(i => (i * 31 - 700).toLong)
    QualityClassifier.saveWeights(spark, w, dir)
    assert(QualityClassifier.loadWeights(spark, dir).toSeq == w.toSeq)
    val df = Seq((1L, "x")).toDF("doc_id", "text")
    intercept[IllegalArgumentException] {
      QualityClassifier.keepByScore(df, "text", w, dim = 32)
    }
  }

  test("keepByScore: stream and batch keep exactly the same rows at the same cutoff") {
    val base = corpus(90)
    val docs = base.toDF("doc_id", "text")
    val feats = QualityClassifier.gopherFeatures(
      docs, "doc_id", "text", dim = 64, minTokens = 25L, minStopHits = 1L)
    val w = QualityClassifier.train(feats, "feats", "y", 64 + 17, iters = 20)
    val batchKept = QualityClassifier
      .keepByScore(docs, "text", w, dim = 64)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(batchKept.nonEmpty && batchKept.size < 90,
      s"gate must act on the fixture: kept ${batchKept.size}/90")

    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val input = MemoryStream[(Long, String)](spark)
    val gated = QualityClassifier.keepByScore(
      input.toDF().toDF("doc_id", "text"), "text", w, dim = 64)
    val q = gated.writeStream.format("memory").queryName("qc_gate_out").start()
    try {
      input.addData(base)
      q.processAllAvailable()
      val streamKept = spark.table("qc_gate_out")
        .select("doc_id").collect().map(_.getLong(0)).toSet
      assert(streamKept == batchKept, "frozen-weight gate must be batch/stream identical")
    } finally q.stop()
  }

  test("empty corpus trains to zero weights; zero-token docs get bias+len only") {
    val empty = spark.emptyDataset[(Long, String)].toDF("doc_id", "text")
    val feats = QualityClassifier.gopherFeatures(
      empty, "doc_id", "text", dim = 16)
    val w = QualityClassifier.train(feats, "feats", "y", 16 + 17, iters = 3)
    assert(w.forall(_ == 0L))
    val one = Seq((1L, "   ")).toDF("doc_id", "text")
    val f = QualityClassifier.gopherFeatures(one, "doc_id", "text", dim = 16)
      .select("feats").head.getSeq[Long](0)
    // bias = 16, len bucket for n_tokens=0 -> 16 + 1 + (len(bin(1)) - 1) = 17
    assert(f == Seq(16L, 17L))
  }

  test("loadWeights rejects corrupt artifacts (duplicate / out-of-range feat ids)") {
    val dir = java.nio.file.Files.createTempDirectory("qc-weights").toString
    val good = s"$dir/good"
    QualityClassifier.saveWeights(spark, Array(5L, -3L, 7L), good)
    assert(QualityClassifier.loadWeights(spark, good).toSeq === Seq(5L, -3L, 7L))
    val dup = s"$dir/dup"
    Seq((0L, 1L), (0L, 2L)).toDF("feat", "w").write.parquet(dup)
    val e1 = intercept[IllegalArgumentException] {
      QualityClassifier.loadWeights(spark, dup)
    }
    assert(e1.getMessage.contains("duplicate feat id"), e1.getMessage)
    val oob = s"$dir/oob"
    Seq((0L, 1L), (5L, 2L)).toDF("feat", "w").write.parquet(oob)
    val e2 = intercept[IllegalArgumentException] {
      QualityClassifier.loadWeights(spark, oob)
    }
    assert(e2.getMessage.contains("outside [0, 2)"), e2.getMessage)
  }

  test("markSelectedCutoffs: argmax-F1 and precision-floor picks, honest all-false floor") {
    // hand-built sweep: P/R in micros
    //   cutoff -2: P=0.50 R=1.00 f1≈0.667   (max recall, fails 0.9 floor)
    //   cutoff -1: P=0.80 R=0.90 f1≈0.847   (max F1)
    //   cutoff  0: P=0.92 R=0.60 f1≈0.726   (floor-eligible, higher recall)
    //   cutoff  1: P=0.95 R=0.40 f1≈0.563   (floor-eligible)
    //   cutoff  2: P=null R=0.00 (kept nothing)
    val sweep = Seq(
      (-2L, Some(500000L), Some(1000000L)),
      (-1L, Some(800000L), Some(900000L)),
      (0L, Some(920000L), Some(600000L)),
      (1L, Some(950000L), Some(400000L)),
      (2L, None, Some(0L)))
      .toDF("cutoff_micro", "precision_micro", "recall_micro")
    val out = QualityClassifier.markSelectedCutoffs(sweep, 900000L)
      .select("cutoff_micro", "f1_micro", "sel_max_f1", "sel_recall_floor")
      .as[(Long, Option[Long], Boolean, Boolean)]
      .collect().map(r => r._1 -> r).toMap
    assert(out(-1L)._3, "argmax F1 row not selected")
    assert(out.values.count(_._3) === 1)
    assert(out(0L)._4, "precision-floor row not selected")
    assert(out.values.count(_._4) === 1)
    // f1 = 2PR/(P+R) micro: 2*0.8*0.9/1.7 = 0.847058... -> 847059
    assert(out(-1L)._2 === Some(847059L))
    assert(out(2L)._2 === None, "undefined precision must give null f1")
    // no cutoff meets an impossible floor -> all-false, never a fallback pick
    val none = QualityClassifier.markSelectedCutoffs(sweep, 990000L)
      .agg(sum(when(col("sel_recall_floor"), 1).otherwise(0))).as[Long].head()
    assert(none === 0L)
  }
}
