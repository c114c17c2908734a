package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The q160 arc: calibration sweep + selection + FREEZE/REFUSE decision
  * over held-out probe scores ([[QualityClassifier.cutoffSweep]] /
  * [[QualityClassifier.markFreezeDecision]]). The decision must FREEZE
  * on a fixture whose geometry transfers across the split and REFUSE on
  * one whose labels are independent of the vectors — the held-out
  * instrument consumed by an operator, not just reported.
  */
class ProbeCalibrationSpec extends SparkTestBase {
  import spark.implicits._

  // the EmbeddingProbeSpec clusters: label tracks the vector sign
  private def separable(n: Int, dim: Int): Seq[(Long, Array[Float], Int)] =
    (0 until n).map { i =>
      val sign = if (i % 2 == 0) 1.0f else -1.0f
      val v = Array.tabulate(dim) { j =>
        sign * (1.0f / (1 << (j % 8))) + 0.07f * (((i * 31 + j * 17) % 11) - 5)
      }
      (i.toLong, v, i % 2)
    }

  // same vectors, labels DECOUPLED from the geometry (period-4 stripe
  // crosses the period-2 cluster sign — 50% agreement by construction)
  private def entangled(n: Int, dim: Int): Seq[(Long, Array[Float], Int)] =
    separable(n, dim).map { case (id, v, _) => (id, v, if (id % 4 < 2) 0 else 1) }

  /** The q160 composition on a local fixture — returns the full scored
    * table (the deployment target) and the calibration table.
    */
  private def calibrateWithScored(
      rows: Seq[(Long, Array[Float], Int)],
      accFloorMicro: Long): (DataFrame, DataFrame) = {
    val df = rows.toDF("vec_id", "embedding", "label")
    val feats = EmbeddingProbe.features(df, "vec_id", "embedding", col("label") === 0)
      .withColumn("is_train", col("vec_id") % 2 === 0)
      .localCheckpoint()
    val w = EmbeddingProbe.train(
      feats.filter(col("is_train")), "codes", "y", 17, iters = 25, lr = 0.001)
    val scored = EmbeddingProbe.score(feats, "codes", w)
      .select(
        col("vec_id"),
        (col("y") === 1L).as("label"),
        col("score_micro"),
        (col("pred") === (col("y") === 1L)).as("correct"),
        col("is_train"))
      .localCheckpoint()
    val heldOut = scored.filter(!col("is_train"))
    val cal = QualityClassifier
      .cutoffSweep(heldOut, "label", "score_micro",
        Seq(-1000000L, 0L, 1000000L))
      .transform(QualityClassifier.markSelectedCutoffs(_, 900000L))
      .transform(QualityClassifier
        .markFreezeDecision(_, heldOut, "correct", accFloorMicro))
    (scored, cal)
  }

  private def calibrate(
      rows: Seq[(Long, Array[Float], Int)],
      accFloorMicro: Long): DataFrame =
    calibrateWithScored(rows, accFloorMicro)._2

  test("separable fixture: held-out accuracy clears the floor and every sweep row says freeze_ok") {
    val out = calibrate(separable(160, 16), accFloorMicro = 700000L)
      .select("cutoff_micro", "holdout_acc_micro", "freeze_ok", "sel_max_f1")
      .as[(Long, Long, Boolean, Boolean)].collect()
    assert(out.length === 3)
    assert(out.forall(_._3), s"separable probe refused to freeze: ${out.toSeq}")
    assert(out.map(_._2).distinct.length === 1, "accuracy must be one scalar on every row")
    assert(out.head._2 >= 850000L, s"separable held-out acc surprisingly low: ${out.head._2}")
    assert(out.count(_._4) === 1, "argmax-F1 must select exactly one cutoff")
  }

  test("entangled fixture: coin-flip transfer is REFUSED — freeze_ok false on every row") {
    val out = calibrate(entangled(160, 16), accFloorMicro = 700000L)
      .select("holdout_acc_micro", "freeze_ok")
      .as[(Long, Boolean)].collect()
    assert(out.forall(!_._2),
      s"entangled probe froze at acc=${out.head._1} — the refuse arm is dead")
    assert(out.head._1 <= 650000L,
      s"entangled fixture unexpectedly generalized: ${out.head._1}")
  }

  test("gateIfFrozen: frozen probe gates on the selected cutoff; refused probe passes through, audited") {
    // FREEZE branch: separable geometry -> gate ON with the argmax-F1 cutoff
    val (scoredS, calS) = calibrateWithScored(separable(160, 16), 700000L)
    val cut = calS.filter(col("sel_max_f1")).select("cutoff_micro")
      .as[Long].collect().head
    val outS = QualityClassifier.gateIfFrozen(scoredS, calS, "score_micro")
      .select("vec_id", "score_micro", "gate_applied", "kept")
      .as[(Long, Long, Boolean, Boolean)].collect()
    assert(outS.forall(_._3), "frozen probe must report gate_applied on every row")
    assert(outS.forall(r => r._4 == (r._2 >= cut)),
      "frozen gate must keep exactly score >= selected cutoff")
    assert(outS.exists(_._4) && outS.exists(!_._4), "frozen gate must discriminate")
    assert(QualityClassifier.freezeDecision(calS))
    // REFUSE branch: entangled labels -> gate OFF, everything passes
    val (scoredE, calE) = calibrateWithScored(entangled(160, 16), 700000L)
    val outE = QualityClassifier.gateIfFrozen(scoredE, calE, "score_micro")
      .select("gate_applied", "kept")
      .as[(Boolean, Boolean)].collect()
    assert(outE.forall(r => !r._1 && r._2),
      "refused probe must pass every row through with gate_applied = false")
    assert(!QualityClassifier.freezeDecision(calE))
    // conflicting decisions fail loudly in the driver-side form
    val conflicted = calS.withColumn("freeze_ok", col("cutoff_micro") >= 0L)
    val e = intercept[IllegalArgumentException] {
      QualityClassifier.freezeDecision(conflicted)
    }
    assert(e.getMessage.contains("one scalar decision"))
    // an EMPTY calibration frame fails loudly in the in-plan form too
    // (min over zero rows is NULL — must not silently admit everything)
    val emptyCal = calS.filter(col("cutoff_micro") > Long.MaxValue - 1)
    val e2 = intercept[Exception] {
      QualityClassifier.gateIfFrozen(scoredS, emptyCal, "score_micro").collect()
    }
    assert(e2.getMessage.contains("calibration frame is empty"))
    // NULL score under a FROZEN gate fails closed (kept = false, never
    // NULL) — the keepByGopher/keepByScore convention (ADVICE r20 #2)
    val withNull = scoredS.limit(1)
      .withColumn("score_micro", lit(null).cast("long"))
      .unionByName(scoredS)
    val outN = QualityClassifier.gateIfFrozen(withNull, calS, "score_micro")
      .select("score_micro", "gate_applied", "kept")
      .as[(Option[Long], Boolean, Option[Boolean])].collect()
    val nullRows = outN.filter(_._1.isEmpty)
    assert(nullRows.nonEmpty)
    assert(nullRows.forall(r => r._2 && r._3.contains(false)),
      s"null score under a frozen gate must be kept = false, got ${nullRows.toSeq}")
  }

  test("cutoffSweep micro P/R pinned on a hand fixture; markFreezeDecision is exact HALF_UP") {
    // 4 held-out rows: scores 10, 5, -5, -10; labels T, F, T, F; 3 of 4 correct
    val held = Seq(
      (10L, true, true), (5L, false, true), (-5L, true, false), (-10L, false, true))
      .toDF("score_micro", "label", "correct")
    val sweep = QualityClassifier.cutoffSweep(held, "label", "score_micro", Seq(0L))
      .as[(Long, Long, Long, Long, Option[Long], Option[Long])].collect()
    // cutoff 0: kept {10,5} -> n_kept 2, tp 1, pos 2; P = 500000, R = 500000
    assert(sweep === Array((0L, 2L, 1L, 2L, Some(500000L), Some(500000L))))
    val dec = QualityClassifier.markFreezeDecision(
        QualityClassifier.cutoffSweep(held, "label", "score_micro", Seq(0L)),
        held, "correct", accFloorMicro = 750000L)
      .select("holdout_acc_micro", "freeze_ok").as[(Long, Boolean)].head()
    // 3/4 = 750000 micro exactly; floor 750000 -> freeze (>= semantics)
    assert(dec === ((750000L, true)))
    val refuse = QualityClassifier.markFreezeDecision(
        QualityClassifier.cutoffSweep(held, "label", "score_micro", Seq(0L)),
        held, "correct", accFloorMicro = 750001L)
      .select("freeze_ok").as[Boolean].head()
    assert(!refuse)
  }
}
