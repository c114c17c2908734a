package graft.operators

import graft.SparkTestBase
import graft.functions.TextFunctions
import org.apache.spark.sql.functions._

/** Contract of [[Mixture]]: the multiplicative-weights trainer vs an
  * independent in-test twin (exact HALF_UP integer arithmetic), the
  * learning direction (above-average signal upweights), the uniform
  * smoothing floor (no source starves), the q73-style resample
  * membership, and the guard rails.
  */
class MixtureSpec extends SparkTestBase {
  import spark.implicits._

  private def rhu(x: Double): Long = new java.math.BigDecimal(x)
    .setScale(0, java.math.RoundingMode.HALF_UP).longValueExact()

  /** Independent twin of the trainer fold (separate code, same public
    * update rule).
    */
  private def twin(q: Array[Long], iters: Int, lr: Double, eps: Long): Array[Long] = {
    val k = q.length
    val epsPer = rhu(eps.toDouble / k.toDouble)
    var w = Array.fill(k)(rhu(1000000.0 / k.toDouble))
    (0 until iters).foreach { _ =>
      val s = w.sum
      val avg = rhu(w.indices.map(i => w(i) * q(i)).sum.toDouble / s.toDouble)
      val wr = w.indices.map(i => rhu(w(i).toDouble *
        (1000000L + rhu(lr * (q(i) - avg).toDouble)).toDouble / 1000000.0)).toArray
      val s2 = wr.sum
      w = wr.map(v => rhu(rhu(v.toDouble * 1000000.0 / s2.toDouble).toDouble
        * (1000000L - eps).toDouble / 1000000.0) + epsPer)
    }
    w
  }

  test("trainer equals the independent twin; above-average quality upweights") {
    val q = Array(280000L, 480000L, 680000L, 520000L)
    val got = Mixture.trainWeights(q, iters = 30, lr = 0.5, epsMicro = 100000L)
    assert(got.toSeq === twin(q, 30, 0.5, 100000L).toSeq)
    // direction: the best source ends heaviest, the worst lightest
    assert(got(2) === got.max, s"best source not heaviest: ${got.toSeq}")
    assert(got(0) === got.min, s"worst source not lightest: ${got.toSeq}")
    assert(got(2) > got(3) && got(3) > got(1), s"ordering broken: ${got.toSeq}")
    // weights remain a (rounded) distribution
    val total = got.sum
    assert(math.abs(total - 1000000L) <= q.length,
      s"weights drifted from a distribution: $total")
  }

  test("uniform smoothing: even a far-below-average source keeps >= eps/K weight") {
    val q = Array(0L, 1000000L, 1000000L, 1000000L)
    val got = Mixture.trainWeights(q, iters = 50, lr = 0.5, epsMicro = 100000L)
    val epsPer = 100000L / 4
    assert(got(0) >= epsPer, s"smoothing floor violated: ${got.toSeq}")
    assert(got(0) < got(1), "direction lost")
  }

  test("lr = 0 keeps the uniform mixture (modulo smoothing rounding)") {
    val q = Array(100000L, 900000L, 500000L)
    val got = Mixture.trainWeights(q, iters = 10, lr = 0.0, epsMicro = 100000L)
    assert(got.distinct.length === 1, s"lr=0 moved weights: ${got.toSeq}")
  }

  test("guards: lr >= 1 and epsMicro >= 1e6 are rejected; empty source set is rejected") {
    intercept[IllegalArgumentException](
      Mixture.trainWeights(Array(1L), 1, lr = 1.0, epsMicro = 0L))
    intercept[IllegalArgumentException](
      Mixture.trainWeights(Array(1L), 1, lr = 0.5, epsMicro = 1000000L))
    intercept[IllegalArgumentException](
      Mixture.trainWeights(Array.empty[Long], 1, lr = 0.5, epsMicro = 0L))
  }

  test("learnedMixture: membership equals the brute-force rate recompute; caps respected") {
    // 3 sources: tiny-high-quality (oversubscribed -> rate caps at 1000),
    // big-low-quality (samples down), mid
    val rows =
      (0 until 10).map(i => (i.toLong, "hi", "w " * 60 + "end")) ++
      (10 until 210).map(i => (i.toLong, "lo", "short text")) ++
      (210 until 310).map(i => (i.toLong, "mid", if (i % 2 == 0) "w " * 60 + "x" else "short"))
    val docs = rows.toDF("doc_id", "source", "text")
    val positive = size(split(col("text"), " ", -1)) >= 55
    val out = Mixture.learnedMixture(docs, "doc_id", "source", positive,
        budgetPermille = 500, iters = 30, lr = 0.5, epsMicro = 100000L)
      .select("doc_id", "source", "rate_pm", "weight_micro")
      .as[(Long, String, Long, Long)].collect()
    val bySrc = out.groupBy(_._2)
    // recompute expected rates from the twin
    val stats = rows.groupBy(_._2).map { case (s, rs) =>
      val n = rs.size.toLong
      val npos = rs.count(_._3.split(" ", -1).length >= 55).toLong
      (s, n, rhu(npos.toDouble * 1000000.0 / n.toDouble))
    }.toSeq.sortBy(_._1)
    val w = twin(stats.map(_._3).toArray, 30, 0.5, 100000L)
    val nTotal = stats.map(_._2).sum
    val budget = nTotal * 500 / 1000
    val expRates = stats.zipWithIndex.map { case ((s, n, _), i) =>
      s -> math.min(1000L, rhu(budget.toDouble * w(i).toDouble / 1000000.0) * 1000L / n)
    }.toMap
    // membership: exactly the hash predicate at the expected rate
    val kept = rows.filter { case (id, s, _) =>
      TextFunctions.md5Hash60Local(id.toString) % 1000 < expRates(s)
    }.map(_._1).toSet
    assert(out.map(_._1).toSet === kept, "mixture membership diverged from the rate recompute")
    // the tiny high-quality source is oversubscribed: rate capped, all kept
    assert(bySrc("hi").head._3 === 1000L)
    assert(bySrc("hi").length === 10)
    // the big low-quality source samples DOWN (rate < 1000)
    assert(bySrc("lo").head._3 < 1000L)
    // weights ride on every row and differ by source
    assert(out.map(r => (r._2, r._4)).toSet.size === 3)
  }
}
