package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** PassJoin segment blocking must lose NO pair the exact quadratic
  * levenshtein join finds — parity here is against brute force on a
  * deterministic corpus engineered for the tricky shapes: lengths
  * below the segment count, empty strings, exact duplicates, hot
  * shared prefixes, and edits at segment boundaries.
  */
class EditDistanceJoinSpec extends SparkTestBase {
  import spark.implicits._

  private def brute(df: DataFrame, d: Int): Set[(String, String, Int)] = {
    val a = df.select(col("id").alias("aid"), col("k").alias("ak"))
    val b = df.select(col("id").alias("bid"), col("k").alias("bk"))
    a.crossJoin(b)
      .filter(col("aid") < col("bid"))
      .withColumn("dist", levenshtein(col("ak"), col("bk")))
      .filter(col("dist") <= d)
      .select("aid", "bid", "dist")
      .as[(String, String, Int)]
      .collect()
      .toSet
  }

  private def blocked(df: DataFrame, d: Int): Set[(String, String, Int)] =
    EditDistanceJoin.selfJoin(df, "id", "k", d)
      .as[(String, String, Int)]
      .collect()
      .toSet

  // deterministic word-salad corpus: a small vocab recombined by index
  // arithmetic, then targeted mutations (substitute / insert / delete /
  // boundary edits) applied to alternating rows so every edit class is
  // represented at every distance 0..4
  private def corpus(n: Int): DataFrame = {
    val vocab = Vector("key", "agg", "row", "scan", "slow", "fast", "tbl", "val")
    val rows = (0 until n).map { i =>
      val base = (0 until 4).map(j => vocab((i / (j + 1) + j) % vocab.size)).mkString(" ")
      val s = i % 7 match {
        case 0 => base
        case 1 => base.updated(base.length / 2, 'Z') // substitute mid
        case 2 => base.drop(1) // delete at segment 0 boundary
        case 3 => base + "x" // insert at tail
        case 4 => "Q" + base.dropRight(2) // shift the whole string
        case 5 => base.take(3) // shorter than the segment count
        case 6 => base.updated(0, 'A').updated(base.length - 1, 'B')
      }
      (i.toString, s)
    } :+ ("e1", "") :+ ("e2", "") :+ ("e3", "ab")
    rows.toDF("id", "k")
  }

  test("parity with brute force at maxDist 0..4 incl. empty and short strings") {
    val df = corpus(60).cache()
    for (d <- 0 to 4) {
      val exact = brute(df, d)
      val fast = blocked(df, d)
      assert(fast === exact, s"maxDist=$d: blocking lost or invented pairs")
      if (d >= 2) assert(exact.nonEmpty, s"maxDist=$d: fixture produced no pairs — weak test")
    }
  }

  test("incremental join: parity with the exact corpus-x-batch product") {
    val df = corpus(60).cache()
    val batch = df.filter(col("id").rlike("^[0-9]+$") && col("id").cast("int") % 5 === 0)
    for (d <- 0 to 3) {
      val exact = df.select(col("id").alias("cid"), col("k").alias("ck"))
        .crossJoin(batch.select(col("id").alias("bid"), col("k").alias("bk")))
        .filter(col("cid") =!= col("bid"))
        .withColumn("dist", levenshtein(col("ck"), col("bk")))
        .filter(col("dist") <= d)
        .select("cid", "bid", "dist")
        .as[(String, String, Int)].collect().toSet
      val fast = EditDistanceJoin.incrementalJoin(df, batch, "id", "k", d)
        .as[(String, String, Int)].collect().toSet
      assert(fast === exact, s"maxDist=$d: incremental blocking lost or invented pairs")
      if (d >= 2) assert(exact.nonEmpty, s"maxDist=$d: fixture produced no pairs — weak test")
    }
  }

  test("incremental join: batch docs match their own corpus twins but not themselves") {
    val corpusDf = Seq(("1", "alpha"), ("2", "alpha"), ("3", "beta")).toDF("id", "k")
    val batchDf = Seq(("1", "alpha")).toDF("id", "k")
    val out = EditDistanceJoin.incrementalJoin(corpusDf, batchDf, "id", "k", 1)
      .as[(String, String, Int)].collect().toSet
    assert(out === Set(("2", "1", 0)))
  }

  test("incrementalKeep: corpus dups drop, intra-batch groups keep min id, chains stay greedy") {
    val corpusState = Seq((100L, "hello world")).toDF("id", "key")
    // 1 matches corpus (drop); 2/3 form an intra-batch pair (2 kept);
    // 4 is a chain hop from 3 only (2..4 dist 2 via 3) — CC groups the
    // chain, so 4 lands in 2's component and drops (documented
    // min-id-per-component rule, not sequential-greedy)
    val batch = Seq(
      (1L, "hello worlds"), (2L, "graft engine"), (3L, "graft enginee"),
      (4L, "graft engineee"), (5L, "unrelated thing")).toDF("doc_id", "k")
    val out = EditDistanceJoin
      .incrementalKeep(batch, corpusState.toDF("doc_id", "k"), "doc_id", "k", 1)
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(out === Set(
      (1L, 1L, -1L, 0L),
      (2L, 0L, 2L, 1L),
      (3L, 0L, 2L, 0L),
      (4L, 0L, 2L, 0L),
      (5L, 0L, 5L, 1L)))
  }

  // ==== maxBlockFreq guard ==================================================

  // driver-side reference implementation of the guarded semantics —
  // the SAME predicate the q141 DuckDB oracle re-derives: a pair
  // (a, b), a.id < b.id, dist <= d survives iff at least one of a's
  // d+1 index segments (i) is under the cap and (ii) occurs verbatim
  // in b at the segment's position shifted by at most d.
  private def refGuarded(
      rows: Seq[(String, String)], d: Int, cap: Int): Set[(String, String, Int)] = {
    val nSeg = d + 1
    def segLen(l: Int, i: Int) = l / nSeg + (if (i >= nSeg - l % nSeg) 1 else 0)
    def segStart(l: Int, i: Int) = i * (l / nSeg) + math.max(0, i - (nSeg - l % nSeg))
    def lev(a: String, b: String): Int = {
      val dp = Array.tabulate(a.length + 1)(identity)
      for (j <- 1 to b.length) {
        var prev = dp(0); dp(0) = j
        for (i <- 1 to a.length) {
          val cur = dp(i)
          dp(i) = math.min(math.min(dp(i) + 1, dp(i - 1) + 1),
            prev + (if (a(i - 1) == b(j - 1)) 0 else 1))
          prev = cur
        }
      }
      dp(a.length)
    }
    val keys = rows.filter(_._2 != null)
    val freq = keys
      .flatMap { case (_, k) => (0 to d).map(i => (k.length, i, k.substring(segStart(k.length, i), segStart(k.length, i) + segLen(k.length, i)))) }
      .groupBy(identity).view.mapValues(_.size).toMap
    (for {
      (aid, ak) <- keys
      (bid, bk) <- keys
      if aid < bid
      dist = lev(ak, bk)
      if dist <= d
      if (0 to d).exists { i =>
        val st = segStart(ak.length, i)
        val sl = segLen(ak.length, i)
        val seg = ak.substring(st, st + sl)
        freq((ak.length, i, seg)) <= cap &&
          (math.max(0, st - d) to math.min(bk.length - sl, st + d))
            .exists(p => bk.substring(p, p + sl) == seg)
      }
    } yield (aid, bid, dist)).toSet
  }

  test("maxBlockFreq: a loose cap reproduces the exact control") {
    val df = corpus(60).cache()
    for (d <- 0 to 3) {
      val exact = blocked(df, d)
      val guarded = EditDistanceJoin.selfJoin(df, "id", "k", d, maxBlockFreq = Some(63))
        .as[(String, String, Int)].collect().toSet
      assert(guarded === exact, s"maxDist=$d: loose cap changed the output")
    }
  }

  test("maxBlockFreq: hot-prefix pairs drop, cold-segment pairs survive, semantics match the reference predicate") {
    // 30 same-length keys share the boilerplate first half "AAAA"
    // (one hot block at d=1) but have pairwise-distant second halves
    // EXCEPT two planted pairs:
    //  - (h1, h2): suffixes one edit apart -> connected ONLY via the
    //    hot prefix block -> must drop under the cap;
    //  - (c1, c2): identical suffix, prefix one edit apart ->
    //    connected via the COLD suffix block -> must survive.
    val hot = (0 until 26).map(i => (f"z$i%02d", "AAAA" + ('a' + i).toChar.toString * 4))
    val rows = hot ++ Seq(
      ("h1", "AAAA0001"), ("h2", "AAAA0002"),
      ("c1", "AAAAtail"), ("c2", "AAABtail"))
    val df = rows.toDF("id", "k")
    val d = 1
    val cap = 10
    val exact = brute(df, d)
    assert(exact.contains(("h1", "h2", 1)) && exact.contains(("c1", "c2", 1)))
    val guarded = EditDistanceJoin.selfJoin(df, "id", "k", d, maxBlockFreq = Some(cap))
      .as[(String, String, Int)].collect().toSet
    assert(guarded.subsetOf(exact), "guard invented pairs")
    assert(!guarded.exists(p => p._1 == "h1" && p._2 == "h2"),
      "hot-block-only pair should be suppressed by the cap")
    assert(guarded.contains(("c1", "c2", 1)),
      "cold-segment pair must survive the cap")
    assert(guarded === refGuarded(rows, d, cap),
      "engine semantics diverged from the documented survive-predicate")
    // the bound witness: every surviving pair has a connecting block
    // at or under the cap (that is WHY per-block candidate volume is
    // bounded by cap * probes-per-block)
  }

  test("maxBlockFreq: reference-predicate parity across caps on the word-salad corpus") {
    val rowsSeq = (0 until 60).map { i =>
      val vocab = Vector("key", "agg", "row", "scan", "slow", "fast", "tbl", "val")
      val base = (0 until 4).map(j => vocab((i / (j + 1) + j) % vocab.size)).mkString(" ")
      val s = i % 7 match {
        case 0 => base
        case 1 => base.updated(base.length / 2, 'Z')
        case 2 => base.drop(1)
        case 3 => base + "x"
        case 4 => "Q" + base.dropRight(2)
        case 5 => base.take(3)
        case 6 => base.updated(0, 'A').updated(base.length - 1, 'B')
      }
      (i.toString, s)
    } :+ ("e1", "") :+ ("e2", "") :+ ("e3", "ab")
    val df = rowsSeq.toDF("id", "k").cache()
    for (cap <- Seq(1, 2, 4, 8, 16)) {
      val got = EditDistanceJoin.selfJoin(df, "id", "k", 2, maxBlockFreq = Some(cap))
        .as[(String, String, Int)].collect().toSet
      assert(got === refGuarded(rowsSeq, 2, cap), s"cap=$cap diverged")
    }
  }

  test("maxBlockFreq rejects a non-positive cap") {
    val df = Seq(("1", "abc")).toDF("id", "k")
    intercept[IllegalArgumentException] {
      EditDistanceJoin.selfJoin(df, "id", "k", 1, maxBlockFreq = Some(0))
    }
  }

  test("null keys are dropped, not matched") {
    val df = Seq(("1", "abc"), ("2", "abd"), ("3", null)).toDF("id", "k")
    val out = blocked(df, 1)
    assert(out === Set(("1", "2", 1)))
  }

  test("exact duplicates pair at distance 0 exactly once") {
    val df = Seq(("a", "same"), ("b", "same"), ("c", "same")).toDF("id", "k")
    val out = blocked(df, 0)
    assert(out === Set(("a", "b", 0), ("a", "c", 0), ("b", "c", 0)))
  }

  test("dist column honors the banded threshold (no -1 leaks through)") {
    val df = Seq(("1", "aaaaaaaa"), ("2", "bbbbbbbb"), ("3", "aaaaaaab")).toDF("id", "k")
    val out = blocked(df, 1)
    assert(out === Set(("1", "3", 1)))
  }
}
