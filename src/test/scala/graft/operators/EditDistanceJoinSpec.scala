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
