package graft.operators

import graft.SparkTestBase

import java.sql.Timestamp

class AsOfJoinSpec extends SparkTestBase {
  import spark.implicits._

  private def ts(m: Int): Timestamp = Timestamp.valueOf(f"2024-01-01 00:$m%02d:00")

  test("asOf: each left row gets the most recent right value at or before its time") {
    val quotes = Seq( // (key, ts, price)
      ("A", ts(0), 10.0),
      ("A", ts(10), 11.0),
      ("B", ts(5), 20.0)).toDF("sym", "ts", "price")
    val trades = Seq( // (key, ts, qty)
      ("A", ts(4), 1L), //  → price 10.0 (ts 0)
      ("A", ts(10), 2L), // → price 11.0 (simultaneous right visible)
      ("A", ts(30), 3L), // → price 11.0 (last known)
      ("B", ts(4), 4L), //  → null (no quote yet)
      ("C", ts(9), 5L) //   → null (no quotes for key)
    ).toDF("sym", "ts", "qty")

    val got = AsOfJoin.asOf(trades, quotes, "sym", "ts", "price")
      .select("sym", "qty", "asof_price")
      .collect()
      .map(r => (r.getString(0), r.getLong(1)) -> Option(r.get(2)))
      .toMap

    assert(got(("A", 1L)) == Some(10.0))
    assert(got(("A", 2L)) == Some(11.0))
    assert(got(("A", 3L)) == Some(11.0))
    assert(got(("B", 4L)) == None)
    assert(got(("C", 5L)) == None)
    // left row count preserved
    assert(got.size == 5)
  }

  private val quotes = Seq(
    ("A", ts(0), 10.0),
    ("A", ts(10), 11.0),
    ("B", ts(5), 20.0)).toDF("sym", "ts", "price")
  private val trades = Seq(
    ("A", ts(4), 1L),
    ("A", ts(10), 2L),
    ("A", ts(30), 3L),
    ("B", ts(4), 4L),
    ("C", ts(9), 5L)).toDF("sym", "ts", "qty")

  private def run(direction: String, tolSec: Option[Long]): Map[Long, Option[Any]] =
    AsOfJoin.asOf(trades, quotes, "sym", "ts", "price", direction, tolSec)
      .select("qty", "asof_price")
      .collect()
      .map(r => r.getLong(0) -> Option(r.get(1)))
      .toMap

  test("asOf forward: earliest right row at or after the left time") {
    val got = run("forward", None)
    assert(got(1L) == Some(11.0)) // next quote at ts 10
    assert(got(2L) == Some(11.0)) // simultaneous visible
    assert(got(3L) == None) //       nothing after ts 30
    assert(got(4L) == Some(20.0)) // B's quote at ts 5
    assert(got(5L) == None)
  }

  test("asOf tolerance: matches farther than the staleness bound resolve to null") {
    // backward with 5-minute tolerance: trade at ts 30 matched quote at
    // ts 10 (20 min stale) -> null; trade at ts 4 matched ts 0 -> keeps
    val got = run("backward", Some(300L))
    assert(got(1L) == Some(10.0))
    assert(got(2L) == Some(11.0)) // zero staleness
    assert(got(3L) == None) //       20 minutes > tolerance
    assert(got(4L) == None) //       no match at all
  }

  test("asOf emits the matched right timestamp (asof_ts), null when no match") {
    val rows = AsOfJoin.asOf(trades, quotes, "sym", "ts", "price")
      .select("qty", "asof_ts")
      .collect()
      .map(r => r.getLong(0) -> Option(r.get(1)))
      .toMap
    assert(rows(1L).contains(ts(0)))
    assert(rows(3L).contains(ts(10)))
    assert(rows(5L).isEmpty)
  }

  test("asOf duplicate-timestamp right rows: deterministic winner (largest value), both directions") {
    // three right rows share (key, ts) — the window tiebreak must pick
    // the same row on every run and partitioning, and asof_ts must come
    // from the SAME row as the value
    val dupQuotes = Seq(
      ("A", ts(5), 7.0), ("A", ts(5), 9.0), ("A", ts(5), 8.0),
      ("A", ts(20), 1.0)).toDF("sym", "ts", "price")
    val oneTrade = Seq(("A", ts(6), 1L)).toDF("sym", "ts", "qty")
    (1 to 3).foreach { _ =>
      val back = AsOfJoin.asOf(oneTrade, dupQuotes, "sym", "ts", "price")
        .select("asof_price", "asof_ts").collect().head
      assert(back.getDouble(0) == 9.0 && back.getTimestamp(1) == ts(5))
      val fwd = AsOfJoin.asOf(oneTrade, dupQuotes, "sym", "ts", "price", "forward")
        .select("asof_price", "asof_ts").collect().head
      assert(fwd.getDouble(0) == 1.0 && fwd.getTimestamp(1) == ts(20))
    }
    // duplicate rows at the FORWARD match point too
    val fwdDup = AsOfJoin.asOf(
        Seq(("A", ts(1), 1L)).toDF("sym", "ts", "qty"),
        dupQuotes, "sym", "ts", "price", "forward")
      .select("asof_price").collect().head.getDouble(0)
    assert(fwdDup == 9.0)
  }

  test("asOf rejects an unknown direction and a negative tolerance") {
    intercept[IllegalArgumentException] {
      AsOfJoin.asOf(trades, quotes, "sym", "ts", "price", direction = "sideways")
    }
    intercept[IllegalArgumentException] {
      AsOfJoin.asOf(trades, quotes, "sym", "ts", "price", toleranceSec = Some(-1L))
    }
  }
}
