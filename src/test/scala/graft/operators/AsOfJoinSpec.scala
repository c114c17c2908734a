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
}
