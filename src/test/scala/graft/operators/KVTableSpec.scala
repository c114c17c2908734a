package graft.operators

import graft.SparkTestBase

class KVTableSpec extends SparkTestBase {
  import spark.implicits._

  test("merge: full-outer, missing side counts as 0, sums per key") {
    val oldT = Seq(("a", 2L), ("b", 3L)).toDF("k", "n")
    val newT = Seq(("b", 5L), ("c", 7L)).toDF("k", "n")
    val got = KVTable.merge(oldT, newT, "k", "n")
      .as[(String, Long)].collect().toMap
    assert(got == Map("a" -> 2L, "b" -> 8L, "c" -> 7L))
  }

  test("merge with an empty side is identity") {
    val oldT = Seq(("a", 2L)).toDF("k", "n")
    val empty = Seq.empty[(String, Long)].toDF("k", "n")
    assert(KVTable.merge(oldT, empty, "k", "n").as[(String, Long)].collect().toMap
      == Map("a" -> 2L))
    assert(KVTable.merge(empty, oldT, "k", "n").as[(String, Long)].collect().toMap
      == Map("a" -> 2L))
  }

  test("merge is associative on running counts") {
    val b1 = Seq(("x", 1L), ("y", 2L)).toDF("k", "n")
    val b2 = Seq(("y", 3L), ("z", 4L)).toDF("k", "n")
    val b3 = Seq(("x", 5L), ("z", 6L)).toDF("k", "n")
    val left = KVTable.merge(KVTable.merge(b1, b2, "k", "n"), b3, "k", "n")
      .as[(String, Long)].collect().toMap
    val right = KVTable.merge(b1, KVTable.merge(b2, b3, "k", "n"), "k", "n")
      .as[(String, Long)].collect().toMap
    assert(left == right)
    assert(left == Map("x" -> 6L, "y" -> 5L, "z" -> 10L))
  }

  test("topK: count desc with key tie-break, exact K rows") {
    val df = Seq(("b", 5L), ("a", 5L), ("c", 9L), ("d", 1L)).toDF("k", "n")
    val got = KVTable.topK(df, "k", "n", 3).as[(String, Long)].collect().toSeq
    assert(got == Seq(("c", 9L), ("a", 5L), ("b", 5L)))
  }
}
