package graft.operators

import graft.SparkTestBase

class SkewSpec extends SparkTestBase {
  import spark.implicits._

  test("saltedSum equals plain groupBy sum, including a pathological hot key") {
    val hot = Seq.fill(5000)(("hot", 1L))
    val rest = (1 to 100).map(i => (s"k$i", i.toLong))
    val df = (hot ++ rest).toDF("k", "v").repartition(8)

    val salted = Skew.saltedSum(df, "k", "v", "total", saltBuckets = 16)
      .as[(String, Long)].collect().toMap
    val plain = df.groupBy("k").sum("v").as[(String, Long)].collect().toMap
    assert(salted == plain)
    assert(salted("hot") == 5000L)
  }

  test("saltedCount equals plain count") {
    val df = (Seq.fill(1000)("x") ++ Seq("a", "b", "a")).toDF("k")
    val got = Skew.saltedCount(df, "k", "n", saltBuckets = 8)
      .as[(String, Long)].collect().toMap
    assert(got == Map("x" -> 1000L, "a" -> 2L, "b" -> 1L))
  }

  test("hotColdLeftJoin equals a plain left join across hot-list choices") {
    val probe = (Seq.fill(2000)(("hot", 7L)) ++
      (1 to 50).map(i => (s"k$i", i.toLong)) ++
      Seq(("missing", 99L))) // key absent from the build side
      .toDF("k", "p").repartition(8)
    val build = (Seq(("hot", 1L)) ++ (1 to 50).map(i => (s"k$i", i * 10L)))
      .toDF("k", "b")
    val plain = probe.join(build, Seq("k"), "left")
      .as[(String, Long, Option[Long])].collect().sorted.toSeq
    for (hot <- Seq(Seq("hot"), Seq("hot", "k1", "k2"), Seq("nope"), Seq.empty[String],
        Seq("hot", "hot", "k1"))) { // duplicate entries must not duplicate rows
      val hk = hot.toDF("k")
      val got = Skew.hotColdLeftJoin(probe, build, Seq("k"), hk)
        .as[(String, Long, Option[Long])].collect().sorted.toSeq
      assert(got == plain, s"hot list $hot diverged from the plain left join")
    }
  }

  test("spreadIfNarrow: spreads a narrow input to the session knob, no-ops a wide one, rows unchanged") {
    val knob = spark.conf.get("spark.sql.shuffle.partitions").toInt
    val rows = (1 to 500).map(i => (i.toLong, s"payload$i"))
    val narrow = rows.toDF("id", "v").coalesce(1)
    val spread = Skew.spreadIfNarrow(narrow, "id")
    assert(spread.rdd.getNumPartitions == knob,
      s"narrow input not spread to $knob partitions")
    assert(spread.as[(Long, String)].collect().sorted.toSeq == rows.sorted.toSeq,
      "spread changed the row set")
    val wide = rows.toDF("id", "v").repartition(knob + 7)
    val untouched = Skew.spreadIfNarrow(wide, "id")
    assert(untouched.rdd.getNumPartitions == knob + 7,
      "already-parallel input must pass through without a new exchange")
  }
}
