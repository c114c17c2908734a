package graft

import graft.functions.TextFunctions

class GraftExtensionsSpec extends SparkTestBase {
  import spark.implicits._

  test("md5_hash60 callable from SQL after registration, equals the column form") {
    GraftFunctions.register(spark)
    val fromSql = spark.sql("SELECT md5_hash60('abc') AS h").as[Long].head()
    assert(fromSql == TextFunctions.md5Hash60Local("abc"))
    // over a table
    Seq("x", "y").toDF("s").createOrReplaceTempView("t_md5")
    val rows = spark.sql("SELECT s, md5_hash60(s) AS h FROM t_md5")
      .as[(String, Long)].collect().toMap
    assert(rows("x") == TextFunctions.md5Hash60Local("x"))
    assert(rows("y") == TextFunctions.md5Hash60Local("y"))
  }

  test("dot_f native expression: bit-identical to the HOF fold, null-safe, SQL-callable, codegen'd") {
    import graft.functions.{VectorFunctions => VF}
    import graft.functions.expressions.DotProductFloat
    import org.apache.spark.sql.functions.col
    GraftFunctions.register(spark)

    val df = Seq(
      (1L, Seq(1.0f, 2.5f, -3.0f), Seq(0.5f, -1.0f, 2.0f)),
      (2L, Seq(0.1f, 0.2f), Seq(0.3f, 0.4f, 9.9f)), // length mismatch → shorter prefix
      (3L, null.asInstanceOf[Seq[Float]], Seq(1.0f)) // null side → null result
    ).toDF("id", "a", "b")

    val native = df.select(col("id"), DotProductFloat.dotF(col("a"), col("b")).as("d"))
      .as[(Long, Option[Double])].collect().toMap
    val hof = df.select(col("id"), VF.dot(col("a"), col("b")).as("d"))
      .as[(Long, Option[Double])].collect().toMap

    assert(native(1L).get == hof(1L).get) // identical fold order ⇒ bit-equal
    assert(native(1L).get == 1.0f.toDouble * 0.5f + 2.5f.toDouble * -1.0f + -3.0f.toDouble * 2.0f)
    assert(native(2L).get == 0.1f.toDouble * 0.3f + 0.2f.toDouble * 0.4f)
    assert(native(3L).isEmpty)

    // SQL registration
    df.createOrReplaceTempView("t_dot")
    val sql = spark.sql("SELECT id, dot_f(a, b) AS d FROM t_dot")
      .as[(Long, Option[Double])].collect().toMap
    assert(sql == native)

    // participates in WholeStageCodegen (not CodegenFallback) — a local
    // relation constant-folds to LocalTableScan, so force a real stage
    // and let AQE finalize before inspecting
    val staged = df.repartition(2).select(DotProductFloat.dotF(col("a"), col("b")))
    staged.collect()
    val plan = staged.queryExecution.executedPlan.toString
    // the "*(n)" operator prefix is the WholeStageCodegen marker in the
    // AQE tree string — the projection computing dot_f must carry it
    assert("\\*\\(\\d+\\) Project \\[dot_f".r.findFirstIn(plan).isDefined, plan)
  }

  test("norm2_f registered alongside dot_f: the scan-side cosine is expressible from pure SQL") {
    import graft.functions.expressions.Norm2Float
    import org.apache.spark.sql.functions.col
    GraftFunctions.register(spark)

    val df = Seq(
      (1L, Seq(3.0f, 4.0f)),
      (2L, Seq(1.0f, 2.0f, 2.0f)),
      (3L, null.asInstanceOf[Seq[Float]])
    ).toDF("id", "v")
    df.createOrReplaceTempView("t_norm")

    val sql = spark.sql("SELECT id, norm2_f(v) AS n FROM t_norm")
      .as[(Long, Option[Double])].collect().toMap
    val nativeCol = df.select(col("id"), Norm2Float.norm2F(col("v")).as("n"))
      .as[(Long, Option[Double])].collect().toMap
    assert(sql == nativeCol)
    assert(sql(1L).get == 5.0)
    assert(sql(2L).get == 3.0)
    assert(sql(3L).isEmpty)

    // full cosine from SQL only — the expression surface the Column API uses
    val cos = spark.sql(
      """SELECT a.id, dot_f(a.v, b.v) / (norm2_f(a.v) * norm2_f(b.v)) AS c
         FROM t_norm a JOIN t_norm b ON b.id = 1 WHERE a.id = 1""")
      .as[(Long, Double)].head()
    assert(cos == ((1L, 1.0)))
  }

  test("sorted_intersect_count: equals the local merge loop, null-safe, SQL-callable, codegen'd") {
    import graft.functions.TextFunctions
    import graft.functions.expressions.SortedIntersectCountLong
    import org.apache.spark.sql.functions.col
    GraftFunctions.register(spark)

    val df = Seq(
      (1L, Seq(1L, 3L, 5L, 9L), Seq(2L, 3L, 5L, 10L)), //        {3,5} common
      (2L, Seq.empty[Long], Seq(1L, 2L)), //                     disjoint with empty
      (3L, Seq(7L), Seq(7L)), //                                 identical singletons
      (4L, null.asInstanceOf[Seq[Long]], Seq(1L)) //             null side → null
    ).toDF("id", "a", "b")

    val native = df
      .select(col("id"), SortedIntersectCountLong.intersectCountF(col("a"), col("b")).as("c"))
      .as[(Long, Option[Long])].collect().toMap
    assert(native(1L).contains(2L))
    assert(native(2L).contains(0L))
    assert(native(3L).contains(1L))
    assert(native(4L).isEmpty)
    // parity with the JVM twin used by the dedup specs
    assert(native(1L).get ==
      TextFunctions.sortedIntersectCount(Array(1L, 3L, 5L, 9L), Array(2L, 3L, 5L, 10L)).toLong)

    // SQL registration
    df.createOrReplaceTempView("t_isect")
    val sql = spark.sql("SELECT id, sorted_intersect_count(a, b) AS c FROM t_isect")
      .as[(Long, Option[Long])].collect().toMap
    assert(sql == native)

    // stays inside WholeStageCodegen (no CodegenFallback, no UDF boundary)
    val staged = df.repartition(2)
      .select(SortedIntersectCountLong.intersectCountF(col("a"), col("b")))
    staged.collect()
    val plan = staged.queryExecution.executedPlan.toString
    assert("\\*\\(\\d+\\) Project \\[sorted_intersect_count".r.findFirstIn(plan).isDefined, plan)
  }

  test("heavy_hitters aggregate callable from SQL with literal sizing") {
    GraftFunctions.register(spark)
    Seq(("a", "x"), ("a", "x"), ("a", "y"), ("b", "z"))
      .toDF("g", "item").createOrReplaceTempView("t_hh")
    val rows = spark.sql(
      """SELECT g, h.item, h.est_count
         FROM (SELECT g, heavy_hitters(item, 8, 2) AS hh FROM t_hh GROUP BY g)
         LATERAL VIEW explode(hh) AS h""")
      .as[(String, String, Long)].collect().toSet
    assert(rows == Set(("a", "x", 2L), ("a", "y", 1L), ("b", "z", 1L)))
    // non-literal sizing is rejected at plan time
    val err = intercept[Exception] {
      spark.sql("SELECT heavy_hitters(item, length(item), 2) FROM t_hh").collect()
    }
    assert(err.getMessage.contains("INT literal") ||
      err.getCause != null && err.getCause.getMessage.contains("INT literal"), err.getMessage)
  }
}
