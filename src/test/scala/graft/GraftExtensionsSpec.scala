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
}
