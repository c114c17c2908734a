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

  test("vector_micro_sum aggregate callable from SQL, equals the Column form") {
    GraftFunctions.register(spark)
    Seq((0L, Seq(1.0f, -2.0f)), (0L, Seq(0.5f, 0.25f)), (1L, Seq(2.0f, 2.0f)))
      .toDF("g", "v").createOrReplaceTempView("t_vs")
    val rows = spark.sql(
      """SELECT g, vs.n, vs.micro FROM
           (SELECT g, vector_micro_sum(v) AS vs FROM t_vs GROUP BY g)""")
      .as[(Long, Long, Seq[Long])].collect().map(r => r._1 -> r).toMap
    assert(rows(0L)._2 == 2L && rows(0L)._3 == Seq(1500000L, -1750000L))
    assert(rows(1L)._2 == 1L && rows(1L)._3 == Seq(2000000L, 2000000L))
    // type discipline: non-float-array input fails analysis
    val err = intercept[Exception] {
      spark.sql("SELECT vector_micro_sum(g) FROM t_vs").collect()
    }
    assert(err.getMessage.toLowerCase.contains("array<float>"), err.getMessage)
  }

  test("shingle_hash_set / shingle_mod_hashes: bit-identical to the UDF twins incl. null text") {
    import graft.functions.expressions.{ShingleHashSetExpr, ShingleModHashesExpr}
    import org.apache.spark.sql.functions.col
    GraftFunctions.register(spark)

    val texts = Seq(
      (1L, "the quick brown fox jumps over the lazy dog the quick brown fox"),
      (2L, "short"),
      (3L, ""),
      (4L, null.asInstanceOf[String]),
      (5L, "Émoji 🎉 and    runs\tof   whitespace and DUP dup DuP tokens dup"))
      .toDF("id", "text")

    for (n <- Seq(1, 3)) {
      val fromExpr = texts
        .select(col("id"), ShingleHashSetExpr.shingleHashSet(col("text"), n).alias("hs"))
        .as[(Long, Seq[Long])].collect().toMap
      val fromUdf = texts
        .select(col("id"), TextFunctions.distinctShingleHashesUdf(n)(col("text")).alias("hs"))
        .as[(Long, Seq[Long])].collect().toMap
      assert(fromExpr == fromUdf, s"shingle_hash_set n=$n diverged from UDF twin")

      val modExpr = texts
        .select(col("id"), ShingleModHashesExpr.shingleModHashes(col("text"), n).alias("hs"))
        .as[(Long, Seq[Long])].collect().toMap
      val modUdf = texts
        .select(col("id"), TextFunctions.shingleHashesUdf(n)(col("text")).alias("hs"))
        .as[(Long, Seq[Long])].collect().toMap
      assert(modExpr == modUdf, s"shingle_mod_hashes n=$n diverged from UDF twin")
    }

    // null text behaves as empty text (the UDF twins' semantics): one
    // hash (the empty shingle), never SQL NULL
    val nullRow = texts.filter(col("id") === 4L)
      .select(ShingleHashSetExpr.shingleHashSet(col("text"), 3))
      .as[Seq[Long]].head()
    assert(nullRow == Seq(TextFunctions.md5Hash60Local("")))

    // SQL surface with literal n; non-literal n rejected at plan time
    texts.createOrReplaceTempView("t_shingle")
    val sqlRows = spark.sql("SELECT id, shingle_hash_set(text, 3) AS hs FROM t_shingle")
      .as[(Long, Seq[Long])].collect().toMap
    assert(sqlRows(1L).nonEmpty && sqlRows(1L) == sqlRows(1L).sorted.distinct)
    val err2 = intercept[Exception] {
      spark.sql("SELECT shingle_hash_set(text, CAST(id AS INT)) FROM t_shingle").collect()
    }
    assert(err2.getMessage.contains("INT literal") ||
      err2.getCause != null && err2.getCause.getMessage.contains("INT literal"), err2.getMessage)

    // stays inside whole-stage codegen (no UDF boundary): over a real
    // source (a local Seq would constant-fold to a LocalTableScan), the
    // projection must sit inside a WholeStageCodegen span with no UDF
    // codegen.fallback=false makes a janino compile failure FATAL instead
    // of a silent interpreted fallback — this catches e.g. the generated
    // static call not resolving (a class member shadowing the companion's
    // static forwarder did exactly that)
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val planned = docs.select(ShingleHashSetExpr.shingleHashSet(col("text"), 3).alias("hs"))
    withStrictCodegen(planned.collect())
    val plan = planned.queryExecution.executedPlan.toString
    assert("\\*\\(\\d+\\) Project \\[shingle_hash_set".r.findFirstIn(plan).isDefined,
      s"expected shingle_hash_set inside a WholeStageCodegen projection:\n$plan")
    assert(!plan.toLowerCase.contains("scalaudf"), plan)
  }

  test("shingle_hash60s / cut_covered_spans: ordered gram stream + doc-local cut, codegen'd") {
    import graft.functions.expressions.{CutCoveredSpansExpr, ShingleHash60sExpr}
    import org.apache.spark.sql.functions.{col, typedlit}
    GraftFunctions.register(spark)

    val texts = Seq(
      (1L, "the quick brown fox jumps over the lazy dog the quick brown fox"),
      (2L, "short"),
      (3L, ""),
      (4L, null.asInstanceOf[String]),
      (5L, "Émoji 🎉 and    runs\tof   whitespace and DUP dup DuP tokens dup"))
      .toDF("id", "text")

    // order-preserving, multiplicity kept: exactly the closure loop
    // `md5Hash60Local ∘ shinglesLocal ∘ tokensLocal` it replaces
    for (n <- Seq(1, 3)) {
      val fromExpr = texts
        .select(col("id"), ShingleHash60sExpr.shingleHash60s(col("text"), n).alias("hs"))
        .as[(Long, Seq[Long])].collect().toMap
      val local = texts.as[(Long, String)].collect().map { case (id, t) =>
        id -> TextFunctions.shinglesLocal(TextFunctions.tokensLocal(t), n)
          .map(TextFunctions.md5Hash60Local).toSeq
      }.toMap
      assert(fromExpr == local, s"shingle_hash60s n=$n diverged from the local loop")
    }

    // cut kernel: unsorted starts, overlapping windows merged, window
    // ends clipped by the token count, empty starts = identity
    val toks = Seq(
      (1L, Seq("a", "b", "c", "d", "e", "f", "g"), Seq(4, 0, 1)),
      (2L, Seq("a", "b", "c"), Seq(2)), //        window runs past the end
      (3L, Seq("a", "b", "c"), Seq.empty[Int]), // nothing covered
      (4L, Seq.empty[String], Seq(0)) //          empty doc, covered anyway
    ).toDF("id", "t", "starts")
    val cut = toks
      .select(col("id"), CutCoveredSpansExpr.cutCoveredSpans(col("t"), col("starts"), 2).alias("kept"))
      .as[(Long, Seq[String])].collect().toMap
    assert(cut(1L) == Seq("d", "g"), cut(1L)) // [0,2)∪[1,3)∪[4,6) covered
    assert(cut(2L) == Seq("a", "b"), cut(2L))
    assert(cut(3L) == Seq("a", "b", "c"), cut(3L))
    assert(cut(4L) == Seq.empty[String], cut(4L))

    // SQL surface; non-literal n/k rejected at plan time
    texts.createOrReplaceTempView("t_h60")
    val sqlRows = spark.sql("SELECT id, shingle_hash60s(text, 3) AS hs FROM t_h60")
      .as[(Long, Seq[Long])].collect().toMap
    assert(sqlRows(1L).length == 11, sqlRows(1L)) // 13 tokens → 11 ordered 3-grams
    val cutSql = spark
      .sql("SELECT cut_covered_spans(array('a','b','c','d'), array(1), 2) AS kept")
      .as[Seq[String]].head()
    assert(cutSql == Seq("a", "d"))
    val err = intercept[Exception] {
      spark.sql("SELECT shingle_hash60s(text, CAST(id AS INT)) FROM t_h60").collect()
    }
    assert(err.getMessage.contains("INT literal") ||
      err.getCause != null && err.getCause.getMessage.contains("INT literal"), err.getMessage)

    // both stay inside whole-stage codegen over a real source; strict
    // fallback makes a janino failure fatal instead of silent
    // plain split (not tokens(): its higher-order filter is
    // CodegenFallback and would evict the projection from codegen)
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val planned = docs.select(
      CutCoveredSpansExpr.cutCoveredSpans(
        org.apache.spark.sql.functions.split(
          org.apache.spark.sql.functions.lower(col("text")), "\\s+"),
        typedlit(Array(0, 2)),
        4).alias("kept"),
      ShingleHash60sExpr.shingleHash60s(col("text"), 4).alias("hs"))
    withStrictCodegen(planned.collect())
    val plan = planned.queryExecution.executedPlan.toString
    assert("\\*\\(\\d+\\) Project \\[cut_covered_spans".r.findFirstIn(plan).isDefined, plan)
    assert(plan.contains("shingle_hash60s"), plan)
    assert(!plan.toLowerCase.contains("scalaudf"), plan)
  }

  test("srp_band_buckets: matches a reference loop, truncates long vectors, codegen'd") {
    import graft.functions.expressions.SrpBandBucketsExpr
    import org.apache.spark.sql.functions.col
    val nBands = 3
    val rowsPerBand = 4
    val dim = 6
    val signs = Array.tabulate(nBands * rowsPerBand * dim) { pj =>
      if (TextFunctions.md5Hash60Local(s"srp:${pj / dim}:${pj % dim}") % 2 == 0) 1.0 else -1.0
    }
    val rnd = new scala.util.Random(3)
    val vecs = (1L to 20L).map { i =>
      // id 20 is longer than dim → must be truncated in the sketch
      val len = if (i == 20L) dim + 3 else dim
      (i, Seq.fill(len)(rnd.nextGaussian().toFloat))
    }
    def refBuckets(vec: Seq[Float]): Seq[Long] =
      (0 until nBands).map { b =>
        var bucket = 0L
        for (k <- 0 until rowsPerBand) {
          var d = 0.0
          val n = math.min(vec.length, dim)
          for (i <- 0 until n) d += vec(i).toDouble * signs((b * rowsPerBand + k) * dim + i)
          if (d >= 0) bucket |= 1L << k
        }
        bucket
      }
    val got = vecs.toDF("id", "vec")
      .select(col("id"),
        SrpBandBucketsExpr.srpBandBuckets(col("vec"), signs, nBands, rowsPerBand, dim).alias("bk"))
      .as[(Long, Seq[Long])].collect().toMap
    vecs.foreach { case (id, v) =>
      assert(got(id) == refBuckets(v), s"id $id sketch diverged")
    }

    // no UDF boundary over a real source
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val planned = emb.select(
      SrpBandBucketsExpr.srpBandBuckets(col("embedding"), signs, nBands, rowsPerBand, dim))
    withStrictCodegen(planned.collect())
    val plan = planned.queryExecution.executedPlan.toString
    assert("\\*\\(\\d+\\) Project \\[srp_band_buckets".r.findFirstIn(plan).isDefined, plan)
    assert(!plan.toLowerCase.contains("scalaudf"), plan)
  }

  test("cdc_chunk_hashes is callable from SQL and matches the Column API") {
    GraftFunctions.register(spark)
    import spark.implicits._
    val df = Seq((1L, "spark order data column join " * 12), (2L, "short"), (3L, ""))
      .toDF("id", "t")
    df.createOrReplaceTempView("cdc_docs")
    val viaSql = spark.sql(
      "SELECT id, cdc_chunk_hashes(t, 8, 16) AS hs FROM cdc_docs ORDER BY id")
      .as[(Long, Seq[Long])].collect()
    val viaCol = df
      .select($"id", graft.operators.Cdc.chunkHashes($"t", 8, 16).alias("hs"))
      .orderBy("id").as[(Long, Seq[Long])].collect()
    assert(viaSql === viaCol)
    assert(viaSql.head._2.size > 1, "long payload should produce multiple chunks")
    // window/divisor are plan-time literals
    val m = intercept[Exception](
      spark.sql("SELECT cdc_chunk_hashes(t, length(t), 16) FROM cdc_docs").collect())
      .getMessage
    assert(m.contains("cdc_chunk_hashes window"), m)
  }

  test("hashed_bow + presence_dot from SQL match the Column API") {
    GraftFunctions.register(spark)
    import spark.implicits._
    Seq((1L, "The quick brown fox the"), (2L, " "))
      .toDF("id", "text").createOrReplaceTempView("t_bow")
    val viaSql = spark.sql(
      "SELECT id, hashed_bow(text, 32) AS f, " +
        "presence_dot(hashed_bow(text, 32), array(" +
        (0 until 32).map(i => s"${i}L").mkString(", ") + ")) AS z " +
        "FROM t_bow")
      .collect().map(r => (r.getLong(0), (r.getSeq[Long](1), r.getLong(2)))).toMap
    val viaCol = spark.table("t_bow")
      .select(org.apache.spark.sql.functions.col("id"),
        graft.functions.expressions.HashedBowExpr
          .hashedBow(org.apache.spark.sql.functions.col("text"), 32).as("f"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(viaSql.keySet == Set(1L, 2L))
    viaSql.foreach { case (id, (f, z)) =>
      assert(f == viaCol(id))
      assert(z == f.sum, "identity weights => z is the sum of feature ids")
    }
    val m = intercept[Exception](
      spark.sql("SELECT hashed_bow('a b')").collect()).getMessage
    assert(m.contains("hashed_bow(text, dim)"), m)
  }

  test("gopher_stats + dhash64 are callable from SQL") {
    GraftFunctions.register(spark)
    import spark.implicits._
    Seq((1L, "the quick brown fox jumps over the lazy dog"))
      .toDF("id", "text").createOrReplaceTempView("t_gs")
    val g = spark.sql(
      "SELECT gopher_stats(text).n_tokens AS n, gopher_stats(text).n_stop_hits AS s FROM t_gs")
      .head()
    assert(g.getLong(0) == 9L && g.getLong(1) >= 1L)
    val viaSql = spark.sql("SELECT dhash64(CAST('payload-bytes' AS BINARY)) AS h")
      .head().getLong(0)
    val viaCol = Seq(Tuple1("payload-bytes".getBytes("UTF-8"))).toDF("b")
      .select(graft.functions.expressions.DHash64Expr.dhash64Col(
        org.apache.spark.sql.functions.col("b")))
      .head().getLong(0)
    assert(viaSql == viaCol)
    val m = intercept[Exception](spark.sql("SELECT gopher_stats()").collect()).getMessage
    assert(m.contains("gopher_stats(text)"), m)
  }

  test("wrong-arity SQL calls fail analysis naming the signature, not IndexOutOfBounds") {
    GraftFunctions.register(spark)
    def messageFor(sql: String): String =
      intercept[Exception](spark.sql(sql).collect()).getMessage

    // one argument to a 2-arg builder used to die with IndexOutOfBoundsException
    val m1 = messageFor("SELECT shingle_hash_set('a b c')")
    assert(m1.contains("shingle_hash_set(text, n)") && m1.contains("got 1"), m1)
    val m2 = messageFor("SELECT shingle_mod_hashes('a b c')")
    assert(m2.contains("shingle_mod_hashes(text, n)") && m2.contains("got 1"), m2)
    val m3 = messageFor("SELECT dot_f(array(1.0F))")
    assert(m3.contains("dot_f(vec_a, vec_b)"), m3)
    val m4 = messageFor("SELECT md5_hash60('a', 'b')")
    assert(m4.contains("md5_hash60(text)") && m4.contains("got 2"), m4)
    val m5 = messageFor("SELECT heavy_hitters('x', 8)")
    assert(m5.contains("heavy_hitters(item, capacity, k)"), m5)
    val m6 = messageFor("SELECT sorted_intersect_count(array(1L))")
    assert(m6.contains("sorted_intersect_count(sorted_a, sorted_b)"), m6)
    val m7 = messageFor("SELECT norm2_f()")
    assert(m7.contains("norm2_f(vec)") && m7.contains("got 0"), m7)
  }

  test("round-18 natives callable from SQL: luhn_scrub, int8_codes, cut_segments_by_fp") {
    GraftFunctions.register(spark)
    val scrub = spark.sql("SELECT luhn_scrub('pay 4111111111111111 now') AS s")
      .selectExpr("s.redacted", "s.n_cards")
      .as[(String, Long)].head()
    assert(scrub === (("pay [CARD] now", 1L)))
    val codes = spark.sql(
      "SELECT int8_codes(array(CAST(1.0 AS FLOAT), CAST(-0.5 AS FLOAT))) AS c")
      .as[Seq[Byte]].head()
    assert(codes === Seq[Byte](127, -64)) // -0.5/(1/127) = -63.5 → half away from zero
    val cut = spark.sql(
      "SELECT cut_segments_by_fp('a b c', array(md5_hash60('b')), ' ') AS s")
      .selectExpr("s.clean_text", "s.n_removed")
      .as[(String, Long)].head()
    assert(cut === (("a c", 1L)))
    // delim must be a literal — the expression captures it at plan time
    val err = intercept[Exception] {
      spark.sql("SELECT cut_segments_by_fp('a', array(1L), repeat(' ', 1))").collect()
    }
    assert(err.getMessage.contains("delim"), err.getMessage)
  }

  test("round-19 natives callable from SQL: bq_codes, secret_scrub, c4_clean") {
    GraftFunctions.register(spark)
    val codes = spark.sql(
      "SELECT bq_codes(array(CAST(1.0 AS FLOAT), CAST(-0.5 AS FLOAT), CAST(0.25 AS FLOAT))) AS c")
      .as[Seq[Long]].head()
    assert(codes === Seq(5L)) // bits 0 and 2 (strict sign test)
    val scrub = spark.sql(
      "SELECT secret_scrub('key sk9Sx2Qw7Lm4Yd0Vt6Hb1Jn8Rc3Zf5Ka+pE/uGi x') AS s")
      .selectExpr("s.redacted", "s.n_secrets")
      .as[(String, Long)].head()
    assert(scrub === (("key [SECRET] x", 1L)))
    val c4 = spark.sql(
      "SELECT c4_clean('A sentence with enough words to pass.' || chr(10) || 'nav') AS c")
      .selectExpr("c.clean_text", "c.n_kept", "c.keep")
      .as[(String, Long, Boolean)].head()
    assert(c4 === (("A sentence with enough words to pass.", 1L, false)))
    val sc = spark.sql("SELECT script_stats('ab 你好') AS s")
      .selectExpr("s.n_latin", "s.n_cjk", "s.main_script")
      .as[(Long, Long, String)].head()
    assert(sc === ((2L, 2L, "latin"))) // 2-2 tie → priority order
  }

  test("srp_expand callable from SQL; column form bit-equals the driver-side twin") {
    import graft.functions.expressions.SrpExpandExpr
    import org.apache.spark.sql.functions.col
    GraftFunctions.register(spark)
    val v = Array(0.5f, -1.25f, 2.0f, 0.0f)
    val fromSql = spark.sql(
      "SELECT srp_expand(array(CAST(0.5 AS FLOAT), CAST(-1.25 AS FLOAT), " +
        "CAST(2.0 AS FLOAT), CAST(0.0 AS FLOAT)), 8, 'rp') AS e")
      .as[Seq[Float]].head()
    assert(fromSql === SrpExpandExpr.expandLocal(v, 8, "rp").toSeq)
    // independent reference: sign from the shared md5-60 convention
    val ref = (0 until 8).map { j =>
      (0 until 4).map { k =>
        val s = if (TextFunctions.md5Hash60Local(s"rp:$j:$k") % 2 == 0) 1.0 else -1.0
        s * v(k).toDouble
      }.sum.toFloat
    }
    assert(fromSql === ref)
    // column form over a table; null vector → null
    val df = Seq((1L, Some(Seq(1.0f, -2.0f))), (2L, Option.empty[Seq[Float]]))
      .toDF("id", "v")
    val got = df.select(col("id"),
        SrpExpandExpr.srpExpand(col("v").cast("array<float>"), 4, "rp").as("e"))
      .as[(Long, Option[Seq[Float]])].collect().toMap
    assert(got(1L).get === SrpExpandExpr.expandLocal(Array(1.0f, -2.0f), 4, "rp").toSeq)
    assert(got(2L).isEmpty)
  }
}
