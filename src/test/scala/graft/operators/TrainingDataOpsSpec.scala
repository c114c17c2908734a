package graft.operators

import graft.SparkTestBase
import graft.functions.TextFunctions

/** Specs for the round-4 training-data operators: decontamination,
  * deterministic sampling, TF-IDF.
  */
class TrainingDataOpsSpec extends SparkTestBase {
  import spark.implicits._

  test("Decontaminate.overlaps counts distinct shared n-grams; clean drops flagged docs") {
    val train = Seq(
      (1L, "alpha beta gamma delta epsilon"), // shares "alpha beta gamma" etc.
      (2L, "zeta eta theta iota kappa"), // disjoint
      (3L, "alpha beta gamma zeta eta") // partial overlap
    ).toDF("doc_id", "text")
    val bench = Seq((100L, "alpha beta gamma delta")).toDF("doc_id", "text")

    val got = Decontaminate.overlaps(train, bench, "doc_id", "text", n = 3)
      .as[(Long, Long)].collect().toMap
    // bench 3-grams: {abg, bgd}; doc1 shares both, doc3 shares abg only
    assert(got == Map(1L -> 2L, 3L -> 1L))

    val cleaned = Decontaminate.clean(train, bench, "doc_id", "text", n = 3)
      .select("doc_id").as[Long].collect().toSet
    assert(cleaned == Set(2L))
  }

  test("Decontaminate.report: per-benchmark-item leak counts; clean items appear with zeros") {
    val train = Seq(
      (1L, "alpha beta gamma delta epsilon"),
      (2L, "zeta eta theta iota kappa"),
      (3L, "alpha beta gamma zeta eta")
    ).toDF("doc_id", "text")
    val bench = Seq(
      (100L, "alpha beta gamma delta"), // grams {abg, bgd}: abg in docs 1+3, bgd in doc 1
      (101L, "totally clean benchmark item") // no train overlap
    ).toDF("doc_id", "text")

    val got = Decontaminate.report(train, bench, "doc_id", "text", n = 3)
      .as[(Long, Long, Long, Long)].collect()
      .map(t => t._1 -> ((t._2, t._3, t._4))).toMap
    // 100: two train docs touch it, both of its 2 grams leak
    assert(got(100L) == ((2L, 2L, 2L)), s"got ${got(100L)}")
    // 101: present with zeros, its own gram count intact
    assert(got(101L) == ((0L, 0L, 2L)), s"got ${got(101L)}")
  }

  test("Decontaminate.scrubSpans cuts only benchmark-matching windows, keeps the remainder") {
    val train = Seq(
      (1L, "intro words alpha beta gamma delta and a unique tail here"),
      (2L, "totally disjoint document with its own content entirely"),
      (3L, "alpha beta gamma delta"), //     fully benchmark text
      (4L, null.asInstanceOf[String])
    ).toDF("doc_id", "text")
    val bench = Seq((100L, "alpha beta gamma delta epsilon")).toDF("doc_id", "text")

    val got = Decontaminate.scrubSpans(train, bench, "doc_id", "text", k = 4)
      .as[(Long, String, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    // bench 4-grams include "alpha beta gamma delta" and "beta gamma
    // delta epsilon"; doc1 matches the first at position 2 → tokens
    // 2..5 cut, prefix and tail survive in order
    assert(got(1L) == (("intro words and a unique tail here", 7L, 4L)), got(1L))
    assert(got(2L) == (("totally disjoint document with its own content entirely", 8L, 0L)), got(2L))
    // doc3 is exactly a benchmark window (short-doc whole-text rule on
    // the gram builder still yields the 4-gram) → fully scrubbed
    assert(got(3L) == (("", 0L, 4L)), got(3L))
    // null text = empty doc, zero counts
    assert(got(4L) == (("", 0L, 0L)), got(4L))
  }

  test("Decontaminate.semantic*: threshold flags, clean-item zeros, null-vec exclusion (exact config)") {
    def unit(axis: Int): Seq[Float] = Seq.tabulate(4)(j => if (j == axis) 1.0f else 0.0f)
    def noisy(base: Seq[Float], eps: Float): Seq[Float] =
      base.updated((base.indexOf(1.0f) + 1) % 4, eps)
    val train = Seq(
      (1L, unit(0)), // paraphrase-leak of bench 100 (cos ~ 1)
      (2L, noisy(unit(0), 0.05f)), // second leak of bench 100
      (3L, unit(1)), // clean (orthogonal to every bench item)
      (4L, unit(2)), // exact leak of bench 101
      (5L, null.asInstanceOf[Seq[Float]]) // null vec: excluded, never flagged
    ).toDF("vec_id", "embedding")
    val bench = Seq(
      (100L, noisy(unit(0), 0.02f)),
      (101L, unit(2)),
      (102L, unit(3)) // clean benchmark item: zero hits, sentinel cosine
    ).toDF("vec_id", "embedding")
    // nLists = 1: the centroid VALUE is irrelevant (every row lands in
    // cell 0), every pair is compared — the oracle configuration
    val one = Array(Array(0.0, 0.0, 0.0, 0.0))

    val rep = Decontaminate.semanticReport(
      train, bench, "vec_id", "embedding", one, threshold = 0.9, nProbe = 1)
      .as[(Long, Long, Double)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(rep.keySet == Set(100L, 101L, 102L), s"report not total: ${rep.keySet}")
    assert(rep(100L)._1 == 2L && rep(100L)._2 > 0.99, s"bench 100: ${rep(100L)}")
    assert(rep(101L) == ((1L, 1.0)), s"bench 101: ${rep(101L)}")
    assert(rep(102L) == ((0L, -2.0)), s"clean item: ${rep(102L)}")

    val ov = Decontaminate.semanticOverlaps(
      train, bench, "vec_id", "embedding", one, threshold = 0.9, nProbe = 1)
      .as[(Long, Long, Double)].collect().map(r => r._1 -> r._2).toMap
    assert(ov == Map(1L -> 1L, 2L -> 1L, 4L -> 1L), s"overlaps: $ov")

    val cleaned = Decontaminate.semanticClean(
      train, bench, "vec_id", "embedding", one, threshold = 0.9, nProbe = 1)
      .select("vec_id").as[Long].collect().toSet
    // 3 survives (orthogonal); the null-vec doc is unflaggable, so kept
    assert(cleaned == Set(3L, 5L), s"cleaned: $cleaned")
  }

  test("Decontaminate.semantic: clustered probing is sound (subset of exact), exact at full probe") {
    def vf(xs: Double*): Seq[Float] = xs.map(_.toFloat)
    // four orthogonal cells; train docs live on axes 0 and 2
    val centroids = Array(
      Array(1.0, 0.0, 0.0, 0.0), Array(0.0, 0.0, 1.0, 0.0),
      Array(0.0, 1.0, 0.0, 0.0), Array(0.0, 0.0, 0.0, 1.0))
    val train = Seq(
      (1L, vf(1, 0, 0, 0)), (2L, vf(0.99, 0.1, 0, 0)),
      (3L, vf(0, 0, 1, 0)), (4L, vf(0, 0.1, 0.99, 0))
    ).toDF("vec_id", "embedding")
    // bench 200 sits BETWEEN cells 0 and 1 (cos 1/sqrt2 ~ 0.707 to both
    // axes): its nearest-cell tie breaks to cell 0, so nProbe = 1 finds
    // the axis-0 leaks but MISSES the axis-2 ones — the recall trade the
    // subset property bounds
    val bench = Seq((200L, vf(0.7071067811865476, 0, 0.7071067811865476, 0)))
      .toDF("vec_id", "embedding")
    def hits(nProbe: Int): Set[(Long, Long)] = Decontaminate.semanticMatches(
      train, bench, "vec_id", "embedding", centroids, threshold = 0.7, nProbe = nProbe)
      .select("doc_id", "bench_id").as[(Long, Long)].collect().toSet

    val exact = hits(nProbe = 4) // probe everything
    assert(exact == Set((1L, 200L), (2L, 200L), (3L, 200L), (4L, 200L)), s"exact: $exact")
    val probed = hits(nProbe = 1)
    assert(probed.subsetOf(exact), "probed hits must be a subset of exact")
    assert(probed == Set((1L, 200L), (2L, 200L)), s"nProbe=1: $probed")
    assert(hits(nProbe = 2) == exact, "covering both straddled cells recovers every hit")

    val e = intercept[IllegalArgumentException] {
      Decontaminate.semanticMatches(
        train, bench, "vec_id", "embedding", centroids, threshold = 0.7, nProbe = 5)
    }
    assert(e.getMessage.contains("nProbe"), e.getMessage)
  }

  test("QualityPrune.pruneByGroupQuantile: per-group thresholds, exact vs approx") {
    import org.apache.spark.sql.functions.col
    // group A scores 1..100, group B scores 1..20 — per-group quartiles
    // differ, so a global threshold would misprune one of them
    val rows = (1 to 100).map(i => ("A", i.toLong, i.toDouble)) ++
      (1 to 20).map(i => ("B", i.toLong + 1000L, i.toDouble))
    val df = rows.toDF("grp", "id", "score")

    val exact = QualityPrune.pruneByGroupQuantile(df, "grp", "score", q = 0.25)
      .select("grp", "id").as[(String, Long)].collect().toSet
    // A: thr = 1 + 99*0.25 = 25.75 → keep 26..100; B: thr = 5.75 → keep 6..20
    assert(exact == ((26 to 100).map(i => ("A", i.toLong)) ++
      (6 to 20).map(i => ("B", i.toLong + 1000L))).toSet)

    // approx picks a MEMBER near the exact rank (no interpolation), so
    // the kept set shifts by at most one boundary row per group
    val approx = QualityPrune.pruneByGroupQuantile(df, "grp", "score", q = 0.25,
      approx = true)
      .select("grp", "id").as[(String, Long)].collect().toSet
    val diff = (exact diff approx) ++ (approx diff exact)
    assert(diff.size <= 2, s"approx shifted more than the boundary rows: $diff")

    // the scale contract: summary aggregate + broadcast + filter — the
    // corpus is never window-sorted
    val plan = QualityPrune.pruneByGroupQuantile(df, "grp", "score", q = 0.25)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"per-row window sort in the prune plan:\n$plan")
    assert(plan.contains("BroadcastHashJoin"), s"thresholds did not broadcast:\n$plan")

    // null group = a group like any other (capPerGroup's `<=>` semantics):
    // its rows get their own threshold instead of vanishing in the join
    val withNull = rows.toDF("grp", "id", "score")
      .unionByName(Seq((null.asInstanceOf[String], 5000L, 1.0),
        (null.asInstanceOf[String], 5001L, 2.0),
        (null.asInstanceOf[String], 5002L, 3.0),
        (null.asInstanceOf[String], 5003L, 4.0)).toDF("grp", "id", "score"))
    val nullKept = QualityPrune.pruneByGroupQuantile(withNull, "grp", "score", q = 0.25)
      .filter(col("grp").isNull).select("id").as[Long].collect().toSet
    // null group scores 1..4: thr = 1 + 3*0.25 = 1.75 → keep 2,3,4
    assert(nullKept == Set(5001L, 5002L, 5003L), s"null group mispruned: $nullKept")
  }

  test("QualityPrune: reserved-column collision fails loud; all-null-score group drops, not crashes") {
    import org.apache.spark.sql.functions.col
    val df = Seq(("A", 1L, 1.0), ("A", 2L, 2.0)).toDF("grp", "id", "score")
    // same guard class as Sharding.assign: reject rather than clobber
    intercept[IllegalArgumentException] {
      QualityPrune.pruneByGroupQuantile(df.withColumn("thr", col("score")),
        "grp", "score", q = 0.25)
    }
    intercept[IllegalArgumentException] {
      QualityPrune.pruneByGroupQuantile(df.withColumn("__graft_grp", col("grp")),
        "grp", "score", q = 0.25)
    }
    // a group whose scores are ALL null must simply drop (null >= thr is
    // never true), not crash pctOfSorted on an empty array
    val withAllNull = df.unionByName(
      Seq(("Z", 10L), ("Z", 11L)).toDF("grp", "id")
        .withColumn("score", org.apache.spark.sql.functions.lit(null)
          .cast("double")))
    for (ap <- Seq(false, true)) {
      val kept = QualityPrune.pruneByGroupQuantile(
        withAllNull, "grp", "score", q = 0.25, approx = ap)
        .select("grp").as[String].collect().toSet
      assert(kept == Set("A"), s"approx=$ap: all-null-score group mishandled: $kept")
    }
  }

  test("Decontaminate.bloomClean equals exact clean byte-for-byte (false positives die in the confirm)") {
    val train = (1L to 80L).map { i =>
      val words =
        if (i % 4 == 0) s"alpha beta gamma token$i extra words here padding" // contaminated
        else s"unique$i only$i words$i nothing$i shared$i at$i all$i done$i"
      (i, words)
    }.toDF("doc_id", "text")
    val bench = Seq((100L, "alpha beta gamma shared benchmark fragment")).toDF("doc_id", "text")

    val exact = Decontaminate.clean(train, bench, "doc_id", "text", n = 3)
      .select("doc_id").as[Long].collect().sorted.toSeq
    // a DELIBERATELY undersized/high-fpp sketch: false positives are
    // likely, and the confirm stage must still kill every one of them
    val bloomDf = Decontaminate.bloomClean(train, bench, "doc_id", "text", n = 3,
      expectedItems = 8L, fpp = 0.5)
    val plan = bloomDf.queryExecution.executedPlan.toString
    assert(plan.contains("might_contain"), plan)
    val filterLines = plan.linesIterator.filter(_.contains("might_contain")).mkString("\n")
    assert(!filterLines.contains("UDF"), s"bloom probe still a UDF:\n$filterLines")
    val got = bloomDf.select("doc_id").as[Long].collect().sorted.toSeq
    assert(got == exact, s"bloomClean diverged from exact clean:\n$got\n$exact")
    assert(got.forall(_ % 4 != 0))
  }

  test("Decontaminate.cleanApprox is sound: subset of exact clean, catches all true contamination") {
    val train = (1L to 60L).map { i =>
      val words =
        if (i % 3 == 0) s"alpha beta gamma token$i extra words here padding" // contaminated
        else s"unique$i only$i words$i nothing$i shared$i at$i all$i done$i"
      (i, words)
    }.toDF("doc_id", "text")
    val bench = Seq((100L, "alpha beta gamma shared benchmark fragment")).toDF("doc_id", "text")

    val exact = Decontaminate.clean(train, bench, "doc_id", "text", n = 3)
      .select("doc_id").as[Long].collect().toSet
    val approxDf = Decontaminate.cleanApprox(train, bench, "doc_id", "text", n = 3,
      expectedItems = 1000L, fpp = 0.01)
    // the bloom probe must be the native might_contain expression inside
    // the codegen filter, not a closure UDF boxing a Long per n-gram
    val approxPlan = approxDf.queryExecution.executedPlan.toString
    assert(approxPlan.contains("might_contain"), approxPlan)
    val filterLines = approxPlan.linesIterator.filter(_.contains("might_contain")).mkString("\n")
    assert(!filterLines.contains("UDF"), s"bloom probe still a UDF:\n$filterLines")
    val approx = approxDf
      .select("doc_id").as[Long].collect().toSet

    // one-sided error: nothing contaminated survives, survivors ⊆ exact
    assert(approx.subsetOf(exact))
    assert(approx.forall(_ % 3 != 0))
    // at fpp=1% on 60 docs, over-dropping everything would be a bug
    assert(approx.size >= exact.size - 5,
      s"implausible over-drop: ${exact.size - approx.size} of ${exact.size}")
  }

  test("leakageSafeSplit: clusters never straddle the split; rate lands near target") {
    // 300 clusters of varying size (1-3 docs); doc ids interleave so a
    // doc-level hash split WOULD straddle many of them
    val assignments = (1L to 300L).flatMap { c =>
      (0L until (c % 3) + 1L).map(i => (c * 1000L + i, c))
    }.toDF("doc_id", "cluster_id")
    val split = Sampling.leakageSafeSplit(assignments, "doc_id", "cluster_id", valPermille = 200)
      .as[(Long, Long, String)].collect()
    // invariant: every doc in a cluster is on the same side
    split.groupBy(_._2).foreach { case (c, rows) =>
      assert(rows.map(_._3).distinct.length == 1, s"cluster $c straddles the split")
    }
    // determinism + rough rate (binomial over 300 clusters at 20%)
    val valClusters = split.map(r => (r._2, r._3)).distinct.count(_._2 == "val")
    assert(valClusters > 30 && valClusters < 90, s"val clusters: $valClusters/300")
    val again = Sampling.leakageSafeSplit(assignments, "doc_id", "cluster_id", valPermille = 200)
      .as[(Long, Long, String)].collect()
    assert(again.toSet == split.toSet)
    // doc-level counterexample: hashing doc_id directly WOULD straddle
    // at least one multi-doc cluster in this fixture
    val docLevel = split.map { case (id, c, _) =>
      (c, graft.functions.TextFunctions.md5Hash60Local(s"split:$id") % 1000 < 200)
    }
    assert(docLevel.groupBy(_._1).exists(_._2.map(_._2).distinct.length == 2),
      "fixture too small to demonstrate the doc-level straddle hazard")
  }

  test("capPerGroup: exact cap on over-cap groups, under-cap groups untouched, deterministic") {
    // en: 300 rows (over a cap of 100), fr: 80 (under), de: 100 (exactly at cap)
    val df = ((1L to 300L).map((_, "en")) ++ (301L to 380L).map((_, "fr")) ++
      (381L to 480L).map((_, "de"))).toDF("id", "lang")
    val capped = Sampling.capPerGroup(df, "id", "lang", cap = 100)
    val byLang = capped.groupBy("lang").count().as[(String, Long)].collect().toMap
    assert(byLang == Map("en" -> 100L, "fr" -> 80L, "de" -> 100L), s"got $byLang")

    // under/at-cap groups keep EVERY row (no hash selection applied)
    val frIds = capped.filter($"lang" === "fr").select("id").as[Long].collect().toSet
    assert(frIds == (301L to 380L).toSet)

    // deterministic and equal to the uniform single-window form
    val again = Sampling.capPerGroup(df, "id", "lang", cap = 100)
      .select("id").as[Long].collect().toSet
    val gotIds = capped.select("id").as[Long].collect().toSet
    assert(again == gotIds)
    val expectedEn = (1L to 300L)
      .sortBy(i => (graft.functions.TextFunctions.md5Hash60Local(s"42:$i"), i))
      .take(100).toSet
    assert(capped.filter($"lang" === "en").select("id").as[Long].collect().toSet == expectedEn)

    // different seed, different kept set (same sizes)
    val other = Sampling.capPerGroup(df, "id", "lang", cap = 100, seed = 7L)
      .select("id").as[Long].collect().toSet
    assert(other != gotIds && other.size == gotIds.size)

    // NULL is a group like any other: an over-cap null-group domain is
    // capped too (equi-join routing would silently keep all of it)
    val withNull = ((1L to 300L).map(i => (i, Option.empty[String])) ++
      (301L to 350L).map(i => (i, Some("en")))).toDF("id", "lang")
    val cappedNull = Sampling.capPerGroup(withNull, "id", "lang", cap = 100)
    val nullCount = cappedNull.filter($"lang".isNull).count()
    assert(nullCount == 100L, s"null group kept $nullCount rows, expected cap 100")
    assert(cappedNull.filter($"lang" === "en").count() == 50L)
  }

  test("Sampling is deterministic, respects strata rates, and nests across rates") {
    val df = (1L to 2000L).map(i => (i, if (i % 2 == 0) "en" else "fr")).toDF("id", "lang")
    val small = Sampling.stratifiedSample(df, "id", "lang", Map("en" -> 100, "fr" -> 300))
    val large = Sampling.stratifiedSample(df, "id", "lang", Map("en" -> 200, "fr" -> 600))
    val smallIds = small.select("id").as[Long].collect().toSet
    val largeIds = large.select("id").as[Long].collect().toSet
    // nested: raising every rate only adds rows
    assert(smallIds.subsetOf(largeIds))
    // deterministic: re-evaluation yields the identical set
    assert(Sampling.stratifiedSample(df, "id", "lang", Map("en" -> 100, "fr" -> 300))
      .select("id").as[Long].collect().toSet == smallIds)
    // rates roughly honored (md5 is uniform; 1000 draws per stratum)
    val en = small.filter($"lang" === "en").count()
    val fr = small.filter($"lang" === "fr").count()
    assert(en > 50 && en < 200, s"en keep-count $en far from 10% of 1000")
    assert(fr > 200 && fr < 400, s"fr keep-count $fr far from 30% of 1000")
    // unknown strata drop by default
    val other = Sampling.stratifiedSample(df, "id", "lang", Map("de" -> 500))
    assert(other.count() == 0)
  }

  test("mixtureSample: availability caps, integer rate math, nesting in the budget") {
    // scarce source (20 docs) + abundant source (1000 docs)
    val df = ((1L to 20L).map(i => (i, "scarce")) ++ (101L to 1100L).map(i => (i, "web")))
      .toDF("id", "src")
    val half = Sampling.mixtureSample(df, "id", "src",
      Seq("scarce" -> 500, "web" -> 500), budgetPermille = 500)
    // budget = 510; scarce rate = min(1000, 510*500/20) → capped: all 20 kept
    val rates = half.select("src", "rate_pm").distinct()
      .as[(String, Long)].collect().toMap
    assert(rates("scarce") == 1000L)
    assert(rates("web") == 510L * 500L / 1000L) // 255‰
    assert(half.filter($"src" === "scarce").count() == 20L)
    val webKept = half.filter($"src" === "web").count()
    assert(webKept > 180 && webKept < 330, s"web keep-count $webKept far from 25.5% of 1000")
    // nesting: a smaller budget's sample is a subset of a larger one's
    val quarter = Sampling.mixtureSample(df, "id", "src",
      Seq("scarce" -> 500, "web" -> 500), budgetPermille = 250)
    val qIds = quarter.select("id").as[Long].collect().toSet
    val hIds = half.select("id").as[Long].collect().toSet
    assert(qIds.subsetOf(hIds))
    // unweighted sources drop
    assert(Sampling.mixtureSample(df, "id", "src", Seq("web" -> 1000), 500)
      .filter($"src" === "scarce").count() == 0L)
  }

  test("temperatureEpochSample: sqrt upsampling, epoch fan-out, determinism") {
    // scarce source (16 docs) + abundant (1024): sqrt weights 4 vs 32,
    // budget 1000‰ of 1040 docs = 1040; scarce rate = 1040*(4/36)/16 ≈ 7.22
    // → every scarce doc appears in epochs 0..6 plus a ~22% 8th; web rate
    // = 1040*(32/36)/1024 ≈ 0.90 → subsample, epoch 0 only
    val df = ((1L to 16L).map(i => (i, "scarce")) ++ (101L to 1124L).map(i => (i, "web")))
      .toDF("id", "src")
    val out = Sampling.temperatureEpochSample(df, "id", "src", budgetPermille = 1000)
      .select("id", "src", "epoch").as[(Long, String, Long)].collect()
    val scarce = out.filter(_._2 == "scarce")
    // all 16 docs × 7 full epochs = 112, plus 0..16 fractional-epoch rows
    assert(scarce.count(_._3 < 7) === 112)
    assert(scarce.forall(_._3 <= 7))
    val web = out.filter(_._2 == "web")
    assert(web.forall(_._3 === 0L))
    val webN = web.length
    assert(webN > 800 && webN < 1010, s"web keep-count $webN far from ~90% of 1024")
    // deterministic: exact same multiset on a re-run
    val again = Sampling.temperatureEpochSample(df, "id", "src", budgetPermille = 1000)
      .select("id", "src", "epoch").as[(Long, String, Long)].collect()
    assert(out.sorted.toSeq === again.sorted.toSeq)
    // alpha = 1 is natural proportions: every source's rate is budget‰,
    // no upsampling at budget <= 1000
    val nat = Sampling.temperatureEpochSample(df, "id", "src", 1000, alpha = 1.0)
      .select("epoch").as[Long].collect()
    assert(nat.forall(_ === 0L))
    // null sources are excluded, not crashed on
    val withNull = df.union(Seq((9999L, null.asInstanceOf[String])).toDF("id", "src"))
    assert(Sampling.temperatureEpochSample(withNull, "id", "src", 1000)
      .filter($"id" === 9999L).count() === 0L)
    // corpus never shuffles: rate join broadcasts, epoch fan-out row-local
    val plan = Sampling.temperatureEpochSample(df, "id", "src", 1000)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"),
      "temperature mix must not hash-exchange the corpus")
  }

  test("hashBucket matches the portable md5 arithmetic") {
    val df = Seq(7L, 8L).toDF("id")
      .select($"id", Sampling.hashBucket($"id", 1000).as("b"))
    val got = df.as[(Long, Long)].collect().toMap
    val expected = Seq(7L, 8L).map(i =>
      i -> TextFunctions.md5Hash60Local(i.toString) % 1000).toMap
    assert(got == expected)
  }

  test("TfIdf.topTerms ranks rarer terms higher at equal tf, bounded at k") {
    val docs = Seq(
      (1L, "apple banana banana common"),
      (2L, "apple cherry common"),
      (3L, "apple date common")
    ).toDF("doc_id", "text")
    val got = TfIdf.topTerms(docs, "doc_id", "text", k = 2)
      .select("doc_id", "term", "tf", "df", "tfidf")
      .as[(Long, String, Long, Long, Double)].collect()
    val byDoc = got.groupBy(_._1).view.mapValues(_.sortBy(r => (-r._5, r._2)).map(_._2).toList).toMap
    // doc1: banana tf=2 df=1 → 6.0; apple/common tf=1 df=3 → 1.0 (tie → apple)
    assert(byDoc(1L) == List("banana", "apple"))
    // doc2: cherry df=1 → 3.0 beats apple/common 1.0
    assert(byDoc(2L).head == "cherry")
    assert(got.count(_._1 == 1L) == 2)
    // exact ratio check: tf * N / df
    val banana = got.find(r => r._1 == 1L && r._2 == "banana").get
    assert(banana._3 == 2L && banana._4 == 1L && banana._5 == 6.0)
  }

  test("TfIdf.bm25Rank matches a local reference; idf spread and length norm order as BM25 should") {
    val docs = Seq(
      (1L, "rare apple apple"),                   // short doc with the rare term
      (2L, "apple apple apple apple banana banana banana banana"), // long, common-heavy
      (3L, "apple banana"),                       // short, one of each common term
      (4L, "rare rare apple banana filler filler filler"), // rare tf=2 but longer
      (5L, "unrelated words only here"),
      (6L, null.asInstanceOf[String])             // excluded from ranking AND stats
    ).toDF("doc_id", "text")
    val terms = Seq("rare", "apple", "banana")
    val got = TfIdf.bm25Rank(docs, "doc_id", "text", terms, topK = 10)
      .as[(Long, Long, Double)].collect()

    // local reference with the operator's exact arithmetic (k1=1.2, b=0.75)
    val corpus = Map(
      1L -> Seq("rare", "apple", "apple"),
      2L -> (Seq.fill(4)("apple") ++ Seq.fill(4)("banana")),
      3L -> Seq("apple", "banana"),
      4L -> Seq("rare", "rare", "apple", "banana", "filler", "filler", "filler"),
      5L -> Seq("unrelated", "words", "only", "here"))
    val n = corpus.size.toLong
    val sumDl = corpus.values.map(_.length.toLong).sum
    val avgdl = sumDl.toDouble / n.toDouble
    def microScore(toks: Seq[String]): Long = {
      val dl = toks.length.toDouble
      terms.map { t =>
        val tf = toks.count(_ == t).toDouble
        val df = corpus.values.count(_.contains(t)).toLong
        val idf = math.log(1.0 + ((n - df).toDouble + 0.5) / (df.toDouble + 0.5))
        val denom = tf + 1.2 * (1.0 - 0.75 + 0.75 * (dl / avgdl))
        math.round(idf * ((tf * 2.2) / denom) * 1000000L)
      }.sum
    }
    val expected = corpus.view.mapValues(microScore).toMap
    assert(got.length == 5)                       // null-text doc never ranks
    got.foreach { case (id, micro, score) =>
      assert(micro == expected(id), s"doc $id micro mismatch")
      assert(score == micro.toDouble / 1000000.0)
    }
    // descending by score, ties by id
    assert(got.map(r => (-r._2, r._1)).sortBy(identity).toSeq == got.map(r => (-r._2, r._1)).toSeq)
    val rank = got.map(_._1).toSeq
    // the rare term dominates: both rare-docs outrank every common-only doc
    assert(rank.indexOf(1L) < rank.indexOf(2L) && rank.indexOf(4L) < rank.indexOf(2L))
    // length normalization: doc3 (short, tf=1 each) beats doc2 (long, tf=4 each is damped)
    assert(rank.indexOf(3L) < rank.indexOf(2L) || expected(3L) < expected(2L))
    // no query term -> zero score, ranked last
    assert(rank.last == 5L && expected(5L) == 0L)
  }

  test("TfIdf.bm25Join agrees with bm25Rank per query; repeated terms score once; no-term docs absent") {
    val docs = Seq(
      (1L, "rare apple apple"),
      (2L, "apple apple apple apple banana banana banana banana"),
      (3L, "apple banana"),
      (4L, "rare rare apple banana filler filler filler"),
      (5L, "unrelated words only here")
    ).toDF("doc_id", "text")
    val queries = Seq(
      (100L, Seq("rare", "apple", "banana")),
      (200L, Seq("rare", "rare", "rare")), // dup terms collapse to one
      (300L, Seq("absent"))                // matches nothing -> no rows
    ).toDF("qid", "qterms")

    val joined = TfIdf.bm25Join(docs, "doc_id", "text", queries, "qid", "qterms", topK = 10)
      .as[(Long, Long, Long, Double)].collect()
    val byQ = joined.groupBy(_._1)

    // q100 must reproduce bm25Rank's scores for every doc containing a term
    val solo = TfIdf.bm25Rank(docs, "doc_id", "text", Seq("rare", "apple", "banana"), topK = 10)
      .as[(Long, Long, Double)].collect().map(r => r._1 -> r._2).toMap
    val q100 = byQ(100L).map(r => r._2 -> r._3).toMap
    assert(q100.keySet == Set(1L, 2L, 3L, 4L)) // doc 5 shares no term
    q100.foreach { case (doc, micro) => assert(micro == solo(doc), s"doc $doc") }

    // q200: 'rare' queried thrice scores once — equal to a one-term query
    val soloRare = TfIdf.bm25Rank(docs, "doc_id", "text", Seq("rare"), topK = 10)
      .as[(Long, Long, Double)].collect().map(r => r._1 -> r._2).toMap
    val q200 = byQ(200L).map(r => r._2 -> r._3).toMap
    assert(q200.keySet == Set(1L, 4L))
    q200.foreach { case (doc, micro) => assert(micro == soloRare(doc), s"doc $doc") }

    // q300 retrieves nothing
    assert(!byQ.contains(300L))

    // within each query: descending micro, ties by doc id
    byQ.values.foreach { rows =>
      val ord = rows.map(r => (-r._3, r._2)).toSeq
      assert(ord == ord.sorted)
    }
  }

  test("TfIdf.hybridRank: weight extremes reduce to the pure signals; missing embeddings rank lexically") {
    val docs = Seq(
      (1L, "rare apple apple"),
      (2L, "apple apple apple apple banana banana banana banana"),
      (3L, "apple banana"),
      (4L, "rare rare apple banana filler filler filler"),
      (5L, "unrelated words only here")
    ).toDF("doc_id", "text")
    // doc 3's embedding aligns with the query; doc 1's opposes; doc 4
    // has NO embedding row
    val emb = Seq(
      (1L, Seq(-1.0f, 0.0f)),
      (2L, Seq(0.3f, 0.6f)),
      (3L, Seq(1.0f, 0.0f)),
      (5L, Seq(0.0f, 1.0f))
    ).toDF("vec_id", "embedding")
    val terms = Seq("rare", "apple", "banana")
    val qv = Seq(1.0, 0.0)

    val lex = TfIdf.bm25Rank(docs, "doc_id", "text", terms, topK = 10)
      .as[(Long, Long, Double)].collect().map(r => r._1 -> r._2).toMap

    // wVec = 0: pure lexical order over the candidate set
    val lexOnly = TfIdf.hybridRank(docs, "doc_id", "text", emb, "vec_id", "embedding",
      terms, qv, wVec = 0.0, candidates = 10, topK = 10)
      .as[(Long, Long, Long, Long, Double)].collect()
    assert(lexOnly.map(_._1).toSeq ==
      lex.toSeq.sortBy { case (id, m) => (-m, id) }.map(_._1))
    assert(lexOnly.forall(_._3 == 0L)) // cos_micro zeroed by the weight

    // wText = 0: candidates re-order purely by cosine (doc 4 counts 0)
    val vecOnly = TfIdf.hybridRank(docs, "doc_id", "text", emb, "vec_id", "embedding",
      terms, qv, wText = 0.0, candidates = 10, topK = 10)
      .as[(Long, Long, Long, Long, Double)].collect()
    assert(vecOnly.head._1 == 3L, s"aligned embedding must lead: ${vecOnly.toSeq}")
    val doc4 = vecOnly.find(_._1 == 4L).get
    assert(doc4._3 == 0L && doc4._4 == 0L, "missing embedding must score cosine 0")
    // doc 1 (opposed embedding) ranks below doc 4's zero
    assert(vecOnly.map(_._1).indexOf(1L) > vecOnly.map(_._1).indexOf(4L))

    // default weights: hybrid_micro is exactly the sum of the two parts
    val both = TfIdf.hybridRank(docs, "doc_id", "text", emb, "vec_id", "embedding",
      terms, qv, candidates = 10, topK = 10)
      .as[(Long, Long, Long, Long, Double)].collect()
    both.foreach { case (id, bm, cm, hm, h) =>
      assert(bm == lex(id))
      assert(hm == bm + cm, s"doc $id hybrid not the micro sum")
      assert(h == hm.toDouble / 1000000.0)
    }
  }

  test("TfIdf.hybridJoin equals per-query hybridRank on the covering case; null qvec ranks lexically") {
    val docs = Seq(
      (1L, "rare apple apple"),
      (2L, "apple apple apple apple banana banana banana banana"),
      (3L, "apple banana"),
      (4L, "rare rare apple banana filler filler filler"),
      (5L, "unrelated words only here")
    ).toDF("doc_id", "text")
    val emb = Seq(
      (1L, Seq(-1.0f, 0.0f)),
      (2L, Seq(0.3f, 0.6f)),
      (3L, Seq(1.0f, 0.0f)),
      (5L, Seq(0.0f, 1.0f))
    ).toDF("vec_id", "embedding")
    // both queries' term sets match >= candidates docs is not needed:
    // parity holds whenever the term-matching set fills the per-query
    // candidate list OR covers every doc the batch surface would rank —
    // here each query's terms are checked against hybridRank over the
    // SAME candidate rule by restricting the comparison to docs sharing
    // >= 1 term (bm25Join's candidate rule)
    val queries = Seq(
      (10L, Seq("rare", "apple", "banana"), Seq(1.0f, 0.0f)),
      (11L, Seq("unrelated", "banana"), Seq(0.0f, 1.0f))
    ).toDF("qid", "qterms", "qvec")
    val joined = TfIdf.hybridJoin(
      docs, "doc_id", "text", emb, "vec_id", "embedding",
      queries, "qid", "qterms", "qvec", candidates = 10, topK = 10)
      .as[(Long, Long, Long, Long, Long, Double)].collect()
      .groupBy(_._1).view.mapValues(_.map(r => (r._2, r._3, r._4, r._5, r._6)).toSeq).toMap

    for ((qid, terms, qv) <- Seq(
        (10L, Seq("rare", "apple", "banana"), Seq(1.0, 0.0)),
        (11L, Seq("unrelated", "banana"), Seq(0.0, 1.0)))) {
      val termMatch = docs.as[(Long, String)].collect()
        .filter { case (_, t) => t != null && terms.exists(t.split(" ").contains(_)) }
        .map(_._1).toSet
      val want = TfIdf.hybridRank(docs, "doc_id", "text", emb, "vec_id", "embedding",
        terms, qv, candidates = 10, topK = 10)
        .as[(Long, Long, Long, Long, Double)].collect()
        .filter(r => termMatch.contains(r._1)) // bm25Join's candidate rule
        .toSeq
      // order-insensitive compare on the full score tuples (the rank
      // order is itself a total function of the tuples)
      assert(joined(qid).sortBy(r => (-r._4, r._1)) == want.sortBy(r => (-r._4, r._1)),
        s"qid $qid diverged from the single-query surface:\n${joined(qid)}\nvs\n$want")
    }

    // a query with a NULL vector reranks on lexical score alone
    val nullVec = Seq((12L, Seq("apple"), null.asInstanceOf[Seq[Float]]))
      .toDF("qid", "qterms", "qvec")
    val lexOnly = TfIdf.hybridJoin(
      docs, "doc_id", "text", emb, "vec_id", "embedding",
      nullVec, "qid", "qterms", "qvec", candidates = 10, topK = 10)
      .as[(Long, Long, Long, Long, Long, Double)].collect()
    assert(lexOnly.nonEmpty && lexOnly.forall(r => r._4 == 0L && r._5 == r._3),
      s"null qvec must zero the cosine: ${lexOnly.toSeq}")
  }

  test("weightedSample: A-ES semantics — weight-proportional, deterministic, without replacement") {
    val rows = (1L to 400L).map { id =>
      // two groups; weights 1 vs 9 in group g1 via id parity
      val g = if (id <= 200) "g1" else "g2"
      val w = if (id % 2 == 0) 9L else 1L
      (id, g, w)
    }
    val df = rows.toDF("id", "grp", "w")
    val got = Sampling.weightedSample(df, "grp", "id", "w", k = 50)
    val picked = got.select("grp", "id").as[(String, Long)].collect().toSeq
    // exactly k per group, no duplicates (without replacement)
    assert(picked.count(_._1 == "g1") === 50)
    assert(picked.count(_._1 == "g2") === 50)
    assert(picked.distinct.size === picked.size)
    // weight proportionality: heavy ids (w=9) dominate the draw —
    // with 9:1 weights and half the population heavy, expect far more
    // than half the sample heavy (binomial argument; deterministic
    // given the fixed seed, so this is a regression pin, not a flake)
    val heavy = picked.count { case (_, id) => id % 2 == 0 }
    assert(heavy > 70, s"heavy-weight rows under-drawn: $heavy/100")
    // determinism: a second run is row-identical
    val again = Sampling.weightedSample(df, "grp", "id", "w", k = 50)
      .select("grp", "id").as[(String, Long)].collect().toSeq
    assert(again.toSet === picked.toSet)
    // a different seed draws a different sample (the knob is live)
    val other = Sampling.weightedSample(df, "grp", "id", "w", k = 50, seed = 7L)
      .select("grp", "id").as[(String, Long)].collect().toSet
    assert(other !== picked.toSet)
    // zero/negative/null weights carry no mass
    val degenerate = Seq((1L, "g", 0L), (2L, "g", -5L)).toDF("id", "grp", "w")
    assert(Sampling.weightedSample(degenerate, "grp", "id", "w", k = 10).count() === 0L)
    // k larger than the group returns the whole group, ranked
    val tiny = Seq((1L, "g", 5L), (2L, "g", 1L)).toDF("id", "grp", "w")
    assert(Sampling.weightedSample(tiny, "grp", "id", "w", k = 10).count() === 2L)
  }

  test("hardNegatives: per-query positive exclusion, score parity with bm25Join, depleted queries shrink visibly") {
    val docs = Seq[(Long, String)](
      (1L, "apple banana cherry durian"),
      (2L, "apple banana cherry elder"),
      (3L, "apple banana fig grape"),
      (4L, "apple honey icewine jackfruit"),
      (5L, "kiwi lemon mango nectarine")).toDF("doc_id", "text")
    // two queries: qA's positive is doc 1, qB's positive is doc 2 — doc 1
    // must still be eligible as qB's negative (per-query exclusion)
    val pairs = Seq(
      (100L, Seq("apple", "banana", "cherry"), 1L),
      (200L, Seq("apple", "banana", "cherry"), 2L)).toDF("qid", "qterms", "pos_id")
    val got = TfIdf.hardNegatives(docs, "doc_id", "text", pairs,
      "qid", "qterms", "pos_id", nNeg = 3, candidates = 5)
      .as[(Long, Long, Long, Double, Long)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._5)).toMap

    assert(!got(100L).exists(_._2 == 1L), s"qA's positive leaked: ${got(100L).toSeq}")
    assert(!got(200L).exists(_._2 == 2L), s"qB's positive leaked: ${got(200L).toSeq}")
    assert(got(200L).exists(_._2 == 1L),
      s"doc 1 must be eligible as qB's negative: ${got(200L).toSeq}")
    // negatives come ranked by the SAME bm25Join scores
    val cand = TfIdf.bm25Join(docs, "doc_id", "text",
        pairs.select($"qid", $"qterms").distinct(), "qid", "qterms", topK = 5)
      .as[(Long, Long, Long, Double)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    got.values.flatten.foreach { n =>
      assert(cand((n._1, n._2)) == n._3, s"score drifted from bm25Join: $n")
    }
    // ranks are contiguous from 1 and descending in score
    got.values.foreach { ns =>
      assert(ns.map(_._5).toSeq == (1L to ns.length).toSeq)
      assert(ns.map(_._3).toSeq == ns.map(_._3).toSeq.sorted.reverse)
    }
    // a query whose terms only its positive contains comes back EMPTY,
    // not padded with easy negatives
    val lonely = Seq((300L, Seq("icewine", "jackfruit"), 4L)).toDF("qid", "qterms", "pos_id")
    assert(TfIdf.hardNegatives(docs, "doc_id", "text", lonely,
      "qid", "qterms", "pos_id", nNeg = 3, candidates = 5).count() == 0L)
    intercept[IllegalArgumentException] {
      TfIdf.hardNegatives(docs, "doc_id", "text", pairs, "qid", "qterms",
        "pos_id", nNeg = 5, candidates = 5)
    }
  }

  test("keepByGopher filters to exactly gopherGate's keep set, preserving input columns; streams accept it") {
    val docs = Seq[(Long, Option[String], String)](
      (1L, Some("the quick brown fox jumps over the lazy dog and then " +
        "sits down with a friendly cat to have a long talk about dinner plans"), "x"),
      (2L, Some("too short"), "x"),
      (3L, None, "x")).toDF("doc_id", "text", "extra")
    val kept = QualityPrune.keepByGopher(docs, "text", minTokens = 20L)
      .as[(Long, Option[String], String)].collect()
    val expect = QualityPrune.gopherGate(docs, "doc_id", "text", minTokens = 20L)
      .filter($"keep").select("doc_id").as[Long].collect().toSet
    assert(kept.map(_._1).toSet === expect)
    assert(kept.map(_._1).toSet === Set(1L))
    assert(kept.head._3 == "x", "input columns must survive")

    // streaming-safe: a pure stateless filter plans in append mode
    val input = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, String)](spark)
    val q = QualityPrune.keepByGopher(
        input.toDF().toDF("doc_id", "text"), "text", minTokens = 20L)
      .writeStream.format("memory").queryName("gopher_kept")
      .outputMode("append").start()
    input.addData((10L, ("word " * 30).trim + " the cat and that dog have fun with all of it to be sure"),
      (11L, "tiny"))
    q.processAllAvailable(); q.stop()
    val streamed = spark.table("gopher_kept").select("doc_id").as[Long].collect()
    assert(streamed.toSet === Set(10L))
  }

  test("dataCard: volumes, dup fraction, majority language with deterministic tie-break, null-text accounting") {
    val docs = Seq[(Long, Option[String], String)](
      (1L, Some("the cat sat on the mat"), "a"),      // en
      (2L, Some("the cat sat on the mat"), "a"),      // exact dup of 1
      (3L, Some("le chat est sur le tapis et il dort"), "a"), // fr
      (4L, Some("der hund und die katze sind hier"), "a"),    // de
      (5L, None, "a"),                                 // null text
      (6L, Some("the dog ran"), "b"),
      (7L, Some("le chien"), "b")).toDF("doc_id", "text", "source")

    val got = TrainingPrep.dataCard(docs, "text", "source")
      .select("source", "n_docs", "n_texted", "n_tokens", "n_unique", "dup_frac",
        "top_lang", "top_lang_docs", "top_lang_share")
      .as[(String, Long, Long, Long, Long, Double, String, Long, Double)]
      .collect().map(r => r._1 -> r).toMap

    val a = got("a")
    assert(a._2 == 5, s"n_docs counts null-text docs too: $a")
    assert(a._3 == 4, s"n_texted excludes the null-text doc: $a")
    // 6+6+9+7 tokens; the null doc contributes none
    assert(a._4 == 28, s"token total: $a")
    // docs 1/2 share a fingerprint; the null-text doc has none and is
    // NOT a duplicate: dup mass = texted - unique = 4 - 3
    assert(a._5 == 3 && a._6 == (4 - 3).toDouble / 5.0, s"dup accounting: $a")
    // language votes: en=2, fr=1, de=1; null doc doesn't vote
    assert(a._7 == "en" && a._8 == 2 && a._9 == 2.0 / 5.0, s"majority lang: $a")

    // source b ties en=1, fr=1 — deterministic alphabetical tie-break
    val b = got("b")
    assert(b._7 == "de" || b._7 == "en" || b._7 == "fr", s"sanity: $b")
    assert(b._8 == 1, s"tie vote count: $b")
    // the tie-break is (count desc, lang asc): 'en' vs 'fr' → 'en'...
    // unless the short 'le chien' votes differently — pin whatever the
    // shared lang_id kernel says, which is what the card must surface
    val langs = docs.filter($"source" === "b" && $"text".isNotNull)
      .select(graft.functions.expressions.LangIdExpr.langId($"text"))
      .as[String].collect().sorted
    assert(b._7 == langs.groupBy(identity).view.mapValues(_.length).toSeq
      .sortBy { case (l, c) => (-c, l) }.head._1, s"card majority diverged from lang_id: $b")
  }

  test("gopherGate: each rule trips on a crafted doc, a clean doc passes, null text fails closed") {
    val good = "the quick brown fox jumps over the lazy dog and then " +
      "sits down with a friendly cat to have a long talk about dinner plans"
    val docs = Seq[(Long, String)](
      (1L, good),                                               // keep
      (2L, "too short to pass the gate"),                       // len
      (3L, ("a " * 40).trim),                                   // mean_len < 3
      (4L, (1 to 30).map(i => s"$i$i$i").mkString(" ")),        // alpha: digit tokens
      (5L, good.replaceAll("\\b(the|and|with|to|have)\\b", "xx")), // stop
      (6L, (1 to 10).map(i => s"line $i trails off...").mkString("\n") +
        "\nthe end and that is all folks we have covered it with care to be sure of it now"), // ellipsis > 0.3
      (7L, (1 to 10).map(i => s"- bullet item $i").mkString("\n")), // bullet > 0.9 (also stop/len)
      (8L, good + " " + ("#" * 20))                             // symbol ratio
    ).toDF("doc_id", "text")
    val nullDoc = Seq((9L, Option.empty[String])).toDF("doc_id", "text")

    val got = QualityPrune.gopherGate(
      docs.unionByName(nullDoc), "doc_id", "text",
      minTokens = 20L, minStopHits = 2L)
      .select("doc_id", "keep", "fail_reason")
      .as[(Long, Boolean, Option[String])].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap

    assert(got(1L) == (true, None), s"clean doc must keep: ${got(1L)}")
    assert(got(2L) == (false, Some("len")))
    assert(got(3L) == (false, Some("mean_len")))
    assert(got(4L) == (false, Some("alpha")))
    assert(got(5L) == (false, Some("stop")))
    assert(got(6L)._1 == false && got(6L)._2 == Some("ellipsis"), s"${got(6L)}")
    assert(got(7L)._1 == false, s"${got(7L)}")
    assert(got(9L) == (false, Some("len")), s"null text must fail closed: ${got(9L)}")

    // rule inputs behind doc 6/8: line fraction and symbol arithmetic
    val st = QualityPrune.gopherGate(docs, "doc_id", "text")
      .select("doc_id", "frac_ellipsis_lines", "frac_bullet_lines", "symbol_ratio")
      .as[(Long, Double, Double, Double)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4)).toMap
    assert(st(6L)._1 == 10.0 / 11.0, s"ellipsis fraction: ${st(6L)}")
    assert(st(7L)._2 == 1.0, s"bullet fraction: ${st(7L)}")
    // doc 8: 20 '#' over 26 tokens
    assert(st(8L)._3 == 20.0 / 26.0, s"symbol ratio: ${st(8L)}")
  }

  test("scriptRoutedGate: each script lands on its own artifact; Latin rules never judge non-Latin pages") {
    val latinGood = "the quick brown fox jumps over the lazy dog and then " +
      "sits down with a friendly cat to talk about dinner plans"
    val docs = Seq[(Long, String)](
      (1L, latinGood),                       // latin + passes the full gate
      (2L, "short latin page here."),        // latin + fails len
      (3L, "Привет мир " * 10),              // cyrillic: would fail alpha+stop in
                                             // a Latin gate; nostop passes it
      (4L, "Привет мир"),                    // cyrillic but only 2 tokens: len fails
      (5L, "你好世界 " * 6),                  // cjk: 24 letters >= 20 -> keep
      (6L, "你好"),                           // cjk but 2 letters < 20 -> drop
      (7L, "12345 67890 !!! ???")            // no letters at all -> none/drop
    ).toDF("doc_id", "text")
    val nullDoc = Seq((9L, Option.empty[String])).toDF("doc_id", "text")
    val got = QualityPrune.scriptRoutedGate(
      docs.unionByName(nullDoc), "doc_id", "text",
      minTokens = 15L, minStopHits = 1L, minLetters = 20L)
      .as[(Long, String, String, Boolean)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4)).toMap
    assert(got(1L) == ("latin", "latin_gate", true))
    assert(got(2L) == ("latin", "latin_gate", false))
    assert(got(3L) == ("cyrillic", "nostop_gate", true),
      s"Cyrillic page must bypass the Latin-trained rules: ${got(3L)}")
    assert(got(4L) == ("cyrillic", "nostop_gate", false))
    assert(got(5L) == ("cjk", "charcount_gate", true),
      s"CJK page must keep on letter mass, not token rules: ${got(5L)}")
    assert(got(6L) == ("cjk", "charcount_gate", false))
    assert(got(7L) == ("none", "drop", false))
    assert(got(9L) == ("none", "drop", false), "null text fails closed")
    // the load-bearing claim: the same Cyrillic page DIES in the
    // unrouted Latin gate (frac_alpha = 0, zero stop hits)
    val unrouted = QualityPrune.gopherGate(
      docs.filter($"doc_id" === 3L), "doc_id", "text",
      minTokens = 15L, minStopHits = 1L)
      .select("keep").as[Boolean].collect()
    assert(unrouted.toSeq == Seq(false),
      "fixture must demonstrate the starvation the router prevents")
  }
}
