package graft.streaming

import graft.SparkTestBase
import graft.operators.{Dedup, Similarity}
import graft.sinks.ParquetKVSink
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger

import java.nio.file.Files

/** The delta-over-state ingest composition (VERDICT r9 #5): multi-batch
  * MemoryStream ingest maintaining the corpus state tables must land on
  * EXACTLY the batch pipeline's output over the same data.
  */
class DedupIngestSpec extends SparkTestBase {
  import spark.implicits._

  private val trigger = Trigger.ProcessingTime("50 milliseconds")

  test("exact ingest: final fingerprint state equals Dedup.exact over the union of all batches") {
    val input = MemoryStream[(Long, String)](spark)
    val sink = new ParquetKVSink(Files.createTempDirectory("graft-ingest-exact").toString)
    val ckpt = Files.createTempDirectory("graft-ingest-exact-ckpt").toString
    val q = DedupIngest.startExact(
      input.toDF().toDF("doc_id", "text"), "doc_id", "text",
      sink, "corpus_fp", ckpt, trigger)

    // dups within a batch, across batches, and OUT-OF-ORDER ids — the
    // merge is min/sum per fingerprint, so arrival order must not matter
    val batches = Seq(
      Seq((5L, "alpha"), (2L, "beta"), (9L, "alpha")),
      Seq((1L, "alpha"), (7L, "gamma")),
      Seq((3L, "beta"), (8L, "delta"), (4L, "delta")))
    batches.foreach { b => input.addData(b: _*); q.processAllAvailable() }
    q.stop()

    val expected = Dedup.exact(batches.flatten.toDF("doc_id", "text"), "doc_id", "text")
      .as[(String, Long, Long)].collect().toSet
    val got = sink.read(spark, "corpus_fp", DedupIngest.exactStateSchema)
      .as[(String, Long, Long)].collect().toSet
    assert(got == expected, s"streamed state diverged:\n$got\nvs batch pipeline:\n$expected")
    // sanity: the state actually deduplicated (4 distinct texts from 8 rows)
    assert(got.size == 4 && got.toSeq.map(_._3).sum == 8L)
  }

  test("null-text docs form ONE dedup group across batches (Dedup.exact's null semantics)") {
    // a plain fp equi-join would never match null against null: each
    // batch would append a fresh null-fp state row and the unified
    // keep rule would silently drop every null-text row from tiers 2+
    val sink = new graft.sinks.InMemoryKVSink
    val batches = Seq(
      Seq((5L, null.asInstanceOf[String]), (2L, "alpha")),
      Seq((7L, null.asInstanceOf[String]), (3L, "alpha")),
      Seq((9L, null.asInstanceOf[String])))
    batches.zipWithIndex.foreach { case (b, i) =>
      DedupIngest.applyExactBatch(b.toDF("doc_id", "text"), i.toLong, "doc_id", "text", sink, "nt")
    }
    val got = sink.read(spark, "nt", DedupIngest.exactStateSchema)
      .as[(String, Long, Long)].collect().toSet
    val want = Dedup.exact(batches.flatten.toDF("doc_id", "text"), "doc_id", "text")
      .as[(String, Long, Long)].collect().toSet
    assert(got == want, s"null-group state diverged:\n$got\nvs Dedup.exact:\n$want")
    assert(got.exists(r => r._1 == null && r._2 == 5L && r._3 == 3L),
      s"null texts must be one group keyed by the first arrival: $got")

    // unified tier 1: the FIRST null-text doc is retained (it carries
    // its vec to the later tiers), later ones are exact dups of the
    // "no content" group
    val usink = new ParquetKVSink(Files.createTempDirectory("graft-nulluni").toString)
    def unit(axis: Int): Seq[Float] = Seq.tabulate(8)(j => if (j == axis) 1.0f else 0.0f)
    DedupIngest.applyUnifiedBatch(
      Seq((5L, null.asInstanceOf[String], unit(0)), (2L, "alpha beta gamma", unit(1)))
        .toDF("doc_id", "text", "embedding"),
      0L, "doc_id", "text", "embedding", usink, "nu", None, nLists = 1, trainSample = 100)
    DedupIngest.applyUnifiedBatch(
      Seq((7L, null.asInstanceOf[String], unit(2))).toDF("doc_id", "text", "embedding"),
      1L, "doc_id", "text", "embedding", usink, "nu", None, nLists = 1, trainSample = 100)
    val near = usink.read(spark, "nu__near", DedupIngest.nearDupStateSchema)
      .select("id").as[Long].collect().toSet
    assert(near == Set(5L, 2L), s"first null-text doc must be retained, later blocked: $near")
  }

  test("mergeExactState is batching-invariant: any grouping or order of batches lands on Dedup.exact") {
    val rnd = new scala.util.Random(7)
    val docs = (1L to 40L).map(i => (i, s"text${rnd.nextInt(9)}"))
    val expected = Dedup.exact(docs.toDF("doc_id", "text"), "doc_id", "text")
      .as[(String, Long, Long)].collect().toSet

    def ingest(batches: Seq[Seq[(Long, String)]]): Set[(String, Long, Long)] = {
      val sink = new graft.sinks.InMemoryKVSink
      batches.filter(_.nonEmpty).foreach { b =>
        val state = sink.read(spark, "t", DedupIngest.exactStateSchema)
        sink.write(
          DedupIngest.mergeExactState(state, b.toDF("doc_id", "text"), "doc_id", "text"),
          "t", org.apache.spark.sql.SaveMode.Overwrite)
      }
      sink.read(spark, "t", DedupIngest.exactStateSchema)
        .as[(String, Long, Long)].collect().toSet
    }

    assert(ingest(Seq(docs)) == expected, "single batch")
    assert(ingest(docs.grouped(7).toSeq.reverse) == expected, "reversed groups of 7")
    assert(ingest(rnd.shuffle(docs).grouped(13).toSeq) == expected, "shuffled groups of 13")
  }

  test("every incremental tier fails loud on non-numeric id columns (no silent cast-to-null drop)") {
    // a string id would cast("long") to null; null join keys match
    // nothing, so whole batches would silently vanish from the state —
    // each tier must reject the frame at plan time instead
    val strDocs = Seq(("doc-a", "alpha"), ("doc-b", "beta")).toDF("doc_id", "text")
    val strVecs = Seq(("doc-a", Seq(1.0f, 0.0f))).toDF("vec_id", "embedding")

    val eEx = intercept[IllegalArgumentException] {
      DedupIngest.mergeExactState(
        new ParquetKVSink(Files.createTempDirectory("graft-guard0").toString)
          .read(spark, "none", DedupIngest.exactStateSchema),
        strDocs, "doc_id", "text")
    }
    assert(eEx.getMessage.contains("doc_id must be an integral type"), eEx.getMessage)

    val eNd = intercept[IllegalArgumentException] {
      val ndSink = new ParquetKVSink(Files.createTempDirectory("graft-guard").toString)
      DedupIngest.mergeNearDupState(
        ndSink.read(spark, "none", DedupIngest.nearDupStateSchema),
        ndSink.read(spark, "none_bands", DedupIngest.nearDupBandStateSchema),
        ndSink.read(spark, "none_sets", DedupIngest.nearDupSetStateSchema),
        strDocs, "doc_id", "text")
    }
    assert(eNd.getMessage.contains("doc_id must be an integral type"), eNd.getMessage)

    val eSem = intercept[IllegalArgumentException] {
      DedupIngest.mergeSemanticState(
        new ParquetKVSink(Files.createTempDirectory("graft-guard2").toString)
          .read(spark, "none", DedupIngest.semanticStateSchema),
        strVecs, "vec_id", "embedding", threshold = 0.9)
    }
    assert(eSem.getMessage.contains("vec_id must be an integral type"), eSem.getMessage)

    val eInc = intercept[IllegalArgumentException] {
      Dedup.incrementalNearDup(
        strDocs, strDocs, "doc_id", "text", n = 3, k = 16, bands = 4, threshold = 0.8)
    }
    assert(eInc.getMessage.contains("doc_id must be"), eInc.getMessage)

    val eFz = intercept[IllegalArgumentException] {
      DedupIngest.mergeFuzzyState(
        new ParquetKVSink(Files.createTempDirectory("graft-guard4").toString)
          .read(spark, "none", DedupIngest.fuzzyStateSchema),
        strDocs, "doc_id", "text", maxDist = 1)
    }
    assert(eFz.getMessage.contains("doc_id must be an integral type"), eFz.getMessage)

    // fractional ids are just as unsafe: cast("long") TRUNCATES (1.2
    // and 1.7 would merge into state key 1), so doubles are rejected too
    val dblDocs = Seq((1.2, "alpha"), (1.7, "beta")).toDF("doc_id", "text")
    val eDbl = intercept[IllegalArgumentException] {
      DedupIngest.mergeExactState(
        new ParquetKVSink(Files.createTempDirectory("graft-guard3").toString)
          .read(spark, "none", DedupIngest.exactStateSchema),
        dblDocs, "doc_id", "text")
    }
    assert(eDbl.getMessage.contains("integral"), eDbl.getMessage)
  }

  test("appendNew: state side never shuffles even with broadcasts force-disabled (100 TB shape)") {
    import org.apache.spark.sql.functions.col
    // a parquet-backed "state" so the plan has a real scan to audit
    val dir = Files.createTempDirectory("graft-appendnew").toString
    (1L to 5000L).map(i => (i, s"doc $i")).toDF("id", "text")
      .write.mode("overwrite").parquet(dir)
    val state = spark.read.parquet(dir)
    val rows = ((4990L to 5010L).map(i => (i, s"doc $i"))).toDF("id", "text")
    val saved = (
      spark.conf.get("spark.sql.autoBroadcastJoinThreshold"),
      spark.conf.get("spark.sql.adaptive.autoBroadcastJoinThreshold", "64MB"))
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    try {
      val out = DedupIngest.appendNew(state, rows)
      val got = out.select("id").as[Long].collect().toSeq.sorted
      // idempotent append semantics: the 4990-5000 overlap is suppressed
      assert(got == (1L to 5010L).toSeq, s"wrong append result: ${got.take(20)}...")
      val plan = out.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
      // the naive shape (rows ANTI state.ids) degrades to a sort-merge
      // join with a full state exchange when the state outgrows every
      // broadcast threshold; the semi-probe shape must not
      assert(!plan.contains("SortMergeJoin"),
        s"state entered a shuffle join under disabled broadcasts:\n$plan")
      val shuffles = "Exchange (hash|range)partitioning".r.findAllIn(plan).length
      assert(shuffles <= 1, // the batch-row distinct only
        s"expected at most the rows-side distinct exchange, got $shuffles:\n$plan")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", saved._1)
      spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", saved._2)
    }
  }

  test("near-dup ingest: final text corpus equals the batch LSH pipeline's kept representatives") {
    // tight dup clusters (exact copies) with increasing ids — the regime
    // where incremental first-wins equals the batch CC's min-id keep
    val a = "the quick brown fox jumps over the lazy dog again and again"
    val b = "streaming ingestion keeps corpus state tables fresh across batches"
    val c = "a totally novel document with its own vocabulary entirely here"
    val batches = Seq(
      Seq((1L, a), (2L, a), (3L, b)),
      Seq((4L, a), (5L, c)),
      Seq((6L, b), (7L, c), (8L, "late unique content nothing matches this sentence at all")))

    val input = MemoryStream[(Long, String)](spark)
    val sink = new ParquetKVSink(Files.createTempDirectory("graft-ingest-nd").toString)
    val ckpt = Files.createTempDirectory("graft-ingest-nd-ckpt").toString
    val q = DedupIngest.startNearDup(
      input.toDF().toDF("doc_id", "text"), "doc_id", "text",
      sink, "corpus_docs", ckpt, trigger, threshold = 0.8)
    batches.foreach { bt => input.addData(bt: _*); q.processAllAvailable() }
    q.stop()

    val got = sink.read(spark, "corpus_docs", DedupIngest.nearDupStateSchema)
      .as[(Long, String)].collect().toMap
    assert(got.keySet == Set(1L, 3L, 5L, 8L), s"corpus ids ${got.keySet}")
    // representatives keep their original text
    assert(got(1L) == a && got(3L) == b && got(5L) == c)
  }

  test("fuzzy ingest: final key state equals first-wins edit-distance dedup across batches") {
    // typo'd twins within and across batches; maxDist=2 so each twin
    // pair matches while distinct keys stay far apart
    val batches = Seq(
      Seq((1L, "spark streaming"), (2L, "spark streaming!"), (3L, "duckdb oracle")),
      Seq((4L, "spark streamin"), (5L, "novel unrelated")),
      Seq((6L, "duckdb oraclee"), (7L, "novel unrelated"), (8L, "completely different words")))

    val input = MemoryStream[(Long, String)](spark)
    val sink = new ParquetKVSink(Files.createTempDirectory("graft-ingest-fz").toString)
    val ckpt = Files.createTempDirectory("graft-ingest-fz-ckpt").toString
    val q = DedupIngest.startFuzzy(
      input.toDF().toDF("doc_id", "k"), "doc_id", "k",
      sink, "fuzzy_keys", ckpt, trigger, maxDist = 2)
    batches.foreach { bt => input.addData(bt: _*); q.processAllAvailable() }
    q.stop()

    val got = sink.read(spark, "fuzzy_keys", DedupIngest.fuzzyStateSchema)
      .as[(Long, String)].collect().toMap
    // 2 intra-batch dup of 1; 4 corpus dup of 1; 6 corpus dup of 3;
    // 7 exact corpus dup of 5; 8 novel
    assert(got.keySet == Set(1L, 3L, 5L, 8L), s"fuzzy state ids ${got.keySet}")
    assert(got(1L) == "spark streaming" && got(3L) == "duckdb oracle")
  }

  test("fuzzy ingest replay: same batchId re-applied is a no-op; partial-persist re-arrival unblocked") {
    val sink = new graft.sinks.InMemoryKVSink
    val b1 = Seq((1L, "alpha"), (2L, "alphaa")).toDF("doc_id", "k")
    DedupIngest.applyFuzzyBatch(b1, batchId = 0L, "doc_id", "k", sink, "fz", maxDist = 1)
    def state: Set[(Long, String)] =
      sink.read(spark, "fz", DedupIngest.fuzzyStateSchema)
        .as[(Long, String)].collect().toSet
    val afterFirst = state
    assert(afterFirst == Set((1L, "alpha")))
    DedupIngest.applyFuzzyBatch(b1, batchId = 0L, "doc_id", "k", sink, "fz", maxDist = 1)
    assert(state == afterFirst, "replay double-applied the batch")
    // the replay SHIELD: even when the meta mark was lost (crash between
    // state and meta writes), doc 1's own persisted row must not block
    // its re-arrival — merge directly, as the recovery path would
    val merged = DedupIngest.mergeFuzzyState(
      sink.read(spark, "fz", DedupIngest.fuzzyStateSchema), b1, "doc_id", "k", maxDist = 1)
      .as[(Long, String)].collect().toSet
    assert(merged == afterFirst, s"shielded re-merge diverged: $merged")
    DedupIngest.applyFuzzyBatch(
      Seq((3L, "alphab"), (4L, "wholly distinct")).toDF("doc_id", "k"),
      batchId = 1L, "doc_id", "k", sink, "fz", maxDist = 1)
    assert(state == Set((1L, "alpha"), (4L, "wholly distinct")))
  }

  test("replayed micro-batch (same batchId) is a no-op: counts are not double-applied") {
    val sink = new graft.sinks.InMemoryKVSink
    val b1 = Seq((1L, "alpha"), (2L, "alpha")).toDF("doc_id", "text")
    DedupIngest.applyExactBatch(b1, batchId = 0L, "doc_id", "text", sink, "t")
    def state: Set[(String, Long, Long)] =
      sink.read(spark, "t", DedupIngest.exactStateSchema)
        .as[(String, Long, Long)].collect().toSet
    val afterFirst = state
    assert(afterFirst.map(_._3) == Set(2L))

    // restart replays the last unacknowledged batch: same id, same data
    DedupIngest.applyExactBatch(b1, batchId = 0L, "doc_id", "text", sink, "t")
    assert(state == afterFirst, "replay double-applied the batch")

    // the NEXT batch id still applies
    DedupIngest.applyExactBatch(
      Seq((3L, "alpha")).toDF("doc_id", "text"), batchId = 1L, "doc_id", "text", sink, "t")
    assert(state.map(_._3) == Set(3L))
  }

  test("semantic ingest: final embedding corpus equals the batch semanticDedup's kept representatives") {
    // perturb one zero dim: cos(noisy, base) = 1/√(1+eps²) ≈ 1
    def noisy(base: Seq[Float], eps: Float): Seq[Float] =
      base.updated((base.indexOf(1.0f) + 1) % 4, eps)
    val c1 = Seq(1.0f, 0.0f, 0.0f, 0.0f)
    val c2 = Seq(0.0f, 1.0f, 0.0f, 0.0f)
    val c3 = Seq(0.0f, 0.0f, 1.0f, 0.0f)
    val c4 = Seq(0.0f, 0.0f, 0.0f, 1.0f)
    // tight clusters (intra-pair cos ≈ 1 ≥ 0.95, cross ≈ 0), increasing ids
    val batches = Seq(
      Seq((1L, c1), (2L, noisy(c1, 0.01f)), (3L, c2)),
      Seq((4L, noisy(c1, 0.02f)), (5L, c3)),
      Seq((6L, noisy(c2, 0.01f)), (7L, noisy(c3, 0.02f)), (8L, c4)))

    val input = MemoryStream[(Long, Seq[Float])](spark)
    val sink = new ParquetKVSink(Files.createTempDirectory("graft-ingest-sem").toString)
    val ckpt = Files.createTempDirectory("graft-ingest-sem-ckpt").toString
    val q = DedupIngest.startSemantic(
      input.toDF().toDF("vec_id", "embedding"), "vec_id", "embedding", threshold = 0.95,
      sink, "corpus_emb", ckpt, trigger, nLists = 1, trainSample = 100)
    batches.foreach { b => input.addData(b: _*); q.processAllAvailable() }
    q.stop()

    val all = batches.flatten.toDF("vec_id", "embedding")
    val expectedIds = Similarity.semanticDedup(
      all, "vec_id", "embedding", threshold = 0.95, nLists = 1, trainSample = 100)
      .filter($"kept" === 1L).select("id").as[Long].collect().toSet
    val got = sink.read(spark, "corpus_emb", DedupIngest.semanticStateSchema)
      .as[(Long, Seq[Float])].collect().toMap
    assert(got.keySet == expectedIds,
      s"streamed corpus ids ${got.keySet} != batch pipeline $expectedIds")
    assert(got.keySet == Set(1L, 3L, 5L, 8L)) // one representative per cluster, min id
    // the state holds the representatives' ORIGINAL vectors
    val byId = batches.flatten.toMap
    got.foreach { case (id, vec) => assert(vec == byId(id), s"vector for $id mutated") }
  }

  test("frozen semantic ingest: one bootstrap train, no per-trigger retrain, batch-pipeline parity") {
    def noisy(base: Seq[Float], eps: Float): Seq[Float] =
      base.updated((base.indexOf(1.0f) + 1) % 4, eps)
    val c1 = Seq(1.0f, 0.0f, 0.0f, 0.0f)
    val c2 = Seq(0.0f, 1.0f, 0.0f, 0.0f)
    val c3 = Seq(0.0f, 0.0f, 1.0f, 0.0f)
    val c4 = Seq(0.0f, 0.0f, 0.0f, 1.0f)
    val batches = Seq(
      Seq((1L, c1), (2L, noisy(c1, 0.01f)), (3L, c2)),
      Seq((4L, noisy(c1, 0.02f)), (5L, c3)),
      Seq((6L, noisy(c2, 0.01f)), (7L, noisy(c3, 0.02f)), (8L, c4)))

    val input = MemoryStream[(Long, Seq[Float])](spark)
    val sink = new ParquetKVSink(Files.createTempDirectory("graft-ingest-semf").toString)
    val ckpt = Files.createTempDirectory("graft-ingest-semf-ckpt").toString
    val q = DedupIngest.startSemanticFrozen(
      input.toDF().toDF("vec_id", "embedding"), "vec_id", "embedding", threshold = 0.95,
      sink, "corpus_emb", ckpt, trigger, nLists = 1, trainSample = 100)
    input.addData(batches.head: _*); q.processAllAvailable()
    // the quantizer persisted by the FIRST batch...
    val model0 = sink.read(spark, "corpus_emb__quantizer", DedupIngest.quantizerSchema)
      .as[(Int, Seq[Double])].collect().sortBy(_._1).toSeq
    assert(model0.nonEmpty, "bootstrap batch must persist the quantizer")
    batches.tail.foreach { b => input.addData(b: _*); q.processAllAvailable() }
    q.stop()
    // ...is byte-identical after every later batch: frozen means frozen
    val modelN = sink.read(spark, "corpus_emb__quantizer", DedupIngest.quantizerSchema)
      .as[(Int, Seq[Double])].collect().sortBy(_._1).toSeq
    assert(modelN === model0, "quantizer mutated across triggers — the tier retrained")

    // parity with the batch pipeline under the SAME frozen model
    val all = batches.flatten.toDF("vec_id", "embedding")
    val centroids = modelN.map(_._2.toArray).toArray
    val expectedIds = Similarity.semanticDedupFrozen(
      all, "vec_id", "embedding", centroids, threshold = 0.95)
      .filter($"kept" === 1L).select("id").as[Long].collect().toSet
    val got = sink.read(spark, "corpus_emb", DedupIngest.semanticStateSchema)
      .as[(Long, Seq[Float])].collect().toMap
    assert(got.keySet == expectedIds,
      s"streamed corpus ids ${got.keySet} != frozen batch pipeline $expectedIds")
    assert(got.keySet == Set(1L, 3L, 5L, 8L))
  }

  test("retireUnified: a takedown disappears from every artifact; blockers lift; replay-safe") {
    val textA = (1 to 40).map(i => s"alpha$i").mkString(" ")
    val textB = (1 to 40).map(i => s"beta$i").mkString(" ")
    val textC = (1 to 40).map(i => s"gamma$i").mkString(" ")
    val textD = (1 to 40).map(i => s"delta$i").mkString(" ")
    def unit(axis: Int): Seq[Float] = Seq.tabulate(8)(j => if (j == axis) 1.0f else 0.0f)
    val batches = Seq(
      Seq((1L, textA, unit(0)), (2L, textA, unit(1)), (3L, textB, unit(2))),
      Seq((5L, textC, unit(0).updated(1, 0.1f))), // sem dup of vec 1 -> dropped at sem
      Seq((6L, textA, unit(4)), (7L, textD, unit(5)))) // 6: exact dup across batches
    val sink = new ParquetKVSink(Files.createTempDirectory("graft-retire-uni").toString)
    val idx = Files.createTempDirectory("graft-retire-uni-idx").toString + "/index"
    val srchIdx = Files.createTempDirectory("graft-retire-uni-srch").toString + "/postings"
    def apply(b: Seq[(Long, String, Seq[Float])], id: Long): Unit =
      DedupIngest.applyUnifiedBatch(
        b.toDF("doc_id", "text", "embedding"), id, "doc_id", "text", "embedding",
        sink, "runi", Some(idx), nLists = 1, trainSample = 100,
        annNLists = 2, annM = 4, annCodes = 4, searchIndexPath = Some(srchIdx))
    batches.zipWithIndex.foreach { case (b, i) => apply(b, i.toLong) }

    def exactState: Map[Long, Long] =
      sink.read(spark, "runi__exact", DedupIngest.exactStateSchema)
        .as[(String, Long, Long)].collect().map(r => r._2 -> r._3).toMap
    def idsOf(tbl: String, schema: org.apache.spark.sql.types.StructType): Set[Long] =
      sink.read(spark, tbl, schema).select("id").as[Long].collect().toSet
    assert(exactState == Map(1L -> 3L, 3L -> 1L, 5L -> 1L, 7L -> 1L))
    assert(idsOf("runi__near", DedupIngest.nearDupStateSchema) == Set(1L, 3L, 5L, 7L))
    assert(idsOf("runi__sem", DedupIngest.semanticStateSchema) == Set(1L, 3L, 7L))

    // retirement 0: ONLY the counted dup (id 6, never retained) — the
    // textA blocker stays (keeper 1 survives), its count decrements
    DedupIngest.retireUnified(
      Seq((6L, textA, unit(4))).toDF("doc_id", "text", "embedding"),
      "doc_id", "text", "embedding", sink, "runi", retireId = 0L,
      annIndexPath = Some(idx), searchIndexPath = Some(srchIdx))
    assert(exactState == Map(1L -> 2L, 3L -> 1L, 5L -> 1L, 7L -> 1L),
      s"dup_count not decremented: $exactState")
    assert(idsOf("runi__near", DedupIngest.nearDupStateSchema) == Set(1L, 3L, 5L, 7L))

    // retirement 1: the retained representative (id 1) and a
    // sem-rejected-but-near-kept doc (id 5) — every artifact forgets them
    val takedown = Seq((1L, textA, unit(0)), (5L, textC, unit(0).updated(1, 0.1f)))
      .toDF("doc_id", "text", "embedding")
    DedupIngest.retireUnified(
      takedown, "doc_id", "text", "embedding", sink, "runi", retireId = 1L,
      annIndexPath = Some(idx), searchIndexPath = Some(srchIdx))
    assert(exactState == Map(3L -> 1L, 7L -> 1L), s"retired fp rows survived: $exactState")
    assert(idsOf("runi__near", DedupIngest.nearDupStateSchema) == Set(3L, 7L))
    assert(idsOf("runi__near__bands", DedupIngest.nearDupBandStateSchema) == Set(3L, 7L))
    assert(idsOf("runi__near__sets", DedupIngest.nearDupSetStateSchema) == Set(3L, 7L))
    assert(idsOf("runi__sem", DedupIngest.semanticStateSchema) == Set(3L, 7L))
    // the index artifacts retire via tombstone sidecars (retire cost
    // tracks the takedown, not the artifact): physical purge happens
    // at the next maintenance fold, which we run before asserting
    // physical membership
    graft.operators.Similarity.compactIvfPqIndex(spark, idx)
    graft.streaming.SearchIndex.compactPostings(spark, srchIdx)
    assert(spark.read.parquet(idx).select("id").as[Long].collect().toSet == Set(3L, 7L))
    assert(spark.read.parquet(srchIdx).select("doc_id").as[Long].collect().toSet == Set(3L, 7L))

    // the blocker is lifted: an identical copy of the retired text is
    // admitted as a FRESH doc by every tier
    apply(Seq((10L, textA, unit(6))), 3L)
    assert(exactState == Map(3L -> 1L, 7L -> 1L, 10L -> 1L), s"re-ingest blocked: $exactState")
    assert(idsOf("runi__near", DedupIngest.nearDupStateSchema) == Set(3L, 7L, 10L))
    assert(idsOf("runi__sem", DedupIngest.semanticStateSchema) == Set(3L, 7L, 10L))
    assert(spark.read.parquet(idx).select("id").as[Long].collect().toSet == Set(3L, 7L, 10L))
    val served = graft.streaming.SearchIndex.search(
      spark, srchIdx, sink, "runi__srch", Seq("alpha1"))
      .as[(Long, Long, Double)].collect().map(r => r._1 -> r._2).toMap
    assert(served.keySet == Set(10L), s"search served ${served.keySet}")
    // score parity proves the df/corpus-stats reversal was exact: the
    // served micro equals a fresh batch build over the current corpus
    val wantMicro = graft.operators.TfIdf.bm25Rank(
      Seq((3L, textB), (7L, textD), (10L, textA)).toDF("doc_id", "text"),
      "doc_id", "text", Seq("alpha1"))
      .as[(Long, Long, Double)].collect().map(r => r._1 -> r._2).toMap
    assert(served(10L) == wantMicro(10L),
      s"retired stats skewed the post-retirement score: ${served(10L)} vs ${wantMicro(10L)}")

    // replay (acked) and crash-window replay (top ack lost, sub-acks
    // present): nothing double-applies
    val before = exactState
    DedupIngest.retireUnified(
      takedown, "doc_id", "text", "embedding", sink, "runi", retireId = 1L,
      annIndexPath = Some(idx), searchIndexPath = Some(srchIdx))
    assert(exactState == before, "acked replay changed state")
    import org.apache.spark.sql.SaveMode
    sink.write(Seq(0L).toDF("last_batch_id"), "runi__retire__meta", SaveMode.Overwrite)
    DedupIngest.retireUnified(
      takedown, "doc_id", "text", "embedding", sink, "runi", retireId = 1L,
      annIndexPath = Some(idx), searchIndexPath = Some(srchIdx))
    assert(exactState == before, "crash-window replay double-applied the exact decrement")
    assert(idsOf("runi__sem", DedupIngest.semanticStateSchema) == Set(3L, 7L, 10L))
  }

  test("similarToRetired expands a takedown to retained near-duplicates via the band/set state") {
    val textA = (1 to 40).map(i => s"alpha$i").mkString(" ")
    val textA2 = textA + " tail" // J ~ 38/40 >= 0.8 vs textA
    val textB = (1 to 40).map(i => s"beta$i").mkString(" ")
    def unit(axis: Int): Seq[Float] = Seq.tabulate(8)(j => if (j == axis) 1.0f else 0.0f)
    val sink = new ParquetKVSink(Files.createTempDirectory("graft-sim-ret").toString)
    val idx = Files.createTempDirectory("graft-sim-ret-idx").toString + "/index"
    DedupIngest.applyUnifiedBatch(
      Seq((1L, textA, unit(0)), (2L, textB, unit(2)), (4L, textA2, unit(3)))
        .toDF("doc_id", "text", "embedding"),
      0L, "doc_id", "text", "embedding", sink, "sr", Some(idx),
      nLists = 1, trainSample = 100, annNLists = 2, annM = 4, annCodes = 4)
    // 4 was near-dup-dropped: the retained carrier of the content is 1
    assert(sink.read(spark, "sr__near", DedupIngest.nearDupStateSchema)
      .select("id").as[Long].collect().toSet == Set(1L, 2L))

    // the takedown names the DROPPED doc's content (the usual case: the
    // named doc is not the retained representative) — the expansion
    // finds the retained near-copy, never reading corpus text
    val takedown = Seq((4L, textA2)).toDF("doc_id", "text")
    val similar = DedupIngest.similarToRetired(
      sink, "sr", takedown, "doc_id", "text")
    assert(similar.as[Long].collect().toSet == Set(1L),
      "expansion missed the retained near-duplicate")

    // unrelated content expands to nothing; a self-named retained doc
    // excludes itself
    assert(DedupIngest.similarToRetired(
      sink, "sr", Seq((9L, "totally different words everywhere here now")).toDF("doc_id", "text"),
      "doc_id", "text").count() == 0L)
    assert(DedupIngest.similarToRetired(
      sink, "sr", Seq((1L, textA)).toDF("doc_id", "text"), "doc_id", "text")
      .as[Long].collect().toSet == Set.empty[Long])

    // the SEMANTIC twin: a paraphrase (different text, near-identical
    // embedding) of retained doc 2's content expands through the sem
    // state + frozen quantizer; doc 1 (orthogonal vec) does not match
    val paraphrase = Seq((7L, Seq.tabulate(8)(j =>
        if (j == 2) 1.0f else if (j == 3) 0.05f else 0.0f)))
      .toDF("doc_id", "embedding")
    val semSimilar = DedupIngest.semanticSimilarToRetired(
      sink, "sr", paraphrase, "doc_id", "embedding", threshold = 0.9)
    assert(semSimilar.as[Long].collect().toSet == Set(2L),
      "semantic expansion missed the retained paraphrase target")

    // the full loop: expand, join the corpus rows, retire both
    import org.apache.spark.sql.functions.{col, typedlit}
    val expandedRows = sink.read(spark, "sr__near", DedupIngest.nearDupStateSchema)
      .join(similar, Seq("id"), "left_semi")
      .select(col("id").alias("doc_id"), col("text"))
      .withColumn("embedding", typedlit(unit(0)))
    DedupIngest.retireUnified(
      expandedRows, "doc_id", "text", "embedding", sink, "sr", retireId = 0L,
      annIndexPath = Some(idx))
    assert(sink.read(spark, "sr__near", DedupIngest.nearDupStateSchema)
      .select("id").as[Long].collect().toSet == Set(2L),
      "the expanded takedown did not retire the retained near-copy")
  }

  test("snapshot refresh: delta-ingest + retirement lands on a fresh build of the new snapshot") {
    // the incremental-refresh contract end-to-end: given corpus
    // snapshots v1 and v2, the THREE work lists —
    // `Snapshot.removedRows -> retireUnified`, `Snapshot.delta`, and
    // `DedupIngest.reRepresentRows` (v2 rows whose retained
    // representative is being retired: doc 3 below exists in the
    // artifacts only as a dup_count under doc 1's fingerprint, so
    // without re-ingesting it the content would silently vanish even
    // though v2 keeps it) — must leave every artifact equal to a fresh
    // unified build over v2 alone.
    val textA = (1 to 40).map(i => s"alpha$i").mkString(" ")
    val textB = (1 to 40).map(i => s"beta$i").mkString(" ")
    val textC = (1 to 40).map(i => s"gamma$i").mkString(" ")
    def unit(axis: Int): Seq[Float] = Seq.tabulate(8)(j => if (j == axis) 1.0f else 0.0f)
    val v1 = Seq((1L, textA, unit(0)), (2L, textB, unit(2)), (3L, textA, unit(3)))
    val v2 = Seq((2L, textB, unit(2)), (3L, textA, unit(3)),
      (10L, textA, unit(4)), (11L, textC, unit(5)))
    val v1df = v1.toDF("doc_id", "text", "embedding")
    val v2df = v2.toDF("doc_id", "text", "embedding")

    def build(tag: String): (ParquetKVSink, String, String) = (
      new ParquetKVSink(Files.createTempDirectory(s"graft-refresh-$tag").toString),
      Files.createTempDirectory(s"graft-refresh-$tag-idx").toString + "/index",
      Files.createTempDirectory(s"graft-refresh-$tag-srch").toString + "/postings")
    def apply(sink: ParquetKVSink, idx: String, srch: String,
              rows: org.apache.spark.sql.DataFrame, id: Long): Unit =
      DedupIngest.applyUnifiedBatch(
        rows, id, "doc_id", "text", "embedding", sink, "rf", Some(idx),
        nLists = 1, trainSample = 100, annNLists = 2, annM = 4, annCodes = 4,
        searchIndexPath = Some(srch))

    // incremental: v1 ingest -> reRepresent probe -> retire -> ingest
    // (delta ∪ reRepresent) in one batch
    val (incSink, incIdx, incSrch) = build("inc")
    apply(incSink, incIdx, incSrch, v1df, 0L)
    val removed = graft.operators.Snapshot.removedRows(v1df, v2df, "doc_id", Seq("text"))
    assert(removed.select("doc_id").as[Long].collect().toSeq == Seq(1L))
    // BEFORE the retirement rewrites the exact state it reads
    val reRep = DedupIngest.reRepresentRows(
      incSink, "rf", removed, v2df, "doc_id", "text").localCheckpoint(true)
    // doc 3 (the never-retained dup) must re-ingest; doc 10 (a NEW
    // arrival with the same content) matches the dropped fingerprint
    // too and is also delta's — hence the by-key union below
    assert(reRep.select("doc_id").as[Long].collect().toSet == Set(3L, 10L))
    DedupIngest.retireUnified(
      removed, "doc_id", "text", "embedding", incSink, "rf", retireId = 0L,
      annIndexPath = Some(incIdx), searchIndexPath = Some(incSrch))
    val delta = graft.operators.Snapshot.delta(v1df, v2df, "doc_id", Seq("text"))
    assert(delta.select("doc_id").as[Long].collect().toSet == Set(10L, 11L))
    apply(incSink, incIdx, incSrch,
      delta.unionByName(reRep).dropDuplicates("doc_id"), 1L)

    // fresh: v2 in one pass into clean artifacts
    val (frSink, frIdx, frSrch) = build("fresh")
    apply(frSink, frIdx, frSrch, v2df, 0L)

    def exact(s: ParquetKVSink): Set[(String, Long, Long)] =
      s.read(spark, "rf__exact", DedupIngest.exactStateSchema)
        .as[(String, Long, Long)].collect().toSet
    def ids(s: ParquetKVSink, t: String, sc: org.apache.spark.sql.types.StructType): Set[Long] =
      s.read(spark, t, sc).select("id").as[Long].collect().toSet
    assert(exact(incSink) == exact(frSink),
      s"exact states diverged:\n${exact(incSink)}\nvs\n${exact(frSink)}")
    assert(ids(incSink, "rf__near", DedupIngest.nearDupStateSchema) ==
      ids(frSink, "rf__near", DedupIngest.nearDupStateSchema))
    assert(ids(incSink, "rf__sem", DedupIngest.semanticStateSchema) ==
      ids(frSink, "rf__sem", DedupIngest.semanticStateSchema))
    // ANN: membership equality (codes/cells are properties of each
    // deployment's own trained model, legitimately different). The
    // incremental side retired via tombstones, so fold them first —
    // the refresh loop's real maintenance cadence
    graft.operators.Similarity.compactIvfPqIndex(spark, incIdx)
    assert(spark.read.parquet(incIdx).select("id").as[Long].collect().toSet ==
      spark.read.parquet(frIdx).select("id").as[Long].collect().toSet)
    // search: SCORE equality, not just membership — df/corpus-stats
    // reversal + delta additions must land on v2's exact statistics
    val terms = Seq("alpha1", "beta1", "gamma1")
    def serve(s: ParquetKVSink, path: String): Seq[(Long, Long)] =
      SearchIndex.search(spark, path, s, "rf__srch", terms)
        .as[(Long, Long, Double)].collect().map(r => (r._1, r._2)).toSeq.sorted
    assert(serve(incSink, incSrch) == serve(frSink, frSrch),
      s"search diverged:\n${serve(incSink, incSrch)}\nvs\n${serve(frSink, frSrch)}")
  }

  test("unified ingest: exact -> near-dup -> semantic -> ANN index in one foreachBatch, tier-exact states") {
    // 40-word base text: the one-word-appended variant keeps shingle
    // Jaccard ≈ 38/40 = 0.95 >= 0.8 (near-dup), while the exact tier
    // only catches byte-identical text
    val textA = (1 to 40).map(i => s"alpha$i").mkString(" ")
    val textA2 = textA + " tail"
    val textB = (1 to 40).map(i => s"beta$i").mkString(" ")
    val textC = (1 to 40).map(i => s"gamma$i").mkString(" ")
    val textD = (1 to 40).map(i => s"delta$i").mkString(" ")
    def unit(axis: Int): Seq[Float] = Seq.tabulate(8)(j => if (j == axis) 1.0f else 0.0f)
    val vx = unit(0)
    val vxNear = unit(0).updated(1, 0.1f) // cos ≈ 0.995 >= 0.9
    val batches = Seq(
      Seq((1L, textA, vx), (2L, textA, unit(1)), (3L, textB, unit(2))),
      // 4: near-dup of A's text; 5: new text but semantic dup of vec 1
      Seq((4L, textA2, unit(3)), (5L, textC, vxNear)),
      // 6: exact dup of A ACROSS batches (state fp hit); 7: unique
      Seq((6L, textA, unit(4)), (7L, textD, unit(5))))

    val input = MemoryStream[(Long, String, Seq[Float])](spark)
    val sink = new ParquetKVSink(Files.createTempDirectory("graft-unified").toString)
    val ckpt = Files.createTempDirectory("graft-unified-ckpt").toString
    val idx = Files.createTempDirectory("graft-unified-idx").toString + "/index"
    val srchIdx = Files.createTempDirectory("graft-unified-srch").toString + "/postings"
    val q = DedupIngest.startUnified(
      input.toDF().toDF("doc_id", "text", "embedding"), "doc_id", "text", "embedding",
      sink, "uni", ckpt, trigger, annIndexPath = Some(idx),
      textThreshold = 0.8, semThreshold = 0.9, nLists = 1, trainSample = 100,
      annNLists = 2, annM = 4, annCodes = 4, searchIndexPath = Some(srchIdx),
      annCompactEvery = 3, searchCompactEvery = 3)
    batches.foreach { b => input.addData(b: _*); q.processAllAvailable() }
    q.stop()

    // the in-trigger compaction hooks fired on the last batch: both
    // artifacts are base-shaped, and every content assertion below
    // reads the COMPACTED layout
    def batchDirNames(path: String): Set[String] = {
      val fs = new org.apache.hadoop.fs.Path(path)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.globStatus(new org.apache.hadoop.fs.Path(s"$path/*/batch=*"))
        .map(_.getPath.getName).toSet
    }
    assert(batchDirNames(idx) == Set("batch=-1"), s"ANN deltas survived: ${batchDirNames(idx)}")
    assert(batchDirNames(srchIdx) == Set("batch=-1"),
      s"postings deltas survived: ${batchDirNames(srchIdx)}")

    // tier 1: every distinct fingerprint recorded, dup counts exact
    val exact = sink.read(spark, "uni__exact", DedupIngest.exactStateSchema)
      .as[(String, Long, Long)].collect().map(r => (r._2, r._3)).toMap
    assert(exact.keySet === Set(1L, 3L, 4L, 5L, 7L), s"exact keep ids ${exact.keySet}")
    assert(exact(1L) === 3L, "textA appeared 3x (ids 1, 2, 6)")

    // tier 2: near-dup corpus dropped the appended-tail variant (id 4)
    val near = sink.read(spark, "uni__near", DedupIngest.nearDupStateSchema)
      .as[(Long, String)].collect().map(_._1).toSet
    assert(near === Set(1L, 3L, 5L, 7L), s"near corpus $near")

    // tier 3: semantic corpus dropped the near-identical vector (id 5)
    val sem = sink.read(spark, "uni__sem", DedupIngest.semanticStateSchema)
      .as[(Long, Seq[Float])].collect().map(_._1).toSet
    assert(sem === Set(1L, 3L, 7L), s"semantic corpus $sem")

    // tier 4: the ANN index holds exactly the final survivors
    val indexed = spark.read.parquet(idx).select("id").as[Long].collect().toSet
    assert(indexed === Set(1L, 3L, 7L), s"indexed ids $indexed")

    // search tier: the BM25 surface serves EXACTLY the retained corpus
    // — a rejected duplicate can never surface — with scores identical
    // to batch bm25Rank over the kept docs
    val searchable = spark.read.parquet(srchIdx).select("doc_id").as[Long].collect().toSet
    assert(searchable === Set(1L, 3L, 7L), s"search index ids $searchable")
    val served = graft.streaming.SearchIndex.search(
      spark, srchIdx, sink, "uni__srch", Seq("alpha1", "beta1"))
      .as[(Long, Long, Double)].collect().map(r => r._1 -> r._2).toMap
    val keptDocs = Seq((1L, textA), (3L, textB), (7L, textD)).toDF("doc_id", "text")
    val wantScores = graft.operators.TfIdf.bm25Rank(keptDocs, "doc_id", "text",
      Seq("alpha1", "beta1")).as[(Long, Long, Double)].collect().map(r => r._1 -> r._2).toMap
    assert(served.keySet === Set(1L, 3L), s"served $served") // doc 7 shares no term
    served.foreach { case (id, micro) => assert(micro == wantScores(id), s"doc $id") }

    // hybrid retrieval from STREAMED STATE ONLY (postings + the sem
    // tier's own (id, vec) table) is bit-identical to the batch
    // composition over the kept corpus — terms cover all kept docs so
    // both surfaces see the same candidate set
    val hybridTerms = Seq("alpha1", "beta1", "delta1")
    val qvec = Seq.tabulate(8)(j => if (j == 2) 1.0 else 0.0)
    val semVecs = sink.read(spark, "uni__sem", DedupIngest.semanticStateSchema)
    val streamedHybrid = graft.streaming.SearchIndex.hybridSearch(
      spark, srchIdx, sink, "uni__srch", semVecs, "id", "vec", hybridTerms, qvec)
      .as[(Long, Long, Long, Long, Double)].collect()
    val keptEmb = Seq((1L, unit(0)), (3L, unit(2)), (7L, unit(5)))
      .toDF("vec_id", "embedding")
    val batchHybrid = graft.operators.TfIdf.hybridRank(
      keptDocs, "doc_id", "text", keptEmb, "vec_id", "embedding", hybridTerms, qvec)
      .as[(Long, Long, Long, Long, Double)].collect()
    assert(streamedHybrid.toSeq == batchHybrid.toSeq,
      s"streamed hybrid diverged:\n${streamedHybrid.toSeq}\nvs\n${batchHybrid.toSeq}")
    assert(streamedHybrid.head._1 == 3L, "the embedding-aligned doc must lead the hybrid mix")

    // equality to the sequential BATCH composition over the union
    val all = batches.flatten
    val allDocs = all.map(t => (t._1, t._2)).toDF("doc_id", "text")
    val exactKeep = Dedup.exact(allDocs, "doc_id", "text")
      .select("keep_id").as[Long].collect().toSet
    assert(exactKeep === exact.keySet, "streamed exact tier != batch Dedup.exact")
    val exactDocs = allDocs.filter($"doc_id".isin(exactKeep.toSeq: _*))
    val nearPairs = Dedup.minHashLsh(exactDocs, "doc_id", "text", n = 3, k = 16,
      bands = 4, threshold = 0.8)
    val nearDropped = nearPairs.select("id_b").as[Long].collect().toSet
    assert(exactKeep -- nearDropped === near, "streamed near tier != batch LSH keep set")

    // replay: re-applying the LAST batch id is a no-op on every state
    DedupIngest.applyUnifiedBatch(
      batches.last.toDF("doc_id", "text", "embedding"), batchId = 2L,
      "doc_id", "text", "embedding", sink, "uni", Some(idx),
      textThreshold = 0.8, semThreshold = 0.9, nLists = 1, trainSample = 100)
    assert(spark.read.parquet(idx).select("id").as[Long].collect().toSet === Set(1L, 3L, 7L))
    assert(sink.read(spark, "uni__sem", DedupIngest.semanticStateSchema).count() === 3L)
  }

  test("unified ingest crash-replay: a batch replayed after a partial first run still reaches every tier") {
    // the ADVICE r13 medium: a crash between the __exact write and the
    // overall markApplied used to starve tiers 2-4 on replay (the exact
    // tier's left_anti self-matched the already-merged state), losing
    // the batch permanently. The keep rules are now replay-stable; this
    // spec drives the two crash windows explicitly.
    val textA = (1 to 40).map(i => s"alpha$i").mkString(" ")
    val textB = (1 to 40).map(i => s"beta$i").mkString(" ")
    val textC = (1 to 40).map(i => s"gamma$i").mkString(" ")
    def unit(axis: Int): Seq[Float] = Seq.tabulate(8)(j => if (j == axis) 1.0f else 0.0f)
    val sink = new ParquetKVSink(Files.createTempDirectory("graft-uni-replay").toString)
    val idx = Files.createTempDirectory("graft-uni-replay-idx").toString + "/index"
    def apply(rows: Seq[(Long, String, Seq[Float])], batchId: Long): Unit =
      DedupIngest.applyUnifiedBatch(
        rows.toDF("doc_id", "text", "embedding"), batchId,
        "doc_id", "text", "embedding", sink, "u", Some(idx),
        textThreshold = 0.8, semThreshold = 0.9, nLists = 1, trainSample = 100,
        annNLists = 2, annM = 4, annCodes = 4)
    def tierIds: (Set[Long], Set[Long], Set[Long], Set[Long]) = (
      sink.read(spark, "u__exact", DedupIngest.exactStateSchema)
        .as[(String, Long, Long)].collect().map(_._2).toSet,
      sink.read(spark, "u__near", DedupIngest.nearDupStateSchema)
        .as[(Long, String)].collect().map(_._1).toSet,
      sink.read(spark, "u__sem", DedupIngest.semanticStateSchema)
        .as[(Long, Seq[Float])].collect().map(_._1).toSet,
      spark.read.parquet(idx).select("id").as[Long].collect().toSet)

    // batch 0 bootstraps every tier (incl. quantizer + ANN model)
    apply(Seq((1L, textA, unit(0)), (2L, textB, unit(1))), batchId = 0L)
    assert(tierIds === ((Set(1L, 2L), Set(1L, 2L), Set(1L, 2L), Set(1L, 2L))))

    // CRASH WINDOW 1: batch 1's first run died after the exact tier's
    // state write AND its per-tier ack, before anything else — simulate
    // by hand-applying exactly those two writes, then replaying the
    // whole batch. Rows 3/4 are intra-batch exact dups (min id 3 wins).
    val b1 = Seq((3L, textC, unit(2)), (4L, textC, unit(3)))
    val exactState0 = sink.read(spark, "u__exact", DedupIngest.exactStateSchema)
    sink.write(
      DedupIngest.mergeExactState(
        exactState0, b1.toDF("doc_id", "text", "embedding"), "doc_id", "text"),
      "u__exact", org.apache.spark.sql.SaveMode.Overwrite)
    sink.write(Seq(1L).toDF("last_batch_id"), "u__exact__meta",
      org.apache.spark.sql.SaveMode.Overwrite)
    apply(b1, batchId = 1L)
    val (exact1, near1, sem1, ann1) = tierIds
    assert(near1 === Set(1L, 2L, 3L), s"tier-2 starved on replay: $near1")
    assert(sem1 === Set(1L, 2L, 3L), s"tier-3 starved on replay: $sem1")
    assert(ann1 === Set(1L, 2L, 3L), s"tier-4 starved on replay: $ann1")
    assert(exact1 === Set(1L, 2L, 3L))
    // the per-tier ack kept dup_count exact (2 rows of textC, not 4)
    val cCount = sink.read(spark, "u__exact", DedupIngest.exactStateSchema)
      .filter($"keep_id" === 3L).as[(String, Long, Long)].head()._3
    assert(cCount === 2L, s"dup_count double-applied on replay: $cCount")

    // CRASH WINDOW 2: batch 2's first run completed EVERY tier write but
    // died before the overall markApplied — simulate by applying fully,
    // rolling the overall meta back, and replaying.
    val b2 = Seq((5L, (1 to 40).map(i => s"delta$i").mkString(" "), unit(4)))
    apply(b2, batchId = 2L)
    val snapshot = tierIds
    val dupCounts0 = sink.read(spark, "u__exact", DedupIngest.exactStateSchema)
      .as[(String, Long, Long)].collect().toSet
    sink.write(Seq(1L).toDF("last_batch_id"), "u__meta",
      org.apache.spark.sql.SaveMode.Overwrite)
    apply(b2, batchId = 2L)
    assert(tierIds === snapshot, "full-write replay changed state")
    assert(sink.read(spark, "u__exact", DedupIngest.exactStateSchema)
      .as[(String, Long, Long)].collect().toSet === dupCounts0,
      "full-write replay double-counted")

    // all-dup batch: every row dies at tier 1 -> tiers 3/4 are skipped
    // (no empty-frame quantizer bootstrap, no empty ANN append)
    apply(Seq((6L, textA, unit(5))), batchId = 3L)
    assert(tierIds === snapshot, "all-dup batch mutated state")
  }

  test("unified ingest decon tier: benchmark-near docs never reach the sem corpus or index, still block dups") {
    def words(p: String) = (1 to 40).map(i => s"$p$i").mkString(" ")
    def unit(axis: Int): Seq[Float] = Seq.tabulate(8)(j => if (j == axis) 1.0f else 0.0f)
    val tC = words("gamma")
    val bench = Seq((900L, unit(2))).toDF("bid", "bvec") // = doc 3's embedding
    val batches = Seq(
      Seq((1L, words("alpha"), unit(0)), (2L, words("beta"), unit(1))),
      // 3 is CONTAMINATED (cos 1.0 to the benchmark item); 4 is clean
      Seq((3L, tC, unit(2)), (4L, words("delta"), unit(3))),
      // 5 is a text near-dup of the CONTAMINATED doc 3 — the near tier
      // must still block it (3's band rows stayed in the dedup state)
      Seq((5L, tC + " tail", unit(4))))

    val input = MemoryStream[(Long, String, Seq[Float])](spark)
    val sink = new ParquetKVSink(Files.createTempDirectory("graft-uni-decon").toString)
    val ckpt = Files.createTempDirectory("graft-uni-decon-ckpt").toString
    val idx = Files.createTempDirectory("graft-uni-decon-idx").toString + "/index"
    val q = DedupIngest.startUnified(
      input.toDF().toDF("doc_id", "text", "embedding"), "doc_id", "text", "embedding",
      sink, "ud", ckpt, trigger, annIndexPath = Some(idx),
      textThreshold = 0.8, semThreshold = 0.9, nLists = 1, trainSample = 100,
      annNLists = 2, annM = 4, annCodes = 4,
      deconBench = Some(bench.toDF("bid", "bvec")), deconThreshold = 0.95)
    batches.foreach { b => input.addData(b: _*); q.processAllAvailable() }
    q.stop()

    val near = sink.read(spark, "ud__near", DedupIngest.nearDupStateSchema)
      .as[(Long, String)].collect().map(_._1).toSet
    assert(near === Set(1L, 2L, 3L, 4L),
      s"contaminated doc must stay a dedup blocker (5 must be near-dropped): $near")
    val sem = sink.read(spark, "ud__sem", DedupIngest.semanticStateSchema)
      .as[(Long, Seq[Float])].collect().map(_._1).toSet
    assert(sem === Set(1L, 2L, 4L), s"contamination reached the semantic corpus: $sem")
    val indexed = spark.read.parquet(idx).select("id").as[Long].collect().toSet
    assert(indexed === Set(1L, 2L, 4L), s"contamination reached the ANN index: $indexed")
  }

  test("ANN-index ingest: streamed appends land in the persisted index; pruned queries see the union") {
    import org.apache.spark.sql.functions.col
    val embR = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val base = embR.filter(col("vec_id") % 2 === 0)
    val indexDir = Files.createTempDirectory("graft-ann-ingest-idx").toString
    Similarity.buildIvfPqIndex(
      base, "vec_id", "embedding", indexDir,
      nLists = 16, m = 16, nCodes = 64, trainSample = 2048)

    val input = MemoryStream[(Long, Seq[Float])](spark)
    val sink = new ParquetKVSink(Files.createTempDirectory("graft-ann-ingest-st").toString)
    val ckpt = Files.createTempDirectory("graft-ann-ingest-ckpt").toString
    val q = DedupIngest.startAnnIndex(
      input.toDF().toDF("vec_id", "embedding"), "vec_id", "embedding",
      indexDir, sink, "ann_idx", ckpt, trigger, compactEvery = 2)

    val deltaRows = embR.filter(col("vec_id") % 2 === 1)
      .select("vec_id", "embedding").as[(Long, Seq[Float])].collect().toSeq
    deltaRows.grouped((deltaRows.size + 2) / 3).foreach { b =>
      input.addData(b: _*); q.processAllAvailable()
    }
    q.stop()

    // every streamed row is in the artifact
    assert(spark.read.parquet(indexDir).count() == embR.count())
    // compactEvery = 2 folded batches 0-1 (and the base) into batch=-1;
    // only the post-compaction batch 2 remains as a delta
    val batches = spark.read.parquet(indexDir)
      .select("batch").distinct().as[Long].collect().toSet
    assert(batches == Set(-1L, 2L), s"compaction did not run mid-stream: $batches")

    // the kNN JOIN over the final artifact equals the inline join with
    // the SAME (frozen, persisted) model over the full union — streamed
    // rows were encoded consistently with the base build
    val (centroids, _) = Similarity.readIvfPqModel(spark, indexDir)
    val queries = embR.filter(col("vec_id") % 100 === 0)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val fromIdx = Similarity.knnJoinFromIndex(
      spark, indexDir, embR, "vec_id", "embedding", queries, "qid", "qvec",
      k = 5, nProbe = 4)
      .as[(Long, Long, Double)].collect().sortBy(r => (r._1, r._2)).toSeq
    val inline = Similarity.knnJoinWithCentroids(
      embR, "vec_id", "embedding", queries, "qid", "qvec", k = 5, nProbe = 4, centroids)
      .as[(Long, Long, Double)].collect().sortBy(r => (r._1, r._2)).toSeq
    assert(fromIdx == inline, s"streamed index diverged from inline:\n$fromIdx\nvs\n$inline")

    // replaying an already-applied batchId must not double-append
    val before = spark.read.parquet(indexDir).count()
    DedupIngest.applyAnnBatch(
      deltaRows.take(5).toDF("vec_id", "embedding"), batchId = 0L,
      "vec_id", "embedding", indexDir, sink, "ann_idx")
    assert(spark.read.parquet(indexDir).count() == before,
      "replayed batch was appended twice")
  }

  test("unified ingest quality tier: frozen-LM gate drops junk before near-dup; exact state still blocks it") {
    import graft.operators.NgramLm
    val textA = (1 to 40).map(i => s"alpha$i").mkString(" ")
    val textB = (1 to 40).map(i => s"beta$i").mkString(" ")
    val textC = (1 to 40).map(i => s"gamma$i").mkString(" ")
    val junk = (1 to 40).map(i => s"junk$i").mkString(" ") // fully OOV vs the LM
    def unit(axis: Int): Seq[Float] = Seq.tabulate(8)(j => if (j == axis) 1.0f else 0.0f)

    // frozen LM trained on the in-domain corpus: in-domain bigrams score
    // ln(1/1) = 0, OOV bigrams the ln(0.4/N) floor (~ -5.7) — cutoff -3
    // splits them cleanly
    val lmDir = Files.createTempDirectory("graft-uni-lm").toString
    NgramLm.saveLm(
      NgramLm.train(
        Seq((0L, textA), (1L, textB), (2L, textC)).toDF("doc_id", "text"),
        "doc_id", "text"),
      lmDir)

    val input = MemoryStream[(Long, String, Seq[Float])](spark)
    val sink = new ParquetKVSink(Files.createTempDirectory("graft-uni-q").toString)
    val ckpt = Files.createTempDirectory("graft-uni-q-ckpt").toString
    val q = DedupIngest.startUnified(
      input.toDF().toDF("doc_id", "text", "embedding"), "doc_id", "text", "embedding",
      sink, "uq", ckpt, trigger,
      textThreshold = 0.8, semThreshold = 0.9, nLists = 1, trainSample = 100,
      lmPath = Some(lmDir), qualityCutoff = -3.0)
    val junk2 = (1 to 40).map(i => s"qq$i").mkString(" ")
    val junk3 = (1 to 40).map(i => s"vv$i").mkString(" ")
    val batches = Seq(
      Seq((1L, textA, unit(0)), (2L, junk, unit(1)), (3L, textB, unit(2))),
      // 4: exact dup of the DROPPED junk — must die in tier 1 (its
      // fingerprint is a blocker) without being re-scored; 5: in-domain
      Seq((4L, junk, unit(3)), (5L, textC, unit(4))),
      // an ALL-junk batch: the gate empties the near tier's input — the
      // pipeline must cross the empty near/sem path without crashing
      // and without touching the kept states
      Seq((8L, junk2, unit(5)), (9L, junk3, unit(6))))
    batches.foreach { b => input.addData(b: _*); q.processAllAvailable() }
    q.stop()

    // exact state holds every junk fingerprint (keep_id 2: dup_count 2)
    val exact = sink.read(spark, "uq__exact", DedupIngest.exactStateSchema)
      .as[(String, Long, Long)].collect().map(r => (r._2, r._3)).toMap
    assert(exact.keySet === Set(1L, 2L, 3L, 5L, 8L, 9L), s"exact keep ids ${exact.keySet}")
    assert(exact(2L) === 2L, "junk fingerprint must count both appearances")

    // the quality gate kept junk OUT of every downstream tier
    val near = sink.read(spark, "uq__near", DedupIngest.nearDupStateSchema)
      .as[(Long, String)].collect().map(_._1).toSet
    assert(near === Set(1L, 3L, 5L), s"near corpus $near")
    val sem = sink.read(spark, "uq__sem", DedupIngest.semanticStateSchema)
      .as[(Long, Seq[Float])].collect().map(_._1).toSet
    assert(sem === Set(1L, 3L, 5L), s"semantic corpus $sem")

    // replaying the last batch is a no-op (the gate is a pure function
    // of batch + frozen LM — replay-stable)
    DedupIngest.applyUnifiedBatch(
      batches.last.toDF("doc_id", "text", "embedding"), batchId = 2L,
      "doc_id", "text", "embedding", sink, "uq", None,
      textThreshold = 0.8, semThreshold = 0.9, nLists = 1, trainSample = 100,
      lmPath = Some(lmDir), qualityCutoff = -3.0)
    assert(sink.read(spark, "uq__sem", DedupIngest.semanticStateSchema)
      .count() === 3L)
  }
}
