package graft.streaming

import graft.SparkTestBase
import graft.operators.TfIdf
import graft.sinks.ParquetKVSink
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger

import java.nio.file.Files

/** The streamed search index must serve EXACTLY [[TfIdf.bm25Rank]]'s
  * scores over the union of all micro-batches (shared micro expression,
  * additive df/stats state), restricted to docs containing a query
  * term; replay of an applied batch must be a no-op; and a query must
  * read only its terms' postings buckets (partition-pruned scan).
  */
class SearchIndexSpec extends SparkTestBase {
  import spark.implicits._

  private val trigger = Trigger.ProcessingTime("50 milliseconds")

  test("streamed index equals batch BM25 over the union; replay no-op; probes prune partitions") {
    val batches = Seq(
      Seq((1L, "rare apple apple"),
        (2L, "apple apple apple apple banana banana banana banana")),
      Seq((3L, "apple banana"),
        (4L, "rare rare apple banana filler filler filler"),
        (5L, null.asInstanceOf[String])), // null text: no postings, no stats
      Seq((6L, "unrelated words only here")))
    val union = batches.flatten.toDF("doc_id", "text")

    val input = MemoryStream[(Long, String)](spark)
    val sink = new ParquetKVSink(Files.createTempDirectory("graft-srch").toString)
    val idxPath = Files.createTempDirectory("graft-srch-idx").toString + "/postings"
    val ckpt = Files.createTempDirectory("graft-srch-ckpt").toString
    val q = SearchIndex.start(
      input.toDF().toDF("doc_id", "text"), "doc_id", "text",
      idxPath, sink, "srch", ckpt, trigger)
    batches.foreach { b => input.addData(b: _*); q.processAllAvailable() }
    q.stop()

    val terms = Seq("rare", "apple", "banana")
    val served = SearchIndex.search(spark, idxPath, sink, "srch", terms)
    val got = served.as[(Long, Long, Double)].collect()
    val want = TfIdf.bm25Rank(union, "doc_id", "text", terms)
      .as[(Long, Long, Double)].collect().map(r => r._1 -> r._2).toMap

    assert(got.map(_._1).toSet == Set(1L, 2L, 3L, 4L)) // docs sharing >= 1 term
    got.foreach { case (doc, micro, score) =>
      assert(micro == want(doc), s"doc $doc diverged from batch BM25")
      assert(score == micro.toDouble / 1000000.0)
    }
    // ordering: micro desc, doc asc
    val ord = got.map(r => (-r._2, r._1)).toSeq
    assert(ord == ord.sorted)

    // the null-text doc reached neither stats nor postings
    val stats = sink.read(spark, "srch__stats", SearchIndex.statsSchema)
      .as[(Long, Long, Long)].head()
    assert(stats._2 == 5L, s"n_docs counted the null-text doc: $stats")

    // partition pruning: the postings scan carries a tb partition filter
    served.collect()
    val planStr = served.queryExecution.executedPlan.toString
    assert(planStr.contains("PartitionFilters: [") && planStr.contains("tb"),
      s"postings read not partition-pruned:\n$planStr")

    // replay via the acked fast path: a no-op
    SearchIndex.applyBatch(
      batches.last.toDF("doc_id", "text"), batchId = 2L,
      "doc_id", "text", idxPath, sink, "srch", buckets = 16)
    val replayed = SearchIndex.search(spark, idxPath, sink, "srch", terms)
      .as[(Long, Long, Double)].collect()
    assert(replayed.toSeq == got.toSeq, "replayed batch changed the index")

    // replay through the CRASH WINDOW (top-level ack lost, per-table
    // acks present): postings rewrite their own partitions, the count
    // merges short-circuit — results still identical
    import org.apache.spark.sql.SaveMode
    sink.write(Seq(1L).toDF("last_batch_id"), "srch__meta", SaveMode.Overwrite)
    SearchIndex.applyBatch(
      batches.last.toDF("doc_id", "text"), batchId = 2L,
      "doc_id", "text", idxPath, sink, "srch", buckets = 16)
    val crashed = SearchIndex.search(spark, idxPath, sink, "srch", terms)
      .as[(Long, Long, Double)].collect()
    assert(crashed.toSeq == got.toSeq, "crash-window replay double-applied")

    // a query for an unseen term returns nothing (and does not error on
    // the pruned-empty read)
    assert(SearchIndex.search(spark, idxPath, sink, "srch", Seq("zzz-absent")).count() == 0L)

    // compaction: delta partitions collapse to batch=-1, search
    // identical, re-compaction a row-level no-op
    def batchDirs(): Set[String] = {
      val fs = new org.apache.hadoop.fs.Path(idxPath)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.globStatus(new org.apache.hadoop.fs.Path(s"$idxPath/tb=*/batch=*"))
        .map(_.getPath.getName).toSet
    }
    assert(batchDirs().exists(_ != "batch=-1"), "expected per-trigger delta partitions")
    SearchIndex.compactPostings(spark, idxPath)
    assert(batchDirs() == Set("batch=-1"), s"deltas survived compaction: ${batchDirs()}")
    val compacted = SearchIndex.search(spark, idxPath, sink, "srch", terms)
      .as[(Long, Long, Double)].collect()
    assert(compacted.toSeq == got.toSeq, "compaction changed search results")
    SearchIndex.compactPostings(spark, idxPath)
    val again = SearchIndex.search(spark, idxPath, sink, "srch", terms)
      .as[(Long, Long, Double)].collect()
    assert(again.toSeq == got.toSeq, "re-compaction changed search results")

    // the artifact's persisted bucket count wins over a mismatched
    // caller parameter — no silent mis-pruned empty ranking
    val mismatched = SearchIndex.search(spark, idxPath, sink, "srch", terms, buckets = 5)
      .as[(Long, Long, Double)].collect()
    assert(mismatched.toSeq == got.toSeq, "bucket-count mismatch mis-pruned the index")

    // crash-window recovery: strand the artifact the way a crash
    // between compaction's two renames would, then query — every entry
    // point self-heals
    val fs = new org.apache.hadoop.fs.Path(idxPath)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val root = new org.apache.hadoop.fs.Path(idxPath)
    val stranded = new org.apache.hadoop.fs.Path(
      root.getParent, s".${root.getName}_compact_old_999")
    assert(fs.rename(root, stranded))
    val healed = SearchIndex.search(spark, idxPath, sink, "srch", terms)
      .as[(Long, Long, Double)].collect()
    assert(healed.toSeq == got.toSeq, "crash-window recovery lost the artifact")
    assert(fs.exists(root) && !fs.exists(stranded))
  }

  test("quiet and null-text streams: compaction no-ops, empty batches never create a dataless dir") {
    val sink = new ParquetKVSink(Files.createTempDirectory("graft-srch2").toString)
    val idxPath = Files.createTempDirectory("graft-srch2-idx").toString + "/postings"
    // cadence firing before any postings exist is maintenance on a
    // quiet stream, not an error
    SearchIndex.compactPostings(spark, idxPath)
    val fs = new org.apache.hadoop.fs.Path(idxPath)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(idxPath)))

    // rows-but-all-null-text batch: acked, no dataless parquet dir
    SearchIndex.applyBatch(
      Seq((1L, null.asInstanceOf[String])).toDF("doc_id", "text"),
      batchId = 0L, "doc_id", "text", idxPath, sink, "srch2", buckets = 16)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(idxPath)),
      "all-null batch created a dataless dir")
    assert(SearchIndex.search(spark, idxPath, sink, "srch2", Seq("anything")).count() == 0L)

    // real data later lands normally under the same table
    SearchIndex.applyBatch(
      Seq((2L, "alpha beta")).toDF("doc_id", "text"),
      batchId = 1L, "doc_id", "text", idxPath, sink, "srch2", buckets = 16)
    val hits = SearchIndex.search(spark, idxPath, sink, "srch2", Seq("alpha"))
      .as[(Long, Long, Double)].collect()
    assert(hits.map(_._1).toSeq == Seq(2L))

    // a restart with a DIFFERENT buckets parameter adopts the
    // artifact's sidecar: the new batch's postings stay findable
    SearchIndex.applyBatch(
      Seq((3L, "alpha gamma")).toDF("doc_id", "text"),
      batchId = 2L, "doc_id", "text", idxPath, sink, "srch2", buckets = 5)
    val after = SearchIndex.search(spark, idxPath, sink, "srch2", Seq("alpha"))
      .as[(Long, Long, Double)].collect()
    assert(after.map(_._1).toSet == Set(2L, 3L),
      s"restart with mismatched buckets lost postings: ${after.toSeq}")
  }

  test("retire: postings, df, and stats all reversed; survivors score as a fresh build; replay-safe") {
    val sink = new ParquetKVSink(Files.createTempDirectory("graft-srch4").toString)
    val idxPath = Files.createTempDirectory("graft-srch4-idx").toString + "/postings"
    val batches = Seq(
      Seq((1L, "alpha alpha beta"), (2L, "alpha gamma gamma gamma")),
      Seq((3L, "beta beta gamma"), (4L, "$$$"), (5L, null.asInstanceOf[String])),
      Seq((6L, "alpha beta gamma")))
    batches.zipWithIndex.foreach { case (b, i) =>
      SearchIndex.applyBatch(
        b.toDF("doc_id", "text"), batchId = i.toLong,
        "doc_id", "text", idxPath, sink, "srch4", buckets = 16)
    }
    // retire a scored doc, the zero-token doc, and the null-text doc —
    // each exercises a different reversal path (postings+df+stats,
    // stats-only, nothing)
    val removed = Seq(
      (2L, "alpha gamma gamma gamma"),
      (4L, "$$$"),
      (5L, null.asInstanceOf[String])).toDF("doc_id", "text")
    SearchIndex.retire(removed, "doc_id", "text", idxPath, sink, "srch4", retireId = 0L)

    val surviving = Seq(
      (1L, "alpha alpha beta"), (3L, "beta beta gamma"), (6L, "alpha beta gamma"))
      .toDF("doc_id", "text")
    val terms = Seq("alpha", "beta", "gamma")
    def serve(): Seq[(Long, Long, Double)] =
      SearchIndex.search(spark, idxPath, sink, "srch4", terms)
        .as[(Long, Long, Double)].collect().toSeq
    val got = serve()
    val want = TfIdf.bm25Rank(surviving, "doc_id", "text", terms)
      .as[(Long, Long, Double)].collect().map(r => r._1 -> r._2).toMap
    assert(got.map(_._1).toSet == Set(1L, 3L, 6L), s"retired doc still served: $got")
    got.foreach { case (doc, micro, _) =>
      assert(micro == want(doc),
        s"doc $doc diverged from a fresh build over the survivors")
    }
    val stats = sink.read(spark, "srch4__stats", SearchIndex.statsSchema)
      .as[(Long, Long, Long)].head()
    assert(stats._2 == 3L, s"n_docs not reversed: $stats")
    assert(sink.read(spark, "srch4__df", SearchIndex.dfSchema)
      .filter(org.apache.spark.sql.functions.col("df") <= 0).count() == 0L,
      "zero/negative df rows survived retirement")

    // replay with the same retireId: a no-op end to end
    SearchIndex.retire(removed, "doc_id", "text", idxPath, sink, "srch4", retireId = 0L)
    assert(serve() == got, "replayed retirement double-subtracted")

    // crash window: top-level ack lost, per-table acks present — the
    // postings rewrite re-runs (content-idempotent), the df/stats
    // subtractions short-circuit on their own acks
    import org.apache.spark.sql.SaveMode
    sink.write(Seq(-1L).toDF("last_batch_id"), "srch4__retire__meta", SaveMode.Overwrite)
    SearchIndex.retire(removed, "doc_id", "text", idxPath, sink, "srch4", retireId = 0L)
    assert(serve() == got, "crash-window retirement replay double-applied")

    // a later ingest keeps working against the retired artifact
    SearchIndex.applyBatch(
      Seq((7L, "alpha beta")).toDF("doc_id", "text"), batchId = 3L,
      "doc_id", "text", idxPath, sink, "srch4", buckets = 16)
    val withNew = SearchIndex.search(spark, idxPath, sink, "srch4", terms)
      .as[(Long, Long, Double)].collect()
    val wantNew = TfIdf.bm25Rank(
      surviving.unionByName(Seq((7L, "alpha beta")).toDF("doc_id", "text")),
      "doc_id", "text", terms)
      .as[(Long, Long, Double)].collect().map(r => r._1 -> r._2).toMap
    assert(withNew.map(_._1).toSet == Set(1L, 3L, 6L, 7L))
    withNew.foreach { case (doc, micro, _) =>
      assert(micro == wantNew(doc), s"post-retirement ingest skewed doc $doc")
    }

    // tombstone shape: retire did NOT rewrite the postings — the
    // retired doc's rows are physically present, masked by the sidecar
    def physicalDocs(): Set[Long] =
      spark.read.parquet(idxPath).select("doc_id").as[Long].collect().toSet
    assert(physicalDocs().contains(2L),
      "tombstone retire rewrote the postings artifact (should be sidecar-only)")
    assert(new java.io.File(idxPath, "_graft_tombstones").exists(),
      "retire left no tombstone sidecar")

    // compaction folds the tombstones: rows physically purged, sidecar
    // consumed, every score unchanged
    SearchIndex.compactPostings(spark, idxPath)
    assert(physicalDocs() == Set(1L, 3L, 6L, 7L),
      "compaction did not fold the retirement tombstones")
    assert(!new java.io.File(idxPath, "_graft_tombstones").exists(),
      "compacted artifact still carries the tombstone sidecar")
    val folded = SearchIndex.search(spark, idxPath, sink, "srch4", terms)
      .as[(Long, Long, Double)].collect()
    assert(folded.toSeq == withNew.toSeq, "scores changed when the tombstones folded")
  }

  test("retire with compactNow purges physically in the call (the erasure-deadline path)") {
    val sink = new ParquetKVSink(Files.createTempDirectory("graft-srch6").toString)
    val idxPath = Files.createTempDirectory("graft-srch6-idx").toString + "/postings"
    SearchIndex.applyBatch(
      Seq((1L, "alpha beta"), (2L, "alpha gamma"), (3L, "beta gamma"))
        .toDF("doc_id", "text"),
      batchId = 0L, "doc_id", "text", idxPath, sink, "srch6", buckets = 4)
    SearchIndex.retire(
      Seq((2L, "alpha gamma")).toDF("doc_id", "text"),
      "doc_id", "text", idxPath, sink, "srch6", retireId = 0L, compactNow = true)
    assert(spark.read.parquet(idxPath).select("doc_id").as[Long].collect().toSet
      == Set(1L, 3L), "compactNow retire left the retired doc's postings")
    assert(!new java.io.File(idxPath, "_graft_tombstones").exists())
    val got = SearchIndex.search(spark, idxPath, sink, "srch6", Seq("alpha", "beta", "gamma"))
      .as[(Long, Long, Double)].collect()
    val want = TfIdf.bm25Rank(
      Seq((1L, "alpha beta"), (3L, "beta gamma")).toDF("doc_id", "text"),
      "doc_id", "text", Seq("alpha", "beta", "gamma"))
      .as[(Long, Long, Double)].collect().map(r => r._1 -> r._2).toMap
    assert(got.map(_._1).toSet == Set(1L, 3L))
    got.foreach { case (doc, micro, _) =>
      assert(micro == want(doc), s"doc $doc diverged after compactNow retire")
    }
  }

  test("searchJoin/hybridJoin from streamed state equal the batch query-set surfaces") {
    val sink = new ParquetKVSink(Files.createTempDirectory("graft-srchj").toString)
    val idxPath = Files.createTempDirectory("graft-srchj-idx").toString + "/postings"
    val batches = Seq(
      Seq((1L, "rare apple apple"), (2L, "apple apple banana banana banana")),
      Seq((3L, "apple banana"), (4L, "rare rare apple banana filler filler")),
      Seq((5L, "unrelated words only here")))
    batches.zipWithIndex.foreach { case (b, i) =>
      SearchIndex.applyBatch(
        b.toDF("doc_id", "text"), batchId = i.toLong,
        "doc_id", "text", idxPath, sink, "srchj", buckets = 16)
    }
    val union = batches.flatten.toDF("doc_id", "text")
    val queries = Seq(
      (10L, Seq("rare", "apple"), Seq(1.0f, 0.0f)),
      (11L, Seq("banana", "unrelated"), Seq(0.0f, 1.0f)),
      (12L, Seq("zzz-absent"), Seq(1.0f, 1.0f))) // no term matches: absent from results
      .toDF("qid", "qterms", "qvec")

    val servedLex = SearchIndex.searchJoin(
      spark, idxPath, sink, "srchj", queries, "qid", "qterms")
      .as[(Long, Long, Long, Double)].collect().toSet
    val wantLex = graft.operators.TfIdf.bm25Join(
      union, "doc_id", "text", queries, "qid", "qterms")
      .as[(Long, Long, Long, Double)].collect().toSet
    assert(servedLex == wantLex, s"streamed searchJoin diverged:\n$servedLex\nvs\n$wantLex")
    assert(servedLex.map(_._1) == Set(10L, 11L), "no-term query leaked into the ranking")

    val emb = Seq(
      (1L, Seq(1.0f, 0.0f)), (2L, Seq(0.3f, 0.6f)),
      (3L, Seq(0.0f, 1.0f)), (5L, Seq(0.5f, 0.5f))) // doc 4 has no embedding
      .toDF("vec_id", "embedding")
    val servedHyb = SearchIndex.hybridJoin(
      spark, idxPath, sink, "srchj", emb, "vec_id", "embedding",
      queries, "qid", "qterms", "qvec")
      .as[(Long, Long, Long, Long, Long, Double)].collect().toSet
    val wantHyb = graft.operators.TfIdf.hybridJoin(
      union, "doc_id", "text", emb, "vec_id", "embedding",
      queries, "qid", "qterms", "qvec")
      .as[(Long, Long, Long, Long, Long, Double)].collect().toSet
    assert(servedHyb == wantHyb, s"streamed hybridJoin diverged:\n$servedHyb\nvs\n$wantHyb")

    // empty index: every query simply has no candidates (no error)
    val sink2 = new ParquetKVSink(Files.createTempDirectory("graft-srchj2").toString)
    val emptyIdx = Files.createTempDirectory("graft-srchj2-idx").toString + "/postings"
    assert(SearchIndex.searchJoin(
      spark, emptyIdx, sink2, "none", queries, "qid", "qterms").count() == 0L)
  }

  test("zero-token texts count toward corpus stats even in a no-postings batch (score parity)") {
    val sink = new ParquetKVSink(Files.createTempDirectory("graft-srch3").toString)
    val idxPath = Files.createTempDirectory("graft-srch3-idx").toString + "/postings"
    // batch 0: normal docs; batch 1: non-null texts that tokenize to
    // ZERO tokens (punctuation only) — no postings, but bm25Rank still
    // counts them in n_docs/sum_dl, so the streamed stats must too or
    // every other doc's idf skews
    val batches = Seq(
      Seq((1L, "alpha alpha beta"), (2L, "alpha gamma gamma gamma")),
      Seq((3L, "!!! ... ???"), (4L, "$$$")),
      Seq((5L, "beta gamma")))
    batches.zipWithIndex.foreach { case (b, i) =>
      SearchIndex.applyBatch(
        b.toDF("doc_id", "text"), batchId = i.toLong,
        "doc_id", "text", idxPath, sink, "srch3", buckets = 16)
    }
    val stats = sink.read(spark, "srch3__stats", SearchIndex.statsSchema)
      .as[(Long, Long, Long)].head()
    assert(stats._2 == 5L, s"zero-token docs missing from n_docs: $stats")
    val union = batches.flatten.toDF("doc_id", "text")
    val terms = Seq("alpha", "beta", "gamma")
    val served = SearchIndex.search(spark, idxPath, sink, "srch3", terms)
      .as[(Long, Long, Double)].collect()
    val want = TfIdf.bm25Rank(union, "doc_id", "text", terms)
      .as[(Long, Long, Double)].collect().map(r => r._1 -> r._2).toMap
    assert(served.map(_._1).toSet == Set(1L, 2L, 5L))
    served.foreach { case (doc, micro, _) =>
      assert(micro == want(doc), s"doc $doc diverged from batch BM25 after a zero-token batch")
    }
    // the zero-postings batch was acked (a replay is a no-op, not a
    // double count)
    SearchIndex.applyBatch(
      batches(1).toDF("doc_id", "text"), batchId = 1L,
      "doc_id", "text", idxPath, sink, "srch3", buckets = 16)
    val statsAfter = sink.read(spark, "srch3__stats", SearchIndex.statsSchema)
      .as[(Long, Long, Long)].head()
    assert(statsAfter == stats, "replayed zero-postings batch double-counted stats")
  }
}
