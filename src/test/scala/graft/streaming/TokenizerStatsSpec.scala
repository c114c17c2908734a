package graft.streaming

import graft.SparkTestBase
import graft.operators.{Bpe, Vocab}
import graft.sinks.ParquetKVSink
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger

import java.nio.file.Files

/** Streamed tokenizer stats must land on EXACTLY the batch q96/q98
  * computations over the union of all micro-batches (the additive-state
  * contract), for any batch partitioning, including null sources and
  * wordless docs.
  */
class TokenizerStatsSpec extends SparkTestBase {
  import spark.implicits._

  private val trigger = Trigger.ProcessingTime("50 milliseconds")

  test("streamed vocab-coverage and fertility state equal the batch computation over the union") {
    val batches = Seq(
      Seq((1L, "the merge then the", "web"), (2L, "stream of merges", "web")),
      Seq((3L, "the the the", "books"), (4L, "", "books"), // wordless doc
        (5L, "merge the stream", null.asInstanceOf[String])), // null source
      Seq((6L, "then then stream", "web")))
    val union = batches.flatten.toDF("doc_id", "text", "source")
    // frozen merge list trained up-front (external-tokenizer contract)
    val merges = Bpe.rankedBigramMerges(union, "text", topPairs = 8)

    val input = MemoryStream[(Long, String, String)](spark)
    val sink = new ParquetKVSink(Files.createTempDirectory("graft-tokstats").toString)
    val ckpt = Files.createTempDirectory("graft-tokstats-ckpt").toString
    val q = TokenizerStats.start(
      input.toDF().toDF("doc_id", "text", "source"), "source", "text", merges,
      sink, "tok", ckpt, trigger)
    batches.foreach { b => input.addData(b: _*); q.processAllAvailable() }
    q.stop()

    // q96 shape: the coverage curve from the maintained state equals the
    // batch curve over the union's token stream
    val streamedCurve = TokenizerStats.vocabCoverage(spark, sink, "tok", topV = 50)
      .as[(String, Long, Long, Double)].collect().sortBy(_._3).toSeq
    val batchCurve = Vocab.vocabularyFromTokens(
      Bpe.tokenStream(union, "text", merges), "token", topV = 50)
      .as[(String, Long, Long, Double)].collect().sortBy(_._3).toSeq
    assert(streamedCurve === batchCurve,
      s"coverage diverged:\n$streamedCurve\nvs\n$batchCurve")

    // q98 shape: fertility totals equal the batch one-pass aggregate
    // (null source is a real group; wordless doc counts toward n_docs)
    val streamedStats = TokenizerStats.sourceStats(spark, sink, "tok")
      .select("source", "n_docs", "n_tokens", "n_chars")
      .as[(Option[String], Long, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    val batchStats = Bpe.groupTokenStats(union, "source", "text", merges)
      .as[(Option[String], Long, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(streamedStats === batchStats,
      s"fertility diverged:\n$streamedStats\nvs\n$batchStats")
    assert(streamedStats.contains(None) && streamedStats(Some("books"))._1 == 2L)

    // replay: re-applying the last batch id is a no-op on both states
    TokenizerStats.applyBatch(
      batches.last.toDF("doc_id", "text", "source"), batchId = 2L,
      "source", "text", merges, sink, "tok")
    val replayed = TokenizerStats.sourceStats(spark, sink, "tok")
      .select("source", "n_docs", "n_tokens", "n_chars")
      .as[(Option[String], Long, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(replayed === batchStats, "replayed batch double-counted")
  }

  test("retire: retired docs' counts reverse exactly; survivors equal a fresh build; replay-safe") {
    val v1 = Seq(
      (1L, "the merge then the", "web"), (2L, "stream of merges", "web"),
      (3L, "the the the", "books"), (4L, "merge the stream", null.asInstanceOf[String]))
    val union = v1.toDF("doc_id", "text", "source")
    val merges = Bpe.rankedBigramMerges(union, "text", topPairs = 8)
    val sink = new ParquetKVSink(Files.createTempDirectory("graft-tokret").toString)
    TokenizerStats.applyBatch(union, 0L, "source", "text", merges, sink, "tkr")

    // retire the whole 'books' source and one web doc (incl. a
    // null-source doc staying put) — states must equal a fresh build
    // over the survivors, with the SAME frozen merges
    val removed = Seq((3L, "the the the", "books"), (2L, "stream of merges", "web"))
      .toDF("doc_id", "text", "source")
    TokenizerStats.retire(removed, "source", "text", merges, sink, "tkr", retireId = 0L)
    val survivors = Seq(
      (1L, "the merge then the", "web"), (4L, "merge the stream", null.asInstanceOf[String]))
      .toDF("doc_id", "text", "source")

    def srcStats: Map[Option[String], (Long, Long, Long)] =
      TokenizerStats.sourceStats(spark, sink, "tkr")
        .select("source", "n_docs", "n_tokens", "n_chars")
        .as[(Option[String], Long, Long, Long)].collect()
        .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    def tokState: Map[String, Long] =
      sink.read(spark, "tkr__tokens", TokenizerStats.tokenStateSchema)
        .as[(String, Long)].collect().toMap
    val wantSrc = Bpe.groupTokenStats(survivors, "source", "text", merges)
      .as[(Option[String], Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    val wantTok = Bpe.tokenStream(survivors, "text", merges)
      .groupBy("token").count().as[(String, Long)].collect().toMap
    assert(srcStats == wantSrc, s"fertility not reversed:\n$srcStats\nvs\n$wantSrc")
    assert(!srcStats.contains(Some("books")), "fully-retired source row survived")
    assert(tokState == wantTok, s"token counts not reversed:\n$tokState\nvs\n$wantTok")

    // acked replay and crash-window replay (top ack lost, per-table
    // acks present): no double subtraction
    TokenizerStats.retire(removed, "source", "text", merges, sink, "tkr", retireId = 0L)
    assert(srcStats == wantSrc && tokState == wantTok, "acked replay double-applied")
    sink.write(Seq(-1L).toDF("last_batch_id"), "tkr__retire__meta",
      org.apache.spark.sql.SaveMode.Overwrite)
    TokenizerStats.retire(removed, "source", "text", merges, sink, "tkr", retireId = 0L)
    assert(srcStats == wantSrc && tokState == wantTok, "crash-window replay double-applied")

    // the state stays live for later ingest after retirement
    TokenizerStats.applyBatch(
      Seq((9L, "then then stream", "web")).toDF("doc_id", "text", "source"),
      1L, "source", "text", merges, sink, "tkr")
    val after = Bpe.groupTokenStats(
      survivors.unionByName(Seq((9L, "then then stream", "web")).toDF("doc_id", "text", "source")),
      "source", "text", merges)
      .as[(Option[String], Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(srcStats == after, "post-retirement ingest skewed the totals")
  }

  test("crash between the two state writes: replay merges only the table that never acked") {
    val merges = Seq(("a", "l"))
    def ingestClean(batches: Seq[Seq[(Long, String, String)]]): (Map[String, Long], Map[Option[String], Long]) = {
      val s = new graft.sinks.InMemoryKVSink
      batches.zipWithIndex.foreach { case (b, i) =>
        TokenizerStats.applyBatch(
          b.toDF("doc_id", "text", "source"), i.toLong, "source", "text", merges, s, "t")
      }
      (s.read(spark, "t__tokens", TokenizerStats.tokenStateSchema)
        .as[(String, Long)].collect().toMap,
        s.read(spark, "t__sources", TokenizerStats.sourceStateSchema)
          .as[(Option[String], Long, Long, Long)].collect().map(r => r._1 -> r._2).toMap)
    }
    val b0 = Seq((1L, "alpha alpha", "web"))
    val b1 = Seq((2L, "alpha beta", "books"))
    val expected = ingestClean(Seq(b0, b1))

    // crashed run: batch 1's token merge + its ack landed, sources did not
    val sink = new graft.sinks.InMemoryKVSink
    TokenizerStats.applyBatch(b0.toDF("doc_id", "text", "source"), 0L, "source", "text", merges, sink, "t")
    sink.write(
      TokenizerStats.mergeTokenState(
        sink.read(spark, "t__tokens", TokenizerStats.tokenStateSchema),
        b1.toDF("doc_id", "text", "source"), "text", merges),
      "t__tokens", org.apache.spark.sql.SaveMode.Overwrite)
    sink.write(Seq(1L).toDF("last_batch_id"), "t__tokens__meta",
      org.apache.spark.sql.SaveMode.Overwrite)
    // replay the whole batch: tokens must NOT double-count, sources must land
    TokenizerStats.applyBatch(b1.toDF("doc_id", "text", "source"), 1L, "source", "text", merges, sink, "t")
    val got = (
      sink.read(spark, "t__tokens", TokenizerStats.tokenStateSchema)
        .as[(String, Long)].collect().toMap,
      sink.read(spark, "t__sources", TokenizerStats.sourceStateSchema)
        .as[(Option[String], Long, Long, Long)].collect().map(r => r._1 -> r._2).toMap)
    assert(got === expected, s"crash-replay diverged:\n$got\nvs\n$expected")
  }

  test("merges are batching-invariant: one batch vs shuffled splits land on the same states") {
    val docs = (1L to 30L).map(i =>
      (i, s"alpha${i % 4} beta${i % 3} alpha${i % 4}", if (i % 5 == 0) null else s"s${i % 2}"))
    val merges = Seq(("a", "l"), ("al", "p"))
    def ingest(batches: Seq[Seq[(Long, String, String)]]): (Map[String, Long], Map[Option[String], (Long, Long, Long)]) = {
      val sink = new graft.sinks.InMemoryKVSink
      batches.zipWithIndex.foreach { case (b, i) =>
        TokenizerStats.applyBatch(
          b.toDF("doc_id", "text", "source"), i.toLong, "source", "text", merges, sink, "t")
      }
      (sink.read(spark, "t__tokens", TokenizerStats.tokenStateSchema)
        .as[(String, Long)].collect().toMap,
        sink.read(spark, "t__sources", TokenizerStats.sourceStateSchema)
          .as[(Option[String], Long, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3, r._4))).toMap)
    }
    val whole = ingest(Seq(docs))
    assert(ingest(docs.grouped(7).toSeq) === whole, "groups of 7 diverged")
    assert(ingest(scala.util.Random.javaRandomToRandom(new java.util.Random(3)).shuffle(docs).grouped(11).toSeq) === whole,
      "shuffled groups of 11 diverged")
  }
}
