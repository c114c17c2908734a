package graft.streaming

import graft.functions.TextFunctions
import graft.operators.{Dedup, TfIdf}
import graft.sinks.KVTableSink
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types._


/** Streaming BM25 search-index maintenance: keeps the retrieval surface
  * (q106/q108's postings, document-frequency table, and corpus stats)
  * LIVE during ingest, so "pull the top docs about X" is answerable
  * mid-crawl without a corpus rescan.
  *
  * Layout, and why it survives 100 TB:
  *
  *  - **postings** land as a parquet artifact partitioned by
  *    `(tb, batch)` — `tb` a stable md5 bucket of the term — via
  *    DYNAMIC partition overwrite, the ANN-index tier's idiom: a
  *    trigger replayed after a crash at ANY point replaces its own
  *    `batch=<id>` files instead of duplicating them (an append would
  *    double rows in the write-vs-ack window). A query then reads ONLY
  *    its terms' buckets — a partition-pruned scan, not an index scan;
  *  - **df** (`term → doc count`) and **stats** (`n_docs, sum_dl`) are
  *    pure additive counts, merged per trigger behind per-table
  *    batch-id acks (the [[TokenizerStats]] discipline): bounded by the
  *    vocabulary and by 1 row respectively, never by the corpus;
  *  - per-trigger cost is ONE `term_counts` pass over the batch plus a
  *    vocabulary-bounded merge — corpus text is never re-read.
  *
  * Contract: each document arrives ONCE (the dedup tiers upstream own
  * that); `df`/`stats` additivity depends on it. [[search]] serves the
  * EXACT [[TfIdf.bm25Rank]] scores over everything ingested so far —
  * same shared micro expression, same integers — restricted (like
  * [[TfIdf.bm25Join]]) to docs containing at least one query term.
  */
object SearchIndex {

  val dfSchema: StructType = new StructType()
    .add("term", StringType, nullable = false)
    .add("df", LongType, nullable = false)

  val statsSchema: StructType = new StructType()
    .add("k", LongType, nullable = false)
    .add("n_docs", LongType, nullable = false)
    .add("sum_dl", LongType, nullable = false)

  /** Stable term→partition bucket (md5-derived, engine-portable). */
  private def termBucketLocal(term: String, buckets: Int): Long =
    TextFunctions.md5Hash60Local(term) % buckets

  private val BucketsSidecar = "_graft_buckets"

  /** The bucket count is part of the ARTIFACT, not the call site: a
    * query recomputing `tb` with a different modulus would prune away
    * the very partitions holding its terms and silently return
    * empty/partial rankings — so the ingest persists the count beside
    * the postings and [[search]] reads it back.
    */
  private def writeBucketsSidecar(
      fs: org.apache.hadoop.fs.FileSystem,
      root: org.apache.hadoop.fs.Path,
      buckets: Int): Unit = {
    val p = new org.apache.hadoop.fs.Path(root, BucketsSidecar)
    if (!fs.exists(p)) {
      // write-to-temp + rename: explicitly-permitted concurrent readers
      // must never observe a half-written sidecar (an empty/truncated
      // value would throw or mis-prune) — rename publishes it whole
      val tmp = new org.apache.hadoop.fs.Path(root, BucketsSidecar + ".tmp")
      val out = fs.create(tmp, true)
      try out.write(buckets.toString.getBytes("UTF-8")) finally out.close()
      if (!fs.rename(tmp, p)) {
        // lost an (idempotent — the value is batch-invariant) race:
        // someone else published it; drop the temp, keep theirs
        fs.delete(tmp, false)
        require(fs.exists(p), s"writeBucketsSidecar: publish of $p failed")
      }
    }
  }

  private def readBucketsSidecar(
      fs: org.apache.hadoop.fs.FileSystem,
      root: org.apache.hadoop.fs.Path): Option[Int] = {
    val p = new org.apache.hadoop.fs.Path(root, BucketsSidecar)
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      try {
        val s = scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim
        Some(s.toInt)
      } finally in.close()
    }
  }

  /** [[graft.operators.ArtifactSwap.recover]] for the postings
    * artifact — run by every entry point so [[compactPostings]]' swap
    * window can strand the artifact but never lose it. Writers
    * (ingest, compaction) also sweep stale leftovers; READERS must
    * not (`sweep = false`): a reader's sweep would delete a live
    * compaction's in-flight tmp (see [[graft.operators.ArtifactSwap]]).
    */
  private[streaming] def recoverCompaction(
      fs: org.apache.hadoop.fs.FileSystem,
      root: org.apache.hadoop.fs.Path,
      sweep: Boolean): Unit =
    graft.operators.ArtifactSwap.recover(fs, root, "SearchIndex", sweep)

  /** The per-micro-batch body (factored out for the replay spec and
    * the `tools` measurement harnesses).
    */
  private[graft] def applyBatch(
      batch: DataFrame,
      batchId: Long,
      idCol: String,
      textCol: String,
      indexPath: String,
      sink: KVTableSink,
      table: String,
      buckets: Int): Unit = {
    val spark = batch.sparkSession
    if (batch.head(1).isEmpty || DedupIngest.alreadyApplied(spark, sink, table, batchId)) return
    Dedup.requireNumericId(batch, idCol, "SearchIndex")
    val root = new org.apache.hadoop.fs.Path(indexPath)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    recoverCompaction(fs, root, sweep = true) // a fresh write into an un-recovered root would strand history
    val posts = TfIdf.postings(batch, idCol, textCol)
      .withColumn("doc_id", col("doc_id").cast("long"))
      .localCheckpoint(true)
    val hasPosts = posts.head(1).nonEmpty
    // a batch with no non-null-text docs at all contributes nothing to
    // any table: ack and move on. But the gate must be CORPUS presence,
    // not postings presence — a non-null text that tokenizes to ZERO
    // tokens produces no postings yet still counts toward
    // n_docs/sum_dl in bm25Rank, so skipping the stats merge for such
    // batches would skew idf/avgdl for every other doc (score-parity
    // contract violation)
    if (!hasPosts && batch.filter(col(textCol).isNotNull).head(1).isEmpty) {
      DedupIngest.markApplied(spark, sink, table, batchId)
      return
    }
    // the ARTIFACT's bucket count wins over the parameter on restarts
    // too: a stream restarted with a different `buckets` would
    // otherwise write deltas under a modulus the sidecar-driven query
    // pruning never probes — those docs would silently vanish from
    // every ranking
    val effBuckets = readBucketsSidecar(fs, root).getOrElse(buckets)
    if (hasPosts) {
      // sidecar BEFORE the first postings write: the reverse order left
      // a window where a crash + restart with a different `buckets`
      // parameter replayed the batch under a new modulus while the
      // old-modulus (tb, batch) partitions persisted (dynamic overwrite
      // only replaces the newly-written partitions) — duplicate
      // postings. The sidecar is idempotent, so writing it first closes
      // the window
      writeBucketsSidecar(fs, root, effBuckets)
      // postings: idempotent by construction (dynamic overwrite of this
      // batch's own partitions) — no ack needed, safe to re-run
      posts
        .withColumn("tb", TextFunctions.md5Hash60(col("term")) % effBuckets)
        .withColumn("batch", lit(batchId))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("tb", "batch").parquet(indexPath)
      if (!DedupIngest.alreadyApplied(spark, sink, s"${table}__df", batchId)) {
        val merged = StateMerge.fullOuterMerge(
          sink.read(spark, s"${table}__df", dfSchema),
          posts.groupBy("term").agg(count(lit(1)).alias("df")),
          keyCols = Seq("term"),
          valueCombiners = Seq("df" -> StateMerge.addLong))
        sink.write(merged, s"${table}__df", SaveMode.Overwrite)
        DedupIngest.markApplied(spark, sink, s"${table}__df", batchId)
      }
    }
    if (!DedupIngest.alreadyApplied(spark, sink, s"${table}__stats", batchId)) {
      val merged = StateMerge.fullOuterMerge(
        sink.read(spark, s"${table}__stats", statsSchema),
        TfIdf.corpusStats(batch, textCol).select(
          lit(0L).alias("k"), col("n_docs"), col("sum_dl")),
        keyCols = Seq("k"),
        valueCombiners = Seq(
          "n_docs" -> StateMerge.addLong,
          "sum_dl" -> StateMerge.addLong))
      sink.write(merged, s"${table}__stats", SaveMode.Overwrite)
      DedupIngest.markApplied(spark, sink, s"${table}__stats", batchId)
    }
    DedupIngest.markApplied(spark, sink, table, batchId)
  }

  /** Start the search-index ingest over a document stream.
    * `compactEvery > 0` folds accumulated `(tb, batch)` delta
    * partitions back into the `batch = -1` base every N batches
    * (maintenance, not correctness — the ANN tier's discipline: run
    * after the ack, so a replayed batch never compacts mid-append).
    */
  def start(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      indexPath: String,
      sink: KVTableSink,
      table: String,
      checkpointDir: String,
      trigger: Trigger,
      buckets: Int = 16,
      compactEvery: Int = 0): StreamingQuery =
    docs.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        applyBatch(batch, batchId, idCol, textCol, indexPath, sink, table, buckets)
        if (compactEvery > 0 && (batchId + 1) % compactEvery == 0)
          compactPostings(batch.sparkSession, indexPath)
      }
      .start()

  /** Hybrid retrieval served ENTIRELY from streamed state: lexical
    * candidates from the live postings index ([[search]]), re-ranked by
    * cosine against an embedding table — in the unified deployment,
    * the semantic tier's own `(id, vec)` state, so both signals come
    * from artifacts the ingest already maintains and the answer covers
    * exactly the retained corpus. Shares
    * [[graft.operators.TfIdf.hybridRerank]] with the batch surface, so
    * per-candidate hybrid scores are bit-identical to
    * [[graft.operators.TfIdf.hybridRank]] over the ingested union.
    *
    * Candidate-rule caveat: [[search]] only ever surfaces docs
    * containing ≥ 1 query term, while the batch `bm25Rank` pads its
    * candidate list with zero-lexical-score docs when the term-matching
    * set is smaller than `candidates` — under a dense-dominant mix
    * (`wText ≈ 0`) the batch surface can then rank a no-term doc that
    * this surface structurally cannot return. Full ranking parity holds
    * exactly when the query terms cover the corpus or the term-matching
    * set fills `candidates` (the spec pins the covering case).
    */
  def hybridSearch(
      spark: SparkSession,
      indexPath: String,
      sink: KVTableSink,
      table: String,
      emb: DataFrame,
      embIdCol: String,
      vecCol: String,
      terms: Seq[String],
      queryVec: Seq[Double],
      k1: Double = 1.2,
      b: Double = 0.75,
      wText: Double = 1.0,
      wVec: Double = 1.0,
      candidates: Int = 100,
      topK: Int = 20): DataFrame = {
    require(queryVec.nonEmpty, "hybridSearch: empty query vector")
    require(topK <= candidates, s"topK=$topK must be <= candidates=$candidates")
    TfIdf.hybridRerank(
      search(spark, indexPath, sink, table, terms, k1, b, topK = candidates)
        .select(col("doc_id"), col("score_micro").alias("bm25_micro")),
      emb, embIdCol, vecCol, queryVec, wText, wVec, topK)
  }

  /** BM25 retrieval JOIN served FROM the maintained index — per-query
    * top-`topK` for a whole query table `(qid, array<term>)`, the
    * streamed twin of [[graft.operators.TfIdf.bm25Join]] exactly as
    * [[search]] is of `bm25Rank`: same shared micro expression, same
    * integers over the ingested union, same candidate rule (docs
    * sharing ≥ 1 term with the query).
    *
    * Scale shape: the postings scan is partition-pruned WITHOUT
    * driver-collecting the (possibly crawl-scale) query vocabulary —
    * the distinct `tb` bucket values of the query terms are bounded by
    * the artifact's bucket count (a ≤`buckets`-int collect), so the
    * scan reads only buckets some query term hashes into; within them
    * the postings semi-join the query vocabulary (no broadcast hint —
    * bm25Join's rule) before the term-keyed scoring join.
    */
  def searchJoin(
      spark: SparkSession,
      indexPath: String,
      sink: KVTableSink,
      table: String,
      queries: DataFrame,
      qidCol: String,
      termsCol: String,
      k1: Double = 1.2,
      b: Double = 0.75,
      topK: Int = 10,
      buckets: Int = 16): DataFrame = {
    val qt = queries
      .select(col(qidCol).alias("qid"), explode(col(termsCol)).alias("term"))
      // a null element inside a terms array matches no posting anyway
      // (the batch twin drops it in its joins) — and unguarded it would
      // NPE the driver-side bucket collect below
      .filter(col("term").isNotNull)
      .distinct()
      .localCheckpoint(true) // feeds the bucket probe, the vocab prune, and the scoring join
    val p = new org.apache.hadoop.fs.Path(indexPath)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    recoverCompaction(fs, p, sweep = false)
    val hasData = fs.exists(p) &&
      fs.globStatus(new org.apache.hadoop.fs.Path(s"$indexPath/tb=*")).nonEmpty
    val effBuckets =
      if (hasData) readBucketsSidecar(fs, p).getOrElse(buckets) else buckets
    val posts =
      if (hasData) {
        // bounded by the artifact's bucket count, never by the queries
        val tbs = qt
          .select((TextFunctions.md5Hash60(col("term")) % effBuckets).alias("tb"))
          .distinct().collect().map(_.getLong(0)).toSeq
        // retirement tombstones anti-probed inline (takedown-sized,
        // broadcast) — same mask as [[search]]'s
        graft.operators.Tombstones.mask(
          spark.read.parquet(indexPath)
            .filter(col("tb").isInCollection(tbs))
            .select("term", "doc_id", "dl", "tf")
            .join(qt.select("term").distinct(), Seq("term"), "left_semi"),
          "doc_id", spark, fs, indexPath)
      } else
        spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
          new StructType()
            .add("term", StringType).add("doc_id", LongType)
            .add("dl", LongType).add("tf", LongType))
    val dfT = sink.read(spark, s"${table}__df", dfSchema)
      .join(qt.select("term").distinct(), Seq("term"), "left_semi")
    val stats = sink.read(spark, s"${table}__stats", statsSchema).drop("k")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("qid").orderBy(col("score_micro").desc, col("doc_id").asc)
    posts
      .join(dfT, Seq("term"))
      .crossJoin(broadcast(stats))
      .join(qt, Seq("term"))
      .select(col("qid"), col("doc_id"), TfIdf.bm25Micro(k1, b).alias("micro"))
      .groupBy("qid", "doc_id")
      .agg(sum(col("micro")).alias("score_micro"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= topK)
      .select(col("qid"), col("doc_id"), col("score_micro"),
        (col("score_micro").cast("double") / lit(1000000.0)).alias("score"))
  }

  /** Query-SET hybrid retrieval served entirely from streamed state —
    * [[searchJoin]]'s lexical candidates re-ranked by each query's own
    * embedding against the (typically sem-tier) embedding table:
    * [[graft.operators.TfIdf.hybridJoin]]'s streamed twin, sharing its
    * rerank tail so per-(qid, doc) hybrid scores are bit-identical to
    * the batch surface over the ingested union. Candidate-rule caveat
    * as [[hybridSearch]]'s: candidates are docs sharing ≥ 1 term with
    * their query ([[TfIdf.bm25Join]]'s rule — the batch hybridJoin
    * shares it, so the two SURFACES agree exactly).
    */
  def hybridJoin(
      spark: SparkSession,
      indexPath: String,
      sink: KVTableSink,
      table: String,
      emb: DataFrame,
      embIdCol: String,
      vecCol: String,
      queries: DataFrame,
      qidCol: String,
      termsCol: String,
      qvecCol: String,
      k1: Double = 1.2,
      b: Double = 0.75,
      wText: Double = 1.0,
      wVec: Double = 1.0,
      candidates: Int = 100,
      topK: Int = 20,
      buckets: Int = 16): DataFrame = {
    require(topK <= candidates, s"topK=$topK must be <= candidates=$candidates")
    TfIdf.hybridJoinRerank(
      searchJoin(spark, indexPath, sink, table, queries, qidCol, termsCol,
        k1, b, topK = candidates, buckets = buckets)
        .select(col("qid"), col("doc_id"), col("score_micro").alias("bm25_micro")),
      emb, embIdCol, vecCol,
      queries.select(col(qidCol).alias("qid"), col(qvecCol).alias("__qvec")),
      wText, wVec, topK)
  }

  /** Compacts the postings artifact's accumulated per-trigger deltas:
    * every `(tb, batch)` partition rewrites into the base `batch = -1`
    * layout with ONE write task per term bucket, so the partition/file
    * count collapses back to ≈ `buckets` instead of growing one
    * partition per bucket per trigger — the long-running-ingest
    * failure mode the ANN tier's compaction closes, closed the same
    * way (write-then-swap: a concurrent reader sees either the old or
    * the new complete artifact; a replayed compaction is a no-op on
    * row content). Also the fold point for [[retire]]'s tombstone
    * sidecar: retired docs' postings are anti-joined out of the
    * rewrite (their df/stats contributions were already reversed at
    * retire time), and the swapped-in replacement carries no sidecar —
    * the query-side anti-probe resets to empty. Consequence: a
    * RETIRED id must not be re-ingested before a compaction has
    * folded its tombstone (the mask would hide the new postings too);
    * the unified refresh path never does — re-represented rows are
    * surviving duplicates, id-disjoint from the retired docs.
    */
  def compactPostings(spark: SparkSession, indexPath: String): Unit = {
    val conf = spark.sparkContext.hadoopConfiguration
    val root = new org.apache.hadoop.fs.Path(indexPath)
    val fs = root.getFileSystem(conf)
    recoverCompaction(fs, root, sweep = true)
    // nothing ingested yet (a quiet stream's cadence can fire before
    // the first non-empty batch), or nothing to fold: a no-op, not an
    // error — compaction is maintenance
    if (!fs.exists(root)) return
    val parts =
      fs.globStatus(new org.apache.hadoop.fs.Path(s"$indexPath/tb=*/batch=*"))
    // no data partitions: nothing to fold (a tombstone-only sidecar
    // masks nothing — harmless to leave until data arrives)
    if (parts.isEmpty) return
    val tombs = graft.operators.Tombstones.exist(spark, fs, indexPath)
    if (!tombs && parts.forall(_.getPath.getName == "batch=-1")) return
    val sidecar = readBucketsSidecar(fs, root)
    val stamp = graft.operators.ArtifactSwap.newStamp()
    val tmp = graft.operators.ArtifactSwap.tmpPath(root, stamp)
    // the fold consumes any retirement tombstones ([[retire]]'s
    // scale path): the swapped-in replacement carries no sidecar, so
    // the query-side anti-probe cost resets to zero here
    graft.operators.Tombstones.mask(
      spark.read.parquet(indexPath)
        .select(col("term"), col("doc_id"), col("dl"), col("tf"), col("tb")),
      "doc_id", spark, fs, indexPath)
      .repartition(col("tb"))
      .withColumn("batch", lit(-1L))
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "static")
      .partitionBy("tb", "batch").parquet(tmp.toString)
    sidecar.foreach(b => writeBucketsSidecar(fs, tmp, b))
    // marker-guarded two-rename publish; a crash at any point strands
    // root for recoverCompaction — stranded, never lost
    graft.operators.ArtifactSwap.swap(fs, root, stamp, "compactPostings")
  }

  /** Document RETIREMENT through the live index — takedowns, opt-outs,
    * recrawl-removals ([[graft.operators.Snapshot.removedKeys]]'s work
    * list, fed here as the full OLD-snapshot rows): drops the retired
    * docs' postings AND reverses their df / corpus-stats contributions,
    * so every surviving doc's BM25 score equals a fresh build from the
    * surviving snapshot — dropping postings alone would leave n_docs /
    * sum_dl / df inflated and skew every idf (the reason
    * [[compactPostings]] scopes removals out).
    *
    * Contract: `removedDocs` are the rows AS INGESTED (id + the same
    * text) and a SUBSET of the ingested corpus — the df/stats reversal
    * recomputes their term counts with the identical scan-side
    * expressions, which is what makes the subtraction exact (and what
    * handles zero-token docs, which live in the stats but have no
    * postings to derive anything from). Retiring a never-ingested or
    * since-edited row under-/over-subtracts: garbage in, garbage out.
    *
    * Replay safety mirrors the ingest: every step — the tombstone
    * append, and the df / stats subtractions (NOT idempotent) — sits
    * behind per-table `retireId` acks in its own meta namespace
    * (`<table>__retire*`); `retireId`s must be monotonically
    * increasing per index, exactly like trigger batch ids. Crash
    * anywhere, re-run with the same `retireId`: each step applies at
    * most once (and a half-replayed tombstone append is harmless
    * regardless — the mask and the compaction fold are anti-joins, so
    * duplicate ids change nothing). Single-writer: run on the
    * maintenance thread that owns the artifact, never concurrently
    * with a live ingest trigger.
    *
    * Scale shape — tombstones, not rewrites: the postings artifact is
    * NOT touched beyond appending the retired ids to its
    * `_graft_tombstones` sidecar; [[search]]/[[searchJoin]]
    * anti-probe the (takedown-sized, broadcast) list, and
    * [[compactPostings]] folds it into the full rewrite it performs
    * anyway on the maintenance cadence. Retire cost is therefore one
    * `term_counts` pass over the RETIRED rows into vocabulary-bounded
    * negative merges plus an id-list write — independent of the
    * artifact size (pre-round-16, each takedown batch paid a full
    * postings rewrite). Pass `compactNow = true` to chain the eager
    * fold and physically purge the rows immediately (the old
    * behavior, for erasure-deadline callers).
    */
  def retire(
      removedDocs: DataFrame,
      idCol: String,
      textCol: String,
      indexPath: String,
      sink: KVTableSink,
      table: String,
      retireId: Long,
      compactNow: Boolean = false): Unit = {
    val spark = removedDocs.sparkSession
    if (DedupIngest.alreadyApplied(spark, sink, s"${table}__retire", retireId)) return
    Dedup.requireNumericId(removedDocs, idCol, "SearchIndex.retire")
    val root = new org.apache.hadoop.fs.Path(indexPath)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    recoverCompaction(fs, root, sweep = true)
    val removed = removedDocs
      .select(col(idCol).cast("long").alias("doc_id"), col(textCol).alias("__text"))
      // the df/stats subtractions below are NOT idempotent per row: a
      // caller whose work list carries the same doc twice would
      // double-decrement df and double-subtract n_docs/sum_dl —
      // silently. One row per id, like the delete paths already
      // guarantee for their id lists
      .dropDuplicates("doc_id")
      .localCheckpoint(true)
    // an empty retirement list has nothing to reverse — ack and return
    // rather than pointlessly touching the postings artifact
    if (removed.head(1).isEmpty) {
      DedupIngest.markApplied(spark, sink, s"${table}__retire", retireId)
      return
    }
    // 1. postings TOMBSTONES (the scale path): append the retired ids
    //    to the artifact's sidecar instead of rewriting the whole
    //    postings artifact — [[search]]/[[searchJoin]] anti-probe the
    //    (takedown-sized, broadcast) list and [[compactPostings]]
    //    folds it into the rewrite it already does, so retire latency
    //    tracks the takedown size, not the corpus. Acked to bound
    //    sidecar growth across replays; a half-replayed append is
    //    harmless anyway (the mask and the fold are anti-joins —
    //    duplicate ids change nothing).
    val hasData = fs.exists(root) &&
      fs.globStatus(new org.apache.hadoop.fs.Path(s"$indexPath/tb=*")).nonEmpty
    if (hasData &&
      !DedupIngest.alreadyApplied(spark, sink, s"${table}__retire_tomb", retireId)) {
      graft.operators.Tombstones.append(removed, "doc_id", indexPath)
      DedupIngest.markApplied(spark, sink, s"${table}__retire_tomb", retireId)
    }
    // 2. df reversal (acked): per-term counts of the retired docs,
    //    subtracted; terms whose df reaches 0 leave the table entirely
    if (!DedupIngest.alreadyApplied(spark, sink, s"${table}__retire_df", retireId)) {
      val negDf = TfIdf.postings(removed, "doc_id", "__text")
        .groupBy("term").agg((-count(lit(1))).alias("df"))
      val merged = StateMerge.fullOuterMerge(
        sink.read(spark, s"${table}__df", dfSchema),
        negDf,
        keyCols = Seq("term"),
        valueCombiners = Seq("df" -> StateMerge.addLong))
        .filter(col("df") > 0)
      sink.write(merged, s"${table}__df", SaveMode.Overwrite)
      DedupIngest.markApplied(spark, sink, s"${table}__retire_df", retireId)
    }
    // 3. corpus-stats reversal (acked): the exact negation of what
    //    applyBatch added for these rows
    if (!DedupIngest.alreadyApplied(spark, sink, s"${table}__retire_stats", retireId)) {
      val merged = StateMerge.fullOuterMerge(
        sink.read(spark, s"${table}__stats", statsSchema),
        TfIdf.corpusStats(removed, "__text").select(
          lit(0L).alias("k"), (-col("n_docs")).alias("n_docs"),
          (-col("sum_dl")).alias("sum_dl")),
        keyCols = Seq("k"),
        valueCombiners = Seq(
          "n_docs" -> StateMerge.addLong,
          "sum_dl" -> StateMerge.addLong))
      sink.write(merged, s"${table}__stats", SaveMode.Overwrite)
      DedupIngest.markApplied(spark, sink, s"${table}__retire_stats", retireId)
    }
    DedupIngest.markApplied(spark, sink, s"${table}__retire", retireId)
    // optional eager fold — the pre-tombstone full-rewrite behavior,
    // for callers that want the takedown physically purged NOW (legal
    // erasure deadlines) rather than at the next maintenance cadence
    if (compactNow) compactPostings(spark, indexPath)
  }

  /** BM25 top-`topK` for a fixed query, served FROM the maintained
    * index: a partition-pruned postings read (only the query terms'
    * `tb` buckets), the bounded df/stats tables, and the shared
    * [[TfIdf.bm25Micro]] expression — score-identical to
    * [[TfIdf.bm25Rank]] over the ingested union, restricted to docs
    * containing at least one query term.
    */
  def search(
      spark: SparkSession,
      indexPath: String,
      sink: KVTableSink,
      table: String,
      terms: Seq[String],
      k1: Double = 1.2,
      b: Double = 0.75,
      topK: Int = 20,
      buckets: Int = 16): DataFrame = {
    require(terms.nonEmpty, "SearchIndex.search: empty query-term list")
    // existence probe through Hadoop's FileSystem (works on any
    // supported filesystem, unlike java.io.File — the r13 ANN-bootstrap
    // lesson); a MISSING index is a real state (nothing ingested yet,
    // empty result), but any other read failure must propagate, not
    // silently serve an empty ranking
    val p = new org.apache.hadoop.fs.Path(indexPath)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    recoverCompaction(fs, p, sweep = false)
    // data presence, not just dir presence: a recovered-but-empty dir
    // (or one holding only the sidecar) has no schema to infer
    val hasData = fs.exists(p) &&
      fs.globStatus(new org.apache.hadoop.fs.Path(s"$indexPath/tb=*")).nonEmpty
    // the artifact's OWN bucket count wins over the parameter: a
    // mismatched caller would otherwise prune away the partitions that
    // hold its terms and silently get an empty ranking
    val effBuckets =
      if (hasData) readBucketsSidecar(fs, p).getOrElse(buckets) else buckets
    val tbs = terms.map(termBucketLocal(_, effBuckets)).distinct
    val posts =
      if (hasData)
        // retirement tombstones anti-probed inline (takedown-sized,
        // broadcast): retired docs stay physically present until the
        // next compaction folds them out, but never surface
        graft.operators.Tombstones.mask(
          spark.read.parquet(indexPath)
            .filter(col("tb").isInCollection(tbs) && col("term").isInCollection(terms))
            .select("term", "doc_id", "dl", "tf"),
          "doc_id", spark, fs, indexPath)
      else
        spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
          new StructType()
            .add("term", StringType).add("doc_id", LongType)
            .add("dl", LongType).add("tf", LongType))
    val dfT = sink.read(spark, s"${table}__df", dfSchema)
      .filter(col("term").isInCollection(terms))
    val stats = sink.read(spark, s"${table}__stats", statsSchema).drop("k")
    posts
      .join(dfT, Seq("term"))
      .crossJoin(broadcast(stats))
      .select(col("doc_id"), TfIdf.bm25Micro(k1, b).alias("micro"))
      .groupBy("doc_id")
      .agg(sum(col("micro")).alias("score_micro"))
      .withColumn("score", col("score_micro").cast("double") / lit(1000000.0))
      .orderBy(col("score_micro").desc, col("doc_id").asc)
      .limit(topK)
  }
}
