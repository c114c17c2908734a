package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Edit-distance (Levenshtein) similarity self-join — the fuzzy-match
  * primitive a curation pipeline needs for near-identical titles,
  * normalized URLs, and OCR'd or typo'd keys that hash-exact dedup
  * misses and token-set Jaccard over-matches (Jaccard is order-blind;
  * edit distance is not).
  *
  * Candidate generation is segment blocking (the PassJoin family,
  * Li/Deng/Feng, ICDE'11 — public literature): partition every key
  * into `maxDist + 1` contiguous segments; by pigeonhole, any string
  * within edit distance `maxDist` of it must contain at least one of
  * those segments VERBATIM, shifted by at most `maxDist` positions.
  * So the join is
  *
  *   1. index side — each key emits its `d+1` segments, keyed by
  *      `(len(key), segIdx, segText)`;
  *   2. probe side — each key emits, for every target length `l`
  *      within `±d` of its own and every segment index, the
  *      substrings at the segment's position `±d` (a CONSTANT
  *      `O(d³)` fan-out per row, independent of corpus size);
  *   3. equi-join on the triple, `left < right` to keep each pair
  *      once, map-side verify with the banded `levenshtein(a, b, d)`
  *      (threshold form: the DP early-exits above `d`), THEN the
  *      pair-level distinct — verification runs before the dedup
  *      shuffle so only true matches pay it.
  *
  * Scale shape: both explodes are map-side projections fused into the
  * scan; the only shuffles are the candidate equi-join on short
  * `(int, int, segment)` keys — never the document payload — and the
  * final distinct on matched id pairs (output-sized). Candidate
  * volume is `O(d³ · corpus)` probe rows against `O(d · corpus)`
  * index rows; within a block key the fan-out is quadratic in that
  * key's frequency, so a boilerplate-heavy key column (every title
  * starting with the same 4-gram) concentrates — `maxBlockFreq` is
  * the ENFORCED guard (drop blocks hotter than the cap, see
  * [[selfJoin]]'s mode split); normalizing/stripping boilerplate
  * before keying, or lowering `maxDist` to raise the segment count,
  * remain the semantic remedies when every pair must be found. The
  * index keys include the segment INDEX and target LENGTH, which
  * spreads hot text across `(2d+1)·(d+1)` distinct block keys for
  * free.
  *
  * Not in the reference (its NLP stage has no fuzzy matching);
  * registry q122 runs it over a 16-char document prefix with the
  * DuckDB `levenshtein` cross-join as the exact oracle.
  */
object EditDistanceJoin {

  // Segment layout for a string of length l cut into nSeg pieces:
  // the first (nSeg - l % nSeg) segments have floor(l/nSeg) chars,
  // the rest one more. 0-based start of segment i:
  //   i * base + max(0, i - (nSeg - rem))
  private def segLen(nSeg: Int)(l: Column, i: Column): Column =
    (l / nSeg).cast("int") +
      when(i >= lit(nSeg) - pmod(l, lit(nSeg)), lit(1)).otherwise(lit(0))
  private def segStart(nSeg: Int)(l: Column, i: Column): Column =
    i * (l / nSeg).cast("int") +
      greatest(lit(0), i - (lit(nSeg) - pmod(l, lit(nSeg))))

  // r21 (guide §8 / §2.6): the O(d³) probe fan-out and the O(d) segment
  // index are CPU-heavy map-side expansions over tiny (id, key) rows;
  // when the upstream scan yields few partitions (one parquet file, a
  // filtered slice, a single-file crawl shard) the whole expansion —
  // and the candidate join built on it — runs on that handful of tasks
  // (measured: q122 at sf0.1 spent 2.4 s in two single-task stages).
  // Hash-repartitioning the pre-expansion rows costs one exchange of
  // ~25-byte rows and spreads the expansion across the session's
  // shuffle parallelism — scale-adaptive via the conf knob, and a
  // no-op-sized shuffle at any corpus size relative to the d³ blow-up
  // it parallelizes. The partition count is pinned EXPLICITLY: AQE's
  // coalescing is bytes-based and blind to downstream CPU fan-out, so
  // an unpinned repartition of these tiny rows collapses straight back
  // to one task (measured — q122's verify stage ran 1.3 s single-task
  // under `repartition(col)` alone).
  private def keyed(df: DataFrame, idCol: String, keyCol: String): DataFrame =
    df.select(col(idCol).alias("__id"), col(keyCol).alias("__key"))
      .na.drop(Seq("__key"))
      .withColumn("__len", length(col("__key")))
      .repartition(
        df.sparkSession.conf.get("spark.sql.shuffle.partitions", "200").toInt,
        col("__id"))

  /** Index side: the d+1 segments of every key, keyed by
    * `(len, segIdx, segText)` — a constant-fanout map-side projection.
    */
  private def segIndex(base: DataFrame, d: Int): DataFrame =
    base
      .select(col("__id").alias("s_id"), col("__key").alias("s_key"),
        col("__len").alias("__tl"),
        explode(sequence(lit(0), lit(d))).alias("__i"))
      .select(col("s_id"), col("s_key"), col("__tl"), col("__i"),
        col("s_key")
          .substr(segStart(d + 1)(col("__tl"), col("__i")) + lit(1),
            segLen(d + 1)(col("__tl"), col("__i")))
          .alias("__seg"))

  /** Probe side: for every target length l in [len-d, len+d] and every
    * segment index, the substrings at the target segment's position
    * shifted by at most d — an `O(d^3)` constant fan-out per row.
    */
  private def probes(base: DataFrame, d: Int): DataFrame =
    base
      .select(col("__id").alias("r_id"), col("__key").alias("r_key"),
        col("__len").alias("__m"),
        explode(sequence(col("__len") - lit(d), col("__len") + lit(d)))
          .alias("__tl"))
      .filter(col("__tl") >= 0)
      .select(col("r_id"), col("r_key"), col("__m"), col("__tl"),
        explode(sequence(lit(0), lit(d))).alias("__i"))
      .withColumn("__sl", segLen(d + 1)(col("__tl"), col("__i")))
      .withColumn("__p",
        explode(sequence(
          greatest(lit(0), segStart(d + 1)(col("__tl"), col("__i")) - lit(d)),
          least(col("__m") - col("__sl"),
            segStart(d + 1)(col("__tl"), col("__i")) + lit(d)))))
      .select(col("r_id"), col("r_key"), col("__tl"), col("__i"),
        col("r_key").substr(col("__p") + lit(1), col("__sl")).alias("__seg"))

  /** All unordered pairs `(left_id, right_id, dist)` with
    * `levenshtein(key_left, key_right) <= maxDist`, `left_id <
    * right_id`. Null keys are dropped (null matches nothing, like
    * SQL equality); empty strings participate (distance = other
    * string's length).
    *
    * Two calibration modes (the q114/q119 exact-vs-production split):
    *
    *  - `maxBlockFreq = None` — the EXACT control: complete by the
    *    pigeonhole argument, but per-block candidate volume is
    *    quadratic in a block key's frequency, so a boilerplate-hot
    *    key column (every title opening with the same prefix — the
    *    common case in web/product corpora) concentrates candidate
    *    generation into one executor-killing block. Use only when the
    *    key column is known non-degenerate (or pre-normalized).
    *  - `maxBlockFreq = Some(f)` — the PRODUCTION guard, the
    *    [[Dedup.ngramJaccard]] `maxShingleFreq` /
    *    [[RangeJoin]] `maxBinsPerInterval` doctrine: block keys whose
    *    index-side frequency exceeds `f` are dropped from BOTH sides
    *    before the join, bounding per-block candidate volume at
    *    `O(f · probes-per-block)`. Completeness caveat: a true pair
    *    ALL of whose `maxDist + 1` connecting segments are
    *    boilerplate-hot is missed — exactly the pair a curation user
    *    wants suppressed (matching on shared boilerplate, not shared
    *    content). The guarded plan also never carries the key strings
    *    through the block exchange: candidates travel as bare id
    *    pairs (deduped while still small), and the keys are joined
    *    back BY ID — each key crosses a wire once, not once per
    *    candidate, so an arbitrarily wide key column cannot amplify
    *    shuffle payload.
    */
  def selfJoin(
      df: DataFrame,
      idCol: String,
      keyCol: String,
      maxDist: Int,
      maxBlockFreq: Option[Int] = None): DataFrame = {
    require(maxDist >= 0, s"maxDist must be >= 0, got $maxDist")
    maxBlockFreq.foreach(f =>
      require(f >= 1, s"maxBlockFreq must be >= 1, got $f"))
    val base = keyed(df, idCol, keyCol)
    maxBlockFreq match {
      case None =>
        // exact control: block join on (target length, segment index,
        // segment text); verify map-side with the banded DP, then
        // distinct the pairs.
        segIndex(base, maxDist)
          .join(probes(base, maxDist), Seq("__tl", "__i", "__seg"))
          .filter(col("s_id") < col("r_id"))
          .withColumn("dist", levenshtein(col("s_key"), col("r_key"), maxDist))
          .filter(col("dist") >= 0)
          .select(col("s_id").alias("left_id"), col("r_id").alias("right_id"),
            col("dist"))
          .dropDuplicates("left_id", "right_id")
      case Some(cap) =>
        // guarded mode: ids-only block join under the hot-block cap,
        // pair-level dedup on the (16-byte) id pairs, THEN the keys
        // rejoin by id for the banded verify.
        val idx = segIndex(base, maxDist)
          .select(col("s_id"), col("__tl"), col("__i"), col("__seg"))
        // hot list = block keys over the cap — by construction at most
        // |segments| / cap entries, so broadcastable whenever the cap
        // is a meaningful guard. Materialized ONCE (localCheckpoint):
        // it feeds both sides' anti-joins, and without the checkpoint
        // each broadcast would re-run the full segment aggregate —
        // an extra corpus scan at scale.
        val hot = idx
          .groupBy("__tl", "__i", "__seg")
          .agg(count(lit(1)).alias("__f"))
          .filter(col("__f") > cap)
          .select("__tl", "__i", "__seg")
          .localCheckpoint(true)
        val candidates = idx
          .join(broadcast(hot), Seq("__tl", "__i", "__seg"), "left_anti")
          .join(
            probes(base, maxDist)
              .select(col("r_id"), col("__tl"), col("__i"), col("__seg"))
              .join(broadcast(hot), Seq("__tl", "__i", "__seg"), "left_anti"),
            Seq("__tl", "__i", "__seg"))
          .filter(col("s_id") < col("r_id"))
          .select("s_id", "r_id")
          .dropDuplicates("s_id", "r_id")
        candidates
          .join(base.select(col("__id").alias("s_id"),
            col("__key").alias("s_key")), Seq("s_id"))
          .join(base.select(col("__id").alias("r_id"),
            col("__key").alias("r_key")), Seq("r_id"))
          .withColumn("dist", levenshtein(col("s_key"), col("r_key"), maxDist))
          .filter(col("dist") >= 0)
          .select(col("s_id").alias("left_id"), col("r_id").alias("right_id"),
            col("dist"))
    }
  }

  /** Incremental form — the per-trigger production shape: every
    * `(corpus_id, batch_id, dist)` pair with `levenshtein <= maxDist`
    * between a BOUNDED new batch and the full corpus, identity pairs
    * (same id) excluded.
    *
    * Scale shape mirrors round-16's state probes: the corpus side is
    * the segment index — a map-side projection over the corpus scan
    * that NEVER shuffles — and the batch side is the `O(d^3 ·
    * |batch|)` probe-substring frame, broadcast by construction
    * (bounded batch ⇒ bounded probes). The block join is therefore a
    * map-side BroadcastHashJoin over the corpus; the only shuffle in
    * the whole plan is the output-sized matched-pair distinct.
    * Completeness is the same pigeonhole as [[selfJoin]], applied
    * with the corpus as index: a corpus key within distance d of a
    * batch key has an untouched segment appearing verbatim (shifted
    * <= d) in the batch key, which the probe frame enumerates.
    */
  def incrementalJoin(
      corpus: DataFrame,
      batch: DataFrame,
      idCol: String,
      keyCol: String,
      maxDist: Int): DataFrame = {
    require(maxDist >= 0, s"maxDist must be >= 0, got $maxDist")
    segIndex(keyed(corpus, idCol, keyCol), maxDist)
      .join(broadcast(probes(keyed(batch, idCol, keyCol), maxDist)),
        Seq("__tl", "__i", "__seg"))
      .filter(col("s_id") =!= col("r_id"))
      .withColumn("dist", levenshtein(col("s_key"), col("r_key"), maxDist))
      .filter(col("dist") >= 0)
      .select(col("s_id").alias("corpus_id"), col("r_id").alias("batch_id"),
        col("dist"))
      .dropDuplicates("corpus_id", "batch_id")
  }

  /** Incremental fuzzy DEDUP decision — [[incrementalJoin]] composed
    * into the keep-rule contract the streaming tiers share
    * (`Dedup.incrementalNearDup`'s output shape): batch docs with a
    * corpus match within `maxDist` are dropped (`corpus_dup = 1`),
    * the survivors' intra-batch match graph keeps the min id per
    * connected component (`kept = 1` iff the doc heads its group).
    *
    * Scale shape: the corpus meets the plan ONLY as the map-side
    * segment index under the broadcast batch probes
    * ([[incrementalJoin]]); everything after the corpus check —
    * survivor anti-join, intra-batch [[selfJoin]], components — is
    * batch-bounded. Same documented first-wins caveat as the LSH
    * tier: tight clusters with increasing ids reproduce the
    * one-batch pipeline; fuzzy chains straddling batch boundaries
    * can differ (edit distance is not transitive).
    */
  def incrementalKeep(
      batch: DataFrame,
      corpusKeys: DataFrame,
      idCol: String,
      keyCol: String,
      maxDist: Int): DataFrame = {
    Dedup.requireNumericId(batch, idCol, "incrementalKeep (batch)")
    val batchKeys = batch
      .select(col(idCol).cast("long").alias("id"), col(keyCol).cast("string").alias("k"))
      .localCheckpoint(true)
    val corpusNorm = corpusKeys
      .select(col(idCol).alias("id"), col(keyCol).cast("string").alias("k"))
    val hits = incrementalJoin(corpusNorm, batchKeys, "id", "k", maxDist)
      .select(col("batch_id").alias("id"))
      .distinct()
      .localCheckpoint(true)
    val survivorIds = batchKeys.select("id")
      .join(broadcast(hits), Seq("id"), "left_anti")
    val survivors = batchKeys.join(survivorIds, Seq("id"), "left_semi")
    val pairs = selfJoin(survivors, "id", "k", maxDist)
    val groups = Components
      .connectedComponents(pairs, "left_id", "right_id", survivorIds, "id")
      .withColumnRenamed("cluster_id", "dup_group")
    survivorIds
      .join(groups, Seq("id"))
      .select(
        col("id"),
        lit(0L).alias("corpus_dup"),
        col("dup_group"),
        (col("id") === col("dup_group")).cast("long").alias("kept"))
      .unionByName(hits.select(
        col("id"),
        lit(1L).alias("corpus_dup"),
        lit(-1L).alias("dup_group"),
        lit(0L).alias("kept")))
  }
}
