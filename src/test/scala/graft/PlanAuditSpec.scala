package graft

import org.apache.spark.sql.DataFrame

/** Physical-plan audits over the actual registry queries (sf0.001
  * fixtures): the properties that keep these plans viable at 1000× the
  * data — scan-level filter pushdown, column pruning, broadcast joins
  * for dimension tables, and bounded shuffle counts in the dedup
  * pipelines — asserted on `explain` output, not assumed.
  */
class PlanAuditSpec extends SparkTestBase {

  private val dir = "/root/testdata/sf0.001"

  private def planOf(name: String): String = {
    val df = SparkEntry.queries(name)(spark, dir)
    df.collect() // force AQE to finalize the adaptive plan
    // AdaptiveSparkPlan.toString prints the final plan followed by the
    // initial plan — audit only the final section
    df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
  }

  private def shuffles(plan: String): Int =
    "Exchange (hash|range)partitioning".r.findAllIn(plan).length

  /** Structural collector that descends through the AQE wrappers
    * (`AdaptiveSparkPlanExec`, materialized `QueryStageExec`s, reused
    * exchanges) that `SparkPlan.collect` treats as leaves — required to
    * see scans living inside broadcast stages of an adaptive plan.
    */
  private def collectAll[T](p: org.apache.spark.sql.execution.SparkPlan)(
      pf: PartialFunction[org.apache.spark.sql.execution.SparkPlan, T]): Seq[T] = {
    val kids = p match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        Seq(a.executedPlan)
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => Seq(q.plan)
      case r: org.apache.spark.sql.execution.exchange.ReusedExchangeExec => Seq(r.child)
      case _ => p.children
    }
    (if (pf.isDefinedAt(p)) Seq(pf(p)) else Nil) ++ kids.flatMap(collectAll(_)(pf))
  }

  test("q06: predicate pushdown and column pruning reach the parquet scan") {
    val df = SparkEntry.queries("q06_filter_pushdown")(spark, dir)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    assert(plan.contains("PushedFilters: ["), plan)
    // shipdate and quantity predicates pushed to the reader
    assert("PushedFilters: \\[[^\\]]*l_shipdate".r.findFirstIn(plan).isDefined, plan)
    assert("PushedFilters: \\[[^\\]]*l_quantity".r.findFirstIn(plan).isDefined, plan)
    // the scan reads only the referenced columns, not the whole table
    val scanOutputs = df.queryExecution.executedPlan.collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s.output.map(_.name)
    }.flatten
    assert(scanOutputs.nonEmpty && scanOutputs.length <= 5, s"scan too wide: $scanOutputs")
    assert(!scanOutputs.contains("l_comment"), s"unpruned column: $scanOutputs")
    assert(shuffles(plan) == 0, s"pure filter+project must not shuffle:\n$plan")
  }

  test("q03: dimension joins execute as broadcast hash joins") {
    val plan = planOf("q03_star_join")
    assert("BroadcastHashJoin".r.findAllIn(plan).length >= 3, plan)
    assert(!plan.contains("SortMergeJoin"), plan)
  }

  test("q18: prefix-filtered Jaccard never shuffles shingle strings") {
    val plan = planOf("q18_ngram_jaccard")
    // every hash/range exchange in the plan carries long ids/hashes, so
    // no partitioning expression references the raw text column
    "Exchange (hash|range)partitioning\\(([^)]*)\\)".r
      .findAllMatchIn(plan)
      .foreach(m => assert(!m.group(2).contains("text"), m.group(0)))
    assert(!plan.contains("Distinct"), "set-dedup must happen in-row, not as a Distinct operator")
  }

  test("q84: incremental near-dup shuffles band keys and hash sets, never text") {
    val plan = planOf("q84_incremental_neardup")
    // band keys are md5 strings of signature slices and verify joins move
    // long ids + sorted hash-long arrays — the raw text column must not
    // appear in any partitioning expression
    "Exchange (hash|range)partitioning\\(([^)]*)\\)".r
      .findAllMatchIn(plan)
      .foreach(m => assert(!m.group(2).contains("text"), m.group(0)))
  }

  test("q20: LSH verify joins broadcast the candidate side (no index join)") {
    val plan = planOf("q20_minhash_lsh")
    // candidate verification joins are broadcast joins against the
    // shingle-set arrays; the exact-verify stage adds no extra aggregate
    assert("BroadcastHashJoin".r.findAllIn(plan).length >= 2, plan)
  }

  test("q01: aggregation is partial+final (map-side combine before the shuffle)") {
    val plan = planOf("q01_tpch_q1")
    assert("partial_sum".r.findFirstIn(plan).isDefined, plan)
    assert(shuffles(plan) == 1, s"single-key aggregate needs exactly one shuffle:\n$plan")
  }

  test("q50: the benchmark n-gram universe broadcasts (map-side contamination join)") {
    val plan = planOf("q50_decontaminate")
    // the corpus-side scan must meet the benchmark hashes in a broadcast
    // hash join — a shuffled join would move the whole corpus by hash
    assert(plan.contains("BroadcastHashJoin"), plan)
    // corpus rows shuffle only for the final per-doc count aggregate
    assert(shuffles(plan) <= 2, s"corpus must not shuffle before the contamination join:\n$plan")
  }

  test("q51: deterministic sampling is a pure scan-side filter (zero shuffles)") {
    val plan = planOf("q51_stratified_sample")
    assert(shuffles(plan) == 0, s"hash-keyed sampling must not shuffle:\n$plan")
  }

  test("q52: term frequency pre-aggregates scan-side (no token-level shuffle)") {
    val plan = planOf("q52_tfidf")
    // no aggregate keyed by (doc_id, term) exists: tf comes out of the
    // map UDF already combined, so the only aggregates are the df count
    // and no shuffle carries one row per token occurrence
    assert(!plan.contains("partial_count(1)") || shuffles(plan) <= 3, plan)
    "Exchange hashpartitioning\\(([^)]*)\\)".r
      .findAllMatchIn(plan)
      .foreach { m =>
        assert(!(m.group(1).contains("doc_id") && m.group(1).contains("term")),
          s"token-level (doc, term) shuffle survived:\n${m.group(0)}")
      }
  }

  test("q23: embedding near-dup is source-driven — no driver-side collect of the table") {
    val df = SparkEntry.queries("q23_embedding_neardup")(spark, dir)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    // the plan must read the embeddings parquet itself (a driver-collect
    // kernel would show a Range/LocalTableScan source with the data
    // smuggled in via broadcast instead of a file scan)
    assert(plan.contains("Scan parquet"), plan)
    assert(!plan.contains("Scan ExistingRDD"), plan)
    val ranges = df.queryExecution.executedPlan.collect {
      case r: org.apache.spark.sql.execution.RangeExec => r
    }
    assert(ranges.isEmpty, "driver-collect kernel shape (Range over broadcast) in q23 plan")
    // pair scoring happens inside the grouped tight loop, not as a join
    assert(plan.contains("MapGroups"), plan)
  }

  test("q74: line-dedup frequency counting partitions by fingerprint or doc id, never raw text") {
    val plan = planOf("q74_line_dedup")
    "Exchange (hash|range)partitioning\\(([^)]*)\\)".r
      .findAllMatchIn(plan)
      .foreach { m =>
        val keys = m.group(2)
        assert(!keys.contains("text") && !keys.contains("line#"),
          s"segment text used as a shuffle key:\n${m.group(0)}")
      }
  }

  test("q56: SRP sketch join partitions by (band, bucket) longs, never by vectors") {
    val plan = planOf("q56_srp_neardup")
    "Exchange (hash|range)partitioning\\(([^)]*)\\)".r
      .findAllMatchIn(plan)
      .foreach(m => assert(!m.group(2).contains("embedding"), m.group(0)))
  }

  test("q57: spine and counts meet on aligned (user, bucket) keys") {
    val plan = planOf("q57_gapfill")
    // the gap-fill join must not broadcast the spine as a nested loop —
    // equi-join on (user_id, b) keeps both sides co-partitionable
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
  }

  test("q63/q64: regex token counting and PII scrubbing are shuffle-free codegen scans") {
    for (q <- Seq("q63_token_count", "q64_pii_scrub")) {
      val plan = planOf(q)
      assert(shuffles(plan) == 0, s"$q is per-row — must not shuffle:\n$plan")
      assert(!plan.contains("BatchEvalPython") && !plan.contains("SQLAppliedFunction"), plan)
      // regexp_extract_all/regexp_replace are native expressions inside a
      // WholeStageCodegen span, not UDF black boxes
      assert("\\*\\(\\d+\\)".r.findFirstIn(plan).isDefined, s"$q lost codegen:\n$plan")
    }
  }

  test("q121: markup extraction is one shuffle-free fused codegen scan") {
    val plan = planOf("q121_html_extract")
    assert(shuffles(plan) == 0, s"q121 is per-row — must not shuffle:\n$plan")
    // the wrap, the strip, the length, and the round-trip compare all
    // live in one WholeStageCodegen projection over the parquet scan
    assert("\\*\\(\\d+\\) Project \\[".r.findFirstIn(plan).isDefined, s"q121 lost codegen:\n$plan")
    assert(plan.contains("html_to_text"), plan)
    assert(!plan.toLowerCase.contains("scalaudf"), plan)
  }

  test("q122: edit-distance join blocks on segments — no cartesian, no text payload in a shuffle") {
    val plan = planOf("q122_edit_join")
    // candidate gen must stay an equi-join on the (len, segIdx, segment)
    // triple — a CartesianProduct/BNLJ means the blocking collapsed to
    // the quadratic control
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"q122 candidate generation went quadratic:\n$plan")
    // both explodes (index segments, probe substrings) are map-side
    // projections under the join; the raw text column is cut to the
    // 16-char key in the Project directly over the scan, so no
    // exchange ever carries it (the hash exchange here moves only the
    // matched id pairs)
    assert("Generate explode".r.findAllIn(plan).length >= 2, s"q122 lost its explodes:\n$plan")
    val exchanged = plan.linesIterator.filter(_.contains("hashpartitioning")).mkString("\n")
    assert(!exchanged.contains("text#") && !exchanged.contains("__key"),
      s"q122 shuffled a text payload:\n$plan")
    // join (2 exchanges) + pair-level distinct (1) is the whole shuffle
    // budget; the levenshtein verify runs map-side between them
    assert(shuffles(plan) <= 3, s"q122 shuffle budget exceeded:\n$plan")
  }

  test("q142: url natives are a pure fused-scan projection — codegen, no UDF, zero shuffles") {
    val plan = planOf("q142_url_normalize")
    assert(shuffles(plan) == 0, s"q142 is scan-shaped — nothing to exchange:\n$plan")
    assert("\\*\\(\\d+\\) Project \\[".r.findFirstIn(plan).isDefined, s"q142 lost codegen:\n$plan")
    assert(plan.contains("url_normalize") && plan.contains("url_host") &&
      plan.contains("registrable_domain"), plan)
    assert(!plan.toLowerCase.contains("scalaudf"), plan)
  }

  test("q143: unigram apply is one scan projection — native kernel, no UDF, zero shuffles") {
    val plan = planOf("q143_unigram_tokenize")
    assert(shuffles(plan) == 0, s"q143 apply is scan-shaped — nothing to exchange:\n$plan")
    assert(plan.contains("unigram_tokenize"), plan)
    assert(!plan.toLowerCase.contains("scalaudf"), plan)
    // the trainer's bounded collects happen before this plan exists;
    // the apply itself reads only doc_id + text
    val scans = plan.linesIterator.filter(_.contains("ReadSchema")).mkString
    assert(scans.contains("doc_id") && scans.contains("text"), plan)
  }

  test("q144: perceptual near-dup — band equi-join, content bytes never leave the scan") {
    val plan = planOf("q144_phash_neardup")
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"q144 candidate generation went quadratic:\n$plan")
    assert(plan.contains("dhash64"), plan)
    // only (id, hash, band, value) rows move — the payload stays in its scan
    val exchanged = plan.linesIterator.filter(_.contains("partitioning")).mkString("\n")
    assert(!exchanged.contains("content"), s"q144 shuffled the media payload:\n$plan")
    // band join (<=2) + pair distinct (1)
    assert(shuffles(plan) <= 3, s"q144 shuffle budget exceeded:\n$plan")
  }

  test("q145: classifier scoring is a shuffle-free scan of the checkpointed feature table") {
    val plan = planOf("q145_quality_classifier")
    // training's 40 gradient jobs ran during construction (each one
    // scan + a <=273-row exchange); the RETURNED plan is the apply
    // path: the localCheckpoint'ed (id, y, feats) table scanned once
    // with the presence-dot margin — nothing corpus-sized shuffles,
    // and the corpus text is not re-derived (no parquet scan at all)
    assert(shuffles(plan) == 0, s"q145 apply is scan-shaped — nothing to exchange:\n$plan")
    assert(plan.contains("presence_dot"), plan)
    assert(!plan.toLowerCase.contains("scalaudf"), plan)
    assert(plan.contains("ExistingRDD") || plan.contains("Scan ExistingRDD"),
      s"q145 must score the checkpointed feature table, not re-read text:\n$plan")
    assert(!plan.contains("FileScan"), s"q145 re-scanned the corpus:\n$plan")
  }

  test("q146: canonical-url dedup — one key aggregate, winners broadcast back, no text moves") {
    val plan = planOf("q146_url_dedup")
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"q146 must not go quadratic:\n$plan")
    assert(plan.contains("url_normalize"), plan)
    // the members-side join back to the per-key winners is broadcast
    // (winners <= one row per canonical URL group, aggregated first)
    assert(plan.contains("BroadcastHashJoin"), s"q146 winners join must broadcast:\n$plan")
    // the only exchanges are the norm_url aggregate (and AQE's view of
    // it) — document text never enters this plan at all
    val exchanged = plan.linesIterator.filter(_.contains("partitioning")).mkString("\n")
    assert(!exchanged.contains("text#"), s"q146 shuffled document text:\n$plan")
    assert(shuffles(plan) <= 2, s"q146 shuffle budget exceeded:\n$plan")
  }

  test("q150: held-out scoring is the same shuffle-free checkpoint scan as q145") {
    val plan = planOf("q150_classifier_holdout")
    assert(shuffles(plan) == 0, s"q150 apply is scan-shaped:\n$plan")
    assert(plan.contains("presence_dot"), plan)
    assert(!plan.contains("FileScan"), s"q150 re-scanned the corpus:\n$plan")
  }

  test("q151: calibration sweep — checkpoint scan x 5-row cutoff list, one tiny aggregate") {
    val plan = planOf("q151_classifier_calibration")
    assert(!plan.contains("FileScan"), s"q151 re-scanned the corpus:\n$plan")
    // the 5-row literal cutoff frame rides a broadcast nested-loop
    // cross (the 1-row-attach class, not a corpus cartesian); the only
    // exchange carries <=5 cutoff aggregate rows
    assert(shuffles(plan) <= 1, s"q151 shuffled more than the cutoff aggregate:\n$plan")
    val exchanged = plan.linesIterator.filter(_.contains("partitioning")).mkString("\n")
    assert(!exchanged.contains("text#") && !exchanged.contains("feats#"),
      s"q151 shuffled a payload:\n$plan")
  }

  test("q152: source packing — one hash exchange of count scalars into the shard window") {
    val plan = planOf("q152_source_packing")
    assert(plan.contains("Window"), s"q152 lost its pack window:\n$plan")
    assert(!plan.contains("rangepartitioning"), s"q152 range-partitioned:\n$plan")
    assert(shuffles(plan) <= 1, s"q152 needs one shard exchange only:\n$plan")
    val exchanged = plan.linesIterator.filter(_.contains("partitioning")).mkString("\n")
    assert(!exchanged.contains("text#"), s"q152 shuffled document text:\n$plan")
  }

  test("q141: guarded edit join — hot blocks anti-joined out on both sides, keys never shuffle") {
    val plan = planOf("q141_edit_join_guarded")
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"q141 candidate generation went quadratic:\n$plan")
    // the checkpointed hot list is anti-joined against BOTH the index
    // and probe segment frames as a broadcast
    assert("BroadcastHashJoin .*LeftAnti".r.findAllIn(plan).length >= 2,
      s"q141 hot-block filter must broadcast-anti both sides:\n$plan")
    // the hot list is materialized once (localCheckpoint), not
    // recomputed per side: the freq aggregate must NOT appear in the
    // main plan — its result enters as a checkpointed RDD scan
    assert(plan.contains("ExistingRDD") || plan.contains("LocalTableScan"),
      s"q141 hot list not pre-materialized:\n$plan")
    // candidates cross wires as bare id pairs: no exchange carries the
    // key strings or raw text
    val exchanged = plan.linesIterator.filter(_.contains("partitioning")).mkString("\n")
    assert(!exchanged.contains("text#") && !exchanged.contains("__key") &&
      !exchanged.contains("s_key") && !exchanged.contains("r_key"),
      s"q141 shuffled a key/text payload:\n$plan")
    // block join (<=2) + pair dedup (1) + two key rejoins (<=2)
    assert(shuffles(plan) <= 5, s"q141 shuffle budget exceeded:\n$plan")
  }

  test("q123: incremental edit join streams the corpus index map-side against broadcast probes") {
    val plan = planOf("q123_edit_join_incremental")
    assert(plan.contains("BroadcastHashJoin"), s"q123 block join must broadcast the batch probes:\n$plan")
    assert(!plan.contains("SortMergeJoin") && !plan.contains("CartesianProduct"),
      s"q123 corpus side must not shuffle into the join:\n$plan")
    // two shuffles since r21: the matched-pair distinct (output-sized)
    // plus EditDistanceJoin.keyed's pre-expansion repartition, which
    // carries only the ~25-byte (id, key, len) proxy rows — the
    // EXPANDED d³ segment frame still never shuffles, and no exchange
    // may carry document text
    assert(shuffles(plan) == 2, s"q123 must shuffle only proxies + matched pairs:\n$plan")
    val exchanged = plan.linesIterator.filter(_.contains("partitioning")).mkString("\n")
    assert(!exchanged.contains("text#") && !exchanged.contains("__seg"),
      s"q123 shuffled an expanded segment/text payload:\n$plan")
  }

  test("q124: count-min lookup broadcasts the sketch; the corpus never meets a sort-merge join") {
    val plan = planOf("q124_countmin_freq")
    // the sketch table (<= depth*width rows) and the watchlist both
    // ride broadcasts; every hash exchange left is a partial-agg
    // combine (sketch build / watch counts), never a join shuffle
    assert(plan.contains("BroadcastHashJoin"), s"q124 lost its broadcasts:\n$plan")
    assert(!plan.contains("SortMergeJoin"), s"q124 shuffled a join side:\n$plan")
    // build agg + estimate min-agg + exact count + final distinct-ish
    // joins: the shuffle budget is the aggregates only
    assert(shuffles(plan) <= 4, s"q124 shuffle budget exceeded:\n$plan")
  }

  test("q125: CDC chunking is one payload scan; only scalar fingerprints ever shuffle") {
    val plan = planOf("q125_cdc_profile")
    // the chunker is a fused HOF projection over the scan (no UDF) and
    // the document text never rides an exchange — every shuffle after
    // the explode carries (fingerprint, doc_id, counts) scalars
    assert(!plan.toLowerCase.contains("scalaudf"), plan)
    assert(plan.contains("Generate explode"), s"q125 lost its chunk explode:\n$plan")
    val exchanged = plan.linesIterator.filter(_.contains("hashpartitioning")).mkString("\n")
    assert(!exchanged.contains("text#"), s"q125 shuffled the payload:\n$plan")
    // per-(chunk,doc) agg + fingerprint window + per-doc rollup (+ the
    // id restore join under AQE) bound the budget
    assert(shuffles(plan) <= 4, s"q125 shuffle budget exceeded:\n$plan")
  }

  test("q126: the KMV sketch partial-aggregates map-side; the payload never shuffles") {
    val plan = planOf("q126_kmv_distinct")
    // the sketch side must show a partial ObjectHashAggregate below its
    // exchange — k longs per (partition, group) is the whole scale story
    assert(plan.contains("partial_kmv_sketch"),
      s"q126 sketch build lost its map-side partial:\n$plan")
    assert(!plan.toLowerCase.contains("scalaudf"), plan)
    val exchanged = plan.linesIterator.filter(_.contains("hashpartitioning")).mkString("\n")
    assert(!exchanged.contains("text#"), s"q126 shuffled the payload:\n$plan")
    // sketch agg + exact-control distinct agg (2) + the tiny source join
    assert(shuffles(plan) <= 5, s"q126 shuffle budget exceeded:\n$plan")
  }

  test("q127: the histogram partial-aggregates map-side; the bounded quantile frame broadcasts into the rank join") {
    val plan = planOf("q127_hist_quantiles")
    assert(!plan.toLowerCase.contains("scalaudf"), plan)
    // the sketch side: partial HashAggregate below its exchange
    assert(plan.contains("partial_count"), s"q127 histogram lost its map-side partial:\n$plan")
    // the |sources|x|pcts| selection frame must broadcast into the
    // corpus-sized rank join, never pull it through another exchange
    assert(plan.contains("BroadcastHashJoin"),
      s"q127 rank join is not broadcast:\n$plan")
    val exchanged = plan.linesIterator.filter(_.contains("hashpartitioning")).mkString("\n")
    assert(!exchanged.contains("text#"), s"q127 shuffled the payload:\n$plan")
    // histogram agg + two source-window sorts share one exchange each
    assert(shuffles(plan) <= 4, s"q127 shuffle budget exceeded:\n$plan")
  }

  test("q128: containment dedup keeps the payload in the scan; ownership shuffles fingerprints only") {
    val plan = planOf("q128_cdc_containment")
    assert(!plan.toLowerCase.contains("scalaudf"), plan)
    assert(plan.contains("Generate explode"), s"q128 lost its chunk explode:\n$plan")
    val exchanged = plan.linesIterator.filter(_.contains("hashpartitioning")).mkString("\n")
    assert(!exchanged.contains("text#"), s"q128 shuffled the payload:\n$plan")
    // per-(chunk,doc) agg + owner window + per-doc rollup + id restore
    assert(shuffles(plan) <= 4, s"q128 shuffle budget exceeded:\n$plan")
  }

  test("q129: interval join is a pure equi-join on (key, bin) — no nested-loop, no cartesian") {
    val plan = planOf("q129_interval_join")
    assert(!plan.contains("BroadcastNestedLoopJoin"),
      s"q129 fell back to the theta-join shape:\n$plan")
    assert(!plan.contains("CartesianProduct"), s"q129 planned a cartesian:\n$plan")
    assert(plan.contains("Generate explode"), s"q129 lost its bin explode:\n$plan")
    assert(!plan.toLowerCase.contains("scalaudf"), plan)
  }

  test("q130: unicode normalization is one shuffle-free fused scan") {
    val plan = planOf("q130_unicode_norm")
    assert(shuffles(plan) === 0, s"q130 must not shuffle:\n$plan")
    assert(!plan.toLowerCase.contains("scalaudf"), plan)
    assert(plan.contains("nfc_normalize") && plan.contains("strip_accents"),
      s"q130 lost its native expressions:\n$plan")
  }

  test("q131: both overlap sketches partial-aggregate map-side; the key universe shuffles only in the exact controls") {
    val plan = planOf("q131_key_overlap")
    assert(!plan.toLowerCase.contains("scalaudf"), plan)
    // two sketch builds, each with a map-side partial before its exchange
    assert("partial_kmv_sketch".r.findAllIn(plan).length >= 2,
      s"q131 lost a map-side sketch partial:\n$plan")
    // no nested-loop anywhere (the 1-row combine frames must broadcast)
    assert(!plan.contains("CartesianProduct"), s"q131 planned a cartesian:\n$plan")
  }

  test("q132: weighted sample prunes text out of the scan and top-k's map-side before the exchange") {
    val plan = planOf("q132_weighted_sample")
    assert(plan.contains("ReadSchema: struct<doc_id:bigint,source:string,n_chars:bigint>"),
      s"q132 scan must prune to the three consumed columns (no text):\n$plan")
    // Spark's WindowGroupLimit must run below the group exchange: each
    // map task forwards at most k rows per group, so the shuffle moves
    // O(groups * k) scalars, not the corpus
    val exchangeLine = plan.linesIterator.indexWhere(_.contains("Exchange hashpartitioning"))
    val preLimit = plan.linesIterator.zipWithIndex
      .exists { case (l, i) => l.contains("WindowGroupLimit") && i > exchangeLine }
    assert(exchangeLine >= 0 && preLimit,
      s"q132 lost the map-side WindowGroupLimit below its exchange:\n$plan")
    assert(!plan.toLowerCase.contains("scalaudf"), plan)
  }

  test("q65: the OR'd brand/size predicate reaches the part side below the broadcast join") {
    val df = SparkEntry.queries("q65_disjunctive")(spark, dir)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    assert(plan.contains("BroadcastHashJoin"), plan)
    // CNF extraction: part rows are filtered by the brand disjunction at
    // (or before) their scan — the join must not see the whole dimension
    val partFiltered = "Filter [^\\n]*p_brand".r.findFirstIn(plan).isDefined ||
      "PushedFilters: \\[[^\\]]*p_brand".r.findFirstIn(plan).isDefined
    assert(partFiltered, s"brand disjunction not extracted to the part side:\n$plan")
    // and the lineitem side keeps its quantity bounds scan-level
    assert("PushedFilters: \\[[^\\]]*l_quantity".r.findFirstIn(plan).isDefined
      || "Filter [^\\n]*l_quantity".r.findFirstIn(plan).isDefined, plan)
  }

  test("q66: dimensions broadcast; the order is a TakeOrderedAndProject, not a global sort") {
    val plan = planOf("q66_returned_items")
    assert("BroadcastHashJoin".r.findAllIn(plan).length >= 2, plan)
    assert(plan.contains("TakeOrderedAndProject"), s"top-20 must not globally sort:\n$plan")
  }

  test("q67: the global threshold joins as a broadcast, never a shuffled join") {
    val plan = planOf("q67_sales_opportunity")
    // one-row threshold frame × customer: broadcast nested loop is the
    // right shape (no equi-key exists); the anti join must be hash-based
    assert(plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(plan.contains("LeftAnti"), plan)
  }

  test("q68: packing windows partition by shard (no single-partition global window)") {
    val plan = planOf("q68_pack_sequences")
    // the cumsum window must run partitioned by shard — a windowing step
    // that funnels through SinglePartition serializes the whole corpus
    // through one task at scale
    assert(plan.contains("Window"), plan)
    assert(!plan.contains("Exchange SinglePartition"), s"global window detected:\n$plan")
  }

  test("q69: cohort join and aggregate share the user_id partitioning (bounded shuffles)") {
    val plan = planOf("q69_cohort_retention")
    // events shuffle on user_id once for the cohort aggregate; the join
    // reuses that co-location; the distinct-count aggregate adds its own
    // two-phase exchange — anything beyond that is a wasted pass over the
    // event log at scale
    assert(shuffles(plan) <= 4, s"too many exchanges:\n$plan")
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
  }

  test("q70: overlapping chunking is a pure row-local generate (zero shuffles)") {
    val plan = planOf("q70_chunk_overlap")
    assert(shuffles(plan) == 0, s"chunking must not shuffle:\n$plan")
    assert(plan.contains("Generate explode"), plan)
  }

  test("q71: heavy hitters partial-aggregate map-side (summaries, not rows, cross the shuffle)") {
    val plan = planOf("q71_heavy_hitters")
    // ObjectHashAggregate with a partial_heavy_hitters phase before the
    // exchange: per-partition summaries combine map-side; no
    // (group, item)-keyed exchange may exist
    assert(plan.contains("partial_heavy_hitters"), plan)
    "Exchange hashpartitioning\\(([^)]*)\\)".r.findAllMatchIn(plan).foreach { m =>
      assert(!m.group(1).contains("user_id"), s"item-level shuffle survived:\n${m.group(0)}")
    }
  }

  test("q72: incremental dedup — corpus fps stream map-side, text never shuffles") {
    val df = SparkEntry.queries("q72_incremental_dedup")(spark, dir)
    df.collect()
    // audit the FULL adaptive string (final + initial): at fixture
    // scale no batch fp matches the corpus, so AQE's empty-relation
    // propagation eliminates the anti join from the final plan — the
    // structural shape lives in the initial plan
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("LeftAnti"), plan)
    // the two-step probe: the corpus fingerprint scan meets the batch
    // fps through a BROADCAST semi (map-side, zero state exchange) —
    // never a shuffled join
    assert(plan.contains("BroadcastHashJoin") && plan.contains("LeftSemi"),
      s"corpus probe not a broadcast semi:\n$plan")
    // every join is broadcast-built (the batch side is bounded by
    // contract): a shuffled join here would mean the corpus fps went
    // onto the wire to meet it. The fp exchanges that remain are the
    // BATCH aggregate's own groupBy and the bounded matched-set
    // distinct — batch-sized by construction.
    assert(!plan.contains("SortMergeJoin") && !plan.contains("ShuffledHashJoin"),
      s"corpus fingerprints shuffled to meet a bounded frame:\n$plan")
    "Exchange (hash|range)partitioning\\(([^)]*)\\)".r.findAllMatchIn(plan).foreach { m =>
      assert(!m.group(2).contains("text"), s"text on the shuffle wire:\n${m.group(0)}")
    }
  }

  test("q73: mixture rates broadcast back; corpus rows never shuffle") {
    val plan = planOf("q73_mixture_sample")
    // the only hash exchanges belong to the tiny per-source count
    // aggregate (keyed by source); the corpus meets its rate via a
    // broadcast join and the keep decision is scan-side
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("SortMergeJoin"), plan)
    "Exchange hashpartitioning\\(([^)]*)\\)".r.findAllMatchIn(plan).foreach { m =>
      assert(!m.group(1).contains("doc_id") && !m.group(1).contains("text"),
        s"corpus rows on the shuffle wire:\n${m.group(0)}")
    }
  }

  test("q79: the PQ code scan is one pass + TakeOrderedAndProject (brute-force shape, 16x smaller table)") {
    import org.apache.spark.sql.functions._
    val spark2 = spark
    import spark2.implicits._
    val emb = (1L to 64L).map(i => (i, Seq.fill(8)((i % 7).toFloat + 1f)))
      .toDF("vec_id", "embedding")
    val cbs = graft.operators.Similarity.trainProductQuantizer(
      emb, "vec_id", "embedding", dim = 8, m = 4, nCodes = 4, trainSample = 64)
    val codes = graft.operators.Similarity.pqEncode(emb, "vec_id", "embedding", cbs)
    val df = graft.operators.Similarity.pqTopK(
      codes, "id", "code", cbs, Seq.fill(8)(1.0), k = 5)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    // distributed top-k: per-partition heaps, no global sort, no shuffle
    // of the code table
    assert(plan.contains("TakeOrderedAndProject"), plan)
    assert(!plan.contains("Exchange rangepartitioning"), s"global sort in PQ scan:\n$plan")
    assert(shuffles(plan) == 0, s"PQ scan must not shuffle:\n$plan")
  }

  test("q81: duplicate-span detection partitions by gram hashes and doc ids, never text") {
    val plan = planOf("q81_dup_spans")
    // grams shuffle as 60-bit longs; the only doc-keyed exchanges carry
    // (doc_id, pos) pairs and the final rebuild rows
    "Exchange (hash|range)partitioning\\(([^)]*)\\)".r
      .findAllMatchIn(plan)
      .foreach(m => assert(!m.group(2).contains("text") && !m.group(2).contains("tok"),
        s"raw text in a partitioning key:\n${m.group(0)}"))
    // round-9 shape: the cut is the doc-local interval union — the
    // k-times covered-position amplification (explode(sequence(pos,
    // pos+k-1)) → distinct → anti-join → collect_list rebuild) must
    // stay gone, and no closure UDF anywhere on the path (the native
    // shingle_hash60s gram scan itself runs inside the localCheckpoint
    // job, invisible here; its codegen shape is pinned in
    // GraftExtensionsSpec)
    assert(plan.contains("cut_covered_spans"), s"doc-local cut missing:\n$plan")
    assert(!plan.toLowerCase.contains("scalaudf"), s"closure UDF on the q81 path:\n$plan")
    assert(!plan.contains("sequence("), s"covered-position explode resurrected:\n$plan")
  }

  test("q82: IVF-PQ — cell-filtered code scan into a top-K heap, broadcast re-rank, no shuffle") {
    val plan = planOf("q82_ivf_pq")
    // the candidate stage filters on the native nearest_cell routing and
    // scores codes with pq_adc_score — both fused into the scan stage
    assert(plan.contains("nearest_cell"), s"coarse routing missing:\n$plan")
    assert(plan.contains("pq_encode"), s"code computation missing:\n$plan")
    assert(plan.contains("pq_adc_score"), s"ADC scoring missing:\n$plan")
    assert(!plan.toLowerCase.contains("scalaudf"), s"closure UDF on the q82 path:\n$plan")
    // distributed top-K (per-partition heaps), never a global sort
    assert(plan.contains("TakeOrderedAndProject"), plan)
    assert(!plan.contains("Exchange rangepartitioning"), s"global sort in q82:\n$plan")
    // the ≤ rerank candidate set broadcasts into the exact-vector fetch
    assert(plan.contains("BroadcastHashJoin"), s"re-rank must broadcast:\n$plan")
    assert(!plan.contains("SortMergeJoin"), plan)
    // nothing hash-shuffles: filter + scan + heap + broadcast join only
    assert(shuffles(plan) == 0, s"q82 must not shuffle:\n$plan")
  }

  test("q77: semantic dedup never puts the vector column in a partitioning key") {
    val plan = planOf("q77_semantic_dedup")
    // the BASELINE.md scale contract: vectors cross the wire once (the
    // cell-id exchange inside the checkpointed pair stage); every
    // visible exchange past the checkpoints carries ids/cells/groups
    // only — a vec/embedding partitioning key would mean the corpus
    // re-shuffles per stage at 100 TB
    "Exchange (hash|range)partitioning\\(([^)]*)\\)".r
      .findAllMatchIn(plan)
      .foreach(m => assert(!m.group(2).contains("vec") && !m.group(2).contains("embedding"),
        s"vector column in a partitioning key:\n${m.group(0)}"))
    // the final labeling join keys on id, not on a recomputed assignment
    assert(!plan.toLowerCase.contains("scalaudf"), s"closure UDF on the q77 path:\n$plan")
  }

  test("q83: span scrub probes a broadcast benchmark universe, cuts doc-locally") {
    val plan = planOf("q83_scrub_spans")
    // the benchmark gram universe must broadcast into the corpus gram
    // stream (a shuffled membership join would re-partition the corpus
    // by gram hash at 100 TB)
    assert(plan.contains("BroadcastHashJoin"), s"benchmark probe must broadcast:\n$plan")
    assert(plan.contains("cut_covered_spans"), s"doc-local cut missing:\n$plan")
    assert(!plan.toLowerCase.contains("scalaudf"), s"closure UDF on the q83 path:\n$plan")
    assert(!plan.contains("sequence("), s"covered-position explode on the q83 path:\n$plan")
    // gram/doc exchanges carry ids and ints, never text or token arrays
    "Exchange (hash|range)partitioning\\(([^)]*)\\)".r
      .findAllMatchIn(plan)
      .foreach(m => assert(!m.group(2).contains("text") && !m.group(2).contains("tok"),
        s"raw text in a partitioning key:\n${m.group(0)}"))
  }

  test("q80: the corpus side is pruned to the batch's cells by a broadcast semi-join") {
    val df = SparkEntry.queries("q80_incremental_semantic")(spark, dir)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    // a small ingest batch must not shuffle (or compare against) the
    // whole corpus — its cells arrive broadcast and the corpus is
    // semi-join-filtered before any replication
    assert("BroadcastHashJoin LeftSemi".r.findFirstIn(plan).isDefined
      || "BroadcastHashJoin.*LeftSemi".r.findFirstIn(plan).isDefined, plan)
    assert(!plan.contains("SortMergeJoin LeftSemi"),
      s"cell pruning must broadcast, not shuffle the corpus:\n$plan")
  }

  test("q76: representative selection is a partial+final aggregate, not a window sort") {
    import org.apache.spark.sql.functions._
    // audit the policy step in isolation (the full q76 plan is dominated
    // by the upstream CC pipeline's iterative stages)
    val members = spark.range(1000).select(
      col("id"),
      (col("id") % 100).alias("cluster_id"),
      (col("id") * 7 % 13).alias("score"))
    val df = graft.operators.Dedup.keepRepresentative(members, "id", "cluster_id", "score")
    df.collect()
    val plan = df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    // a window implementation would sort every partition and could not
    // pre-combine; the max_by(struct) form must partial-aggregate
    assert(!plan.contains("Window"), s"window sort in the policy step:\n$plan")
    assert("partial_max|partial.*max\\(".r.findFirstIn(plan).isDefined
      || plan.contains("partial"), s"no map-side combine:\n$plan")
    // text never enters this operator: only (id, cluster, score) shuffle
    "Exchange (hash|range)partitioning\\(([^)]*)\\)".r.findAllMatchIn(plan).foreach { m =>
      assert(!m.group(2).contains("text"), m.group(0))
    }
  }

  test("q85: kNN join broadcasts the probe side; vectors never enter a partitioning key") {
    val plan = planOf("q85_knn_join")
    // the small exploded query side must broadcast (the corpus never
    // shuffles for candidate generation); at huge |Q| both sides would
    // hash-partition on the scalar cell id instead — either way no
    // embedding column may ever be a partitioning key, or the corpus
    // vectors re-shuffle per stage at 100 TB
    assert(plan.contains("BroadcastHashJoin"), s"probe join did not broadcast:\n$plan")
    "Exchange (hash|range)partitioning\\(([^)]*)\\)".r
      .findAllMatchIn(plan)
      .foreach(m => assert(!m.group(2).contains("vec") && !m.group(2).contains("embedding"),
        s"vector column in a partitioning key:\n${m.group(0)}"))
    // ranking windows consume scalar (qid, id, cos) triples only
    assert(!plan.toLowerCase.contains("scalaudf"), s"closure UDF on the q85 path:\n$plan")
  }

  test("q86: bloom probe prunes the gram scan map-side; confirm join broadcasts") {
    val plan = planOf("q86_bloom_decontaminate")
    // the sketch probe must sit in a codegen Filter on the scan side —
    // BEFORE any exchange — or the prefilter saves nothing at 100 TB
    assert(plan.contains("might_contain"), s"no native bloom probe:\n$plan")
    assert(plan.contains("BroadcastHashJoin"), s"confirm join did not broadcast:\n$plan")
    "Exchange (hash|range)partitioning\\(([^)]*)\\)".r
      .findAllMatchIn(plan)
      .foreach(m => assert(!m.group(2).contains("text"),
        s"raw text in a partitioning key:\n${m.group(0)}"))
    assert(!plan.toLowerCase.contains("scalaudf"), s"closure UDF on the q86 path:\n$plan")
  }

  test("q87: per-group thresholds broadcast back; the corpus is never window-sorted") {
    val plan = planOf("q87_quality_prune")
    // a percent_rank implementation would range-partition and sort every
    // group's full slice; the threshold-broadcast shape must not
    assert(!plan.contains("Window"), s"window sort in the prune plan:\n$plan")
    assert(plan.contains("BroadcastHashJoin"), s"thresholds did not broadcast:\n$plan")
    assert(!plan.contains("rangepartitioning"), s"corpus range-partitioned:\n$plan")
    assert(!plan.toLowerCase.contains("scalaudf"), s"closure UDF on the q87 path:\n$plan")
  }

  test("q88: seeded sharding hash-exchanges on the shard id, never range-partitions the corpus") {
    val plan = planOf("q88_shard_assignments")
    // the training order is a WITHIN-shard sort under a hash exchange on
    // (shard) — a global orderBy would range-partition the whole corpus
    assert(plan.contains("hashpartitioning(shard"), s"no hash exchange on shard:\n$plan")
    assert(!plan.contains("rangepartitioning"), s"corpus range-partitioned:\n$plan")
    assert(!plan.toLowerCase.contains("scalaudf"), s"closure UDF on the q88 path:\n$plan")
  }

  test("q89: top-V vocab cut is a TakeOrdered, not a global sort of the token counts") {
    // the coverage tail is computed driver-side over the collected
    // top-V rows (round 15 — the unpartitioned V-row window was the
    // bench tail's warning source), so the registry query's own plan is
    // a bounded LocalTableScan; the distributed property to audit is
    // the CUT that feeds the collect — Vocab.topCut over the token
    // counts, which must be a TakeOrdered (per-partition heaps), never
    // a range-partitioned global sort
    import org.apache.spark.sql.functions._
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val counts = docs
      .select(explode(graft.functions.TextFunctions.tokens(col("text"))).alias("token"))
      .groupBy("token").agg(count(lit(1)).alias("cnt"))
    val cut = graft.operators.Vocab.topCut(counts, 500)
    cut.collect()
    val cutPlan = cut.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    assert(cutPlan.contains("TakeOrderedAndProject"), s"top-V not TakeOrdered:\n$cutPlan")
    assert(!cutPlan.contains("rangepartitioning"), s"token counts range-partitioned:\n$cutPlan")
    assert(!cutPlan.toLowerCase.contains("scalaudf"), s"closure UDF on the cut path:\n$cutPlan")
    // and the registry query itself now materializes as driver-local
    // bounded rows (no distributed tail at all)
    val plan = planOf("q89_vocab_coverage")
    assert(plan.contains("LocalTableScan"), s"expected the driver-local tail:\n$plan")
    assert(!plan.contains("rangepartitioning") && !plan.toLowerCase.contains("scalaudf"), plan)
  }

  test("q90: pair explode runs over distinct words, not the token stream") {
    val plan = planOf("q90_bpe_pairs")
    // word frequencies aggregate BEFORE the pair generate: the plan
    // must carry BOTH keyed exchanges — hashpartitioning(word) below
    // the pair explode and hashpartitioning(pair) above it. A
    // regression that exploded pairs straight off the token stream
    // would lose the word exchange entirely.
    assert(plan.contains("hashpartitioning(word"),
      s"no word-frequency aggregate below the pair explode:\n$plan")
    assert(plan.contains("hashpartitioning(pair"),
      s"no pair aggregate exchange:\n$plan")
    assert(plan.contains("TakeOrderedAndProject"), s"top pairs not TakeOrdered:\n$plan")
    assert(!plan.contains("rangepartitioning"), s"pair path range-partitioned:\n$plan")
    assert(!plan.toLowerCase.contains("scalaudf"), s"closure UDF on the q90 path:\n$plan")
  }

  test("q91: under-cap groups bypass the window via broadcast anti-join; only over-cap slices sort") {
    val plan = planOf("q91_group_cap")
    // the long tail of a domain-capped corpus must be kept MAP-SIDE:
    // broadcast anti (under-cap keep-all) + broadcast semi (over-cap
    // route into the window); one Window for the over-cap slices only
    assert(plan.contains("BroadcastHashJoin") && plan.contains("LeftAnti"),
      s"under-cap bypass not a broadcast anti-join:\n$plan")
    assert(plan.contains("LeftSemi"), s"over-cap routing not a semi-join:\n$plan")
    assert(plan.contains("Window"), s"no window for the over-cap slices:\n$plan")
    assert(!plan.contains("rangepartitioning"), s"corpus range-partitioned:\n$plan")
    assert(!plan.toLowerCase.contains("scalaudf"), s"closure UDF on the q91 path:\n$plan")
  }

  test("q147: domain cap keeps q91's two-phase shape with the url natives fused into the scan") {
    val plan = planOf("q147_domain_cap")
    // the registrable-domain key is computed in the scan projection
    // (native codegen), then the q91 discipline: long tail broadcast
    // anti-joined past the window, only the farm domain sorts
    assert(plan.contains("registrable_domain") && plan.contains("url_host"), plan)
    assert(plan.contains("BroadcastHashJoin") && plan.contains("LeftAnti"),
      s"under-cap bypass not a broadcast anti-join:\n$plan")
    assert(plan.contains("Window"), s"no window for the over-cap domains:\n$plan")
    assert(!plan.contains("rangepartitioning"), s"corpus range-partitioned:\n$plan")
    val exchanged = plan.linesIterator.filter(_.contains("partitioning")).mkString("\n")
    assert(!exchanged.contains("text#"), s"q147 shuffled document text:\n$plan")
  }

  test("q148: the whole attribute sheet is ONE fused scan — no shuffle, no second read, no UDF") {
    val plan = planOf("q148_attribute_tags")
    assert(shuffles(plan) == 0, s"q148 tags are per-row — nothing to exchange:\n$plan")
    assert("FileScan parquet".r.findAllIn(plan).length == 1,
      s"q148 must read the corpus exactly once:\n$plan")
    Seq("lang_id", "gopher_stats", "char_entropy", "repetition_stats").foreach(fn =>
      assert(plan.contains(fn), s"q148 lost the $fn kernel:\n$plan"))
    assert(!plan.toLowerCase.contains("scalaudf"), plan)
    assert("\\*\\(\\d+\\) Project \\[".r.findFirstIn(plan).isDefined, s"q148 lost codegen:\n$plan")
  }

  test("q149: incremental url dedup — corpus key scan never shuffles; both probes broadcast") {
    val plan = planOf("q149_incremental_url_dedup")
    // the q72 state-side contract carried to the keyed form: the
    // corpus canonical scan streams map-side against broadcast batch
    // keys (semi), the matched set broadcasts back (anti); the only
    // exchange is the batch's own intra-batch aggregate
    assert("BroadcastHashJoin .*LeftSemi".r.findFirstIn(plan).isDefined,
      s"corpus probe not a broadcast semi:\n$plan")
    assert("BroadcastHashJoin .*LeftAnti".r.findFirstIn(plan).isDefined,
      s"matched-set removal not a broadcast anti:\n$plan")
    assert(shuffles(plan) <= 1, s"q149 shuffled more than the batch aggregate:\n$plan")
    val exchanged = plan.linesIterator.filter(_.contains("partitioning")).mkString("\n")
    assert(!exchanged.contains("text#"), s"q149 shuffled document text:\n$plan")
  }

  test("q92: benchmark grams broadcast; the corpus gram stream is never shuffled before matching") {
    val plan = planOf("q92_contamination_report")
    assert(plan.contains("BroadcastHashJoin"), s"benchmark grams did not broadcast:\n$plan")
    assert(!plan.contains("rangepartitioning"), s"corpus range-partitioned:\n$plan")
    assert(!plan.toLowerCase.contains("scalaudf"), s"closure UDF on the q92 path:\n$plan")
  }

  test("q93: the BPE apply chain is a pure projection — zero exchanges, zero UDFs") {
    val plan = planOf("q93_bpe_tokenize")
    assert(shuffles(plan) == 0,
      s"merge application must be scan->project (the training job is separate):\n$plan")
    assert(!plan.toLowerCase.contains("scalaudf"), s"closure UDF on the q93 path:\n$plan")
    // since r21 the merge chain is the native bpe_apply kernel (per-word
    // merge passes + per-task distinct-word cache, BpeKernelSpec pins
    // parity with the r20 replace chain); the scan must stay pruned to
    // (doc_id, text)
    assert(plan.contains("bpe_apply("), s"merge chain not the native bpe_apply kernel:\n$plan")
    assert(plan.contains("ReadSchema: struct<doc_id:bigint,text:string>"),
      s"scan not pruned to the two consumed columns:\n$plan")
  }

  test("q94: rate table broadcasts; the corpus is never hash-exchanged for the epoch fan-out") {
    val plan = planOf("q94_temperature_mix")
    assert(plan.contains("BroadcastHashJoin"), s"rate table did not broadcast:\n$plan")
    assert(shuffles(plan) == 0, s"epoch fan-out must be row-local:\n$plan")
    assert(!plan.toLowerCase.contains("scalaudf"), s"closure UDF on the q94 path:\n$plan")
  }

  test("q95: BPE packing windows per shard, never range-partitions; replace chain over distinct words") {
    val plan = planOf("q95_bpe_pack")
    assert(!plan.contains("rangepartitioning"), s"global sort crept into packing:\n$plan")
    // the cumsum window partitions by shard (local sort under the hash
    // exchange), never a global order
    assert(plan.contains("windowspecdefinition(shard"), s"window not per-shard:\n$plan")
    assert(plan.contains("HashAggregate"), s"distinct-word kernel missing its aggregate:\n$plan")
    assert(!plan.toLowerCase.contains("scalaudf"), s"closure UDF on the q95 path:\n$plan")
  }

  test("q96: vocab top-V cut is a TakeOrdered over the bounded subword vocab, no global stream sort") {
    // same round-15 shape as q89: the distributed cut (shared
    // Vocab.topCut code path, audited there) feeds a driver-side tail,
    // so the registry plan is bounded LocalTableScan rows
    val plan = planOf("q96_bpe_vocab")
    assert(plan.contains("LocalTableScan"), s"expected the driver-local tail:\n$plan")
    assert(!plan.contains("rangepartitioning"), s"global stream sort:\n$plan")
    assert(!plan.toLowerCase.contains("scalaudf"), s"closure UDF on the q96 path:\n$plan")
  }

  test("q97: manifest is one hash aggregate per shard over count scalars; text never shuffles") {
    val plan = planOf("q97_shard_manifest")
    assert(!plan.contains("rangepartitioning"), s"manifest range-partitioned:\n$plan")
    // the only exchanged columns are ids/counts — the doc text column
    // must not appear in any Exchange input
    val exchanges = "Exchange hashpartitioning\\([^)]*\\)".r.findAllIn(plan).toSeq
    assert(exchanges.forall(e => !e.contains("text#")),
      s"document text crossed a shuffle:\n$exchanges")
    assert(!plan.toLowerCase.contains("scalaudf"), s"closure UDF on the q97 path:\n$plan")
  }

  test("q98: one-pass fertility stats — no doc-keyed shuffle join, text never shuffles") {
    val plan = planOf("q98_source_token_stats")
    val exchanges = "hashpartitioning\\([^)]*\\)".r.findAllIn(plan).toSeq
    assert(exchanges.forall(e => !e.contains("doc_id")),
      s"per-doc reunite join crept back (doc_id in an exchange):\n$exchanges")
    assert(exchanges.forall(e => !e.contains("text#")), s"text crossed a shuffle:\n$exchanges")
    assert(!plan.contains("rangepartitioning"), s"range partitioning on the q98 path:\n$plan")
    assert(!plan.toLowerCase.contains("scalaudf"), s"closure UDF on the q98 path:\n$plan")
  }

  test("q100: multi-level BPE apply + id mapping is still a zero-exchange projection") {
    // since round 16 the registry query checkpoints its tokenized frame
    // (one replace-chain pass feeds both the vocab collect and the
    // output), so the REGISTRY plan reads the materialized RDD; the
    // replace-chain / scan-pruning shape is audited on the tokenize
    // phase itself, exactly as the query builds it
    val docs = graft.tables.Tables.documents(spark, dir)
    val merges = graft.operators.Bpe.trainMergesFromCorpus(docs, "text", numMerges = 24)
    val tokPlan = graft.operators.Bpe.tokenize(docs, "doc_id", "text", merges)
      .queryExecution.executedPlan.toString
    assert(shuffles(tokPlan) == 0,
      s"the tokenize phase must stay scan->project:\n$tokPlan")
    assert(tokPlan.contains("bpe_apply("),
      s"merge chain not the native bpe_apply kernel:\n$tokPlan")
    assert(tokPlan.contains("ReadSchema: struct<doc_id:bigint,text:string>"),
      s"scan not pruned to the two consumed columns:\n$tokPlan")
    val plan = planOf("q100_bpe_multilevel")
    assert(shuffles(plan) == 0,
      s"the id-mapping tail must stay a zero-exchange projection:\n$plan")
    assert(!plan.toLowerCase.contains("scalaudf"), s"closure UDF on the q100 path:\n$plan")
  }

  test("q99: benchmark probes broadcast; the corpus embedding stream never shuffles, vectors never key") {
    val plan = planOf("q99_semantic_decon")
    assert(plan.contains("BroadcastHashJoin"), s"benchmark probe table did not broadcast:\n$plan")
    // the only exchange is the per-benchmark-item aggregate on bench_id
    // (bounded by the benchmark, not the corpus); no vector column may
    // enter a partitioning key
    val exchanges = "hashpartitioning\\([^)]*\\)".r.findAllIn(plan).toSeq
    assert(exchanges.forall(e => !e.contains("vec") && !e.contains("embedding")),
      s"vectors entered a partitioning key:\n$exchanges")
    assert(!plan.contains("rangepartitioning"), s"corpus range-partitioned:\n$plan")
    assert(!plan.toLowerCase.contains("scalaudf"), s"closure UDF on the q99 path:\n$plan")
  }

  test("q101: LM scoring joins key on grams and doc ids — text never shuffles, no UDFs") {
    val plan = planOf("q101_ngram_perplexity")
    // every exchange carries gram strings (w1/w2), doc ids, or counts;
    // the raw document text must never enter a partitioning key (at
    // 100 TB the LM join is the big shuffle — it must move grams, not
    // documents)
    val exchanges = "hashpartitioning\\([^)]*\\)".r.findAllIn(plan).toSeq
    assert(exchanges.nonEmpty, s"expected gram-keyed shuffle joins:\n$plan")
    assert(exchanges.forall(e => !e.contains("text#")),
      s"document text crossed a shuffle:\n$exchanges")
    assert(!plan.contains("rangepartitioning"), s"range partitioning on the q101 path:\n$plan")
    assert(!plan.toLowerCase.contains("scalaudf"), s"closure UDF on the q101 path:\n$plan")
    // count aggregates are partial+final (map-side combine absorbs the
    // Zipf head before the LM-table exchanges)
    assert(plan.contains("partial_count"), s"LM counts not map-side combined:\n$plan")
  }

  test("q102: containment joins shuffle long hashes and ids, never text; verify is in-row") {
    val plan = planOf("q102_containment")
    "Exchange (hash|range)partitioning\\(([^)]*)\\)".r
      .findAllMatchIn(plan)
      .foreach(m => assert(!m.group(2).contains("text"), m.group(0)))
    // exact containment comes from the native sorted-intersect over the
    // full arrays — no closure UDF anywhere on the path
    assert(!plan.toLowerCase.contains("scalaudf"), s"closure UDF on the q102 path:\n$plan")
  }

  test("q104: quality profile buckets row-locally — no window, no global sort, text never shuffles") {
    val plan = planOf("q104_quality_profile")
    // fixed-width floor bins, NOT quantiles: a corpus-wide ntile would
    // serialize the whole held-out set through one partition
    assert(!plan.contains("Window"), s"quantile window crept into the profile:\n$plan")
    assert(!plan.contains("rangepartitioning"), s"global sort on the q104 path:\n$plan")
    val exchanges = "hashpartitioning\\([^)]*\\)".r.findAllIn(plan).toSeq
    assert(exchanges.forall(e => !e.contains("text#")),
      s"document text crossed a shuffle:\n$exchanges")
    assert(!plan.toLowerCase.contains("scalaudf"), s"closure UDF on the q104 path:\n$plan")
  }

  test("q103: z-order report is one pruned scan into one hash aggregate") {
    val plan = planOf("q103_zorder_stats")
    assert(shuffles(plan) == 1,
      s"interleave+bucket is a projection; only the bucket aggregate may shuffle:\n$plan")
    assert(plan.contains("ReadSchema: struct<l_partkey:bigint,l_suppkey:bigint>"),
      s"scan not pruned to the two dimension columns:\n$plan")
    assert(!plan.toLowerCase.contains("scalaudf"), s"closure UDF on the q103 path:\n$plan")
    assert(plan.contains("partial_min") || plan.contains("partial_count"),
      s"bucket stats not map-side combined:\n$plan")
  }

  test("q105: prototype scoring is one scan-side projection — zero exchanges, centroids as plan literals") {
    val plan = planOf("q105_prototype_prune")
    // the quantizer trains in separate bounded driver jobs; the scored
    // output must be scan -> project with the centroid matrix shipped
    // inside the plan (no join side, no shuffle — at 100 TB this is one
    // embarrassingly parallel pass)
    assert(shuffles(plan) == 0, s"prototype scoring must not shuffle:\n$plan")
    assert(!plan.toLowerCase.contains("scalaudf"), s"closure UDF on the q105 path:\n$plan")
    assert(plan.contains("nearest_cell"), s"cell assignment not the native expression:\n$plan")
  }

  test("q106: BM25 is stats-broadcast + row-local scoring + TakeOrdered — no hash/range exchange") {
    val plan = planOf("q106_bm25")
    // the 1-row stats frame broadcasts back over the materialized
    // per-doc stats; ranking converges per-partition heaps — nothing
    // keyed on doc or term ever shuffles
    assert(shuffles(plan) == 0, s"BM25 scoring must not hash/range-shuffle:\n$plan")
    assert(plan.contains("BroadcastNestedLoopJoin"), s"corpus stats did not broadcast:\n$plan")
    assert(plan.contains("TakeOrderedAndProject"), s"top-k not a TakeOrdered:\n$plan")
    assert(!plan.toLowerCase.contains("scalaudf"), s"closure UDF on the q106 path:\n$plan")
  }

  test("q107: snapshot diff shuffles (id, fingerprint) pairs only — text is hashed below the exchange") {
    val plan = planOf("q107_snapshot_diff")
    // the full-outer join must key on the scalar id and move 32-char
    // fingerprints; the raw content columns never enter an exchange
    val exchanges = "hashpartitioning\\([^)]*\\)".r.findAllIn(plan).toSeq
    assert(exchanges.nonEmpty, s"expected the id-keyed full-outer join:\n$plan")
    assert(exchanges.forall(e => e.contains("doc_id")), s"join not keyed on the id:\n$exchanges")
    assert(exchanges.forall(e => !e.contains("text#") && !e.contains("source#")),
      s"raw content crossed a shuffle:\n$exchanges")
    assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"),
      s"full-outer join missing:\n$plan")
    assert(!plan.contains("rangepartitioning"), s"global sort on the q107 path:\n$plan")
    assert(!plan.toLowerCase.contains("scalaudf"), s"closure UDF on the q107 path:\n$plan")
  }

  test("q108: retrieval join moves postings on term/qid/doc keys — text never shuffles, no global sort") {
    val plan = planOf("q108_bm25_join")
    // the classic inverted-index discipline: every exchange carries
    // terms, ids, or count scalars; raw document text stays below the
    // scan-side term_counts projection
    val exchanges = "hashpartitioning\\([^)]*\\)".r.findAllIn(plan).toSeq
    assert(exchanges.nonEmpty, s"expected term/qid-keyed shuffles:\n$plan")
    assert(exchanges.forall(e => !e.contains("text#")),
      s"document text crossed a shuffle:\n$exchanges")
    assert(!plan.contains("rangepartitioning"),
      s"per-query ranking must be a qid-partitioned window, not a global sort:\n$plan")
    assert(!plan.toLowerCase.contains("scalaudf"), s"closure UDF on the q108 path:\n$plan")
    // per-(qid,doc) totals are map-side combined before the final exchange
    assert(plan.contains("partial_sum") || plan.contains("partial_count"),
      s"micro totals not map-side combined:\n$plan")
  }

  test("q139: hard-negative mining inherits q108's shuffle discipline; the anti-join stays id-keyed") {
    val plan = planOf("q139_hard_negatives")
    val exchanges = "hashpartitioning\\([^)]*\\)".r.findAllIn(plan).toSeq
    assert(exchanges.nonEmpty, s"expected term/qid-keyed shuffles:\n$plan")
    assert(exchanges.forall(e => !e.contains("text#")),
      s"document text crossed a shuffle:\n$exchanges")
    assert(!plan.contains("rangepartitioning"),
      s"per-query re-rank must be a qid-partitioned window, not a global sort:\n$plan")
    // the positive exclusion is an anti-join over (qid, doc_id) scalars
    assert(plan.contains("LeftAnti"), s"q139 lost the positive anti-join:\n$plan")
    assert(!plan.toLowerCase.contains("scalaudf"), s"closure UDF on the q139 path:\n$plan")
  }

  test("q140: data card is one fused scan into source-keyed aggregates — text never shuffles, vote table broadcasts") {
    val plan = planOf("q140_data_card")
    assert(plan.contains("corpus_stats") && plan.contains("char_entropy"),
      s"q140 lost a native stats kernel:\n$plan")
    val exchanges = "hashpartitioning\\([^)]*\\)".r.findAllIn(plan).toSeq
    assert(exchanges.forall(e => !e.contains("text#")),
      s"document text crossed a shuffle:\n$exchanges")
    assert(plan.contains("BroadcastHashJoin"),
      s"the vote table must broadcast onto the rollup:\n$plan")
    assert(!plan.toLowerCase.contains("scalaudf"), s"closure UDF on the q140 path:\n$plan")
  }

  test("q109: mean-pool shuffles one vector buffer per group, map-side combined; vectors never key") {
    val plan = planOf("q109_mean_pool")
    assert(plan.contains("vector_micro_sum"), s"native aggregate missing:\n$plan")
    // partial aggregation absorbs each partition's vectors into one
    // buffer per group BEFORE the exchange — the whole point vs a
    // posexplode+groupBy(dim) shape
    assert(plan.contains("partial_vector_micro_sum"),
      s"vector buffers not map-side combined:\n$plan")
    assert(shuffles(plan) == 1, s"exactly the group-keyed exchange expected:\n$plan")
    "Exchange (hash|range)partitioning\\(([^)]*)\\)".r
      .findAllMatchIn(plan)
      .foreach(m => assert(!m.group(2).contains("embedding"), m.group(0)))
  }

  test("q111: funnel is one fused scan, one aggregate — only the distinct-fp exchange, no join") {
    val plan = planOf("q111_funnel")
    // stages 1–3 are pure conditional sums; stage 4's distinct count
    // is the single legitimate hash exchange (fingerprints co-locate
    // for the distinct), keyed on the md5 expression — never raw text
    assert(shuffles(plan) == 1, s"expected exactly the distinct-fp exchange:\n$plan")
    // the exchange keys on the conditional-fingerprint CASE over the
    // fused struct — never the raw text column
    "Exchange hashpartitioning\\(.*".r
      .findAllIn(plan).toSeq
      .foreach(line => assert(line.contains("st#") && !line.contains("text#"), line))
    assert(!plan.contains("Join"), s"funnel must not join:\n$plan")
    assert(plan.contains("corpus_stats"), s"fused scoring expression missing:\n$plan")
    assert(!plan.toLowerCase.contains("scalaudf"), s"closure UDF on the q111 path:\n$plan")
  }

  test("q112: PMI joins key on grams with map-side-combined counts; totals broadcast; TakeOrdered rank") {
    val plan = planOf("q112_pmi_collocations")
    val exchanges = "hashpartitioning\\([^)]*\\)".r.findAllIn(plan).toSeq
    assert(exchanges.nonEmpty, s"expected gram-keyed count joins:\n$plan")
    assert(exchanges.forall(e => !e.contains("text#")),
      s"document text crossed a shuffle:\n$exchanges")
    assert(plan.contains("partial_count"), s"gram counts not map-side combined:\n$plan")
    assert(plan.contains("TakeOrderedAndProject"), s"top-k not a TakeOrdered:\n$plan")
    assert(!plan.contains("rangepartitioning"), s"global sort on the q112 path:\n$plan")
    assert(!plan.toLowerCase.contains("scalaudf"), s"closure UDF on the q112 path:\n$plan")
  }

  test("q113: KL profile shuffles (group, term) counts, never text; all aggregates map-side combined") {
    val plan = planOf("q113_source_divergence")
    val exchanges = "hashpartitioning\\([^)]*\\)".r.findAllIn(plan).toSeq
    assert(exchanges.nonEmpty, s"expected (grp, w)-keyed count aggregate:\n$plan")
    assert(exchanges.forall(e => !e.contains("text#")),
      s"document text crossed a shuffle:\n$exchanges")
    assert(plan.contains("partial_sum") || plan.contains("partial_count"),
      s"counts not map-side combined:\n$plan")
    assert(!plan.contains("rangepartitioning"), s"global sort on the q113 path:\n$plan")
    assert(!plan.toLowerCase.contains("scalaudf"), s"closure UDF on the q113 path:\n$plan")
  }

  test("q114: sweep runs candidate generation once; shuffles carry ids/hashes, never text") {
    val plan = planOf("q114_threshold_sweep")
    "Exchange (hash|range)partitioning\\(([^)]*)\\)".r
      .findAllMatchIn(plan)
      .foreach(m => assert(!m.group(2).contains("text"), m.group(0)))
    // the per-threshold filters are row-local over ONE materialized
    // pair table — no threshold may trigger its own shingle pipeline
    assert(!plan.contains("shingle_hash_set"),
      s"candidate generation re-ran inside the sweep plan (it must come from the checkpoint):\n$plan")
    assert(!plan.toLowerCase.contains("scalaudf"), s"closure UDF on the q114 path:\n$plan")
  }

  test("q115: hybrid rerank joins embeddings AFTER the candidate cut; text never shuffles") {
    val plan = planOf("q115_hybrid_rank")
    assert(plan.contains("TakeOrderedAndProject"), s"candidate/final cuts not TakeOrdered:\n$plan")
    "Exchange (hash|range)partitioning\\(([^)]*)\\)".r
      .findAllMatchIn(plan)
      .foreach(m => assert(!m.group(2).contains("text"), m.group(0)))
    assert(!plan.toLowerCase.contains("scalaudf"), s"closure UDF on the q115 path:\n$plan")
  }

  test("q115: embedding side is semi-join-pruned to the candidate ids, never broadcast whole") {
    val df = SparkEntry.queries("q115_hybrid_rank")(spark, dir)
    df.collect()
    val root = df.queryExecution.executedPlan
    def embScans(p: org.apache.spark.sql.execution.SparkPlan) =
      collectAll(p) {
        case s: org.apache.spark.sql.execution.FileSourceScanExec
            if s.relation.location.rootPaths.mkString.contains("embeddings") => s
      }
    // (a) the embedding scan sits BEHIND a broadcast LeftSemi prune on
    // the candidate ids — the cosine only ever touches ≤candidates rows
    val semiOverEmb = collectAll(root) {
      case j: org.apache.spark.sql.execution.joins.BroadcastHashJoinExec
          if j.joinType == org.apache.spark.sql.catalyst.plans.LeftSemi &&
            embScans(j.left).nonEmpty => j
    }
    assert(semiOverEmb.nonEmpty,
      s"embedding scan not behind a broadcast semi-join on the candidate ids:\n$root")
    // (b) no BroadcastExchange ships the UN-pruned embedding relation:
    // any broadcast subtree containing the embeddings scan must also
    // contain the LeftSemi prune below it
    collectAll(root) {
      case b: org.apache.spark.sql.execution.exchange.BroadcastExchangeExec => b
    }.foreach { ex =>
      if (embScans(ex).nonEmpty) {
        val pruned = collectAll(ex) {
          case j: org.apache.spark.sql.execution.joins.BroadcastHashJoinExec
              if j.joinType == org.apache.spark.sql.catalyst.plans.LeftSemi => j
        }
        assert(pruned.nonEmpty,
          s"full-relation BroadcastExchange of the embedding table:\n$ex")
      }
    }
  }

  test("q117: hybrid join never keys a shuffle on text/vectors; corpus embeddings semi-pruned") {
    val df = SparkEntry.queries("q117_hybrid_join")(spark, dir)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    // ids and scalar micros shuffle; raw text and embedding arrays
    // must never appear in a partitioning expression
    "Exchange (hash|range)partitioning\\(([^)]*)\\)".r
      .findAllMatchIn(plan)
      .foreach { m =>
        assert(!m.group(2).contains("text"), m.group(0))
        assert(!m.group(2).contains("embedding"), m.group(0))
      }
    assert(!plan.toLowerCase.contains("scalaudf"), s"closure UDF on the q117 path:\n$plan")
    // the CORPUS-side embedding scan pays cosine only behind a
    // BROADCAST candidate-id LeftSemi prune (the query-side scan is
    // the |Q|-row query table itself — bounded by the qid filter, not
    // pruned here). SMJ/shuffled-hash semis are rejected outright:
    // either one hash-exchanges the entire embeddings relation with
    // the vector payload to meet a ≤|Q|·candidates id list — the r15
    // `weak` this test was too loose to catch.
    val root = df.queryExecution.executedPlan
    def embScans(p: org.apache.spark.sql.execution.SparkPlan) =
      collectAll(p) {
        case s: org.apache.spark.sql.execution.FileSourceScanExec
            if s.relation.location.rootPaths.mkString.contains("embeddings") => s
      }
    val shuffledSemisOverEmb = collectAll(root) {
      case j: org.apache.spark.sql.execution.joins.ShuffledHashJoinExec
          if j.joinType == org.apache.spark.sql.catalyst.plans.LeftSemi &&
            embScans(j).nonEmpty => j
      case j: org.apache.spark.sql.execution.joins.SortMergeJoinExec
          if j.joinType == org.apache.spark.sql.catalyst.plans.LeftSemi &&
            embScans(j).nonEmpty => j
    }
    assert(shuffledSemisOverEmb.isEmpty,
      s"candidate prune over embeddings planned as a shuffled semi-join " +
        s"(full-corpus vector exchange):\n$plan")
    val broadcastSemiOverEmb = collectAll(root) {
      case j: org.apache.spark.sql.execution.joins.BroadcastHashJoinExec
          if j.joinType == org.apache.spark.sql.catalyst.plans.LeftSemi &&
            embScans(j.left).nonEmpty => j
    }
    assert(broadcastSemiOverEmb.nonEmpty,
      s"corpus embedding scan not behind a broadcast candidate-id semi-join:\n$plan")
    // and NO shuffle Exchange moves a vector payload at all: the
    // query table broadcasts (|Q| rows by contract), the candidate
    // vectors stay map-side through the broadcast qid join, and the
    // window's qid exchange carries only scalar micros. (r16
    // tightening — the earlier version allowed a "bounded" candidate
    // exchange with the __vec payload; broadcasting qv removes it.)
    collectAll(root) {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
    }.foreach { ex =>
      val carriesVec = ex.output.exists(_.dataType match {
        case org.apache.spark.sql.types.ArrayType(
              org.apache.spark.sql.types.FloatType, _) => true
        case _ => false
      })
      assert(!carriesVec,
        s"shuffle Exchange carries an embedding payload:\n$ex")
    }
  }

  /** The hint-class sweep (VERDICT r15 "What's missing" #2).
    *
    * Bounded-by-contract candidate frames (`localCheckpoint` lineage)
    * carry no stats, so Catalyst cannot pick broadcast for joins
    * against them on its own — every such join needs an explicit
    * `broadcast()` hint, and q115 (r14) then q117 (r15) each shipped
    * with one missing. The observable failure mode is always the
    * same: a shuffle Exchange whose input subtree contains the corpus
    * `embeddings` FileSourceScan, whose output still carries the raw
    * float-vector payload, with no broadcast LeftSemi prune between
    * scan and exchange. This sweep audits EVERY registry query for
    * that shape, so the next missed hint fails CI instead of shipping
    * as a full-corpus vector shuffle.
    *
    * Queries where a vector-payload shuffle is the operator's actual
    * scale design (cell/band-keyed repartitions whose per-key volume
    * is bounded by construction) are allowlisted BY NAME with the
    * justification inline — a new offender must either add itself
    * here with a reason or fix its plan.
    */
  test("registry sweep: corpus embedding vectors never feed an un-pruned shuffle exchange") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import org.apache.spark.sql.execution.joins.BroadcastHashJoinExec
    import org.apache.spark.sql.types.{ArrayType, FloatType}
    val allow: Map[String, String] = Map(
      // blocked all-pairs cosine (the documented run-once exact
      // control): vectors are REPLICATED to block-pair keys and
      // shuffled so each block computes its pairwise cosines locally —
      // moving the vectors IS the operator, and the per-block volume
      // is bounded by the `maxBlockRows` require + escalation
      // (Dedup.scala block primitive). Not a hint miss.
      "q23_embedding_neardup" ->
        "block-pair-keyed vector replication is the all-pairs operator's bounded scale design",
      // r22: Skew.spreadIfNarrow's id-keyed REPARTITION_BY_NUM fires
      // ONLY when the scan yields fewer partitions than the session
      // knob — a single-file/filtered input, impossible for a
      // corpus-scale table at any sane split size — and exists to
      // spread the nPlanes·dim SRP sketch kernel that otherwise runs
      // entirely on the lone scan task (measured 1.56× at sf0.1).
      // On a multi-split corpus the guard disengages and no vector
      // ever crosses an exchange. Not a hint miss.
      "q56_srp_neardup" ->
        "narrow-guarded id-keyed spread before the SRP sketch kernel; no-op on any multi-split corpus")
    def isVec(dt: org.apache.spark.sql.types.DataType): Boolean = dt match {
      case ArrayType(FloatType, _) => true
      case _ => false
    }
    val offenders = scala.collection.mutable.ArrayBuffer.empty[String]
    for (name <- SparkEntry.queries.keys.toSeq.sorted if !allow.contains(name)) {
      val df = SparkEntry.queries(name)(spark, dir)
      val scansEmb = df.queryExecution.optimizedPlan.collect {
        case r: org.apache.spark.sql.execution.datasources.LogicalRelation
            if r.relation.isInstanceOf[
              org.apache.spark.sql.execution.datasources.HadoopFsRelation] &&
              r.relation
                .asInstanceOf[org.apache.spark.sql.execution.datasources.HadoopFsRelation]
                .location.rootPaths.mkString.contains("embeddings") => r
      }.nonEmpty
      if (scansEmb) {
        df.collect()
        val root = df.queryExecution.executedPlan
        collectAll(root) { case e: ShuffleExchangeExec => e }.foreach { ex =>
          val fromCorpus = collectAll(ex) {
            case s: FileSourceScanExec
                if s.relation.location.rootPaths.mkString.contains("embeddings") => s
          }.nonEmpty
          val carriesVec = ex.output.exists(a => isVec(a.dataType))
          // any broadcast hash join below the exchange is a bounded
          // cut (LeftSemi candidate prunes AND inner joins against a
          // broadcast id list both bound the exchanged row count);
          // the failure shape has the corpus scan feeding the
          // exchange with no such cut in between
          val pruned = collectAll(ex) {
            case j: BroadcastHashJoinExec => j
          }.nonEmpty
          if (fromCorpus && carriesVec && !pruned)
            offenders += s"$name: ${ex.outputPartitioning} over ${ex.output.map(_.name)}"
        }
      }
    }
    assert(offenders.isEmpty,
      s"un-pruned corpus-vector shuffles (missing broadcast hint?):\n${offenders.mkString("\n")}")
  }

  /** The text-payload half of the hint-class sweep: no shuffle
    * exchange may carry the raw `documents.text` column out of the
    * corpus scan without a broadcast-bounded cut below it. Same
    * failure class as the vector sweep (a bounded-by-contract frame
    * met by shuffling the whole corpus WITH its payload), different
    * payload column. Operators for which moving text once is the
    * design are allowlisted by name with the justification inline.
    */
  test("registry sweep: corpus text payload never feeds an un-pruned shuffle exchange") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import org.apache.spark.sql.execution.joins.BroadcastHashJoinExec
    val allow: Map[String, String] = Map.empty
    val offenders = scala.collection.mutable.ArrayBuffer.empty[String]
    for (name <- SparkEntry.queries.keys.toSeq.sorted if !allow.contains(name)) {
      val df = SparkEntry.queries(name)(spark, dir)
      val scansDocs = df.queryExecution.optimizedPlan.collect {
        case r: org.apache.spark.sql.execution.datasources.LogicalRelation
            if r.relation.isInstanceOf[
              org.apache.spark.sql.execution.datasources.HadoopFsRelation] &&
              r.relation
                .asInstanceOf[org.apache.spark.sql.execution.datasources.HadoopFsRelation]
                .location.rootPaths.mkString.contains("documents") => r
      }.nonEmpty
      if (scansDocs) {
        df.collect()
        val root = df.queryExecution.executedPlan
        collectAll(root) { case e: ShuffleExchangeExec => e }.foreach { ex =>
          val fromCorpus = collectAll(ex) {
            case s: FileSourceScanExec
                if s.relation.location.rootPaths.mkString.contains("documents") &&
                  s.output.exists(_.name == "text") => s
          }.nonEmpty
          val carriesText = ex.output.exists(_.name == "text")
          val bounded = collectAll(ex) {
            case j: BroadcastHashJoinExec => j
          }.nonEmpty
          if (fromCorpus && carriesText && !bounded)
            offenders += s"$name: ${ex.outputPartitioning} over ${ex.output.map(_.name)}"
        }
      }
    }
    assert(offenders.isEmpty,
      s"un-pruned corpus-text shuffles (missing broadcast hint?):\n${offenders.mkString("\n")}")
  }

  test("q135: one tokenization feeds both LM scorings; the draw is a TakeOrdered of scalars") {
    val df = SparkEntry.queries("q135_dsir_select")(spark, dir)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    // the candidate gram-frequency exchange is built once and REUSED by
    // the second scoring branch — without reuse the corpus tokenizes
    // twice (2× the dominant scan+explode cost at 100 TB)
    assert(plan.contains("ReusedExchange") || collectAll(df.queryExecution.executedPlan) {
        case r: org.apache.spark.sql.execution.exchange.ReusedExchangeExec => r
      }.nonEmpty,
      s"q135 lost the shared-gram-table exchange reuse:\n$plan")
    // the final k-cut is a TakeOrdered over id/micro scalars, never a
    // global sort of the corpus
    assert(plan.contains("TakeOrderedAndProject"),
      s"q135 selection cut must be a TakeOrdered:\n$plan")
    // text never keys a partitioning (the q101 doctrine, twice over)
    val exchanges = "hashpartitioning\\([^)]*\\)".r.findAllIn(plan).toSeq
    assert(exchanges.forall(e => !e.contains("text#")),
      s"document text crossed a shuffle:\n$exchanges")
    assert(!plan.toLowerCase.contains("scalaudf"), s"closure UDF on the q135 path:\n$plan")
  }

  test("q136: int8 search is one fused scan + TakeOrdered — no shuffle, no UDF, native kernels") {
    val plan = planOf("q136_int8_topk")
    assert(shuffles(plan) === 0, s"q136 must not shuffle (scan + TakeOrdered):\n$plan")
    assert(plan.contains("TakeOrderedAndProject"), s"q136 cut must be a TakeOrdered:\n$plan")
    assert(plan.contains("int8_cos"), s"q136 lost the fused quantize+cos kernel:\n$plan")
    assert(!plan.toLowerCase.contains("scalaudf"), s"closure UDF on the q136 path:\n$plan")
  }

  test("q138: IVF-SQ8 probe is a pruned fused scan; rerank stays in-plan — no shuffle beyond the 1-row combine") {
    val plan = planOf("q138_ivf_sq8")
    // cell routing + int8 scoring + exact rerank: all scan-side
    assert(plan.contains("nearest_cell"), s"q138 lost the cell-probe filter:\n$plan")
    assert(plan.contains("int8_cos"), s"q138 lost the quantized scoring kernel:\n$plan")
    assert(plan.contains("TakeOrderedAndProject"), s"q138 cuts must be TakeOrdered:\n$plan")
    // the only exchanges are the 1-row summary combines (SinglePartition)
    assert(shuffles(plan) === 0,
      s"q138 must not hash/range-shuffle (candidates are TakeOrdered-bounded):\n$plan")
    assert(!plan.toLowerCase.contains("scalaudf"), s"closure UDF on the q138 path:\n$plan")
  }

  test("q137: gopher gate is one fused native scan — no shuffle, no UDF") {
    val plan = planOf("q137_gopher_gate")
    assert(shuffles(plan) === 0, s"q137 must not shuffle:\n$plan")
    assert(plan.contains("gopher_stats"), s"q137 lost the native stats kernel:\n$plan")
    assert(!plan.toLowerCase.contains("scalaudf"), s"closure UDF on the q137 path:\n$plan")
  }

  test("q118: hot/cold split — hot lookups broadcast, cold shuffles never carry text, no UDFs") {
    val plan = planOf("q118_perplexity_hardened")
    // the split's whole point: the hot-key lookups are broadcast joins
    assert("BroadcastHashJoin".r.findAllIn(plan).length >= 3,
      s"hot lookups did not broadcast:\n$plan")
    "Exchange (hash|range)partitioning\\(([^)]*)\\)".r
      .findAllMatchIn(plan)
      .foreach(m => assert(!m.group(2).contains("text"), m.group(0)))
    assert(!plan.toLowerCase.contains("scalaudf"), s"closure UDF on the q118 path:\n$plan")
  }

  test("q120: auto-resolved hot keys ENGAGE the split on the collapsed corpus") {
    val plan = planOf("q120_perplexity_autoskew")
    // hotKeys = -1 must resolve to a positive K here (the collapse
    // puts ~half the mass on one unigram): the hot lookups broadcast,
    // exactly q118's audited shape — if auto mis-resolved to 0 the
    // plan collapses to q101's and this fails
    assert("BroadcastHashJoin".r.findAllIn(plan).length >= 3,
      s"auto mode did not engage the hot/cold split:\n$plan")
    "Exchange (hash|range)partitioning\\(([^)]*)\\)".r
      .findAllMatchIn(plan)
      .foreach(m => assert(!m.group(2).contains("text"), m.group(0)))
    assert(!plan.toLowerCase.contains("scalaudf"), s"closure UDF on the q120 path:\n$plan")
  }

  test("q119: filtered sweep reuses one candidate generation; shuffles carry ids/hashes, never text") {
    val plan = planOf("q119_threshold_sweep_filtered")
    "Exchange (hash|range)partitioning\\(([^)]*)\\)".r
      .findAllMatchIn(plan)
      .foreach(m => assert(!m.group(2).contains("text"), m.group(0)))
    // per-threshold filters run over ONE materialized pair table (the
    // q114 property, inherited via the shared sweep tail)
    assert(!plan.contains("shingle_hash_set"),
      s"candidate generation re-ran inside the sweep plan:\n$plan")
    assert(!plan.toLowerCase.contains("scalaudf"), s"closure UDF on the q119 path:\n$plan")
  }

  test("q110: overlap matrix shuffles (group, hash) longs; sizes broadcast; text never keys") {
    val plan = planOf("q110_source_overlap")
    "Exchange (hash|range)partitioning\\(([^)]*)\\)".r
      .findAllMatchIn(plan)
      .foreach(m => assert(!m.group(2).contains("text"), m.group(0)))
    assert(plan.contains("BroadcastHashJoin"), s"size table did not broadcast:\n$plan")
    assert(!plan.toLowerCase.contains("scalaudf"), s"closure UDF on the q110 path:\n$plan")
  }

  test("q153: domain boilerplate — text never keys an exchange; the rebuild join is id-keyed") {
    val plan = planOf("q153_domain_boilerplate")
    // no exchange is keyed by a text-derived string payload; the only
    // wide column that moves rides the doc_id-keyed rebuild join
    "Exchange (hash|range)partitioning\\(([^)]*)\\)".r
      .findAllMatchIn(plan)
      .foreach(m => assert(!m.group(2).contains("text") && !m.group(2).contains("seg#"),
        s"text keyed an exchange: ${m.group(0)}"))
    assert(plan.contains("cut_covered_spans"),
      s"q153 lost the doc-local span cut:\n$plan")
    assert(!plan.toLowerCase.contains("scalaudf"), s"closure UDF on the q153 path:\n$plan")
    // hot detection (distinct + (domain,lh) agg + doc gather) + rebuild:
    // bounded exchange count, no quadratic shapes
    assert(!plan.contains("CartesianProduct"), s"q153 went quadratic:\n$plan")
    assert(shuffles(plan) <= 6, s"q153 shuffle budget exceeded:\n$plan")
  }

  test("q154: embedding probe — scoring is a shuffle-free codes scan; vectors never exchange") {
    val plan = planOf("q154_embedding_probe")
    // training's 40 gradient jobs ran during construction; the RETURNED
    // plan is the apply: one scan of the checkpointed codes table
    assert(plan.contains("int8_dot"), s"q154 lost the native margin kernel:\n$plan")
    assert(shuffles(plan) == 0, s"q154 apply is scan-shaped:\n$plan")
    assert(!plan.contains("FileScan"), s"q154 re-scanned the embeddings:\n$plan")
    assert(!plan.toLowerCase.contains("scalaudf"), s"closure UDF on the q154 path:\n$plan")
  }

  test("q157: probe holdout — the q154 apply shape over the is_train-tagged checkpoint") {
    val plan = planOf("q157_probe_holdout")
    assert(plan.contains("int8_dot"), s"q157 lost the native margin kernel:\n$plan")
    assert(shuffles(plan) == 0, s"q157 apply is scan-shaped:\n$plan")
    assert(!plan.contains("FileScan"), s"q157 re-scanned the embeddings:\n$plan")
    assert(!plan.toLowerCase.contains("scalaudf"), s"closure UDF on the q157 path:\n$plan")
  }

  test("q160: probe calibration — q151's sweep shape over the held-out checkpoint, " +
      "plus one scalar accuracy broadcast") {
    val plan = planOf("q160_probe_calibration")
    assert(!plan.contains("FileScan"), s"q160 re-scanned the embeddings:\n$plan")
    // sweep aggregate + the 5-row selection window + the 1-row accuracy
    // aggregate — every exchange carries cutoff/accuracy scalars, never
    // scores or codes
    assert(shuffles(plan) <= 3, s"q160 shuffle budget exceeded:\n$plan")
    val exchanged = plan.linesIterator.filter(_.contains("partitioning")).mkString("\n")
    assert(!exchanged.contains("codes#") && !exchanged.contains("embedding#"),
      s"q160 shuffled a payload:\n$plan")
    assert(!plan.toLowerCase.contains("scalaudf"), s"closure UDF on the q160 path:\n$plan")
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastExchange"),
      s"q160 accuracy scalar did not broadcast:\n$plan")
  }

  test("q172: freeze-gated deploy — one decision row broadcast onto the scored checkpoint") {
    val plan = planOf("q172_freeze_gated_deploy")
    assert(!plan.contains("FileScan"), s"q172 re-scanned the embeddings:\n$plan")
    // the q160 sweep budget + the one-row decision aggregate; every
    // exchange carries cutoff/decision scalars, never scores or codes
    assert(shuffles(plan) <= 4, s"q172 shuffle budget exceeded:\n$plan")
    val exchanged = plan.linesIterator.filter(_.contains("partitioning")).mkString("\n")
    assert(!exchanged.contains("codes#") && !exchanged.contains("embedding#"),
      s"q172 shuffled a payload:\n$plan")
    assert(plan.contains("BroadcastNestedLoopJoin"),
      s"q172 decision row did not broadcast onto the scan:\n$plan")
    assert(!plan.toLowerCase.contains("scalaudf"), s"closure UDF on the q172 path:\n$plan")
  }

  test("q175: path blocklist — a pure scan, literal OR chain, zero exchanges") {
    val plan = planOf("q175_path_blocklist")
    assert(plan.contains("url_normalize"), s"q175 lost the normalize kernel:\n$plan")
    assert(shuffles(plan) == 0, s"q175 must not exchange (the prefix list is a literal):\n$plan")
    assert(!plan.contains("Join"), s"q175 must not join:\n$plan")
    assert(!plan.toLowerCase.contains("scalaudf"), s"closure UDF on the q175 path:\n$plan")
  }

  test("q159: blocklist — one broadcast probe, corpus side never shuffles") {
    val plan = planOf("q159_domain_blocklist")
    assert(plan.contains("BroadcastHashJoin"), s"blocklist did not broadcast:\n$plan")
    // the one permitted exchange is the LIST side's distinct (bounded
    // by the blocklist contract); the corpus side is scan → project →
    // broadcast probe with no exchange of its own
    assert(shuffles(plan) <= 1, s"q159 shuffled the corpus side:\n$plan")
    assert(!plan.toLowerCase.contains("scalaudf"), s"closure UDF on the q159 path:\n$plan")
  }

  test("q158: segment dedup is one native scan — no exchange, no UDF") {
    val plan = planOf("q158_segment_dedup")
    assert(plan.contains("dedup_segments"), s"q158 lost the native kernel:\n$plan")
    assert(shuffles(plan) == 0, s"q158 is a pure scan query:\n$plan")
    assert(!plan.toLowerCase.contains("scalaudf"), s"closure UDF on the q158 path:\n$plan")
  }

  test("q155: luhn scrub is one native scan — no exchange, no UDF, no regex fallback") {
    val plan = planOf("q155_luhn_scrub")
    assert(plan.contains("luhn_scrub"), s"q155 lost the native kernel:\n$plan")
    assert(shuffles(plan) == 0, s"q155 is a pure scan query:\n$plan")
    assert(!plan.toLowerCase.contains("scalaudf"), s"closure UDF on the q155 path:\n$plan")
  }

  test("q161: learned mixture — rates broadcast onto the corpus scan, zero shuffles") {
    val plan = planOf("q161_learned_mixture")
    // the trainer ran driver-side during construction (one aggregate,
    // collected K source rows); the RETURNED plan is the resample:
    // scan -> broadcast rate join -> scan-side hash keep predicate
    assert(plan.contains("BroadcastHashJoin"), s"q161 rates did not broadcast:\n$plan")
    assert(shuffles(plan) == 0, s"q161 corpus side shuffled:\n$plan")
    assert(!plan.toLowerCase.contains("scalaudf"), s"closure UDF on the q161 path:\n$plan")
    assert(!plan.contains("CartesianProduct"), s"q161 went quadratic:\n$plan")
  }

  test("q162: mod97 scrub is one native scan — no exchange, no UDF, no regex fallback") {
    val plan = planOf("q162_mod97_scrub")
    assert(plan.contains("mod97_scrub"), s"q162 lost the native kernel:\n$plan")
    assert(shuffles(plan) == 0, s"q162 is a pure scan query:\n$plan")
    assert(!plan.toLowerCase.contains("scalaudf"), s"closure UDF on the q162 path:\n$plan")
  }

  test("q163: BQ hamming top-k — one fused scan into a TakeOrdered heap, zero exchanges") {
    val plan = planOf("q163_bq_topk")
    assert(plan.contains("bq_hamming"), s"q163 lost the fused native kernel:\n$plan")
    assert(plan.contains("TakeOrderedAndProject"), s"q163 cut is not a top-k heap:\n$plan")
    assert(shuffles(plan) == 0, s"q163 is scan + heap, no exchange:\n$plan")
    assert(!plan.toLowerCase.contains("scalaudf"), s"closure UDF on the q163 path:\n$plan")
    // the word array must never materialize: no bq_codes in the plan
    assert(!plan.contains("bq_codes"), s"q163 materialized the code array:\n$plan")
  }

  test("q164: secret scrub is one native scan — no exchange, no UDF, no regex fallback") {
    val plan = planOf("q164_secret_scrub")
    assert(plan.contains("secret_scrub"), s"q164 lost the native kernel:\n$plan")
    assert(shuffles(plan) == 0, s"q164 is a pure scan query:\n$plan")
    assert(!plan.toLowerCase.contains("scalaudf"), s"closure UDF on the q164 path:\n$plan")
  }

  test("q168: template families — scan-side fingerprint, one 60-bit-keyed aggregate, no HTML in any exchange") {
    val plan = planOf("q168_template_families")
    assert(plan.contains("regexp_extract_all"), s"q168 lost the tag extraction:\n$plan")
    assert(shuffles(plan) <= 1, s"q168 is one partial+final aggregate:\n$plan")
    assert(!plan.toLowerCase.contains("scalaudf"), s"closure UDF on the q168 path:\n$plan")
    // the only exchange keys on the 60-bit fingerprint — never raw HTML
    val exchangeLines = plan.linesIterator.filter(_.contains("Exchange hashpartitioning")).toSeq
    assert(exchangeLines.forall(_.contains("tag_fp")),
      s"q168's exchange does not key on tag_fp:\n$plan")
    assert(exchangeLines.forall(l => !l.contains("raw")),
      s"q168 HTML crossed an exchange:\n$plan")
  }

  test("q167: BQ rerank — bounded candidate heap feeds the exact re-rank, zero exchanges") {
    val plan = planOf("q167_bq_rerank")
    assert(plan.contains("bq_hamming"), s"q167 lost the fused Hamming kernel:\n$plan")
    // two TakeOrdered cuts: the 200-candidate heap and the final top-10
    assert(
      "TakeOrderedAndProject".r.findAllIn(plan).size >= 2,
      s"q167 lost a top-k heap (candidate cut or re-rank):\n$plan")
    assert(shuffles(plan) == 0, s"q167 re-rank must not join or exchange:\n$plan")
    assert(!plan.toLowerCase.contains("scalaudf"), s"closure UDF on the q167 path:\n$plan")
  }

  test("q166: script stats is one native scan — no exchange, no UDF") {
    val plan = planOf("q166_script_stats")
    assert(plan.contains("script_stats"), s"q166 lost the native kernel:\n$plan")
    assert(shuffles(plan) == 0, s"q166 is a pure scan query:\n$plan")
    assert(!plan.toLowerCase.contains("scalaudf"), s"closure UDF on the q166 path:\n$plan")
  }

  test("q165: c4 clean is one native scan — no exchange, no UDF, no HOF chain") {
    val plan = planOf("q165_c4_clean")
    assert(plan.contains("c4_clean"), s"q165 lost the native kernel:\n$plan")
    assert(shuffles(plan) == 0, s"q165 is a pure scan query:\n$plan")
    assert(!plan.toLowerCase.contains("scalaudf"), s"closure UDF on the q165 path:\n$plan")
    // the CDC lesson: line logic must be the kernel, not interpreted
    // higher-order functions re-deriving filters per element
    assert(!plan.contains("ArrayFilter"), s"interpreted HOF on the q165 path:\n$plan")
  }

  test("q156: profile apply — fps broadcast onto docs, doc side never shuffles, native cut") {
    val plan = planOf("q156_boilerplate_profile")
    assert(plan.contains("cut_segments_by_fp"), s"q156 lost the native kernel:\n$plan")
    // the profile rolls up and BROADCASTS; the apply side has no exchange,
    // so the only shuffles are the mine's scalar aggregates
    assert(plan.contains("BroadcastHashJoin"), s"profile did not broadcast:\n$plan")
    "Exchange (hash|range)partitioning\\(([^)]*)\\)".r
      .findAllMatchIn(plan)
      .foreach(m => assert(!m.group(2).contains("text"),
        s"doc text keyed an exchange: ${m.group(0)}"))
    assert(shuffles(plan) <= 5, s"q156 shuffle budget exceeded:\n$plan")
    assert(!plan.toLowerCase.contains("scalaudf"), s"closure UDF on the q156 path:\n$plan")
  }

  test("q174: six-stage front door — both caps two-phase, neither text nor HTML in an exchange") {
    val plan = planOf("q174_front_door6")
    // the fingerprint/cap stages live BEFORE the composition's
    // localCheckpoint, so the final plan shows the tail kernels (the
    // fingerprint's own plan shape is audited standalone by q170)
    assert(plan.contains("cut_segments_by_fp") && plan.contains("c4_clean") &&
      plan.contains("gopher_stats"),
      s"q174 lost a stage kernel:\n$plan")
    assert(plan.contains("LeftAnti"), s"q174 lost a cap bypass/blocklist anti-join:\n$plan")
    "Exchange (hash|range)partitioning\\(([^)]*)\\)".r
      .findAllMatchIn(plan)
      .foreach(m => assert(!m.group(2).contains("text") && !m.group(2).contains("raw"),
        s"payload keyed an exchange: ${m.group(0)}"))
    // since r22 the five survivor totals ride ONE union-aggregate
    // broadcast (funnelCounts) — a single scalar cross-join, not five
    // sequential broadcast builds
    assert("BroadcastNestedLoopJoin BuildRight, Cross".r.findAllIn(plan).length == 1,
      s"q174 expects exactly one scalar count join (funnelCounts):\n$plan")
    assert(!plan.toLowerCase.contains("scalaudf"), s"closure UDF on the q174 path:\n$plan")
  }

  test("q173: SRP-expanded BQ rerank — expansion fused into the candidate scan, two heaps, zero exchanges") {
    val plan = planOf("q173_bq_rerank_srp")
    assert(plan.contains("srp_expand") && plan.contains("bq_hamming"),
      s"q173 lost the expansion or Hamming kernel:\n$plan")
    assert("TakeOrderedAndProject".r.findAllIn(plan).size >= 2,
      s"q173 lost a top-k heap (candidate cut or re-rank):\n$plan")
    assert(shuffles(plan) == 0, s"q173 must not join or exchange:\n$plan")
    assert(!plan.toLowerCase.contains("scalaudf"), s"closure UDF on the q173 path:\n$plan")
  }

  test("q171: script-routed gate is one fused native scan — no exchange, no UDF") {
    val plan = planOf("q171_script_routed_gate")
    assert(plan.contains("script_stats") && plan.contains("gopher_stats"),
      s"q171 lost a routing kernel:\n$plan")
    assert(shuffles(plan) == 0, s"q171 is a pure scan query:\n$plan")
    assert(!plan.toLowerCase.contains("scalaudf"), s"closure UDF on the q171 path:\n$plan")
  }

  test("q170: template cap — two-phase plan keyed on the 60-bit fingerprint, HTML never in an exchange") {
    val plan = planOf("q170_template_cap")
    assert(plan.contains("regexp_extract_all"), s"q170 lost the tag extraction:\n$plan")
    // under-cap families bypass via broadcast anti-join; over-cap
    // families window their own slice keyed on tag_fp
    assert(plan.contains("LeftAnti"), s"q170 lost the under-cap bypass:\n$plan")
    assert(plan.contains("Window"), s"q170 lost the over-cap window:\n$plan")
    val exchangeLines = plan.linesIterator
      .filter(_.contains("Exchange hashpartitioning")).toSeq
    assert(exchangeLines.forall(l => l.contains("tag_fp") || l.contains("__graft_over_g")),
      s"q170 exchange keys off the fingerprint:\n$plan")
    assert(exchangeLines.forall(l => !l.contains("raw")),
      s"q170 HTML crossed an exchange:\n$plan")
    assert(!plan.toLowerCase.contains("scalaudf"), s"closure UDF on the q170 path:\n$plan")
  }

  test("q169: composed front door — broadcast stages, domain-keyed exchanges only, scalar count frames") {
    val plan = planOf("q169_front_door")
    // all three native stage kernels survive into the fused plan
    assert(plan.contains("cut_segments_by_fp") && plan.contains("c4_clean") &&
      plan.contains("gopher_stats"), s"q169 lost a stage kernel:\n$plan")
    // blocklist is a broadcast anti-probe; the profile broadcasts back
    assert(plan.contains("LeftAnti"), s"q169 blocklist is not an anti-join:\n$plan")
    assert(plan.contains("BroadcastHashJoin"), s"q169 lost its broadcasts:\n$plan")
    // no partitioning expression ever carries document text
    "Exchange (hash|range)partitioning\\(([^)]*)\\)".r
      .findAllMatchIn(plan)
      .foreach(m => assert(!m.group(2).contains("text"),
        s"doc text keyed an exchange: ${m.group(0)}"))
    // the four survivor totals attach as ONE one-row scalar broadcast
    // (funnelCounts union-aggregate) since r22
    assert("BroadcastNestedLoopJoin BuildRight, Cross".r.findAllIn(plan).length == 1,
      s"q169 expects exactly one scalar count join (funnelCounts):\n$plan")
    // shuffle budget: quota window + blocklist build + the mine's
    // scalar aggregates — the corpus-sized apply/C4/gate side is
    // exchange-free
    assert(shuffles(plan) <= 8, s"q169 shuffle budget exceeded:\n$plan")
    assert(!plan.toLowerCase.contains("scalaudf"), s"closure UDF on the q169 path:\n$plan")
  }
}
