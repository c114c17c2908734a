package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Group-relative quality pruning — the "drop the worst X% per
  * language/domain" step of a pre-training pipeline (per-group
  * thresholds, because an absolute quality cut calibrated on English
  * would gut every other language). (Reference analogue: none;
  * training-data-pipeline extension.)
  *
  * Scale shape: the per-group thresholds are ONE small aggregate over
  * `(group, score)` scalars — groups are languages/domains/sources,
  * i.e. FEW — broadcast back onto the corpus for a map-side filter.
  * The corpus itself never sorts, never range-partitions, and crosses
  * no extra exchange: the only wire traffic beyond the threshold
  * summary is the one scan it already owed the downstream consumer.
  * (A per-row `percent_rank` window would instead sort every group's
  * full corpus slice — the shape this operator exists to avoid.)
  */
object QualityPrune {

  /** q37's interpolated-percentile arithmetic over a pre-sorted array
    * column — `lo + (hi - lo) * frac`, bit-identical in Spark and the
    * DuckDB oracle.
    */
  private def pctOfSorted(arr: Column, p: Double): Column = {
    val pos = (size(arr) - 1).cast("double") * lit(p)
    val idx = floor(pos).cast("int")
    val frac = pos - idx.cast("double")
    val lo = element_at(arr, idx + 1)
    val hi = element_at(arr, least(idx + lit(2), size(arr)))
    lo + (hi - lo) * frac
  }

  /** Keeps rows whose `scoreCol` is at or above their group's `q`-th
    * quantile (q = 0.25 drops each group's worst quartile). Exact mode
    * (default) computes the threshold from the group's full sorted
    * score list — deterministic, oracle-matchable, and fine whenever
    * per-group row counts fit an executor (the fixture gate). At true
    * 100 TB group sizes pass `approx = true`: `percentile_approx`'s
    * bounded sketch (map-side combinable) replaces the sorted list and
    * the plan shape — summary aggregate, broadcast, map-side filter —
    * stays identical, with the documented rank-error tolerance as the
    * only difference.
    */
  def pruneByGroupQuantile(
      df: DataFrame,
      groupCol: String,
      scoreCol: String,
      q: Double,
      approx: Boolean = false,
      accuracy: Int = 10000): DataFrame = {
    require(q > 0.0 && q < 1.0, s"q must be in (0,1), got $q")
    // fail loud on column collisions rather than producing an ambiguous
    // join or silently dropping a caller column (same guard class as
    // Sharding.assign)
    Seq("__graft_grp", "thr").foreach { reserved =>
      require(!df.columns.contains(reserved),
        s"input already has a '$reserved' column, which this operator reserves")
    }
    // a group whose scores are ALL null contributes an empty sorted
    // array (exact) / a null sketch result (approx); drop its threshold
    // row — with an inner join that is identical to "every row of the
    // group drops" (null >= anything is never true), and it keeps
    // pctOfSorted off the empty array it cannot index
    val thresholds =
      if (approx)
        df.groupBy(groupCol)
          .agg(percentile_approx(col(scoreCol), lit(q), lit(accuracy)).as("thr"))
          .filter(col("thr").isNotNull)
      else
        df.groupBy(groupCol)
          .agg(sort_array(collect_list(col(scoreCol))).as("arr"))
          .filter(size(col("arr")) > 0)
          .select(col(groupCol), pctOfSorted(col("arr"), q).as("thr"))
    // null-safe join (`<=>`), matching capPerGroup: a null group is a
    // group like any other — it gets its own threshold row instead of
    // being silently dropped by an equi-join. (Null SCORES still drop:
    // `null >= thr` is never true, and a group's threshold is computed
    // over its non-null scores only.)
    val thr = thresholds.withColumnRenamed(groupCol, "__graft_grp")
    df.join(broadcast(thr), col(groupCol) <=> col("__graft_grp"))
      .filter(col(scoreCol) >= col("thr"))
      .drop("__graft_grp", "thr")
  }

  /** The Gopher document-quality gate (Rae et al. 2021, Appendix A1.1):
    * seven ABSOLUTE rules over one
    * [[graft.functions.expressions.GopherStatsExpr]] scan pass — word
    * count in `[minTokens, maxTokens]`, mean word length in
    * `[minMeanLen, maxMeanLen]`, ≥ `minAlphaFrac` of words containing
    * an alphabetic character, ≥ `minStopHits` distinct members of the
    * fixed 8-word stop set, ≤ `maxEllipsisFrac` of lines ending in an
    * ellipsis, ≤ `maxBulletFrac` of lines starting with a bullet, and
    * a `#`/`…` symbol-to-word ratio ≤ `maxSymbolRatio`. The complement
    * of [[pruneByGroupQuantile]]: absolute floors that don't shift with
    * corpus quality (a corpus that is 90 % spam should FAIL 90 %, not
    * keep its best spam).
    *
    * Emits every rule input and every flag plus `keep` and the
    * first-failing `fail_reason` — the auditable form (a filter that
    * only returns survivors can't tell you WHY the corpus shrank 40 %).
    * Scale shape: one native-codegen scan projection + scalar
    * comparisons; no shuffle, no UDF, nothing driver-side. Null text
    * fails every rule (`fail_reason = 'len'`).
    */
  def gopherGate(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      minTokens: Long = 50L,
      maxTokens: Long = 100000L,
      minMeanLen: Double = 3.0,
      maxMeanLen: Double = 10.0,
      minAlphaFrac: Double = 0.8,
      minStopHits: Long = 2L,
      maxEllipsisFrac: Double = 0.3,
      maxBulletFrac: Double = 0.9,
      maxSymbolRatio: Double = 0.1): DataFrame = {
    val g = graft.functions.expressions.GopherStatsExpr.gopherStats(col(textCol))
    val st = docs.select(col(idCol), g.as("g"))
      .select(
        col(idCol),
        col("g.n_tokens").as("n_tokens"),
        col("g.mean_token_len").as("mean_token_len"),
        col("g.frac_alpha").as("frac_alpha"),
        col("g.n_stop_hits").as("n_stop_hits"),
        col("g.frac_ellipsis_lines").as("frac_ellipsis_lines"),
        col("g.frac_bullet_lines").as("frac_bullet_lines"),
        col("g.symbol_ratio").as("symbol_ratio"))
    val rules = gopherRules(col, minTokens, maxTokens, minMeanLen, maxMeanLen,
      minAlphaFrac, minStopHits, maxEllipsisFrac, maxBulletFrac, maxSymbolRatio)
    val flagged = rules.foldLeft(st) { case (df, (name, rule)) =>
      df.withColumn(s"r_$name", coalesce(rule, lit(false)))
    }
    flagged
      .withColumn("keep",
        rules.map { case (name, _) => col(s"r_$name") }.reduce(_ && _))
      .withColumn("fail_reason",
        rules.tail.foldLeft(when(!col(s"r_${rules.head._1}"), rules.head._1)) {
          case (c, (name, _)) => c.when(!col(s"r_$name"), name)
        })
  }

  /** The seven rule predicates over a field accessor — ONE definition
    * shared by [[gopherGate]] (flat columns, per-rule flags) and
    * [[keepByGopher]] (struct fields, one AND), so the enforcement
    * filter can never drift from the audit report.
    */
  private[graft] def gopherRules(
      f: String => Column,
      minTokens: Long, maxTokens: Long,
      minMeanLen: Double, maxMeanLen: Double,
      minAlphaFrac: Double, minStopHits: Long,
      maxEllipsisFrac: Double, maxBulletFrac: Double,
      maxSymbolRatio: Double): Seq[(String, Column)] = Seq(
    "len" -> (f("n_tokens") >= minTokens && f("n_tokens") <= maxTokens),
    "mean_len" -> (f("mean_token_len") >= minMeanLen &&
      f("mean_token_len") <= maxMeanLen),
    "alpha" -> (f("frac_alpha") >= minAlphaFrac),
    "stop" -> (f("n_stop_hits") >= minStopHits),
    "ellipsis" -> (f("frac_ellipsis_lines") <= maxEllipsisFrac),
    "bullet" -> (f("frac_bullet_lines") <= maxBulletFrac),
    "symbol" -> (f("symbol_ratio") <= maxSymbolRatio))

  /** [[gopherGate]] as a row FILTER that keeps the input's own columns —
    * the form that composes: `startUnified(keepByGopher(stream, ...),
    * ...)` puts the heuristic gate in front of a streaming ingest as a
    * stateless projection+filter (no state, no watermark, replay-safe
    * because it is a pure function of each row), and batch pipelines
    * chain it like any other transform. The audit form (flags +
    * fail_reason) stays [[gopherGate]]; this is the enforcement form.
    * Null text fails closed here too.
    */
  def keepByGopher(
      docs: DataFrame,
      textCol: String,
      minTokens: Long = 50L,
      maxTokens: Long = 100000L,
      minMeanLen: Double = 3.0,
      maxMeanLen: Double = 10.0,
      minAlphaFrac: Double = 0.8,
      minStopHits: Long = 2L,
      maxEllipsisFrac: Double = 0.3,
      maxBulletFrac: Double = 0.9,
      maxSymbolRatio: Double = 0.1): DataFrame = {
    val g = graft.functions.expressions.GopherStatsExpr.gopherStats(col(textCol))
    val pass = gopherRules(g.getField, minTokens, maxTokens, minMeanLen,
      maxMeanLen, minAlphaFrac, minStopHits, maxEllipsisFrac, maxBulletFrac,
      maxSymbolRatio).map(_._2).reduce(_ && _)
    docs.filter(coalesce(pass, lit(false)))
  }

  /** The C4 line-level cleaning rules (Raffel et al. 2020 §2.2) — the
    * SALVAGE member of the quality family: where [[gopherGate]] judges
    * a whole document, this drops its boilerplate LINES (no terminal
    * punctuation / under `minWords` words / "javascript" boilerplate)
    * and keeps the prose, with the paper's page-level vetoes (`{`,
    * "lorem ipsum") riding along as audit columns. One native
    * `c4_clean` scan pass ([[graft.functions.expressions.C4CleanExpr]]),
    * no shuffle, no UDF — the auditable form: every input row +
    * `clean_text`/`n_lines`/`n_kept`/`has_brace`/`has_lorem`/`keep`.
    */
  def c4Clean(
      docs: DataFrame,
      textCol: String,
      minWords: Int = 5,
      minKeptLines: Int = 3): DataFrame = {
    val c = graft.functions.expressions.C4CleanExpr
      .c4Clean(col(textCol), minWords, minKeptLines)
    docs
      .withColumn("__c4", c)
      .withColumn("clean_text", col("__c4.clean_text"))
      .withColumn("n_lines", col("__c4.n_lines"))
      .withColumn("n_kept", col("__c4.n_kept"))
      .withColumn("has_brace", col("__c4.has_brace"))
      .withColumn("has_lorem", col("__c4.has_lorem"))
      .withColumn("keep", col("__c4.keep"))
      .drop("__c4")
  }

  /** Script-ROUTED quality gate (round 20): consume the
    * [[graft.functions.expressions.ScriptStatsExpr]] `main_script`
    * signal (q166 — "the multilingual front door's FIRST routing
    * signal") to select the gate ARTIFACT per script, instead of
    * pushing every page through the Latin-trained rule set — the C4
    * starvation lesson, multilingual edition: a CJK page has
    * `frac_alpha = 0` and zero English stop hits, so the q137 gate
    * silently drops entire non-Latin populations; routing sends each
    * script to rules that can actually measure it.
    *
    * Routes (the artifact name is emitted so the decision is
    * auditable):
    *  - `latin` → `latin_gate`: the full seven-rule Gopher gate
    *    (Latin-trained stop list and `[a-z]` alpha fraction apply);
    *  - `greek`/`cyrillic`/`arabic` → `nostop_gate`: the Gopher
    *    rules MINUS the two Latin-trained ones (stop hits, alpha
    *    fraction) — token shape, length, and symbol rules still
    *    apply to space-separated scripts;
    *  - `cjk`/`kana`/`hangul` → `charcount_gate`: token rules are
    *    meaningless for space-free scripts; keep on letter MASS
    *    (`n_cjk + n_kana + n_hangul >= minLetters`);
    *  - `none` (no classified letters, incl. null text) → `drop`.
    *
    * Output: every input row's `(id, main_script, route, keep)` —
    * the audit form. One fused native scan (both kernels are codegen
    * expressions over the same column), zero exchanges, no UDF.
    */
  def scriptRoutedGate(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      minTokens: Long = 25L,
      minStopHits: Long = 1L,
      minLetters: Long = 20L): DataFrame = {
    val st = docs.select(
      col(idCol),
      graft.functions.expressions.ScriptStatsExpr.scriptStats(col(textCol)).as("sc"),
      graft.functions.expressions.GopherStatsExpr.gopherStats(col(textCol)).as("g"))
    val main = col("sc.main_script")
    val g: String => Column = f => col(s"g.$f")
    val all = gopherRules(g, minTokens, 100000L, 3.0, 10.0, 0.8, minStopHits,
      0.3, 0.9, 0.1)
    val latinKeep = all.map(_._2).reduce(_ && _)
    val noStopKeep = all
      .filterNot { case (name, _) => name == "alpha" || name == "stop" }
      .map(_._2).reduce(_ && _)
    val letters = col("sc.n_cjk") + col("sc.n_kana") + col("sc.n_hangul")
    st.select(
      col(idCol),
      coalesce(main, lit("none")).alias("main_script"),
      when(main === "latin", lit("latin_gate"))
        .when(main.isin("cjk", "kana", "hangul"), lit("charcount_gate"))
        .when(main.isin("greek", "cyrillic", "arabic"), lit("nostop_gate"))
        .otherwise(lit("drop")).alias("route"),
      coalesce(
        when(main === "latin", latinKeep)
          .when(main.isin("cjk", "kana", "hangul"), letters >= minLetters)
          .when(main.isin("greek", "cyrillic", "arabic"), noStopKeep)
          .otherwise(lit(false)),
        lit(false)).alias("keep"))
  }

  /** [[c4Clean]]'s enforcement form: surviving pages only, their
    * `textCol` REPLACED by the cleaned line-joined text — the
    * stateless projection+filter shape that chains in front of any
    * streaming ingest (the [[keepByGopher]] composition rule). Null
    * text fails closed.
    */
  def keepByC4(
      docs: DataFrame,
      textCol: String,
      minWords: Int = 5,
      minKeptLines: Int = 3): DataFrame = {
    val c = graft.functions.expressions.C4CleanExpr
      .c4Clean(col(textCol), minWords, minKeptLines)
    docs
      .withColumn("__c4", c)
      .filter(coalesce(col("__c4.keep"), lit(false)))
      .withColumn(textCol, col("__c4.clean_text"))
      .drop("__c4")
  }
}
