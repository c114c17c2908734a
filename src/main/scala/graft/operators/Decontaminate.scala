package graft.operators

import graft.functions.TextFunctions
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Benchmark decontamination — the standard pre-training hygiene step:
  * flag (or drop) training documents that share word n-grams with an
  * evaluation/benchmark set, so test data doesn't leak into training.
  * (Reference analogue: none; training-data-pipeline extension.)
  *
  * Mechanics: both sides reduce to per-doc SORTED DISTINCT 60-bit n-gram
  * hash sets in one scan-side pass (longs on the wire, no string
  * shuffle, no `.distinct()` shuffle — same discipline as the dedup
  * pipelines). The benchmark side collapses to its distinct hash
  * universe and BROADCASTS: benchmarks are a few thousand documents
  * against a 100 TB corpus, so the contamination check is a map-side
  * hash-join — one corpus scan, zero corpus shuffles before the final
  * per-doc count aggregation.
  */
object Decontaminate {

  /** `(doc_id, n_shared)` for every training doc sharing ≥ 1 distinct
    * n-gram with the benchmark set; `n_shared` counts distinct shared
    * n-gram hashes.
    */
  def overlaps(
      train: DataFrame,
      benchmark: DataFrame,
      idCol: String,
      textCol: String,
      n: Int): DataFrame = {
    val hashes = (c: org.apache.spark.sql.Column) =>
      graft.functions.expressions.ShingleHashSetExpr.shingleHashSet(c, n)
    val benchHashes = benchmark
      .select(explode(hashes(col(textCol))).alias("h"))
      .distinct()
    val trainHashes = train
      .select(col(idCol).alias("doc_id"), explode(hashes(col(textCol))).alias("h"))
    trainHashes
      .join(broadcast(benchHashes), Seq("h"))
      .groupBy("doc_id")
      .agg(count(lit(1)).alias("n_shared"))
  }

  /** Training docs with every contaminated document removed — the
    * filter form (left anti on the overlap set).
    */
  def clean(
      train: DataFrame,
      benchmark: DataFrame,
      idCol: String,
      textCol: String,
      n: Int): DataFrame =
    train.join(
      overlaps(train, benchmark, idCol, textCol, n)
        .select(col("doc_id").alias(idCol)),
      Seq(idCol), "left_anti")

  /** Span-level decontamination — instead of dropping a contaminated
    * document wholesale ([[clean]]), CUT only the tokens inside
    * benchmark-matching k-gram windows: a training doc that quotes one
    * benchmark item keeps its unique remainder instead of disappearing
    * (the ExactSubstr surgical recipe of Lee et al., ACL 2022, aimed at
    * eval-set leakage instead of cross-document duplication —
    * [[graft.operators.Dedup.duplicateSpans]]'s machinery with the
    * dup-detection aggregate replaced by the broadcast benchmark
    * membership probe).
    *
    * Scale shape: the benchmark hash universe broadcasts (same argument
    * as [[overlaps]]); ONE corpus scan builds position-ordered gram
    * hashes (native `shingle_hash60s`); matching gram START positions
    * gather per doc through one aggregate (one int per matching gram —
    * no covered-position amplification); the cut is the doc-local
    * `cut_covered_spans` interval union. The corpus text itself crosses
    * the wire exactly once (the final doc-keyed join); nothing explodes
    * through a shuffle.
    *
    * Emits `(doc_id, clean_text, n_kept, n_removed)` for EVERY training
    * doc (unmatched docs pass through uncut); null text behaves as the
    * empty document.
    */
  def scrubSpans(
      train: DataFrame,
      benchmark: DataFrame,
      idCol: String,
      textCol: String,
      k: Int): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val benchHashes = benchmark
      .select(explode(
        graft.functions.expressions.ShingleHashSetExpr
          .shingleHashSet(col(textCol), k)).alias("h"))
      .distinct()
    val base = train
      .select(
        col(idCol).alias("doc_id"),
        graft.functions.expressions.TokensExpr.tokens(col(textCol)).alias("t"),
        graft.functions.expressions.ShingleHash60sExpr
          .shingleHash60s(col(textCol), k).alias("hs"))
      .localCheckpoint(true)
    val starts = base
      .select(col("doc_id"), posexplode(col("hs")).as(Seq("pos", "h")))
      .join(broadcast(benchHashes), Seq("h"))
      .groupBy("doc_id")
      .agg(collect_list(col("pos")).alias("starts"))
    base
      .join(starts, Seq("doc_id"), "left")
      .select(
        col("doc_id"),
        col("t"),
        graft.functions.expressions.CutCoveredSpansExpr.cutCoveredSpans(
          col("t"), coalesce(col("starts"), typedlit(Array.empty[Int])), k).alias("kept"))
      .select(
        col("doc_id"),
        concat_ws(" ", col("kept")).alias("clean_text"),
        size(col("kept")).cast("long").alias("n_kept"),
        (size(col("t")) - size(col("kept"))).cast("long").alias("n_removed"))
  }

  /** Bloom-filter variant of [[clean]] — the scale path when the
    * benchmark hash universe itself is too large to broadcast exactly
    * (e.g. decontaminating against a full eval SUITE of millions of
    * n-grams): build a Bloom filter over the benchmark hashes with
    * `DataFrameStatFunctions.bloomFilter` (distributed build, sketch to
    * the driver, broadcast once — `expectedItems`/`fpp` bound its size
    * independent of the corpus), probe it scan-side.
    *
    * One-sided error: false POSITIVES only, so the result is a SUBSET of
    * the exact [[clean]] output — decontamination stays sound (no
    * contaminated doc survives); at most `fpp` of clean docs are
    * over-dropped. That direction is the one a careful pipeline wants.
    */
  def cleanApprox(
      train: DataFrame,
      benchmark: DataFrame,
      idCol: String,
      textCol: String,
      n: Int,
      expectedItems: Long = 1000000L,
      fpp: Double = 0.01): DataFrame = {
    val hashes = (c: org.apache.spark.sql.Column) =>
      graft.functions.expressions.ShingleHashSetExpr.shingleHashSet(c, n)
    val bloom = benchmark
      .select(explode(hashes(col(textCol))).alias("h"))
      .stat.bloomFilter("h", expectedItems, fpp)
    // probe via Spark's native BloomFilterMightContain (the expression
    // runtime-filter joins use): the serialized sketch rides the plan as
    // a binary literal and the probe stays inside whole-stage codegen —
    // a closure UDF here would box a Long per n-gram occurrence
    val bos = new java.io.ByteArrayOutputStream()
    bloom.writeTo(bos)
    import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
    import org.apache.spark.sql.graftbridge.Bridge
    def probe(h: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
      Bridge.column(new BloomFilterMightContain(
        Literal.create(bos.toByteArray, org.apache.spark.sql.types.BinaryType),
        Bridge.expression(h)))
    val flagged = train
      .select(col(idCol), explode(hashes(col(textCol))).alias("h"))
      .filter(probe(col("h")))
      .select(idCol)
      .distinct()
    train.join(flagged, Seq(idCol), "left_anti")
  }
}
