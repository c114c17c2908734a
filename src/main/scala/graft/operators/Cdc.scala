package graft.operators

import graft.functions.TextFunctions
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Content-defined chunking — the byte-level dedup primitive for
  * opaque payloads (the multimodal binary columns of q27, raw crawl
  * bodies, any column where token-level shingles don't apply). A
  * fixed-size blocking scheme breaks under a single inserted byte
  * (every later block shifts); CDC cuts where the CONTENT says to —
  * at positions whose trailing window hashes to a sentinel residue —
  * so an insertion re-chunks only the span it lands in and every
  * later chunk fingerprint survives verbatim. This is the
  * rsync/LBFS/FastCDC family (public literature) restated
  * declaratively.
  *
  * Spark-first shape: boundary detection and chunk fingerprinting are
  * ONE native scan kernel
  * ([[graft.functions.expressions.CdcChunkHashesExpr]] — one md5 per
  * position plus one per chunk, whole-stage-codegen'd); a corpus-wide
  * duplicate-chunk analysis adds a single hash aggregate on the
  * (scalar) chunk fingerprints. The window hash is the repo-wide
  * md5-60 scheme, so the DuckDB oracle reproduces every boundary and
  * fingerprint bit-for-bit (q125). The declarative
  * higher-order-function form of the same arithmetic is kept as
  * [[chunkHashesComposed]] — HOF lambdas evaluate interpreted and
  * re-derive the boundary filter once per chunk (quadratic md5s), so
  * it exists only as the parity-spec readable definition.
  *
  * Statelessness trade, documented: classic CDC imposes min/max chunk
  * sizes, which makes each boundary depend on the previous one — a
  * sequential fold. This variant cuts at EVERY sentinel position
  * (expected chunk length = `divisor` bytes), keeping boundaries
  * independent and the whole computation a per-row projection; a
  * pathological payload (the sentinel window repeated) yields
  * 1-byte chunks where FastCDC would floor at min-size — acceptable
  * for fingerprinting, where tiny chunks cost space, not correctness.
  *
  * Payloads are chunked as STRINGS (the fixture's text; binary
  * columns hex-encode first — deterministic and order-preserving).
  */
object Cdc {

  /** 0-based cut positions (cut AFTER the i-th character, 1-based i):
    * every `i >= window` where the trailing `window` chars hash to
    * residue 0 mod `divisor`.
    */
  private def cuts(text: Column, window: Int, divisor: Int): Column =
    // guard: sequence(a, b) DESCENDS when a > b, so a payload shorter
    // than the window must short-circuit to "no cuts"
    when(length(text) < window, array().cast("array<int>"))
      .otherwise(filter(
        sequence(lit(window), length(text)),
        i =>
          pmod(
            TextFunctions.md5Hash60(text.substr(i - lit(window - 1), lit(window))),
            lit(divisor.toLong)) === 0))

  /** Per-chunk 60-bit fingerprints, in payload order. Empty payloads
    * and nulls yield an empty array / null respectively; a cut at the
    * very end produces no empty tail chunk. Backed by the native
    * codegen kernel; [[chunkHashesComposed]] is the built-in-function
    * statement of the same arithmetic (parity spec-pinned).
    */
  def chunkHashes(text: Column, window: Int = 8, divisor: Int = 16): Column = {
    require(window >= 1 && divisor >= 1, s"need window/divisor >= 1, got $window/$divisor")
    graft.functions.expressions.CdcChunkHashesExpr.cdcChunkHashes(text, window, divisor)
  }

  /** [[chunkHashes]] restated as built-in higher-order functions —
    * interpreted (and quadratic: the boundary array is re-derived per
    * chunk element), so NEVER on a registry path; the parity spec runs
    * it against the kernel as an executable specification.
    */
  def chunkHashesComposed(text: Column, window: Int = 8, divisor: Int = 16): Column = {
    require(window >= 1 && divisor >= 1, s"need window/divisor >= 1, got $window/$divisor")
    val b = concat(array(lit(0)), cuts(text, window, divisor), array(length(text)))
    filter(
      transform(
        sequence(lit(2), size(b)),
        j => {
          val lo = element_at(b, j - lit(1))
          val hi = element_at(b, j)
          when(hi > lo, TextFunctions.md5Hash60(text.substr(lo + lit(1), hi - lo)))
        }),
      h => h.isNotNull)
  }

  /** Corpus duplicate-chunk profile: per doc, the chunk count and how
    * many of its chunks also occur in ANOTHER doc (`dup_chunks`, plus
    * `dup_ratio_micro = round(1e6 * dup/n)`; docs with no chunks —
    * null/empty payloads — report 0/0 with a null ratio).
    *
    * One payload pass: the scan explodes to scalar `(fingerprint,
    * doc_id)` rows and everything after is fingerprint-keyed
    * arithmetic — a per-(chunk, doc) pre-aggregate, a window count of
    * distinct docs per fingerprint (no extra pass over the data, one
    * exchange on the fingerprint), and the per-doc rollup. A chunk
    * repeated WITHIN a doc is not a cross-doc dup, but every
    * occurrence of a shared chunk counts toward the doc's dup mass.
    */
  /** Chunk-CONTAINMENT dedup — the action form of [[dupChunkProfile]]:
    * a document is dropped when ≥ `maxCoveredMicro` of its chunk mass
    * is OWNED by an earlier document (owner = smallest doc id sharing
    * the chunk fingerprint — the deterministic keep-best rule the
    * exact tier uses). This catches PARTIAL duplication token shingles
    * under-weight: a page that is 80% boilerplate plus a fresh
    * paragraph, a re-upload with a prepended header, an append-only
    * log re-crawl — byte-level containment, not whole-document
    * similarity (q102 is token-set containment; this is its opaque-
    * payload sibling).
    *
    * Scale shape: identical to the profile — the payload never leaves
    * the scan (chunk fingerprints explode to scalars), ownership is
    * one window min over the fingerprint key, and the rollup is
    * per-doc arithmetic. Ties cannot happen (owner of a doc's own
    * chunk is ≤ its id); a doc with no chunks (empty payload) is kept.
    */
  def containmentDedup(
      df: DataFrame,
      idCol: String,
      contentCol: String,
      window: Int = 8,
      divisor: Int = 16,
      maxCoveredMicro: Long = 500000L): DataFrame = {
    require(maxCoveredMicro >= 0, s"need maxCoveredMicro >= 0, got $maxCoveredMicro")
    val chunks = df
      .select(col(idCol).alias("doc_id"),
        explode(chunkHashes(col(contentCol), window, divisor)).alias("h"))
      .groupBy("h", "doc_id").agg(count(lit(1)).alias("c"))
    val byFingerprint = org.apache.spark.sql.expressions.Window.partitionBy("h")
    val perDoc = chunks
      .withColumn("owner", min("doc_id").over(byFingerprint))
      .groupBy("doc_id")
      .agg(
        sum("c").alias("n_chunks"),
        sum(when(col("owner") < col("doc_id"), col("c")).otherwise(lit(0L)))
          .alias("borrowed_chunks"))
    df.select(col(idCol).alias("doc_id"))
      .join(perDoc, Seq("doc_id"), "left")
      .na.fill(0L, Seq("n_chunks", "borrowed_chunks"))
      .select(
        col("doc_id"), col("n_chunks"), col("borrowed_chunks"),
        when(col("n_chunks") > 0,
          round(col("borrowed_chunks") * lit(1000000.0) / col("n_chunks")).cast("long"))
          .alias("covered_micro"))
      .withColumn("keep",
        col("covered_micro").isNull || col("covered_micro") < maxCoveredMicro)
  }

  def dupChunkProfile(
      df: DataFrame,
      idCol: String,
      contentCol: String,
      window: Int = 8,
      divisor: Int = 16): DataFrame = {
    val chunks = df
      .select(col(idCol).alias("doc_id"),
        explode(chunkHashes(col(contentCol), window, divisor)).alias("h"))
    val perChunkDoc = chunks.groupBy("h", "doc_id").agg(count(lit(1)).alias("c"))
    val byFingerprint = org.apache.spark.sql.expressions.Window.partitionBy("h")
    val perDoc = perChunkDoc
      .withColumn("n_docs", count(lit(1)).over(byFingerprint))
      .groupBy("doc_id")
      .agg(
        sum("c").alias("n_chunks"),
        sum(when(col("n_docs") > 1, col("c")).otherwise(lit(0L))).alias("dup_chunks"))
    df.select(col(idCol).alias("doc_id"))
      .join(perDoc, Seq("doc_id"), "left")
      .na.fill(0L, Seq("n_chunks", "dup_chunks"))
      .select(
        col("doc_id"), col("n_chunks"), col("dup_chunks"),
        when(col("n_chunks") > 0,
          round(col("dup_chunks") * lit(1000000.0) / col("n_chunks")).cast("long"))
          .alias("dup_ratio_micro"))
  }
}
