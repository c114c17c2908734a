package graft.tools

import graft.operators.{Bpe, Chunker, Components, Decontaminate, Dedup, Sharding}
import graft.tables.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** End-to-end batch training-data pipeline over the fixture corpus —
  * the composition proof: every stage is the same library operator the
  * registry oracle-checks individually, chained the way a 100 TB
  * pretraining run would chain them, timed per stage.
  *
  *   extract (html_to_text over a deterministic markup wrap, q121's
  *            template) →
  *   canonical-URL keep-best (url_normalize group key, q146) →
  *   per-domain quota (registrable_domain rollup + two-phase cap,
  *            q147) →
  *   quality/langid gate (native quality_stats + lang_id scans) →
  *   exact dedup (fingerprint representative, q17) →
  *   near-dup keep-best (MinHash-LSH pairs → connected components →
  *            argmax representative, q20/q49/q76) →
  *   decontamination (Bloom-prefiltered exact gram overlap vs the
  *            benchmark slice, q86) →
  *   tokenize (BPE merge table + reassembly-free counts, q93/q95) →
  *   pack (budgeted sequence packing, q95) →
  *   shard (seeded manifest, q97)
  *
  * Stage boundaries are `localCheckpoint`ed so each timer measures its
  * own stage, not upstream recompute; the surviving-doc frame that
  * crosses a boundary carries ONLY `(doc_id, lang, source, text)`.
  * Prints one JSON line: per-stage seconds, per-stage surviving rows,
  * and the end-of-pipeline token/shard accounting. Env:
  * SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
  * SPARK_GRAFT_CPUS (default 8).
  *
  * Run: `SPARK_GRAFT_SF_DIR=... sbt "runMain graft.tools.PipelineBench"`
  */
object PipelineBench {

  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val stages = scala.collection.mutable.LinkedHashMap.empty[String, Double]
    val rows = scala.collection.mutable.LinkedHashMap.empty[String, Long]
    def stage[T](name: String)(body: => T): T = {
      val t0 = System.nanoTime()
      val r = body
      stages(name) = (System.nanoTime() - t0) / 1e9
      r
    }
    def checkpointCount(name: String, df: DataFrame): DataFrame = {
      val c = df.localCheckpoint(true)
      rows(name) = c.count()
      c
    }

    // every group of 4 consecutive ids is one page under four URL
    // spellings on one of 50 registrable domains (shared by the
    // blocklist, URL-dedup, domain-cap, and boilerplate stages)
    def pageUrl = {
      val g = floor(col("doc_id") / 4).cast("long")
      val site = (g % 50).cast("string")
      val gs = g.cast("string")
      val m = col("doc_id") % 4
      when(m === 0, concat(lit("http://www.site"), site, lit(".com/a/"), gs))
        .when(m === 1, concat(lit("HTTP://WWW.Site"), site, lit(".COM:80/a/"), gs, lit("#f")))
        .when(m === 2, concat(lit("http://www.site"), site, lit(".com/%61/"), gs, lit("?utm_source=x")))
        .otherwise(concat(lit("http://www.site"), site, lit(".com/a/"), gs, lit("?utm_campaign=y")))
    }

    // ---- -0.5. blocklist: the literal first stage (q159) — listed
    // domains never pay extraction or anything after it ----
    val raw = Tables.documents(spark, dir)
    raw.count() // session/scan warmup outside every stage timer
    import spark.implicits._
    val allowed = stage("blocklist") {
      checkpointCount("blocklist",
        graft.operators.UrlFilter.keepAllowed(
          raw.withColumn("domain",
            graft.functions.expressions.UrlExprs.registrableDomain(
              graft.functions.expressions.UrlExprs.urlHost(pageUrl))),
          "domain",
          Seq("site7.com", "site13.com", "site23.com").toDF("domain"))
          .drop("domain"))
    }

    // ---- 0. extract: the corpus arrives as markup (q121's template) ----
    def esc(c: org.apache.spark.sql.Column) =
      regexp_replace(regexp_replace(regexp_replace(c, "&", "&amp;"), "<", "&lt;"), ">", "&gt;")
    val extracted = stage("extract") {
      val html = concat(
        lit("<!DOCTYPE html><html><head><title>"), esc(col("source")),
        lit("</title><style>body{}</style><script>var x = 1 < 2;</script></head><body><p>"),
        esc(col("text")),
        lit("</p></body></html>"))
      checkpointCount("extract", allowed.select(
        col("doc_id"), col("lang"), col("source"),
        graft.functions.expressions.HtmlToTextExpr.htmlToText(html).alias("text")))
    }

    // ---- 0.5 web front door: canonical-URL keep-best + domain quota ----
    // (q146/q147's stages at their CC-chain position: URL dedup
    // collapses spellings, the quota caps each domain's survivors)
    // ---- 0.25 per-domain boilerplate removal (q153's stage at its
    // RefinedWeb-chain position: segments on >75% of a registrable
    // domain's pages are nav/footer-class furniture — cut from every
    // page BEFORE dedup keys and quality stats are derived from text) ----
    val deboiled = stage("boilerplate") {
      val dom = extracted.select(
        col("doc_id"), col("lang"), col("source"),
        graft.functions.expressions.UrlExprs.registrableDomain(
          graft.functions.expressions.UrlExprs.urlHost(pageUrl)).alias("domain"),
        col("text"))
      val cleaned = Dedup.domainBoilerplate(
        dom, "doc_id", "domain", "text",
        delim = " ", maxPagePct = 75, minPages = 10L)
      checkpointCount("boilerplate",
        dom.select("doc_id", "lang", "source").join(
          cleaned.select(col("doc_id"), col("clean_text").alias("text")),
          Seq("doc_id")))
    }

    val urlKept = stage("url_dedup") {
      val kept = Dedup.byCanonicalUrl(
        deboiled.select(
          col("doc_id"), pageUrl.alias("url"),
          graft.functions.TextFunctions.tokenCount(col("text")).cast("long").alias("nt")),
        "doc_id", "url", "nt")
        .filter(col("kept") === 1L)
        .select("doc_id")
      checkpointCount("url_dedup", deboiled.join(kept, Seq("doc_id"), "left_semi"))
    }
    val quotaed = stage("domain_cap") {
      val domains = urlKept.select(
        col("doc_id"),
        graft.functions.expressions.UrlExprs.registrableDomain(
          graft.functions.expressions.UrlExprs.urlHost(pageUrl)).alias("domain"))
      val kept = graft.operators.Sampling
        .capPerGroup(domains, "doc_id", "domain", cap = 15)
        .select("doc_id")
      checkpointCount("domain_cap", urlKept.join(kept, Seq("doc_id"), "left_semi"))
    }

    // ---- 1. quality + langid gate (native one-pass scans) ----
    val gated = stage("quality_gate") {
      val scored = quotaed.select(
        col("doc_id"), col("lang"), col("source"), col("text"),
        graft.functions.expressions.QualityStatsExpr
          .qualityStats(col("text"), "english").alias("qs"),
        graft.functions.expressions.LangIdExpr.langId(col("text")).alias("lang_pred"))
      checkpointCount("quality_gate", scored
        .filter(col("qs.n_tokens") >= 8 && col("lang_pred").isNotNull)
        .drop("qs", "lang_pred"))
    }

    // ---- 2. exact dedup (q17's representative aggregate) ----
    val exactKept = stage("exact_dedup") {
      val reps = Dedup.exact(gated, "doc_id", "text")
        .select(col("keep_id").alias("doc_id"))
      checkpointCount("exact_dedup", gated.join(reps, Seq("doc_id"), "left_semi"))
    }

    // ---- 3. near-dup keep-best (q20 pairs → q49 clusters → q76 argmax) ----
    val nearKept = stage("near_dedup") {
      val pairs = Dedup.minHashLsh(
        exactKept, "doc_id", "text", n = 3, k = 16, bands = 4, threshold = 0.5)
      val clusters = Components.connectedComponents(
        pairs.select("id_a", "id_b"), "id_a", "id_b",
        exactKept.select("doc_id"), "doc_id")
        .select(col("id").alias("doc_id"), col("cluster_id"))
      val scored = clusters.join(
        exactKept.select(
          col("doc_id"),
          graft.functions.TextFunctions.tokenCount(col("text")).cast("long").alias("n_tokens")),
        Seq("doc_id"))
      val kept = Dedup.keepRepresentative(scored, "doc_id", "cluster_id", "n_tokens")
        .filter(col("kept") === 1L)
        .select("doc_id")
      checkpointCount("near_dedup", exactKept.join(kept, Seq("doc_id"), "left_semi"))
    }

    // ---- 4. decontamination vs the benchmark slice (q86's Bloom gate) ----
    val clean = stage("decontaminate") {
      val benchmark = raw.filter(col("doc_id") % 20 === 0)
      checkpointCount("decontaminate",
        // 8-gram overlap — the contamination width real decon runs use
        // (3-grams cross-match boilerplate; 8-grams match leakage)
        Decontaminate.bloomClean(nearKept, benchmark, "doc_id", "text", n = 8))
    }

    // ---- 5. tokenize: BPE merges + reassembly-free counts (q93/q95) ----
    val counts = stage("tokenize") {
      val merges = Bpe.rankedBigramMerges(clean, "text", topPairs = 50)
      checkpointCount("tokenize",
        Bpe.tokenCounts(clean, "doc_id", "text", merges).withColumnRenamed("id", "doc_id"))
    }

    // ---- 6. pack into training sequences (q95's budget window) ----
    val packed = stage("pack") {
      checkpointCount("pack",
        Chunker.packSequencesByCount(counts, "doc_id", "n_tokens", budget = 512L, shards = 32))
    }

    // ---- 7. shard manifest (q97's seeded assignment) ----
    val manifest = stage("shard") {
      checkpointCount("shard",
        Sharding.orderedAssignments(clean, "doc_id", seed = 42L, nShards = 8)
          .select("doc_id", "shard")
          .join(counts.select("doc_id", "n_tokens"), Seq("doc_id"))
          .groupBy("shard")
          .agg(count(lit(1)).alias("n_docs"), sum("n_tokens").alias("n_tokens_total")))
    }

    val totalTokens = manifest.agg(sum("n_tokens_total")).head().getLong(0)
    val packedSeqs = packed.select("shard", "chunk_id").distinct().count()
    val totalSec = stages.values.sum
    val stagesJson = stages.map { case (k, v) => s""""$k":${f"$v%.4f"}""" }.mkString(",")
    val rowsJson = rows.map { case (k, v) => s""""$k":$v""" }.mkString(",")
    println(
      s"""{"metric":"pipeline_total","value":${f"$totalSec%.4f"},"unit":"sec",""" +
        s""""stages":{$stagesJson},"rows":{$rowsJson},""" +
        s""""packed_seqs":$packedSeqs,"total_tokens":$totalTokens,"sf":"$dir"}""")
    spark.stop()
  }
}
