package graft

import graft.functions.expressions.{CleanTextExpr, CleanTextFastExpr, CleanTokensExpr, CorpusStatsExpr, CutCoveredSpansExpr, DotProductFloat, HeavyHittersAgg, LangIdExpr, Md5Hash60Expr, Norm2Float, QualityStatsExpr, RepetitionStatsExpr, SentimentScoreExpr, ShingleHash60sExpr, ShingleHashSetExpr, ShingleModHashesExpr, SimHash60Expr, SortedIntersectCountLong, TermCountsExpr, TokensExpr, WinnowFingerprintsExpr}
import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo
import org.apache.spark.sql.graftbridge.Bridge

/** SparkSessionExtensions entry point — makes the engine's native
  * expressions callable from SQL:
  *
  * {{{
  *   SparkSession.builder().withExtensions(new GraftExtensions).getOrCreate()
  *   // or: spark.sql.extensions=graft.GraftExtensions
  *   spark.sql("SELECT md5_hash60(text) FROM docs")
  *   spark.sql("SELECT dot_f(embedding, embedding) FROM embeddings")
  * }}}
  *
  * [[GraftFunctions.register]] does the same on an already-built session.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    // deployment guards: the hint-class defect (an un-pruned
    // corpus-vector or corpus-text shuffle) warns — or, opted-in,
    // fails — at plan time instead of shipping silently; see
    // VectorShuffleGuardRule / TextShuffleGuardRule
    e.injectQueryStagePrepRule(graft.plans.VectorShuffleGuardRule.apply)
    e.injectQueryStagePrepRule(graft.plans.TextShuffleGuardRule.apply)
    // second injection point: columnar rules run in EVERY plan's
    // preparations (incl. streaming micro-batch plans, which skip AQE
    // and therefore the two rules above) — see ShuffleGuardColumnarRule
    e.injectColumnar(graft.plans.ShuffleGuardColumnarRule.apply)
    e.injectFunction(
      (
        FunctionIdentifier("md5_hash60"),
        new ExpressionInfo(classOf[Md5Hash60Expr].getName, "md5_hash60"),
        GraftFunctions.md5Hash60Builder))
    e.injectFunction(
      (
        FunctionIdentifier("dot_f"),
        new ExpressionInfo(classOf[DotProductFloat].getName, "dot_f"),
        GraftFunctions.dotFBuilder))
    // norm2_f alongside dot_f: the scan-side cosine
    // dot_f(a, b) / (norm2_f(a) * norm2_f(b)) is expressible from pure
    // SQL, matching the Column-API surface
    e.injectFunction(
      (
        FunctionIdentifier("norm2_f"),
        new ExpressionInfo(classOf[Norm2Float].getName, "norm2_f"),
        GraftFunctions.norm2FBuilder))
    e.injectFunction(
      (
        FunctionIdentifier("sorted_intersect_count"),
        new ExpressionInfo(classOf[SortedIntersectCountLong].getName, "sorted_intersect_count"),
        GraftFunctions.sortedIntersectCountBuilder))
    e.injectFunction(
      (
        FunctionIdentifier("heavy_hitters"),
        new ExpressionInfo(classOf[HeavyHittersAgg].getName, "heavy_hitters"),
        GraftFunctions.heavyHittersBuilder))
    e.injectFunction(
      (
        FunctionIdentifier("vector_micro_sum"),
        new ExpressionInfo(
          classOf[graft.functions.expressions.VectorSumAgg].getName, "vector_micro_sum"),
        GraftFunctions.vectorMicroSumBuilder))
    e.injectFunction(
      (
        FunctionIdentifier("shingle_hash_set"),
        new ExpressionInfo(classOf[ShingleHashSetExpr].getName, "shingle_hash_set"),
        GraftFunctions.shingleHashSetBuilder))
    e.injectFunction(
      (
        FunctionIdentifier("shingle_mod_hashes"),
        new ExpressionInfo(classOf[ShingleModHashesExpr].getName, "shingle_mod_hashes"),
        GraftFunctions.shingleModHashesBuilder))
    e.injectFunction(
      (
        FunctionIdentifier("shingle_hash60s"),
        new ExpressionInfo(classOf[ShingleHash60sExpr].getName, "shingle_hash60s"),
        GraftFunctions.shingleHash60sBuilder))
    e.injectFunction(
      (
        FunctionIdentifier("cut_covered_spans"),
        new ExpressionInfo(classOf[CutCoveredSpansExpr].getName, "cut_covered_spans"),
        GraftFunctions.cutCoveredSpansBuilder))
    e.injectFunction(
      (
        FunctionIdentifier("lang_id"),
        new ExpressionInfo(classOf[LangIdExpr].getName, "lang_id"),
        GraftFunctions.langIdBuilder))
    e.injectFunction(
      (
        FunctionIdentifier("quality_stats"),
        new ExpressionInfo(classOf[QualityStatsExpr].getName, "quality_stats"),
        GraftFunctions.qualityStatsBuilder))
    e.injectFunction(
      (
        FunctionIdentifier("corpus_stats"),
        new ExpressionInfo(classOf[CorpusStatsExpr].getName, "corpus_stats"),
        GraftFunctions.corpusStatsBuilder))
    e.injectFunction(
      (
        FunctionIdentifier("clean_text"),
        new ExpressionInfo(classOf[CleanTextExpr].getName, "clean_text"),
        GraftFunctions.cleanTextBuilder))
    e.injectFunction(
      (
        FunctionIdentifier("winnow_fingerprints"),
        new ExpressionInfo(classOf[WinnowFingerprintsExpr].getName, "winnow_fingerprints"),
        GraftFunctions.winnowFingerprintsBuilder))
    e.injectFunction(
      (
        FunctionIdentifier("sentiment_score"),
        new ExpressionInfo(classOf[SentimentScoreExpr].getName, "sentiment_score"),
        GraftFunctions.sentimentScoreBuilder))
    e.injectFunction(
      (
        FunctionIdentifier("tokens"),
        new ExpressionInfo(classOf[TokensExpr].getName, "tokens"),
        GraftFunctions.tokensBuilder))
    e.injectFunction(
      (
        FunctionIdentifier("clean_tokens"),
        new ExpressionInfo(classOf[CleanTokensExpr].getName, "clean_tokens"),
        GraftFunctions.cleanTokensBuilder))
    e.injectFunction(
      (
        FunctionIdentifier("simhash60"),
        new ExpressionInfo(classOf[SimHash60Expr].getName, "simhash60"),
        GraftFunctions.simHash60Builder))
    e.injectFunction(
      (
        FunctionIdentifier("clean_text_fast"),
        new ExpressionInfo(classOf[CleanTextFastExpr].getName, "clean_text_fast"),
        GraftFunctions.cleanTextFastBuilder))
    e.injectFunction(
      (
        FunctionIdentifier("repetition_stats"),
        new ExpressionInfo(classOf[RepetitionStatsExpr].getName, "repetition_stats"),
        GraftFunctions.repetitionStatsBuilder))
    e.injectFunction(
      (
        FunctionIdentifier("term_counts"),
        new ExpressionInfo(classOf[TermCountsExpr].getName, "term_counts"),
        GraftFunctions.termCountsBuilder))
    e.injectFunction(
      (
        FunctionIdentifier("html_to_text"),
        new ExpressionInfo(
          classOf[graft.functions.expressions.HtmlToTextExpr].getName, "html_to_text"),
        GraftFunctions.htmlToTextBuilder))
    e.injectFunction(
      (
        FunctionIdentifier("cdc_chunk_hashes"),
        new ExpressionInfo(
          classOf[graft.functions.expressions.CdcChunkHashesExpr].getName, "cdc_chunk_hashes"),
        GraftFunctions.cdcChunkHashesBuilder))
    e.injectFunction(
      (
        FunctionIdentifier("keyword_classify"),
        new ExpressionInfo(
          classOf[graft.functions.expressions.KeywordClassifyExpr].getName, "keyword_classify"),
        GraftFunctions.keywordClassifyBuilder))
    e.injectFunction(
      (
        FunctionIdentifier("nfc_normalize"),
        new ExpressionInfo(
          classOf[graft.functions.expressions.NfcNormalizeExpr].getName, "nfc_normalize"),
        GraftFunctions.nfcNormalizeBuilder))
    e.injectFunction(
      (
        FunctionIdentifier("strip_accents"),
        new ExpressionInfo(
          classOf[graft.functions.expressions.StripAccentsExpr].getName, "strip_accents"),
        GraftFunctions.stripAccentsBuilder))
    e.injectFunction(
      (
        FunctionIdentifier("char_entropy"),
        new ExpressionInfo(
          classOf[graft.functions.expressions.CharEntropyExpr].getName, "char_entropy"),
        GraftFunctions.charEntropyBuilder))
    e.injectFunction(
      (
        FunctionIdentifier("url_normalize"),
        new ExpressionInfo(
          classOf[graft.functions.expressions.UrlNormalizeExpr].getName, "url_normalize"),
        GraftFunctions.urlNormalizeBuilder))
    e.injectFunction(
      (
        FunctionIdentifier("url_host"),
        new ExpressionInfo(
          classOf[graft.functions.expressions.UrlHostExpr].getName, "url_host"),
        GraftFunctions.urlHostBuilder))
    e.injectFunction(
      (
        FunctionIdentifier("registrable_domain"),
        new ExpressionInfo(
          classOf[graft.functions.expressions.RegistrableDomainExpr].getName,
          "registrable_domain"),
        GraftFunctions.registrableDomainBuilder))
    e.injectFunction(
      (
        FunctionIdentifier("hashed_bow"),
        new ExpressionInfo(
          classOf[graft.functions.expressions.HashedBowExpr].getName, "hashed_bow"),
        GraftFunctions.hashedBowBuilder))
    e.injectFunction(
      (
        FunctionIdentifier("presence_dot"),
        new ExpressionInfo(
          classOf[graft.functions.expressions.PresenceDotExpr].getName,
          "presence_dot"),
        GraftFunctions.presenceDotBuilder))
    e.injectFunction(
      (
        FunctionIdentifier("gopher_stats"),
        new ExpressionInfo(
          classOf[graft.functions.expressions.GopherStatsExpr].getName,
          "gopher_stats"),
        GraftFunctions.gopherStatsBuilder))
    e.injectFunction(
      (
        FunctionIdentifier("dhash64"),
        new ExpressionInfo(
          classOf[graft.functions.expressions.DHash64Expr].getName, "dhash64"),
        GraftFunctions.dhash64Builder))
    e.injectFunction(
      (
        FunctionIdentifier("luhn_scrub"),
        new ExpressionInfo(
          classOf[graft.functions.expressions.LuhnScrubExpr].getName, "luhn_scrub"),
        GraftFunctions.luhnScrubBuilder))
    e.injectFunction(
      (
        FunctionIdentifier("int8_codes"),
        new ExpressionInfo(
          classOf[graft.functions.expressions.Int8CodesExpr].getName, "int8_codes"),
        GraftFunctions.int8CodesBuilder))
    e.injectFunction(
      (
        FunctionIdentifier("dedup_segments"),
        new ExpressionInfo(
          classOf[graft.functions.expressions.DedupSegmentsExpr].getName,
          "dedup_segments"),
        GraftFunctions.dedupSegmentsBuilder))
    e.injectFunction(
      (
        FunctionIdentifier("cut_segments_by_fp"),
        new ExpressionInfo(
          classOf[graft.functions.expressions.CutSegmentsByFpExpr].getName,
          "cut_segments_by_fp"),
        GraftFunctions.cutSegmentsByFpBuilder))
    e.injectFunction(
      (
        FunctionIdentifier("bq_codes"),
        new ExpressionInfo(
          classOf[graft.functions.expressions.BqCodesExpr].getName, "bq_codes"),
        GraftFunctions.bqCodesBuilder))
    e.injectFunction(
      (
        FunctionIdentifier("secret_scrub"),
        new ExpressionInfo(
          classOf[graft.functions.expressions.SecretScrubExpr].getName,
          "secret_scrub"),
        GraftFunctions.secretScrubBuilder))
    e.injectFunction(
      (
        FunctionIdentifier("c4_clean"),
        new ExpressionInfo(
          classOf[graft.functions.expressions.C4CleanExpr].getName, "c4_clean"),
        GraftFunctions.c4CleanBuilder))
    e.injectFunction(
      (
        FunctionIdentifier("script_stats"),
        new ExpressionInfo(
          classOf[graft.functions.expressions.ScriptStatsExpr].getName,
          "script_stats"),
        GraftFunctions.scriptStatsBuilder))
    e.injectFunction(
      (
        FunctionIdentifier("srp_expand"),
        new ExpressionInfo(
          classOf[graft.functions.expressions.SrpExpandExpr].getName,
          "srp_expand"),
        GraftFunctions.srpExpandBuilder))
  }
}

object GraftFunctions {

  private type Expr = org.apache.spark.sql.catalyst.expressions.Expression

  /** Wrong-arity SQL calls must fail analysis with the signature, not
    * `IndexOutOfBoundsException` from `exprs(1)` inside the builder.
    */
  private[graft] def arity(exprs: Seq[Expr], n: Int, signature: String): Seq[Expr] = {
    if (exprs.length != n)
      throw new IllegalArgumentException(
        s"$signature expects $n argument${if (n == 1) "" else "s"}, got ${exprs.length}")
    exprs
  }

  private[graft] def md5Hash60Builder: Seq[Expr] => Expr =
    exprs => Md5Hash60Expr(arity(exprs, 1, "md5_hash60(text)").head)

  private[graft] def dotFBuilder: Seq[Expr] => Expr = { exprs0 =>
    val exprs = arity(exprs0, 2, "dot_f(vec_a, vec_b)")
    DotProductFloat(exprs.head, exprs(1))
  }

  private[graft] def norm2FBuilder: Seq[Expr] => Expr =
    exprs => Norm2Float(arity(exprs, 1, "norm2_f(vec)").head)

  private[graft] def sortedIntersectCountBuilder: Seq[Expr] => Expr = { exprs0 =>
    val exprs = arity(exprs0, 2, "sorted_intersect_count(sorted_a, sorted_b)")
    SortedIntersectCountLong(exprs.head, exprs(1))
  }

  private[graft] def shingleHashSetBuilder: Seq[Expr] => Expr = { exprs0 =>
    val exprs = arity(exprs0, 2, "shingle_hash_set(text, n)")
    ShingleHashSetExpr(exprs.head, intLit(exprs(1), "shingle_hash_set n"))
  }

  private[graft] def shingleModHashesBuilder: Seq[Expr] => Expr = { exprs0 =>
    val exprs = arity(exprs0, 2, "shingle_mod_hashes(text, n)")
    ShingleModHashesExpr(exprs.head, intLit(exprs(1), "shingle_mod_hashes n"))
  }

  /** `heavy_hitters(item, capacity, k)` — capacity/k must be integer
    * literals (the summary is sized at plan time).
    */
  private[graft] def intLit(
      e: org.apache.spark.sql.catalyst.expressions.Expression, name: String): Int =
    e match {
      case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
      case other => throw new IllegalArgumentException(
        s"$name must be an INT literal, got $other")
    }

  private[graft] def strLit(
      e: org.apache.spark.sql.catalyst.expressions.Expression, name: String): String =
    e match {
      case org.apache.spark.sql.catalyst.expressions.Literal(v: org.apache.spark.unsafe.types.UTF8String, _) if v != null =>
        v.toString
      case other => throw new IllegalArgumentException(
        s"$name must be a STRING literal, got $other")
    }

  private[graft] def shingleHash60sBuilder: Seq[Expr] => Expr = { exprs0 =>
    val exprs = arity(exprs0, 2, "shingle_hash60s(text, n)")
    ShingleHash60sExpr(exprs.head, intLit(exprs(1), "shingle_hash60s n"))
  }

  private[graft] def cutCoveredSpansBuilder: Seq[Expr] => Expr = { exprs0 =>
    val exprs = arity(exprs0, 3, "cut_covered_spans(tokens, starts, k)")
    CutCoveredSpansExpr(exprs.head, exprs(1), intLit(exprs(2), "cut_covered_spans k"))
  }

  private[graft] def langIdBuilder: Seq[Expr] => Expr =
    exprs => LangIdExpr(arity(exprs, 1, "lang_id(text)").head)

  private[graft] def qualityStatsBuilder: Seq[Expr] => Expr = { exprs0 =>
    val exprs = arity(exprs0, 2, "quality_stats(text, language)")
    QualityStatsExpr(exprs.head, strLit(exprs(1), "quality_stats language"))
  }

  private[graft] def corpusStatsBuilder: Seq[Expr] => Expr =
    exprs => CorpusStatsExpr(arity(exprs, 1, "corpus_stats(text)").head)

  private[graft] def termCountsBuilder: Seq[Expr] => Expr =
    exprs => TermCountsExpr(arity(exprs, 1, "term_counts(text)").head)

  private[graft] def repetitionStatsBuilder: Seq[Expr] => Expr =
    exprs => RepetitionStatsExpr(arity(exprs, 1, "repetition_stats(text)").head)

  private[graft] def cleanTextBuilder: Seq[Expr] => Expr =
    exprs => CleanTextExpr(arity(exprs, 1, "clean_text(text)").head)

  private[graft] def winnowFingerprintsBuilder: Seq[Expr] => Expr = { exprs0 =>
    val exprs = arity(exprs0, 3, "winnow_fingerprints(text, k, w)")
    WinnowFingerprintsExpr(exprs.head,
      intLit(exprs(1), "winnow_fingerprints k"), intLit(exprs(2), "winnow_fingerprints w"))
  }

  private[graft] def sentimentScoreBuilder: Seq[Expr] => Expr =
    exprs => SentimentScoreExpr(arity(exprs, 1, "sentiment_score(text)").head)

  private[graft] def cleanTokensBuilder: Seq[Expr] => Expr = { exprs0 =>
    val exprs = arity(exprs0, 3, "clean_tokens(text, language, min_length)")
    CleanTokensExpr(exprs.head,
      strLit(exprs(1), "clean_tokens language"), intLit(exprs(2), "clean_tokens min_length"))
  }

  private[graft] def simHash60Builder: Seq[Expr] => Expr =
    exprs => SimHash60Expr(arity(exprs, 1, "simhash60(text)").head)

  private[graft] def cleanTextFastBuilder: Seq[Expr] => Expr =
    exprs => CleanTextFastExpr(arity(exprs, 1, "clean_text_fast(text)").head)

  private[graft] def htmlToTextBuilder: Seq[Expr] => Expr =
    exprs => graft.functions.expressions.HtmlToTextExpr(
      arity(exprs, 1, "html_to_text(html)").head)

  private[graft] def tokensBuilder: Seq[Expr] => Expr =
    exprs => TokensExpr(arity(exprs, 1, "tokens(text)").head)

  private[graft] def cdcChunkHashesBuilder: Seq[Expr] => Expr = { exprs0 =>
    val exprs = arity(exprs0, 3, "cdc_chunk_hashes(text, window, divisor)")
    graft.functions.expressions.CdcChunkHashesExpr(exprs.head,
      intLit(exprs(1), "cdc_chunk_hashes window"), intLit(exprs(2), "cdc_chunk_hashes divisor"))
  }

  /** `keyword_classify(text)` — labels from the bundled default keyword
    * model (loaded once from the classpath, deterministic).
    */
  private[graft] def keywordClassifyBuilder: Seq[Expr] => Expr =
    exprs => graft.functions.expressions.KeywordClassifyExpr(
      arity(exprs, 1, "keyword_classify(text)").head,
      graft.classify.TextClassifier.default)

  private[graft] def nfcNormalizeBuilder: Seq[Expr] => Expr =
    exprs => graft.functions.expressions.NfcNormalizeExpr(
      arity(exprs, 1, "nfc_normalize(text)").head)

  private[graft] def stripAccentsBuilder: Seq[Expr] => Expr =
    exprs => graft.functions.expressions.StripAccentsExpr(
      arity(exprs, 1, "strip_accents(text)").head)

  private[graft] def charEntropyBuilder: Seq[Expr] => Expr =
    exprs => graft.functions.expressions.CharEntropyExpr(
      arity(exprs, 1, "char_entropy(text)").head)

  private[graft] def heavyHittersBuilder: Seq[Expr] => Expr = { exprs0 =>
    val exprs = arity(exprs0, 3, "heavy_hitters(item, capacity, k)")
    HeavyHittersAgg(exprs.head,
      intLit(exprs(1), "heavy_hitters capacity"), intLit(exprs(2), "heavy_hitters k"))
  }

  private[graft] def vectorMicroSumBuilder: Seq[Expr] => Expr = exprs =>
    graft.functions.expressions.VectorSumAgg(
      arity(exprs, 1, "vector_micro_sum(vec)").head)

  private[graft] def urlNormalizeBuilder: Seq[Expr] => Expr = exprs =>
    graft.functions.expressions.UrlNormalizeExpr(
      arity(exprs, 1, "url_normalize(url)").head,
      graft.functions.expressions.UrlExprs.DefaultDropParams)

  private[graft] def urlHostBuilder: Seq[Expr] => Expr = exprs =>
    graft.functions.expressions.UrlHostExpr(
      arity(exprs, 1, "url_host(url)").head)

  private[graft] def registrableDomainBuilder: Seq[Expr] => Expr = exprs =>
    graft.functions.expressions.RegistrableDomainExpr(
      arity(exprs, 1, "registrable_domain(host)").head,
      graft.functions.expressions.UrlExprs.DefaultSuffixes)

  private[graft] def hashedBowBuilder: Seq[Expr] => Expr = { exprs0 =>
    val exprs = arity(exprs0, 2, "hashed_bow(text, dim)")
    graft.functions.expressions.HashedBowExpr(
      exprs.head, intLit(exprs(1), "hashed_bow dim"))
  }

  private[graft] def presenceDotBuilder: Seq[Expr] => Expr = { exprs0 =>
    val exprs = arity(exprs0, 2, "presence_dot(feats, weights)")
    graft.functions.expressions.PresenceDotExpr(exprs.head, exprs(1))
  }

  private[graft] def gopherStatsBuilder: Seq[Expr] => Expr = exprs =>
    graft.functions.expressions.GopherStatsExpr(
      arity(exprs, 1, "gopher_stats(text)").head)

  private[graft] def dhash64Builder: Seq[Expr] => Expr = exprs =>
    graft.functions.expressions.DHash64Expr(
      arity(exprs, 1, "dhash64(content)").head)

  private[graft] def luhnScrubBuilder: Seq[Expr] => Expr = exprs =>
    graft.functions.expressions.LuhnScrubExpr(
      arity(exprs, 1, "luhn_scrub(text)").head)

  private[graft] def int8CodesBuilder: Seq[Expr] => Expr = exprs =>
    graft.functions.expressions.Int8CodesExpr(
      arity(exprs, 1, "int8_codes(vec)").head)

  private[graft] def dedupSegmentsBuilder: Seq[Expr] => Expr = { exprs0 =>
    val exprs = arity(exprs0, 2, "dedup_segments(text, delim)")
    graft.functions.expressions.DedupSegmentsExpr(
      exprs.head, strLit(exprs(1), "dedup_segments delim"))
  }

  private[graft] def cutSegmentsByFpBuilder: Seq[Expr] => Expr = { exprs0 =>
    val exprs = arity(exprs0, 3, "cut_segments_by_fp(text, sorted_fps, delim)")
    graft.functions.expressions.CutSegmentsByFpExpr(
      exprs.head, exprs(1), strLit(exprs(2), "cut_segments_by_fp delim"))
  }

  private[graft] def bqCodesBuilder: Seq[Expr] => Expr = exprs =>
    graft.functions.expressions.BqCodesExpr(
      arity(exprs, 1, "bq_codes(vec)").head)

  private[graft] def secretScrubBuilder: Seq[Expr] => Expr = exprs =>
    graft.functions.expressions.SecretScrubExpr(
      arity(exprs, 1, "secret_scrub(text)").head)

  private[graft] def c4CleanBuilder: Seq[Expr] => Expr = exprs =>
    graft.functions.expressions.C4CleanExpr(
      arity(exprs, 1, "c4_clean(text)").head)

  private[graft] def scriptStatsBuilder: Seq[Expr] => Expr = exprs =>
    graft.functions.expressions.ScriptStatsExpr(
      arity(exprs, 1, "script_stats(text)").head)

  private[graft] def srpExpandBuilder: Seq[Expr] => Expr = { exprs0 =>
    val exprs = arity(exprs0, 3, "srp_expand(vec, out_dim, prefix)")
    graft.functions.expressions.SrpExpandExpr(
      exprs.head, intLit(exprs(1), "srp_expand out_dim"),
      strLit(exprs(2), "srp_expand prefix"))
  }

  def register(spark: SparkSession): Unit = {
    Bridge.registerTempFunction(spark, "md5_hash60", md5Hash60Builder)
    Bridge.registerTempFunction(spark, "dot_f", dotFBuilder)
    Bridge.registerTempFunction(spark, "norm2_f", norm2FBuilder)
    Bridge.registerTempFunction(spark, "sorted_intersect_count", sortedIntersectCountBuilder)
    Bridge.registerTempFunction(spark, "heavy_hitters", heavyHittersBuilder)
    Bridge.registerTempFunction(spark, "vector_micro_sum", vectorMicroSumBuilder)
    Bridge.registerTempFunction(spark, "shingle_hash_set", shingleHashSetBuilder)
    Bridge.registerTempFunction(spark, "shingle_mod_hashes", shingleModHashesBuilder)
    Bridge.registerTempFunction(spark, "shingle_hash60s", shingleHash60sBuilder)
    Bridge.registerTempFunction(spark, "cut_covered_spans", cutCoveredSpansBuilder)
    Bridge.registerTempFunction(spark, "lang_id", langIdBuilder)
    Bridge.registerTempFunction(spark, "quality_stats", qualityStatsBuilder)
    Bridge.registerTempFunction(spark, "corpus_stats", corpusStatsBuilder)
    Bridge.registerTempFunction(spark, "term_counts", termCountsBuilder)
    Bridge.registerTempFunction(spark, "repetition_stats", repetitionStatsBuilder)
    Bridge.registerTempFunction(spark, "clean_text", cleanTextBuilder)
    Bridge.registerTempFunction(spark, "winnow_fingerprints", winnowFingerprintsBuilder)
    Bridge.registerTempFunction(spark, "sentiment_score", sentimentScoreBuilder)
    Bridge.registerTempFunction(spark, "clean_tokens", cleanTokensBuilder)
    Bridge.registerTempFunction(spark, "simhash60", simHash60Builder)
    Bridge.registerTempFunction(spark, "clean_text_fast", cleanTextFastBuilder)
    Bridge.registerTempFunction(spark, "html_to_text", htmlToTextBuilder)
    Bridge.registerTempFunction(spark, "tokens", tokensBuilder)
    Bridge.registerTempFunction(spark, "cdc_chunk_hashes", cdcChunkHashesBuilder)
    Bridge.registerTempFunction(spark, "keyword_classify", keywordClassifyBuilder)
    Bridge.registerTempFunction(spark, "nfc_normalize", nfcNormalizeBuilder)
    Bridge.registerTempFunction(spark, "strip_accents", stripAccentsBuilder)
    Bridge.registerTempFunction(spark, "char_entropy", charEntropyBuilder)
    Bridge.registerTempFunction(spark, "url_normalize", urlNormalizeBuilder)
    Bridge.registerTempFunction(spark, "url_host", urlHostBuilder)
    Bridge.registerTempFunction(spark, "registrable_domain", registrableDomainBuilder)
    Bridge.registerTempFunction(spark, "hashed_bow", hashedBowBuilder)
    Bridge.registerTempFunction(spark, "presence_dot", presenceDotBuilder)
    Bridge.registerTempFunction(spark, "gopher_stats", gopherStatsBuilder)
    Bridge.registerTempFunction(spark, "dhash64", dhash64Builder)
    Bridge.registerTempFunction(spark, "luhn_scrub", luhnScrubBuilder)
    Bridge.registerTempFunction(spark, "int8_codes", int8CodesBuilder)
    Bridge.registerTempFunction(spark, "cut_segments_by_fp", cutSegmentsByFpBuilder)
    Bridge.registerTempFunction(spark, "dedup_segments", dedupSegmentsBuilder)
    Bridge.registerTempFunction(spark, "bq_codes", bqCodesBuilder)
    Bridge.registerTempFunction(spark, "secret_scrub", secretScrubBuilder)
    Bridge.registerTempFunction(spark, "c4_clean", c4CleanBuilder)
    Bridge.registerTempFunction(spark, "script_stats", scriptStatsBuilder)
    Bridge.registerTempFunction(spark, "srp_expand", srpExpandBuilder)
  }
}
