package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** [[Dedup.byCanonicalUrl]] — canonical-URL keep-best dedup. */
class UrlDedupSpec extends SparkTestBase {
  import spark.implicits._

  test("spelling variants collapse to one canonical group; best score wins") {
    val df = Seq(
      (1L, "http://www.site.example.com/a?id=9", 10L),
      (2L, "HTTP://WWW.Site.Example.COM:80/a?id=9#frag", 30L),
      (3L, "http://www.site.example.com/%61?utm_source=x&id=9", 20L),
      (4L, "https://other.example.com/b", 5L)).toDF("doc_id", "url", "score")
    val out = Dedup.byCanonicalUrl(df, "doc_id", "url", "score")
      .orderBy("doc_id")
      .collect()
    assert(out.length == 4)
    val canon = out.map(_.getString(1))
    assert(canon(0) == canon(1) && canon(1) == canon(2),
      s"variants must share one canonical URL: ${canon.toSeq}")
    assert(canon(0) == "http://www.site.example.com/a?id=9")
    assert(out.map(r => r.getLong(0) -> r.getLong(3)).toMap ==
      Map(1L -> 0L, 2L -> 1L, 3L -> 0L, 4L -> 1L),
      "highest score wins its group; the singleton keeps itself")
  }

  test("score ties break to the minimum id") {
    val df = Seq(
      (7L, "http://a.example.com/x", 5L),
      (3L, "http://A.example.com:80/x", 5L),
      (9L, "http://a.example.com/x#f", 5L)).toDF("doc_id", "url", "score")
    val kept = Dedup.byCanonicalUrl(df, "doc_id", "url", "score")
      .filter(col("kept") === 1L)
      .select("doc_id")
      .collect()
      .map(_.getLong(0))
      .toSeq
    assert(kept == Seq(3L))
  }

  test("registrable-domain rollup unifies subdomains before a per-domain cap") {
    import graft.functions.expressions.UrlExprs
    val df = Seq(
      (1L, "http://www.farm.com/a"),
      (2L, "http://cdn.farm.com/b"),
      (3L, "http://static.farm.com/c"),
      (4L, "http://www.other.com/d")).toDF("doc_id", "url")
    val domains = df.select(
      col("doc_id"),
      UrlExprs.registrableDomain(UrlExprs.urlHost(col("url"))).as("domain"))
    val capped = Sampling.capPerGroup(domains, "doc_id", "domain", cap = 2)
    val byDomain = capped.groupBy("domain").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byDomain == Map("farm.com" -> 2L, "other.com" -> 1L),
      s"three subdomains must collapse into ONE capped domain group: $byDomain")
  }

  test("incrementalExactByKey: batch dedups against corpus canonicals, nulls drop") {
    import graft.functions.expressions.UrlExprs
    def keyed(rows: Seq[(Long, String)]) =
      rows.toDF("doc_id", "url").select(
        col("doc_id"),
        UrlExprs.urlNormalize(col("url")).as("norm_url"))
    val corpus = keyed(Seq(
      (1L, "http://a.example.com/x"),
      (2L, "http://b.example.com/y")))
    val batch = keyed(Seq(
      (10L, "HTTP://A.Example.COM:80/x#f"), // corpus-known canonical -> dropped
      (11L, "http://c.example.com/z"),      // new
      (12L, "http://C.example.com/z"),      // intra-batch dup of 11
      (13L, "not a url")))                  // null key -> dropped
    val out = Dedup.incrementalExactByKey(batch, corpus, "doc_id", "norm_url")
      .collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getLong(0) == 11L && r.getString(1) == "http://c.example.com/z"
      && r.getLong(2) == 2L)
  }

  test("unparseable URLs are dropped, not folded into a NULL hot key") {
    val df = Seq(
      (1L, "not a url", 10L),
      (2L, "also://", 10L), // empty host -> NULL
      (3L, "http://ok.example.com/", 10L)).toDF("doc_id", "url", "score")
    val out = Dedup.byCanonicalUrl(df, "doc_id", "url", "score").collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(3L))
    assert(out.head.getLong(3) == 1L)
  }
}
