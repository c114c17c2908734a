package graft.operators

import graft.SparkTestBase
import graft.functions.expressions.UrlExprs
import org.apache.spark.sql.functions._

/** Contract of [[UrlFilter]]: registrable-domain matching rolls all
  * subdomains under one list entry, null domains pass, duplicate list
  * entries don't fan out, and the enforcement form equals the marked
  * form's filter.
  */
class UrlFilterSpec extends SparkTestBase {
  import spark.implicits._

  private val docs = Seq(
    (1L, "http://www.bad.com/a"),
    (2L, "http://cdn.bad.com/b"),       // subdomain of a listed domain
    (3L, "http://good.com/c"),
    (4L, "not a url at all"),           // null domain — passes, never eaten
    (5L, "http://bad.com.evil.org/d"))  // 'bad.com' as a SUBDOMAIN of evil.org
    .toDF("doc_id", "url")
    .select(col("doc_id"),
      UrlExprs.registrableDomain(UrlExprs.urlHost(col("url"))).alias("domain"))

  private val blocklist = Seq("bad.com", "bad.com", "unused.net").toDF("domain")

  test("registrable-domain matching: subdomains block together, lookalikes do not") {
    val marked = UrlFilter.markBlocked(docs, "domain", blocklist)
      .select("doc_id", "blocked").as[(Long, Boolean)].collect().toMap
    assert(marked(1L) && marked(2L), "subdomain variants must block under one entry")
    assert(!marked(3L), "unlisted domain blocked")
    assert(!marked(4L), "null-domain row must pass, not be eaten")
    assert(!marked(5L), "bad.com.evil.org is evil.org's capture, not bad.com's")
    // duplicate list entries never fan rows out
    assert(marked.size === 5)
  }

  test("keepAllowed equals the marked form's filter") {
    val kept = UrlFilter.keepAllowed(docs, "domain", blocklist)
      .select("doc_id").as[Long].collect().toSet
    val viaMark = UrlFilter.markBlocked(docs, "domain", blocklist)
      .filter(!col("blocked")).select("doc_id").as[Long].collect().toSet
    assert(kept === viaMark)
    assert(kept === Set(3L, 4L, 5L))
  }

  test("path-prefix blocklist: normalized-path matching defeats %-encoding; nulls pass; forms agree") {
    val urls = Seq(
      (1L, "http://a.com/search?q=x"),       // query split off -> '/search'
      (2L, "http://b.org/t%61g/5"),          // %61='a' -> '/tag/5' blocks
      (3L, "http://a.com/article/9"),        // allowed
      (4L, "http://a.com/tagging/9"),        // '/tag/' prefix does NOT match '/tagging/'
      (5L, "not a url"),                     // null path -> passes
      (6L, "http://c.net/searchable"),       // '/search' prefix DOES match (documented prefix semantics)
      (7L, "http://c.net"))                  // empty path normalizes to '/'
      .toDF("doc_id", "url")
    val prefixes = Seq("/search", "/tag/")
    val marked = UrlFilter.markBlockedByPath(urls, "url", prefixes)
      .select("doc_id", "path", "blocked")
      .as[(Long, Option[String], Boolean)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    assert(marked(1L) == (Some("/search"), true))
    assert(marked(2L) == (Some("/tag/5"), true),
      "percent-encoded path must block after normalization")
    assert(marked(3L) == (Some("/article/9"), false))
    assert(marked(4L) == (Some("/tagging/9"), false),
      "'/tag/' must not match '/tagging/'")
    assert(marked(5L) == (None, false), "unparseable URL passes with null path")
    assert(marked(6L)._2, "prefix semantics: '/search' matches '/searchable'")
    assert(marked(7L) == (Some("/"), false))
    val kept = UrlFilter.keepAllowedByPath(urls, "url", prefixes)
      .select("doc_id").as[Long].collect().toSet
    assert(kept === Set(3L, 4L, 5L, 7L))
  }
}
