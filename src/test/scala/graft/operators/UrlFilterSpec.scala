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
}
