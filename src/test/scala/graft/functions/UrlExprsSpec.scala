package graft.functions

import graft.SparkTestBase
import graft.functions.expressions.UrlExprs
import org.apache.spark.sql.functions._

/** The documented normalization steps, each pinned on a crafted input —
  * plus the SQL registration and null/invalid contracts. The q142 gate
  * re-checks every step against the DuckDB re-derivation; this spec is
  * the fast in-JVM pin of the same semantics.
  */
class UrlExprsSpec extends SparkTestBase {
  import spark.implicits._

  private def norm(url: String): Option[String] =
    Seq(url).toDF("u")
      .select(UrlExprs.urlNormalize(col("u")).alias("n"))
      .collect().map(r => Option(r.getString(0))).head

  private def host(url: String): Option[String] =
    Seq(url).toDF("u")
      .select(UrlExprs.urlHost(col("u")).alias("n"))
      .collect().map(r => Option(r.getString(0))).head

  private def dom(h: String): Option[String] =
    Seq(h).toDF("h")
      .select(UrlExprs.registrableDomain(col("h")).alias("d"))
      .collect().map(r => Option(r.getString(0))).head

  test("scheme/host lowercase, default ports dropped, explicit ports kept") {
    assert(norm("HTTP://WWW.Example.COM:80/A/b") === Some("http://www.example.com/A/b"))
    assert(norm("https://X.Y:443/") === Some("https://x.y/"))
    assert(norm("http://x.y:8080/p") === Some("http://x.y:8080/p"))
    // no default-port rule for other schemes
    assert(norm("ftp://x.y:21/p") === Some("ftp://x.y:21/p"))
    // empty port: colon dropped
    assert(norm("http://x.y:/p") === Some("http://x.y/p"))
  }

  test("fragment and userinfo drop; empty path becomes /") {
    assert(norm("http://u:p@Host.com/a#frag?notquery") === Some("http://host.com/a"))
    assert(norm("http://host.com") === Some("http://host.com/"))
    assert(norm("http://host.com?a=1") === Some("http://host.com/?a=1"))
    assert(norm("http://host.com#f") === Some("http://host.com/"))
  }

  test("tracking params drop (case-insensitive name), survivors decode and sort bytewise") {
    assert(norm("http://h.co/p?utm_source=x&b=2&a=1") === Some("http://h.co/p?a=1&b=2"))
    assert(norm("http://h.co/p?UTM_Campaign=x&gclid=1&fbclid=2") === Some("http://h.co/p"))
    // valueless params filter by their own name; empty pieces drop
    assert(norm("http://h.co/p?&q&ref") === Some("http://h.co/p?q"))
    // decode BEFORE sort: %41 ('A', 0x41) sorts before 'B'
    assert(norm("http://h.co/p?x=%41&x=B") === Some("http://h.co/p?x=A&x=B"))
  }

  test("percent-decode: one pass, unreserved only, invalid sequences verbatim") {
    assert(norm("http://h.co/%41%7e%2F%zz%4") === Some("http://h.co/A~%2F%zz%4"))
    // %2541: %25 is reserved ('%'), stays; the 41 is consumed as its text
    assert(norm("http://h.co/%2541") === Some("http://h.co/%2541"))
    // "%4%41": the %4 is invalid, %41 decodes — no re-scan of the output
    assert(norm("http://h.co/%4%41") === Some("http://h.co/%4A"))
  }

  test("invalid URLs and empty hosts are null; null propagates") {
    assert(norm("not a url") === None)
    assert(norm("1http://x.y/") === None)
    assert(norm("http://") === None)
    assert(norm("http://@/p") === None)
    val r = Seq[(Integer, String)]((1, null)).toDF("i", "u")
      .select(UrlExprs.urlNormalize(col("u"))).collect().head
    assert(r.isNullAt(0))
  }

  test("url_host: parse-only surface") {
    assert(host("HTTPS://User@Some.Host.IO:9999/x?y#z") === Some("some.host.io"))
    assert(host("garbage") === None)
  }

  test("registrable_domain: listed suffixes, multi-label before TLD, fallbacks") {
    assert(dom("www.example.com") === Some("example.com"))
    assert(dom("blog.deep.example.co.uk") === Some("example.co.uk"))
    assert(dom("example.co.uk") === Some("example.co.uk"))
    // bare public suffix: nothing registrable
    assert(dom("co.uk") === None)
    assert(dom("com") === None)
    // unknown TLD: PSL '*' default — last two labels
    assert(dom("a.b.internal") === Some("b.internal"))
    assert(dom("intranethost") === None)
    // IPv4 literal is its own domain
    assert(dom("192.168.0.1") === Some("192.168.0.1"))
    // degenerate hosts stay null, not garbage
    assert(dom(".com") === None)
    assert(dom("a..internal") === None)
    // trailing-dot (FQDN-root) hosts yield NULL — the documented
    // contract (the final label is empty; root dots are not stripped),
    // matching the DuckDB oracle's identical label walk
    assert(dom("a.b.c.") === None)
    assert(dom("example.com.") === None)
  }

  test("SQL registration: url_normalize / url_host / registrable_domain callable from SQL") {
    graft.GraftFunctions.register(spark)
    val row = spark.sql(
      """SELECT url_normalize('HTTP://A.Example.COM:80/x?utm_source=1&k=v') AS n,
                url_host('http://u@B.co:1/p') AS h,
                registrable_domain('x.y.example.org') AS d""").collect().head
    assert(row.getString(0) == "http://a.example.com/x?k=v")
    assert(row.getString(1) == "b.co")
    assert(row.getString(2) == "example.org")
  }
}
