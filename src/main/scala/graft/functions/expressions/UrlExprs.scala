package graft.functions.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

import java.util.Locale

/** URL canonicalization front door — the dedup key every web corpus
  * groups by BEFORE any content fingerprinting (CommonCrawl-style
  * pipelines dedup by canonical URL, then by registrable domain, then
  * by content): the same page arrives as `HTTP://Site.com:80/a?b=1&
  * utm_source=feed#frag` and `http://site.com/a?b=1`, and
  * un-canonicalized keys silently split URL-dedup groups and domain
  * rollups. Not present in the reference (its IRC pipeline has no URL
  * stage); the operator family follows the q130 unicode-front-door
  * pattern: native codegen scan expressions + a DuckDB string-op
  * oracle (q142).
  *
  * Three native expressions (scan-fused, no UDF, per-row state-free):
  *
  *  - `url_normalize(url)` — RFC-3986-flavored canonical form with
  *    EXACTLY these documented steps (each reproducible in DuckDB
  *    v1.0 SQL, which has no URL functions — the oracle re-derives
  *    the whole chain from regexp/string/list ops):
  *      1. trim ASCII spaces; require `scheme://` where scheme is
  *         `[A-Za-z][A-Za-z0-9+.-]*`, else NULL;
  *      2. lowercase the scheme;
  *      3. drop the fragment (first `#` onward, wherever it appears
  *         after the scheme);
  *      4. authority = up to the first `/` or `?`; drop userinfo
  *         (through the LAST `@`); lowercase host and port; split the
  *         port at the LAST `:` (no IPv6 bracket handling —
  *         documented out of scope); empty host ⇒ NULL;
  *      5. drop the port when empty, `http:80`, or `https:443`;
  *      6. percent-decode the path ONE pass, UNRESERVED characters
  *         only (ALPHA / DIGIT / `-._~` — decoding `%2F` would change
  *         the path structure); empty path ⇒ `/`;
  *      7. query: split on `&`, drop empty params and params whose
  *         lowercased NAME (before `=`) is in the drop list (default
  *         [[UrlExprs.DefaultDropParams]]: the utm_ family, gclid,
  *         fbclid, ...),
  *         percent-decode each survivor (same unreserved rule), SORT
  *         bytewise, rejoin; empty ⇒ no `?`.
  *    The percent-decode is defined split-on-`%`-wise so the DuckDB
  *    twin (string_split + list_transform) is EXACTLY the same
  *    function — no "close enough" decoding.
  *  - `url_host(url)` — steps 1–4 alone: the normalized host, NULL
  *    when unparseable.
  *  - `registrable_domain(host)` — eTLD+1 against a suffix list
  *    (longest match wins). The built-in seed list
  *    ([[UrlExprs.DefaultSuffixes]]) covers the common public
  *    suffixes; production callers pass the full PSL (external data —
  *    deliberately not vendored). Rules: NULL host ⇒ NULL; an
  *    all-digits-and-dots host (IPv4 literal) is its own "domain"; a
  *    bare public suffix ⇒ NULL; a listed suffix match takes one more
  *    label; an unknown TLD falls back to the last two non-empty
  *    labels (the PSL `*` default), NULL for single-label hosts.
  *
  * Cost shape: one pass per row, output proportional to input, no
  * lookup tables beyond the broadcast-by-reference drop/suffix
  * arrays — fuses into the scan stage like [[UnicodeNormExprs]].
  */
object UrlExprs {

  /** Tracking parameters dropped by default (lowercased names). */
  val DefaultDropParams: Seq[String] = Seq(
    "utm_source", "utm_medium", "utm_campaign", "utm_term", "utm_content",
    "utm_id", "gclid", "fbclid", "msclkid", "mc_cid", "mc_eid", "igshid",
    "ref", "ref_src", "spm")

  /** Seed public-suffix list (longest-match; extend with the full PSL
    * in production). Multi-label suffixes must precede their parent
    * TLD in match priority — [[sortedSuffixes]] enforces the order.
    */
  val DefaultSuffixes: Seq[String] = Seq(
    "co.uk", "org.uk", "ac.uk", "gov.uk", "me.uk",
    "com.au", "net.au", "org.au",
    "co.jp", "or.jp", "ne.jp", "ac.jp",
    "co.nz", "co.in", "co.kr", "co.za",
    "com.br", "com.cn", "com.tw", "com.mx", "com.ar", "com.sg", "com.hk",
    "com", "org", "net", "edu", "gov", "mil", "int",
    "io", "ai", "co", "dev", "app", "info", "biz", "xyz",
    "de", "fr", "it", "nl", "es", "pt", "se", "no", "fi", "dk", "pl",
    "cz", "ru", "ch", "at", "be", "eu",
    "us", "uk", "ca", "jp", "cn", "in", "br", "mx", "au", "nz", "kr",
    "tv", "me", "cc")

  private[expressions] def sortedSuffixes(s: Seq[String]): Array[String] =
    s.distinct.sortBy(x => (-x.length, x)).toArray

  // ==== Column API ==========================================================

  def urlNormalize(c: Column, drop: Seq[String] = DefaultDropParams): Column =
    Bridge.column(UrlNormalizeExpr(Bridge.expression(c), drop))

  def urlHost(c: Column): Column =
    Bridge.column(UrlHostExpr(Bridge.expression(c)))

  def registrableDomain(c: Column, suffixes: Seq[String] = DefaultSuffixes): Column =
    Bridge.column(RegistrableDomainExpr(Bridge.expression(c), suffixes))

  // ==== kernels (static: called from both eval and generated code) ==========

  private def trimSpaces(s: String): String = {
    var a = 0
    var b = s.length
    while (a < b && s.charAt(a) == ' ') a += 1
    while (b > a && s.charAt(b - 1) == ' ') b -= 1
    if (a == 0 && b == s.length) s else s.substring(a, b)
  }

  private def hexVal(c: Char): Int =
    if (c >= '0' && c <= '9') c - '0'
    else if (c >= 'A' && c <= 'F') c - 'A' + 10
    else if (c >= 'a' && c <= 'f') c - 'a' + 10
    else -1

  private def isUnreserved(code: Int): Boolean =
    (code >= '0' && code <= '9') || (code >= 'A' && code <= 'Z') ||
      (code >= 'a' && code <= 'z') ||
      code == '-' || code == '.' || code == '_' || code == '~'

  /** One-pass unreserved-only percent decode; every non-decodable `%`
    * passes through verbatim. Definitionally equal to the oracle's
    * split-on-% formulation (decoded output never contains `%`, so no
    * new decode sites can appear).
    */
  private[expressions] def pctDecode(s: String): String = {
    if (s.indexOf('%') < 0) return s
    val sb = new java.lang.StringBuilder(s.length)
    var p = 0
    val n = s.length
    while (p < n) {
      val c = s.charAt(p)
      if (c == '%' && p + 2 < n) {
        val h1 = hexVal(s.charAt(p + 1))
        val h2 = hexVal(s.charAt(p + 2))
        val code = h1 * 16 + h2
        if (h1 >= 0 && h2 >= 0 && isUnreserved(code)) {
          sb.append(code.toChar)
          p += 3
        } else {
          sb.append(c)
          p += 1
        }
      } else {
        sb.append(c)
        p += 1
      }
    }
    sb.toString
  }

  /** Parse out (scheme, host, port) — null when invalid. */
  private def parse(s0: String): (String, String, String, String) = {
    val s = trimSpaces(s0)
    val idx = s.indexOf("://")
    if (idx <= 0) return null
    var i = 1
    while (i < idx) {
      val c = s.charAt(i)
      val ok = (c >= 'A' && c <= 'Z') || (c >= 'a' && c <= 'z') ||
        (c >= '0' && c <= '9') || c == '+' || c == '.' || c == '-'
      if (!ok) return null
      i += 1
    }
    val c0 = s.charAt(0)
    if (!((c0 >= 'A' && c0 <= 'Z') || (c0 >= 'a' && c0 <= 'z'))) return null
    val scheme = s.substring(0, idx).toLowerCase(Locale.ROOT)
    var rest = s.substring(idx + 3)
    val hi = rest.indexOf('#')
    if (hi >= 0) rest = rest.substring(0, hi)
    var ae = 0
    while (ae < rest.length && rest.charAt(ae) != '/' && rest.charAt(ae) != '?') ae += 1
    var auth = rest.substring(0, ae)
    val pq = rest.substring(ae)
    val at = auth.lastIndexOf('@')
    if (at >= 0) auth = auth.substring(at + 1)
    auth = auth.toLowerCase(Locale.ROOT)
    val ci = auth.lastIndexOf(':')
    val (host, port) =
      if (ci >= 0) (auth.substring(0, ci), auth.substring(ci + 1)) else (auth, "")
    if (host.isEmpty) return null
    (scheme, host, port, pq)
  }

  def normalize(u: UTF8String, drop: java.util.Set[String]): UTF8String = {
    if (u == null) return null
    val parsed = parse(u.toString)
    if (parsed == null) return null
    val (scheme, host, port, pq) = parsed
    val keepPort = port.nonEmpty &&
      !(scheme == "http" && port == "80") && !(scheme == "https" && port == "443")
    var path = pq
    var query: String = null
    val qi = pq.indexOf('?')
    if (qi >= 0) {
      path = pq.substring(0, qi)
      query = pq.substring(qi + 1)
    }
    val dp = pctDecode(path)
    val pathOut = if (dp.isEmpty) "/" else dp
    val qOut =
      if (query == null) ""
      else {
        val kept = query.split("&", -1).toIndexedSeq
          .filter { p =>
            if (p.isEmpty) false
            else {
              val eq = p.indexOf('=')
              val name = (if (eq >= 0) p.substring(0, eq) else p).toLowerCase(Locale.ROOT)
              !drop.contains(name)
            }
          }
          .map(pctDecode)
          // bytewise (UTF-8 binary) order — the collation array_sort
          // and DuckDB list_sort both use
          .map(UTF8String.fromString)
          .sorted
        if (kept.isEmpty) "" else kept.mkString("?", "&", "")
      }
    UTF8String.fromString(
      scheme + "://" + host + (if (keepPort) ":" + port else "") + pathOut + qOut)
  }

  def host(u: UTF8String): UTF8String = {
    if (u == null) return null
    val parsed = parse(u.toString)
    if (parsed == null) null else UTF8String.fromString(parsed._2)
  }

  def registrable(hostStr: UTF8String, suffixes: Array[String]): UTF8String = {
    if (hostStr == null) return null
    val h = hostStr.toString
    if (h.isEmpty) return null
    var digitsAndDots = true
    var i = 0
    while (i < h.length && digitsAndDots) {
      val c = h.charAt(i)
      if (!((c >= '0' && c <= '9') || c == '.')) digitsAndDots = false
      i += 1
    }
    if (digitsAndDots) return hostStr
    var si = 0
    while (si < suffixes.length) {
      val s = suffixes(si)
      if (h == s) return null // bare public suffix
      if (h.length > s.length + 1 && h.endsWith(s) &&
        h.charAt(h.length - s.length - 1) == '.') {
        val prefix = h.substring(0, h.length - s.length - 1)
        val li = prefix.lastIndexOf('.')
        val label = if (li < 0) prefix else prefix.substring(li + 1)
        return if (label.isEmpty) null else UTF8String.fromString(label + "." + s)
      }
      si += 1
    }
    // unknown TLD: PSL '*' default — the last two labels. A
    // trailing-dot host ('a.b.c.') yields NULL here (the final label
    // is empty), matching the DuckDB oracle's identical walk — FQDN
    // root dots are not normalized away, by contract.
    val li = h.lastIndexOf('.')
    if (li < 0 || li == h.length - 1) return null
    val prefix = h.substring(0, li)
    val li2 = prefix.lastIndexOf('.')
    val label = if (li2 < 0) prefix else prefix.substring(li2 + 1)
    if (label.isEmpty) null else UTF8String.fromString(label + "." + h.substring(li + 1))
  }
}

abstract class UrlExprBase extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${child.dataType.catalogString}")

  override def dataType: DataType = StringType

  // invalid input -> NULL even for non-null children
  override def nullable: Boolean = true
}

case class UrlNormalizeExpr(child: Expression, drop: Seq[String])
  extends UrlExprBase {
  override def prettyName: String = "url_normalize"

  @transient private lazy val dropSet: java.util.HashSet[String] = {
    val set = new java.util.HashSet[String]()
    drop.foreach(p => set.add(p.toLowerCase(Locale.ROOT)))
    set
  }

  override protected def nullSafeEval(input: Any): Any =
    UrlExprs.normalize(input.asInstanceOf[UTF8String], dropSet)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("urlDropParams", dropSet, "java.util.HashSet")
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.expressions.UrlExprs.normalize($c, $ref);
      ${ev.isNull} = ${ev.value} == null;
    """)
  }

  override protected def withNewChildInternal(newChild: Expression): UrlNormalizeExpr =
    copy(child = newChild)
}

case class UrlHostExpr(child: Expression) extends UrlExprBase {
  override def prettyName: String = "url_host"

  override protected def nullSafeEval(input: Any): Any =
    UrlExprs.host(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.expressions.UrlExprs.host($c);
      ${ev.isNull} = ${ev.value} == null;
    """)

  override protected def withNewChildInternal(newChild: Expression): UrlHostExpr =
    copy(child = newChild)
}

case class RegistrableDomainExpr(child: Expression, suffixes: Seq[String])
  extends UrlExprBase {
  override def prettyName: String = "registrable_domain"

  @transient private lazy val sorted: Array[String] =
    UrlExprs.sortedSuffixes(suffixes)

  override protected def nullSafeEval(input: Any): Any =
    UrlExprs.registrable(input.asInstanceOf[UTF8String], sorted)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pslSuffixes", sorted, "java.lang.String[]")
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.expressions.UrlExprs.registrable($c, $ref);
      ${ev.isNull} = ${ev.value} == null;
    """)
  }

  override protected def withNewChildInternal(newChild: Expression): RegistrableDomainExpr =
    copy(child = newChild)
}
