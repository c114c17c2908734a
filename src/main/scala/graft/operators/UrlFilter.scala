package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Domain blocklist filtering — the FIRST stage of a CC-class front
  * door (spam/adult/malware domain lists applied before anything else
  * is spent on a capture): a doc is blocked when its REGISTRABLE
  * domain is listed, so `www.` / `cdn.` / any-subdomain variants of a
  * listed domain block together (derive the domain with
  * `registrable_domain(url_host(url))` — the q142 natives — before
  * calling; matching on raw hosts is the classic blocklist bypass).
  * (Reference analogue: none; training-data-pipeline extension.)
  *
  * The blocklist is a `(domain)` frame, bounded by contract (curated
  * lists are 10⁴–10⁷ rows — broadcast-sized by construction); it
  * broadcasts into ONE hash join against the already-derived domain
  * column, so the corpus side never shuffles and the stage is a pure
  * scan + broadcast probe — streaming-composable like every other
  * front-door gate. NULL domains (unparseable URLs) are NOT blocked
  * by the list — route them to quarantine explicitly if the pipeline
  * wants that; a blocklist silently eating parse failures is how
  * corpora lose whole protocols.
  */
object UrlFilter {

  /** Every input row + `blocked: boolean` — the auditable form (count
    * what the list costs before enforcing it).
    */
  def markBlocked(
      docs: DataFrame,
      domainCol: String,
      blocklist: DataFrame): DataFrame = {
    val bl = blocklist
      .select(col(blocklist.columns.head).cast("string").alias("__bl_domain"))
      .distinct()
      .withColumn("__bl", lit(true))
    docs
      .join(broadcast(bl), docs(domainCol) === col("__bl_domain"), "left")
      .drop("__bl_domain")
      .withColumn("blocked", coalesce(col("__bl"), lit(false)))
      .drop("__bl")
  }

  /** The enforcement form: rows whose domain is NOT listed (null
    * domains pass — see the object scaladoc). One broadcast anti-join.
    */
  def keepAllowed(
      docs: DataFrame,
      domainCol: String,
      blocklist: DataFrame): DataFrame = {
    val bl = blocklist
      .select(col(blocklist.columns.head).cast("string").alias("__bl_domain"))
      .distinct()
    docs.join(
      broadcast(bl), docs(domainCol) === col("__bl_domain"), "left_anti")
  }

  /** Path-PREFIX blocklist (round 20) — the UT1-style rung BELOW the
    * domain list: block by URL path prefix across domains
    * (`/search`, `/tag/`, `/login` — the machine-generated page
    * classes a domain list can't name). Matching is on the
    * NORMALIZED path ([[graft.functions.expressions.UrlExprs
    * .urlNormalize]]: fragment dropped, query split off, unreserved
    * percent-escapes decoded), so the classic `%`-encoded evasion
    * (`/t%61g/…`) blocks under the plain `/tag/` entry — the q159
    * subdomain-rotation lesson, path edition. The prefix list is
    * config-scale by contract and compiles to a literal OR chain on
    * the scan — no join, no broadcast, no exchange at all (cheaper
    * than the domain list's anti-join). Unparseable URLs carry a
    * null path and PASS ([[markBlocked]]'s null rule; chain a
    * parseability gate first when that matters).
    *
    * Audit form: every row + `path` + `blocked`. Enforcement:
    * [[keepAllowedByPath]].
    */
  def markBlockedByPath(
      docs: DataFrame,
      urlCol: String,
      prefixes: Seq[String]): DataFrame = {
    require(prefixes.nonEmpty, "markBlockedByPath needs at least one prefix")
    Seq("path", "blocked").filter(docs.columns.contains).foreach { c =>
      throw new IllegalArgumentException(
        s"markBlockedByPath reserves column name '$c'; rename it in the input first")
    }
    // path materializes ONCE; the prefix tests reference the column, so
    // the plan carries one normalize kernel, not one per list entry
    val withPath = docs.withColumn("path", pathOf(col(urlCol)))
    val hit = prefixes.map(p => col("path").startsWith(lit(p))).reduce(_ || _)
    withPath.withColumn("blocked", coalesce(hit, lit(false)))
  }

  /** [[markBlockedByPath]]'s enforcement form: listed-path rows drop,
    * everything else (null paths included) passes, input columns
    * untouched. Pure scan filter (the path rides an internal reserved
    * column that is dropped again).
    */
  def keepAllowedByPath(
      docs: DataFrame,
      urlCol: String,
      prefixes: Seq[String]): DataFrame = {
    require(prefixes.nonEmpty, "keepAllowedByPath needs at least one prefix")
    val tmp = "__graft_url_path"
    val hit = prefixes.map(p => col(tmp).startsWith(lit(p))).reduce(_ || _)
    docs
      .withColumn(tmp, pathOf(col(urlCol)))
      .filter(!coalesce(hit, lit(false)))
      .drop(tmp)
  }

  /** The normalized PATH from the [[graft.functions.expressions
    * .UrlExprs.urlNormalize]] form: strip scheme+authority with one
    * ANCHORED regex (negated classes — identical semantics in Java
    * and RE2), then split off the query at the FIRST `?`
    * (`substring_index` / `string_split(...)[1]` — deliberately NOT a
    * `.*$`-style regex, whose `.` and `$` treat line terminators
    * differently across the two engines).
    */
  private def pathOf(url: Column): Column =
    substring_index(
      regexp_replace(
        graft.functions.expressions.UrlExprs.urlNormalize(url),
        "^[a-z][a-z0-9+.-]*://[^/?]*", ""),
      "?", 1)
}
