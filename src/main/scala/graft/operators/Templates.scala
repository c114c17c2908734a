package graft.operators

import graft.functions.TextFunctions
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Template-page detection by TAG-STRUCTURE fingerprinting — the
  * layout-level member of the dedup family: a site's templated pages
  * (product listings, profile pages, paginated archives) share an
  * essentially identical TAG SEQUENCE while their text differs, so
  * content dedup (exact/near/semantic) never groups them — but the
  * structure hash does, in one scan. The classic curation use: find
  * the machine-generated page FAMILIES, then cap/drop/deboilerplate
  * per family rather than per page. Complements `html_to_text` (q121,
  * which keeps text and drops tags — this keeps ONLY the tags) and
  * the domain-boilerplate rungs (q153/q156, which need shared SEGMENT
  * text; a template family can share zero text).
  * (Reference analogue: none; training-data-pipeline extension.)
  *
  * The fingerprint is the md5-60 of the lowercased, space-joined tag
  * NAME sequence in document order — opening and self-closing tags as
  * their name, closing tags with their `/` (so `<div><p></p></div>`
  * and `<div><p><p></p>`-style malformations differ), doctype and
  * comments excluded (`<!` matches no tag). Everything is built from
  * engine-portable natives (`regexp_extract_all` with an
  * RE2-compatible pattern — the q63 rule — plus the md5-60 hash), so
  * the DuckDB oracle reproduces every fingerprint bit-for-bit.
  *
  * Scale shape: the fingerprint is scan-side arithmetic; the family
  * table is one partial+final aggregate on a 60-bit key (the only
  * exchange anywhere); HTML/text never shuffles. [[markTemplated]]
  * broadcasts the family table back — template families are
  * config-scale by contract (a corpus has millions of pages but only
  * thousands of layouts).
  */
object Templates {

  /** RE2- and Java-compatible tag pattern: `<` + optional `/` + a
    * letter + alphanumerics. `<!DOCTYPE`, `<!--`, and bare `<` in text
    * match nothing.
    */
  val tagPattern: String = "<(/?[A-Za-z][A-Za-z0-9]*)"

  /** The structure hash: md5-60 over the lowercased space-joined tag
    * sequence. Empty/tagless HTML hashes the empty string (a valid,
    * shared "no structure" family).
    */
  def tagFingerprint(html: Column): Column =
    TextFunctions.md5Hash60(
      lower(array_join(regexp_extract_all(html, lit(tagPattern), lit(1)), " ")))

  /** One row per layout family: `(tag_fp, n_pages, first_doc,
    * is_template)` with `is_template = n_pages >= minPages` — the
    * audit/report form.
    */
  def templateFamilies(
      docs: DataFrame,
      idCol: String,
      htmlCol: String,
      minPages: Long): DataFrame =
    docs
      .select(col(idCol), tagFingerprint(col(htmlCol)).alias("tag_fp"))
      .groupBy("tag_fp")
      .agg(
        count(lit(1)).alias("n_pages"),
        min(col(idCol)).alias("first_doc"))
      .withColumn("is_template", col("n_pages") >= minPages)

  /** The enforcement form: every input row + its `tag_fp` +
    * `is_template` — family sizes aggregate once and broadcast back
    * onto the scan, so the corpus never shuffles. The join is
    * null-SAFE on `tag_fp`: null-html rows fingerprint to the null
    * family, which [[templateFamilies]] aggregates like any other key
    * — a plain equi-join would silently drop those rows and the two
    * forms would disagree on null input.
    */
  def markTemplated(
      docs: DataFrame,
      idCol: String,
      htmlCol: String,
      minPages: Long): DataFrame = {
    val fams = templateFamilies(docs, idCol, htmlCol, minPages)
      .select(col("tag_fp").alias("__graft_fam_fp"), col("is_template"))
    docs
      .withColumn("tag_fp", tagFingerprint(col(htmlCol)))
      .join(broadcast(fams), col("tag_fp") <=> col("__graft_fam_fp"))
      .drop("__graft_fam_fp")
  }

  /** Per-family cap ENFORCEMENT — the q147 domain-quota shape keyed on
    * the layout fingerprint: each template family contributes at most
    * `cap` pages (the seeded-hash sample within the family, so
    * membership is deterministic, nested in the cap, and
    * oracle-replayable), while families at or under the cap bypass
    * untouched. This is the front-door stage the family TABLE
    * ([[templateFamilies]]) only reports: "cap pages per layout" the
    * way the domain quota caps pages per registrable domain — the
    * dedup ladder's rung-13 action. Output: every admitted input row +
    * its `tag_fp`.
    *
    * Scale shape inherits [[graft.operators.Sampling.capPerGroup]]'s
    * two-phase plan: under-cap families (the long tail of layouts)
    * bypass via a broadcast anti-join with zero sort; only the few
    * over-cap families hash-exchange ON THE 60-BIT KEY and window
    * their own slice — HTML never keys an exchange.
    */
  def capPerFamily(
      docs: DataFrame,
      idCol: String,
      htmlCol: String,
      cap: Int,
      seed: Long = 42L): DataFrame =
    Sampling.capPerGroup(
      docs.withColumn("tag_fp", tagFingerprint(col(htmlCol))),
      idCol, "tag_fp", cap, seed)
}
