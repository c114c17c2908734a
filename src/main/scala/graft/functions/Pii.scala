package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** PII detection and redaction over text columns — the privacy pass a
  * training corpus runs before anything else sees the data. All native
  * regex expressions (`regexp_extract_all` / `regexp_replace`, codegen'd,
  * shuffle-free); the patterns avoid lookarounds so they behave
  * identically under Java regex (Spark) and RE2 (DuckDB, for the
  * correctness oracle).
  *
  * Redaction order matters and is fixed: URLs first (their paths can
  * contain digit runs a phone pattern would half-match), then emails,
  * then phone numbers.
  */
object Pii {

  val emailPattern = "[a-z0-9.]+@[a-z][a-z.]+"
  val urlPattern = "https?://[^ ]+"
  val phonePattern = "[0-9]{3}-[0-9]{3}-[0-9]{4}"

  private def countMatches(c: Column, pattern: String): Column =
    size(regexp_extract_all(c, lit(pattern), lit(0))).cast("long")

  def emailCount(c: Column): Column = countMatches(c, emailPattern)
  def urlCount(c: Column): Column = countMatches(c, urlPattern)
  def phoneCount(c: Column): Column = countMatches(c, phonePattern)

  /** The text with every URL, email, and phone number replaced by a
    * bracketed tag.
    */
  def redact(c: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(c, urlPattern, "[URL]"),
        emailPattern, "[EMAIL]"),
      phonePattern, "[PHONE]")
}
