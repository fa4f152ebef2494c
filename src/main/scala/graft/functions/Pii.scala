package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** PII detection + redaction column functions for training-data
  * pipelines: mask email addresses and phone-number-shaped digit runs
  * before a corpus leaves the cleaning stage (the standard pre-training
  * hygiene pass; the reference pipeline extracts these shapes —
  * `/root/reference/extract/commoncrawl_scraper.py:84-89` — this is the
  * inverse operation, removal instead of harvest).
  *
  * Patterns are deliberately restricted to the regex intersection of
  * java.util.regex and RE2 (no lookaround, no backreferences) so any
  * RE2-based engine (DuckDB, Go, Hyperscan pre-filters) applies the SAME
  * masking — which is also what lets the driver's DuckDB oracle verify
  * redaction byte-for-byte. All functions are codegen'd builtin
  * compositions: map-only, no shuffle, fused into the scan.
  */
object Pii {

  /** Email shape (local@domain.tld). Same character-class policy as the
    * reference's harvest regex, minus lookaround. */
  val emailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"

  /** Phone-number shape: optional +, then ≥8 chars of digits with
    * space/hyphen separators, starting and ending on a digit. */
  val phonePattern = "\\+?[0-9][0-9 -]{6,}[0-9]"

  def redactEmails(c: Column, token: String = "[EMAIL]"): Column =
    regexp_replace(c, emailPattern, token)

  def redactPhones(c: Column, token: String = "[PHONE]"): Column =
    regexp_replace(c, phonePattern, token)

  /** Full redaction chain. Email first: an email's local part may contain
    * digit runs that the phone pattern would otherwise split. */
  def redact(c: Column): Column = redactPhones(redactEmails(c))

  def emailCount(c: Column): Column =
    regexp_count(c, lit(emailPattern)).cast("long")

  def phoneCount(c: Column): Column =
    regexp_count(c, lit(phonePattern)).cast("long")
}
