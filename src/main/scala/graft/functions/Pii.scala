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

  /** Payment-card-shaped digit run: 13–19 digits on word boundaries
    * (PAN lengths per ISO/IEC 7812). Like the other patterns, inside
    * the java/RE2 intersection. */
  val cardPattern = "\\b[0-9]{13,19}\\b"

  /** Luhn (mod-10) checksum validity of a digit string — ISO/IEC
    * 7812-1: from the RIGHTMOST digit, double every second digit
    * (subtracting 9 when the double exceeds 9) and require the sum
    * ≡ 0 (mod 10). The checksum is what separates a real PAN from an
    * arbitrary digit run — redaction pipelines gate on it to kill the
    * false positives a bare length regex produces (order ids,
    * timestamps, hashes). Pure builtin-column arithmetic (reverse →
    * per-digit transform → aggregate), so it stays codegen'd and the
    * q167 oracle replays it digit-for-digit. */
  def luhnValid(s: Column): Column = {
    val rev = reverse(s)
    val terms = transform(split(rev, ""), (ch, i) => {
      val d = ch.cast("int")
      when(i % 2 === 1,
        when(d * 2 > 9, d * 2 - 9).otherwise(d * 2)).otherwise(d)
    })
    aggregate(terms, lit(0), (acc, t) => acc + t) % 10 === 0
  }

  /** The Luhn check digit that makes `payload + digit` valid — the
    * generator's half of the checksum (used by the q167 fixture to
    * synthesize known-valid and known-invalid runs in-query on both
    * engines). Position parity: the appended digit sits at position 1
    * (not doubled), so the payload's digits double from ITS rightmost
    * one. */
  def luhnCheckDigit(payload: Column): Column = {
    val rev = reverse(payload)
    val terms = transform(split(rev, ""), (ch, i) => {
      val d = ch.cast("int")
      when(i % 2 === 0,
        when(d * 2 > 9, d * 2 - 9).otherwise(d * 2)).otherwise(d)
    })
    (lit(10) - aggregate(terms, lit(0), (acc, t) => acc + t) % 10) % 10
  }

  /** Card scan + checksum-gated redaction: counts the card-shaped runs,
    * counts the Luhn-VALID ones, and replaces only the valid ones with
    * `token`. Each replacement is `\b`-ANCHORED (the same boundary the
    * candidate regex used), so a valid PAN that also occurs EMBEDDED in
    * a longer digit run — a 20+-digit sequence the 13-19 pattern never
    * extracted — is left alone there (ADVICE r13: plain substring
    * replace mangled such runs). Candidates are all-digit so they need
    * no regex quoting; the token contains no digits, so replacements
    * can never create or destroy other candidates, and the fold over
    * the valid list is order-independent. Map-only, fused with the
    * scan. */
  def cardScan(c: Column, token: String = "[CARD]"): Column = {
    val cands = regexp_extract_all(c, lit(cardPattern), lit(0))
    val valid = filter(cands, x => luhnValid(x))
    // the token rides regexp_replace's REPLACEMENT slot, where '\' and
    // '$' are escapes/group refs — quote them (Matcher.quoteReplacement
    // semantics) so a caller-supplied token is always literal
    val safeToken = token.replace("\\", "\\\\").replace("$", "\\$")
    struct(
      size(cands).cast("long").as("n_digit_runs"),
      size(valid).cast("long").as("n_valid_cards"),
      aggregate(valid, c, (acc, v) =>
        regexp_replace(acc, concat(lit("\\b"), v, lit("\\b")),
          lit(safeToken))).as("redacted"))
  }
}
