package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Pii

/** Luhn card PII (q167): the mod-10 validator against known test
  * numbers, the generator/validator round trip, and the general
  * multi-card redaction fold the oracle's ≤1-candidate CASE
  * specializes. */
class LuhnPiiSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.session
  import spark.implicits._

  private def validOf(nums: Seq[String]): Map[String, Boolean] =
    nums.toDF("s").select(col("s"), Pii.luhnValid(col("s")).as("v"))
      .collect().map(r => r.getString(0) -> r.getBoolean(1)).toMap

  test("validator: canonical Luhn test numbers") {
    val v = validOf(Seq(
      "4111111111111111",   // the classic Visa test PAN
      "4111111111111112",   // one digit off
      "79927398713",        // the textbook Luhn example
      "79927398710",        // its invalid sibling
      "4532015112830366",   // known-valid 16-digit
      "1234567890123456"))  // arbitrary run
    assert(v("4111111111111111") && v("79927398713") && v("4532015112830366"))
    assert(!v("4111111111111112") && !v("79927398710") &&
      !v("1234567890123456"))
  }

  test("generator/validator round trip: payload + check digit is always " +
      "valid, payload + (check+1) never is") {
    val payloads = (0 until 50).map(i =>
      "4" + f"${i * 987654321L % 100000000000000L}%014d")
    val rows = payloads.toDF("p")
      .select(col("p"), Pii.luhnCheckDigit(col("p")).as("c"))
      .select(
        Pii.luhnValid(concat(col("p"), col("c").cast("string"))).as("ok"),
        Pii.luhnValid(concat(col("p"),
          ((col("c") + 1) % 10).cast("string"))).as("bad"))
      .collect()
    assert(rows.forall(_.getBoolean(0)), "a generated check digit failed")
    assert(rows.forall(!_.getBoolean(1)), "check+1 passed the checksum")
  }

  test("cardScan general fold: multiple valid cards all redact, invalid " +
      "runs and short digit runs survive") {
    val text = "a 4111111111111111 b 4532015112830366 c " +
      "1234567890123456 d 12345 e 4111111111111111"
    val out = Seq(text).toDF("t")
      .select(Pii.cardScan(col("t")).as("s")).select("s.*").head()
    assert(out.getLong(0) == 4L, s"n_digit_runs ${out.getLong(0)}")
    assert(out.getLong(1) == 3L, s"n_valid_cards ${out.getLong(1)}")
    assert(out.getString(2) ==
      "a [CARD] b [CARD] c 1234567890123456 d 12345 e [CARD]",
      out.getString(2))
  }

  test("cardScan anchoring: a valid PAN embedded in a 20+-digit run is " +
      "not rewritten there (ADVICE r13)") {
    // the 24-digit run contains the valid PAN as a substring but is not
    // itself a candidate (13-19 pattern); the standalone occurrence IS
    val text = "x 4111111111111111 y 794111111111111111111111 z"
    val out = Seq(text).toDF("t")
      .select(Pii.cardScan(col("t")).as("s")).select("s.*").head()
    assert(out.getLong(0) == 1L, s"n_digit_runs ${out.getLong(0)}")
    assert(out.getLong(1) == 1L, s"n_valid_cards ${out.getLong(1)}")
    assert(out.getString(2) == "x [CARD] y 794111111111111111111111 z",
      out.getString(2))
  }

  test("cardScan token is literal even when it contains replacement " +
      "metacharacters '$' and '\\' (ADVICE r14)") {
    val text = "pay 4111111111111111 now"
    val out = Seq(text).toDF("t")
      .select(Pii.cardScan(col("t"), "<$0\\PAN>").as("s"))
      .select("s.*").head()
    assert(out.getString(2) == "pay <$0\\PAN> now", out.getString(2))
  }
}
