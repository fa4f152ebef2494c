package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.AbnKernel

/** ABN mod-89 checksum properties (SURVEY.md §5.2). */
class AbnSpec extends AnyFunSuite {

  /** Sample random 11-digit strings until one passes (P ≈ 1/89/try). */
  def makeValidAbn(rng: scala.util.Random): String =
    Iterator.continually("%011d".format(math.abs(rng.nextLong()) % 100000000000L))
      .take(100000).find(AbnKernel.isValid)
      .getOrElse(fail("no valid ABN in 100k samples"))

  test("the ATO's published example ABN validates") {
    assert(AbnKernel.isValid("51824753556"))       // ATO checksum doc example
    assert(AbnKernel.isValid("51 824 753 556"))    // spaces stripped
    assert(AbnKernel.isValid("51-824-753-556"))    // hyphens stripped
  }

  test("length and character gates") {
    assert(!AbnKernel.isValid(""))
    assert(!AbnKernel.isValid("1234567890"))    // 10 digits
    assert(!AbnKernel.isValid("123456789012")) // 12 digits
    assert(!AbnKernel.isValid("51824x53556"))  // non-digit
  }

  test("property: every single-digit mutation of a valid ABN fails " +
      "(weights < 89 prime ⇒ w·Δ ≢ 0 mod 89)") {
    val rng = new scala.util.Random(42)
    (1 to 50).foreach { _ =>
      val abn = makeValidAbn(rng)
      assert(AbnKernel.isValid(abn))
      for (pos <- 0 until 11; d <- '0' to '9' if d != abn(pos)) {
        val mutated = abn.updated(pos, d)
        assert(!AbnKernel.isValid(mutated), s"$abn -> $mutated")
      }
    }
  }

  test("clean keeps exactly-11-char strings, else null " +
      "(data_cleaning.py:71-75)") {
    assert(AbnKernel.clean("51 824 753 556") == "51824753556")
    assert(AbnKernel.clean("51824753556") == "51824753556")
    assert(AbnKernel.clean("518247535") == null)
    assert(AbnKernel.clean("5182475355678") == null)
  }
}
