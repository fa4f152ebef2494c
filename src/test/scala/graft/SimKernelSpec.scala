package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.SimKernel

/** rapidfuzz-parity suite for the Indel/token-sort kernels (SURVEY.md §2.8,
  * FIXTURES.md B5). Recorded values follow the published rapidfuzz
  * definition (Indel ratio = 100*(1 - dist/(|a|+|b|)), dist =
  * insert/delete-only edit distance). Property checks use seeded random
  * corpora (deterministic).
  */
class SimKernelSpec extends AnyFunSuite {

  private val recorded = Seq(
    ("this is a test", "this is a test!", 96.5517), // rapidfuzz docs example
    ("kitten", "sitting", 61.5385),                 // LCS=4 → dist 5 / 13
    ("abc", "abc", 100.0),
    ("abc", "", 0.0),
    ("", "", 100.0),
    ("ab", "ba", 50.0),                             // LCS=1 → dist 2 / 4
    ("flaw", "lawn", 75.0),                         // LCS=3 → dist 2 / 8
    ("CA", "ABC", 40.0),                            // LCS=1 → dist 3 / 5
    ("Acme Pty Ltd", "Acme Pty Ltd", 100.0))

  test("indelRatio matches recorded rapidfuzz values") {
    recorded.foreach { case (a, b, want) =>
      val got = SimKernel.indelRatio(a, b)
      assert(math.abs(got - want) < 5e-4, s"($a, $b): got $got want $want")
    }
  }

  test("tokenSortRatio is invariant to token order (fuzzywuzzy doc example)") {
    assert(SimKernel.tokenSortRatio(
      "fuzzy wuzzy was a bear", "wuzzy fuzzy was a bear") == 100.0)
    assert(SimKernel.tokenSortRatio("new york mets", "mets new york") == 100.0)
  }

  test("tokenSortRatio is case-sensitive (no default preprocessing — " +
      "SURVEY.md §2.4 J4 fine print)") {
    assert(SimKernel.tokenSortRatio("ACME", "acme") < 100.0)
  }

  private val vocab = Vector("acme", "pty", "ltd", "group", "services",
    "the", "australia", "mining", "&", "co")
  private def randomName(rng: scala.util.Random): String =
    Seq.fill(1 + rng.nextInt(4))(vocab(rng.nextInt(vocab.size))).mkString(" ")

  test("property: symmetry, bounds, identity (seeded corpus)") {
    val rng = new scala.util.Random(42)
    (1 to 300).foreach { _ =>
      val a = randomName(rng); val b = randomName(rng)
      val r = SimKernel.indelRatio(a, b)
      assert(r >= 0.0 && r <= 100.0)
      assert(math.abs(r - SimKernel.indelRatio(b, a)) < 1e-12)
      assert(SimKernel.indelRatio(a, a) == 100.0)
      val ts = SimKernel.tokenSortRatio(a, b)
      assert(ts >= 0.0 && ts <= 100.0)
      assert(math.abs(ts - SimKernel.tokenSortRatio(b, a)) < 1e-12)
      val shuffled = rng.shuffle(a.split("\\s+").toSeq).mkString(" ")
      assert(SimKernel.tokenSortRatio(a, shuffled) == 100.0)
    }
  }

  test("indel distance = |a|+|b| - 2*LCS (cross-check vs brute-force LCS)") {
    def lcsBrute(a: String, b: String): Int = {
      val dp = Array.ofDim[Int](a.length + 1, b.length + 1)
      for (i <- 1 to a.length; j <- 1 to b.length)
        dp(i)(j) =
          if (a(i - 1) == b(j - 1)) dp(i - 1)(j - 1) + 1
          else math.max(dp(i - 1)(j), dp(i)(j - 1))
      dp(a.length)(b.length)
    }
    val rng = new scala.util.Random(7)
    (1 to 500).foreach { _ =>
      val a = Seq.fill(rng.nextInt(10))("abcd" (rng.nextInt(4))).mkString
      val b = Seq.fill(rng.nextInt(10))("abcd" (rng.nextInt(4))).mkString
      assert(SimKernel.indelDistance(a, b) ==
        a.length + b.length - 2 * lcsBrute(a, b), s"a=$a b=$b")
    }
  }
}
