package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.SimKernel._

/** WRatio family kernel semantics (F12's `process.extractOne` default
  * scorer, data_cleaning.py:50): full_process, partial alignment,
  * token_set constructions, composition scales/breakpoints, and the two
  * documented refinements over bug-compatible fuzzywuzzy (empty-partial
  * scores 0; complete window search). Hand-computed expectations. */
class WRatioSpec extends AnyFunSuite {

  test("fullProcess: non-alnum -> space (runs kept), lowercase, trim, non-ascii dropped") {
    assert(fullProcess("N.S.W.") == "n s w")
    assert(fullProcess("  Acme-Widgets  Pty. Ltd ") == "acme widgets  pty  ltd")
    assert(fullProcess("café") == "caf") // é dropped (force_ascii)
    assert(fullProcess("!!!") == "")
    // \W preserves underscores as word chars — one token, not three
    assert(fullProcess("SOUTH_AUSTRALIA_HOLDINGS") == "south_australia_holdings")
  }

  test("partialRatio: perfect substring window scores 100; empty scores 0") {
    assert(partialRatio("abc", "xxabcxx") == 100.0)
    assert(partialRatio("xxabcxx", "abc") == 100.0) // symmetric via swap
    assert(partialRatio("", "abc") == 0.0)
    assert(partialRatio("abc", "") == 0.0)
    // equal lengths degrade to plain Indel ratio
    assert(partialRatio("abcd", "abxd") == indelRatio("abcd", "abxd"))
    // best window: "nsw" against "n s w" -> best 3-char window scores 2/3
    assert(math.abs(partialRatio("nsw", "n s w") - 100.0 * 2.0 / 3.0) < 1e-9)
  }

  test("tokenSetRatio: containment of token sets scores 100; disjoint sets stay low") {
    assert(tokenSetRatio("harbour mining", "mining harbour") == 100.0)
    assert(tokenSetRatio("nsw", "nsw australia") == 100.0) // sect == one side
    assert(tokenSetRatio("alpha beta", "gamma delta") < 50.0)
    // empty intersection must NOT inflate the partial variant (refinement 1)
    assert(partialTokenSetRatio("alpha beta", "gamma delta") < 100.0)
  }

  test("wratio: composition, scales, and breakpoints") {
    assert(wratio("Queensland", "QUEENSLAND") == 100.0)
    assert(wratio("", "x") == 0.0)
    assert(wratio("!!!", "x") == 0.0) // empty after processing
    // same token multiset, different order, equal length -> 0.95 * 100
    assert(math.abs(wratio("mining harbour", "harbour mining") - 95.0) < 1e-9)
    // containment with len_ratio 13/3 > 1.5 (< 8): partial_ratio 100 * 0.9
    assert(math.abs(wratio("NSW AUSTRALIA", "NSW") - 90.0) < 1e-9)
    // extreme length ratio > 8 drops the partial scale to 0.6
    val longSide = ("nsw " * 7).trim + " extra words here" // len >= 8 * 3
    assert(wratio(longSide, "nsw") <= 60.0 + 1e-9)
    // boundary: len_ratio EXACTLY 8 keeps scale 0.9 (fuzzywuzzy `> 8`)
    assert(math.abs(wratio("sa dept of mines", "sa") - 90.0) < 1e-9) // 16/2 = 8
    assert(wratio("abcdefghX", "a") <= 60.0 + 1e-9) // 9/1 > 8 -> 0.6
    // junk vs a state alias stays under the reference's 85 gate
    assert(wratio("xyzzy", "queensland") < 85.0)
    assert(wratio("quebec", "queensland") < 85.0)
  }

  test("wratio is symmetric") {
    val pairs = Seq(
      ("new south wales", "nsw"), ("victorias", "victoria"),
      ("acme pty ltd", "acme group"), ("a", "abcdefghij"))
    pairs.foreach { case (a, b) =>
      assert(wratio(a, b) == wratio(b, a), s"($a, $b)")
    }
  }
}
