package graft

import org.scalatest.funsuite.AnyFunSuite

/** Winner-selection rule for bench sweep attempts (r19 regression: an
  * attempt whose EVERY query failed — all timings and control ratios -1.0 —
  * slipped past the `ratio > 1.3` noise test, was classified calm, won the
  * attempt loop, and clobbered the committed per-query record with sentinel
  * garbage). These pin the rule: invalid attempts never win over valid ones,
  * calm+valid wins chronologically, all-invalid surfaces the failure. */
class BenchSelectionSpec extends AnyFunSuite {

  private def att(noisy: Boolean, valid: Boolean, worstRatio: Double,
                  tag: Double): Bench.Attempt =
    Bench.Attempt(
      results = Seq("q" -> tag),
      samples = Seq.empty,
      worst = Map("c" -> (worstRatio, worstRatio)),
      load1Start = 0, load5Start = 0, load1End = 0, load5End = 0,
      userSec = 1, sysSec = 0, sysRatio = 0,
      readBytes = 0L, writeBytes = 0L,
      wallSec = 1, contended = false, noisy = noisy, valid = valid)

  private def tagOf(a: Bench.Attempt): Double = a.results.head._2

  test("first calm+valid attempt wins in chronological order") {
    // list is newest-first; attempt 1 (tag 1.0) was calm+valid
    val attempts = List(att(noisy = false, valid = true, 1.0, tag = 2.0),
                        att(noisy = false, valid = true, 1.1, tag = 1.0))
    assert(tagOf(Bench.chooseAttempt(attempts)) == 1.0)
  }

  test("an invalid attempt never wins, even with calm-looking controls") {
    // the r19 shape: attempt 3 all-failed (ratios -1.0 look 'calm'),
    // attempts 1-2 noisy but valid → least-noisy VALID attempt wins
    val attempts = List(att(noisy = true, valid = false, -1.0, tag = 3.0),
                        att(noisy = true, valid = true, 1.9, tag = 2.0),
                        att(noisy = true, valid = true, 1.5, tag = 1.0))
    val w = Bench.chooseAttempt(attempts)
    assert(w.valid)
    assert(tagOf(w) == 1.0) // ratio 1.5 beats 1.9
  }

  test("all noisy but valid: least worst-control-ratio wins") {
    val attempts = List(att(noisy = true, valid = true, 1.4, tag = 2.0),
                        att(noisy = true, valid = true, 2.5, tag = 1.0))
    assert(tagOf(Bench.chooseAttempt(attempts)) == 2.0)
  }

  test("all invalid: last attempt surfaces the failure") {
    val attempts = List(att(noisy = true, valid = false, -1.0, tag = 2.0),
                        att(noisy = true, valid = false, -1.0, tag = 1.0))
    val w = Bench.chooseAttempt(attempts)
    assert(!w.valid && tagOf(w) == 2.0)
  }

  test("calm+valid beats an earlier noisy-valid attempt") {
    val attempts = List(att(noisy = false, valid = true, 1.05, tag = 2.0),
                        att(noisy = true, valid = true, 1.6, tag = 1.0))
    assert(tagOf(Bench.chooseAttempt(attempts)) == 2.0)
  }
}
