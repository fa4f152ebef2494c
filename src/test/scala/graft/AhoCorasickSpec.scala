package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.AhoCorasick
import graft.operators.TextAnalysis

/** Aho–Corasick blocklist kernel (q166): hand-verified overlapping
  * matches, failure-link traversal, output-chain suffix hits, a
  * randomized cross-check against the naive per-pattern position scan
  * (the oracle's semantics), and codegen presence. */
class AhoCorasickSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.session
  import spark.implicits._

  private def naive(text: String, patterns: Seq[String]): (Long, Int) = {
    val perPat = patterns.distinct.map { p =>
      (0 to text.length - p.length).count(i => text.startsWith(p, i))
    }
    (perPat.map(_.toLong).sum, perPat.count(_ > 0))
  }

  test("hand cases: overlaps, suffix output chains, failure links") {
    // overlapping occurrences of one pattern
    assert(new AhoCorasick(Seq("aa")).countMatches("aaaa") == (3L, 1))
    // suffix pattern fires with its superstring at the same position
    assert(new AhoCorasick(Seq("batch", "atch")).countMatches("batch") == (2L, 2))
    // failure links: "ab" then "ba" interleave through "ababab"
    assert(new AhoCorasick(Seq("ab", "ba")).countMatches("ababab") == (5L, 2))
    // classic AC example: he/she/his/hers over "ushers"
    assert(new AhoCorasick(Seq("he", "she", "his", "hers"))
      .countMatches("ushers") == (3L, 3))
    // absent pattern, empty text
    assert(new AhoCorasick(Seq("zz")).countMatches("abc") == (0L, 0))
    assert(new AhoCorasick(Seq("zz")).countMatches("") == (0L, 0))
    // duplicate patterns in the list count once
    assert(new AhoCorasick(Seq("ab", "ab")).countMatches("abab") == (2L, 1))
  }

  test("randomized cross-check vs the naive position scan (the oracle's " +
      "exact semantics) over a small alphabet that forces dense overlaps") {
    val rng = new scala.util.Random(42)
    val alphabet = "abc"
    (1 to 200).foreach { _ =>
      val patterns = (1 to (1 + rng.nextInt(5))).map(_ =>
        (1 to (1 + rng.nextInt(4)))
          .map(_ => alphabet(rng.nextInt(3))).mkString).distinct
      val text = (1 to rng.nextInt(60))
        .map(_ => alphabet(rng.nextInt(3))).mkString
      val ac = new AhoCorasick(patterns)
      assert(ac.countMatches(text) == naive(text, patterns),
        s"patterns=$patterns text=$text")
    }
  }

  test("operator shape: map-only, codegen'd, and the gate fires on the " +
      "real corpus") {
    val docs = Seq((1L, "a slow batch dup"), (2L, "clean text")).toDF("doc_id", "text")
    val out = TextAnalysis.blocklistGate(docs, "text", "doc_id",
      SketchParams.q166.patterns)
    val rows = out.collect().map(r => r.getLong(0) ->
      ((r.getLong(1), r.getLong(2), r.getBoolean(3)))).toMap
    // "a slow batch dup": slow, batch, atch, dup -> 4 matches, 4 patterns
    assert(rows(1L) == (4L, 4L, true), s"${rows(1L)}")
    assert(rows(2L) == (0L, 0L, false))
    // plan shape over the parquet-backed corpus (a local relation above
    // constant-folds into a LocalTableScan, hiding the expression)
    val real = SparkEntry.queries("q166_blocklist_gate")(
      spark, "/root/testdata/sf0.001")
    real.count()
    val plan = real.queryExecution.executedPlan.toString
    assert(plan.contains("blocklist_stats"), plan.take(800))
    assert(!plan.contains("Exchange"), "gate must be map-only")
    assert("\\*\\(\\d+\\)".r.findAllIn(plan).nonEmpty, "codegen stage missing")
  }
}
