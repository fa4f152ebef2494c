package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Dedup, TextAnalysis}

/** Source-pair contamination matrix (q164) and the BPE compression
  * report (q165) on hand corpora with known answers. */
class CurationReportsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.session
  import spark.implicits._

  test("q164 semantics: shared trigram counts and directed containment " +
      "on a hand corpus; mirror sources show containment 1.0") {
    val docs = Seq(
      // site_a and mirror carry the identical doc -> containment 1 both ways
      ("site_a", "alpha beta gamma delta epsilon"),
      ("mirror", "alpha beta gamma delta epsilon"),
      // feed shares a 3-token window with site_a plus its own tail
      ("feed", "alpha beta gamma zeta eta theta iota"),
      // clean shares nothing
      ("clean", "one two three four five")).toDF("source", "text")
    val out = Dedup.sourceOverlapMatrix(docs, "text", "source", 3)
      .collect().map(r => ((r.getString(0), r.getString(1)),
        (r.getLong(2), r.getLong(3), r.getLong(4),
          r.getDouble(5), r.getDouble(6)))).toMap
    // site_a: trigrams {abc, bcd, cde} (3); mirror identical
    val mirrorKey = if ("mirror" < "site_a") ("mirror", "site_a")
      else ("site_a", "mirror")
    val (nShared, na, nb, ca, cb) = out(mirrorKey)
    assert(nShared == 3 && na == 3 && nb == 3, s"mirror row: ${out(mirrorKey)}")
    assert(ca == 1.0 && cb == 1.0)
    // feed ∩ site_a = {alpha beta gamma} (1 of feed's 5, 1 of site_a's 3)
    val feedKey = if ("feed" < "site_a") ("feed", "site_a")
      else ("site_a", "feed")
    val (fs, fa, fb, fca, fcb) = out(feedKey)
    assert(fs == 1 && fa == 5 && fb == 3, s"feed row: ${out(feedKey)}")
    assert(math.abs(fca - 0.2) < 1e-12 && math.abs(fcb - 1.0 / 3) < 1e-12)
    // clean never pairs
    assert(!out.keys.exists(k => k._1 == "clean" || k._2 == "clean"))
  }

  test("q165 semantics: chars-per-token under a hand merge table; a " +
      "merge-covered language compresses better than an uncovered one") {
    val merges = Seq(("a", "b"), ("ab", "c"))
    val docs = Seq(
      (1L, "en", "web", "abc abc"),      // each word -> 1 token 'abc'
      (2L, "zz", "web", "xyz xyz")       // no merges apply -> 3 tokens each
    ).toDF("doc_id", "lang", "source", "text")
    val counts = TextAnalysis.bpeTokens(
        docs.select(col("doc_id"), col("text")), "text", "doc_id", merges)
      .groupBy("id").agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(counts(1L) == 2L, s"covered doc tokens: ${counts(1L)}")
    assert(counts(2L) == 6L, s"uncovered doc tokens: ${counts(2L)}")
    // the q165 grouping math: chars(norm) / tokens
    // "abc abc" = 7 chars / 2 tokens = 3.5; "xyz xyz" = 7 / 6
    assert(7.0 / counts(1L) > 7.0 / counts(2L))
  }
}
