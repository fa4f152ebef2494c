package graft

import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Dedup, SuffixArray}

/** Suffix-array EXACTSUBSTR dedup (q222): hand-computed removals, a
  * brute-force n-gram reference oracle, the offset-copy case the
  * strided q76 form misses, round idempotence, and the doc-length
  * guard. */
class SuffixArraySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.session

  private def run(docs: DataFrame, minSpan: Int, rounds: Int,
      baseSpan: Int = 4) =
    SuffixArray.exactSubstrDedup(docs, "text", "doc_id", minSpan, rounds,
        baseSpan)
      .collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4))))
      .toMap

  test("decompose covers [0, minSpan) with available spans, overlapping " +
      "tail window anchored at minSpan - base") {
    assert(SuffixArray.decompose(50, 3) == Seq((5, 0), (4, 32), (3, 42)))
    assert(SuffixArray.decompose(8, 3) == Seq((3, 0)))
    assert(SuffixArray.decompose(5, 2) == Seq((2, 0), (2, 1)))
    // every decomposition covers [0, minSpan) exactly
    for (base <- 0 to 3; span <- (1 << base) to 40) {
      val parts = SuffixArray.decompose(span, base)
      val covered = parts.flatMap { case (k, off) =>
        off until off + (1 << k) }.toSet
      assert(covered == (0 until span).toSet,
        s"decompose($span, $base) covers $covered")
      assert(parts.forall { case (k, off) => off + (1 << k) <= span })
    }
  }

  /** Driver-side reference: every minSpan-gram, grouped by its token
    * string; groups of size ≥ 2 keep their min (doc, pos) member; every
    * other member's [pos, pos+minSpan-1] is removed (interval union). */
  private def reference(docs: Seq[(Long, String)], minSpan: Int)
      : Map[Long, (Long, Long, Long, String)] = {
    val toks = docs.map { case (id, t) => id -> t.split("\\s+").toSeq }
    val grams = for {
      (id, tk) <- toks
      p <- 1 to tk.length - minSpan + 1
    } yield (tk.slice(p - 1, p - 1 + minSpan).mkString(" "), id, p.toLong)
    val removed = grams.groupBy(_._1).valuesIterator
      .filter(_.size >= 2)
      .flatMap { g =>
        val keep = g.map { case (_, id, p) => (id, p) }.min
        g.collect { case (_, id, p) if (id, p) != keep => (id, p) }
      }
      .toSeq
    toks.map { case (id, tk) =>
      val starts = removed.collect { case (d, p) if d == id => p }.sorted
      val covered = starts
        .flatMap(p => p until p + minSpan).toSet
      val kept = tk.zipWithIndex
        .collect { case (t, i) if !covered.contains((i + 1).toLong) => t }
      id -> ((tk.length.toLong, starts.size.toLong,
        covered.size.toLong, kept.mkString(" ")))
    }.toMap
  }

  test("hand case: a misaligned shared 6-token run loses its non-first " +
      "occurrence, merged into one interval") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a b c d e f g h i j"),
      (2L, "z x y c d e f g h q"))
      .toDF("doc_id", "text")
    val out = run(docs, minSpan = 5, rounds = 2)
    // shared 5-gram groups: "c d e f g" {1@3, 2@4} and "d e f g h"
    // {1@4, 2@5} — doc 1 holds both keepers; doc 2 loses starts 4 and 5,
    // intervals [4,8] ∪ [5,9] merge to [4,9] = 6 tokens
    assert(out(1L) == ((10L, 0L, 0L, "a b c d e f g h i j")))
    assert(out(2L) == ((10L, 2L, 6L, "z x y q")))
  }

  test("matches the brute-force n-gram reference on a mixed corpus " +
      "(aligned copies, misaligned copies, full duplicates, shorts)") {
    import spark.implicits._
    val words = "w%d"
    def seqText(from: Int, n: Int): String =
      (from until from + n).map(words.format(_)).mkString(" ")
    val docs = Seq(
      1L -> (seqText(0, 12) + " " + seqText(100, 4)),
      2L -> ("x0 x1 " + seqText(0, 12) + " tail0"), // misaligned copy
      3L -> (seqText(0, 12) + " " + seqText(100, 4)), // full duplicate of 1
      4L -> seqText(200, 7), // unique
      5L -> ("y0 " + seqText(4, 8) + " y1 y2"), // copies a 8-token slice
      6L -> seqText(300, 3), // shorter than minSpan
      7L -> (seqText(5, 6) + " z9 " + seqText(5, 6))) // within-doc repeat
      .toDF("doc_id", "text")
    val minSpan = 6
    val got = run(docs, minSpan, rounds = 2)
    val want = reference(Seq(
      1L -> (seqText(0, 12) + " " + seqText(100, 4)),
      2L -> ("x0 x1 " + seqText(0, 12) + " tail0"),
      3L -> (seqText(0, 12) + " " + seqText(100, 4)),
      4L -> seqText(200, 7),
      5L -> ("y0 " + seqText(4, 8) + " y1 y2"),
      6L -> seqText(300, 3),
      7L -> (seqText(5, 6) + " z9 " + seqText(5, 6))), minSpan)
    assert(got == want)
    // sanity on the reference itself: the full duplicate lost everything
    assert(want(3L)._4 == "" && want(3L)._3 == 16L)
  }

  test("catches the offset copy the symmetric strided form misses at " +
      "window+stride-1 boundaries") {
    import spark.implicits._
    // 8 shared tokens of 2 chars each = 26 shared chars, displaced by 3
    // chars between the docs. Strided char windows (window 20, stride
    // 10) sample both docs at absolute char positions 1, 11, 21, ... —
    // the shared span covers chars [1,26] of doc 1 but [4,29] of doc 2,
    // so no sampled 20-char window lands inside the span at the SAME
    // span-relative offset in both docs (26 < window+stride-1 = 29
    // would be the general-variant guarantee; the symmetric form needs
    // alignment mod 10 and the 3-char displacement breaks it).
    val span = (0 until 8).map(i => s"s$i").mkString(" ") // 23 chars
    val docs = Seq(
      (1L, span + " a0 a1 a2 a3 a4 a5"),
      (2L, "z " + span + " b0 b1 b2 b3 b4"))
      .toDF("doc_id", "text")
    val strided = Dedup.exactSubstringDupJoin(
      docs, "text", "doc_id", window = 20, stride = 10)
    assert(strided.count() == 0L,
      "fixture broken: the strided form was supposed to miss this copy")
    val out = run(docs, minSpan = 8, rounds = 2)
    assert(out(2L)._2 == 1L && out(2L)._3 == 8L,
      s"suffix array must catch the offset copy: ${out(2L)}")
    assert(out(2L)._4 == "z b0 b1 b2 b3 b4")
    assert(out(1L)._4 == span + " a0 a1 a2 a3 a4 a5")
  }

  test("contamination: every >= minSpan run shared with a bench doc is " +
      "removed from the corpus doc; bench text never returned") {
    import spark.implicits._
    val corpus = Seq(
      (1L, (0 until 20).map(i => s"t$i").mkString(" ")),
      (2L, (100 until 118).map(i => s"u$i").mkString(" ")))
      .toDF("doc_id", "text")
    // bench doc 101 = the first 19 tokens of doc 1 (truncated twin);
    // bench doc 102 is unrelated
    val bench = Seq(
      (101L, (0 until 19).map(i => s"t$i").mkString(" ")),
      (102L, (200 until 215).map(i => s"b$i").mkString(" ")))
      .toDF("doc_id", "text")
    val out = SuffixArray.exactSubstrContamination(corpus, bench,
        "text", "doc_id", minSpan = 10, rounds = 3, baseSpan = 4)
      .collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4))))
      .toMap
    assert(out.keySet == Set(1L, 2L), s"bench rows leaked: ${out.keySet}")
    // doc 1 shares 10-token runs with bench 101 at starts 1..10
    // (bench len 19 => gate p <= 10): covered [1, 19], one survivor t19
    assert(out(1L) == ((20L, 10L, 19L, "t19")), out(1L).toString)
    assert(out(2L) == ((18L, 0L, 0L,
      (100 until 118).map(i => s"u$i").mkString(" "))))
  }

  test("contamination matches a brute-force cross-side n-gram " +
      "reference on a mixed corpus") {
    import spark.implicits._
    def seqText(from: Int, n: Int): String =
      (from until from + n).map(i => s"w$i").mkString(" ")
    val minSpan = 6
    val corpusRows = Seq(
      1L -> (seqText(0, 12) + " " + seqText(100, 4)), // prefix benched
      2L -> ("x0 x1 " + seqText(0, 12) + " tail0"), // misaligned overlap
      3L -> seqText(200, 9), // clean
      4L -> ("y0 " + seqText(300, 7) + " y1"), // interior benched span
      5L -> seqText(5, 7)) // overlaps the bench inside doc 1's range
    val benchRows = Seq(
      (101L, seqText(0, 12)),
      (102L, seqText(300, 7)),
      (103L, seqText(400, 8)))
    val got = SuffixArray.exactSubstrContamination(
        corpusRows.toDF("doc_id", "text"),
        benchRows.toDF("doc_id", "text"),
        "text", "doc_id", minSpan, rounds = 3, baseSpan = 4)
      .collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4))))
      .toMap
    // brute force: corpus position p contaminated iff its minSpan-gram
    // appears in ANY bench doc
    val bgrams = benchRows.flatMap { case (_, t) =>
      val tk = t.split(" ")
      (0 to tk.length - minSpan).map(i =>
        tk.slice(i, i + minSpan).mkString(" "))
    }.toSet
    val want = corpusRows.map { case (id, t) =>
      val tk = t.split(" ")
      val starts = (1 to tk.length - minSpan + 1).filter(p =>
        bgrams.contains(tk.slice(p - 1, p - 1 + minSpan).mkString(" ")))
      val covered = starts.flatMap(p => p until p + minSpan).toSet
      val kept = tk.zipWithIndex.collect {
        case (w, i) if !covered.contains(i + 1) => w }
      id -> ((tk.length.toLong, starts.size.toLong, covered.size.toLong,
        kept.mkString(" ")))
    }.toMap
    assert(got == want, s"$got\n  vs\n$want")
    // sanity: the reference itself found contamination in 1, 2, 4, 5
    assert(want(1L)._2 > 0 && want(2L)._2 > 0 && want(4L)._2 > 0 &&
      want(5L)._2 > 0 && want(3L)._2 == 0)
  }

  test("extra doubling rounds are idempotent: rounds=5 and rounds=9 " +
      "produce identical output") {
    import spark.implicits._
    val docs = Seq(
      (1L, (0 until 20).map(i => s"t$i").mkString(" ")),
      (2L, "pre " + (5 until 17).map(i => s"t$i").mkString(" ")))
      .toDF("doc_id", "text")
    assert(run(docs, minSpan = 7, rounds = 3) ==
      run(docs, minSpan = 7, rounds = 9))
  }

  test("memorizationReport matches a brute-force cross-side n-gram " +
      "frequency reference (freq grading, interval union, zero rows)") {
    import spark.implicits._
    def seqText(from: Int, n: Int): String =
      (from until from + n).map(i => s"w$i").mkString(" ")
    val minSpan = 5
    val corpusRows = Seq(
      1L -> seqText(0, 10),
      2L -> seqText(0, 10),             // exact duplicate → freq 2 grams
      3L -> ("p0 " + seqText(0, 9)),    // shifted partial overlap
      4L -> seqText(50, 8),             // unique corpus doc
      5L -> seqText(100, 4))            // shorter than minSpan
    val benchRows = Seq(
      10L -> seqText(0, 7),             // fully memorized, hot grams
      11L -> (seqText(50, 6) + " q0 q1 q2"), // partially memorized
      12L -> seqText(200, 9),           // clean
      13L -> seqText(300, 3))           // too short — all-zero row
    // brute force: corpus minSpan-gram occurrence counts, then per
    // bench doc the memorized starts, their interval union, and the
    // max/total frequency grading
    val cCnt = corpusRows.flatMap { case (_, t) =>
      val tk = t.split(" ")
      (0 to tk.length - minSpan).map(i =>
        tk.slice(i, i + minSpan).mkString(" "))
    }.groupBy(identity).map { case (g, o) => g -> o.size.toLong }
    val want = benchRows.map { case (id, t) =>
      val tk = t.split(" ")
      val hits = (1 to tk.length - minSpan + 1).flatMap { p =>
        cCnt.get(tk.slice(p - 1, p - 1 + minSpan).mkString(" "))
          .map(c => (p, c))
      }
      val covered = hits.flatMap { case (p, _) => p until p + minSpan }
        .toSet
      id -> ((tk.length.toLong, hits.size.toLong, covered.size.toLong,
        if (hits.isEmpty) 0L else hits.map(_._2).max,
        hits.map(_._2).sum))
    }.toMap
    val got = SuffixArray.memorizationReport(
        corpusRows.toDF("doc_id", "text"),
        benchRows.toDF("doc_id", "text"),
        "text", "doc_id", minSpan, baseSpan = 4)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))))
      .toMap
    assert(got == want, s"$got\n  vs\n$want")
    // fixture sanity: the grading is exercised beyond 0/1 — doc 10's
    // grams occur in BOTH corpus duplicates (and some in doc 3 too)
    assert(want(10L)._4 >= 2L && want(11L)._4 == 1L &&
      want(12L)._2 == 0L && want(13L) == ((3L, 0L, 0L, 0L, 0L)))
  }

  test("duplicationSpectrum matches brute-force gram counting with " +
      "exact integer log2 buckets") {
    import spark.implicits._
    def seqText(from: Int, n: Int): String =
      (from until from + n).map(i => s"w$i").mkString(" ")
    val minSpan = 5
    // freq profile: the seqText(0, 10) grams occur 4x (docs 1, 2, 6
    // and shifted in 3 where the window fits), others 2x / unique
    val corpusRows = Seq(
      1L -> seqText(0, 10),
      2L -> seqText(0, 10),
      3L -> ("p0 " + seqText(0, 9)),
      4L -> seqText(50, 8),
      5L -> seqText(50, 8),
      6L -> seqText(0, 10),
      7L -> seqText(200, 6))
    val cnt = corpusRows.flatMap { case (_, t) =>
      val tk = t.split(" ")
      (0 to tk.length - minSpan).map(i =>
        tk.slice(i, i + minSpan).mkString(" "))
    }.groupBy(identity).map { case (_, o) => o.size.toLong }
      .filter(_ >= 2L).toSeq
    val want = cnt.groupBy(c => 63 - java.lang.Long.numberOfLeadingZeros(c))
      .map { case (b, cs) =>
        b -> ((1L << b, cs.size.toLong, cs.sum)) }
    val got = SuffixArray.duplicationSpectrum(
        corpusRows.toDF("doc_id", "text"),
        "text", "doc_id", minSpan, baseSpan = 4)
      .collect()
      .map(r => r.getInt(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(got == want, s"$got\n  vs\n$want")
    // fixture sanity: at least two distinct buckets (freq 2 → bucket 1,
    // freq 4 → bucket 2), so the bucketing itself is exercised
    assert(want.keySet.exists(_ >= 2) && want.contains(1))
  }

  test("a flat sig-only build with baseSpan > minSpan fails fast with " +
      "the decompose guard's message, not an empty-list error") {
    import spark.implicits._
    val docs = Seq(1L -> "a b c d e f g h").toDF("doc_id", "text")
    val e = intercept[IllegalArgumentException] {
      SuffixArray.duplicationSpectrum(docs, "text", "doc_id",
        minSpan = 4, baseSpan = 8).collect()
    }
    assert(e.getMessage.contains("must be >= the base span"))
  }

  test("a document longer than 2^rounds tokens fails fast") {
    import spark.implicits._
    val docs = Seq(
      (1L, (0 until 20).map(i => s"t$i").mkString(" ")))
      .toDF("doc_id", "text")
    val e = intercept[Exception] {
      SuffixArray.exactSubstrDedup(docs, "text", "doc_id",
        minSpan = 4, rounds = 2, baseSpan = 4).collect()
    }
    assert(e.getMessage != null)
  }
}
