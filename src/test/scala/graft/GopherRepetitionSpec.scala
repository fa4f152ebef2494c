package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.TextAnalysis

/** The full Gopher repetition table (q223): a driver-side reference
  * over planted docs — one offender per published threshold — plus
  * independence checks (an exactly-n repeated phrase fires dup_n but
  * not dup_{n+1}) and a clean control that passes every gate. */
class GopherRepetitionSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.session

  private val topNs = Seq(2, 3, 4)
  private val dupNs = Seq(5, 6, 7, 8, 9, 10)
  private val topThr = Seq(0.20, 0.18, 0.16)
  private val dupThr = Seq(0.15, 0.14, 0.13, 0.12, 0.11, 0.10)

  /** Driver-side reference mirroring the documented semantics. */
  private def reference(text: String): (Seq[Double], Boolean) = {
    val toks = text.trim.split("\\s+").toSeq
    val tc = toks.mkString(" ").length.toLong
    def unitFracs(units: Seq[String]): (Double, Double) = {
      if (units.isEmpty) return (0.0, 0.0)
      val counts = units.groupBy(identity).view.mapValues(_.size.toLong)
      val n = units.size.toLong
      val d = counts.values.map(_ - 1).sum
      val ch = counts.map { case (u, c) => c * u.length }.sum
      val dch = counts.map { case (u, c) => (c - 1) * u.length }.sum
      (d.toDouble / n, if (ch == 0) 0.0 else dch.toDouble / ch)
    }
    val (dl, dlc) = unitFracs(text.split("\n").toSeq.filter(_.nonEmpty))
    val (dp, dpc) = unitFracs(text.split("\n\n").toSeq.filter(_.nonEmpty))
    def grams(n: Int): Seq[(Int, String)] =
      (1 to toks.length - n + 1).map(i =>
        i -> toks.slice(i - 1, i - 1 + n).mkString(" "))
    def topFrac(n: Int): Double = {
      val g = grams(n)
      if (g.isEmpty) 0.0
      else {
        val counts = g.groupBy(_._2).view
          .mapValues(_.size.toLong).toSeq
        val best = counts.map { case (u, c) => (c, u.length.toLong) }.max
        (best._1 * best._2).toDouble / tc
      }
    }
    def dupFrac(n: Int): Double = {
      val g = grams(n)
      val counts = g.groupBy(_._2).view.mapValues(_.size).toMap
      val covered = g.collect { case (i, u) if counts(u) >= 2 =>
        i until i + n }.flatten.toSet
      if (covered.isEmpty) 0.0
      else {
        val mass = covered.toSeq.map(p => toks(p - 1).length.toLong).sum +
          covered.count(p => covered.contains(p + 1))
        mass.toDouble / tc
      }
    }
    val fr = Seq(dl, dlc, dp, dpc) ++ topNs.map(topFrac) ++
      dupNs.map(dupFrac)
    val pass = (Seq(dl <= 0.30, dlc <= 0.20, dp <= 0.30, dpc <= 0.20) ++
      topNs.zip(topThr).map { case (n, t) => topFrac(n) <= t } ++
      dupNs.zip(dupThr).map { case (n, t) => dupFrac(n) <= t })
      .forall(identity)
    (fr, pass)
  }

  // planted corpus: a clean control, a dup-line offender, a dup-para
  // offender, a top-gram offender, and one exactly-n phrase repeat per
  // dup-n gate
  private def corpus: Seq[(Long, String)] = {
    val distinctTail = (0 until 40).map(i => s"f$i").mkString(" ")
    val dupLine = (Seq.fill(5)("x y z") ++
      (0 until 5).map(i => s"u$i v$i w$i")).mkString("\n")
    val dupPara = (Seq.fill(3)("p q\nr s") ++
      (0 until 3).map(i => s"m$i n$i\no$i k$i")).mkString("\n\n")
    val topHeavy = (Seq.fill(10)("a b").mkString(" ") + " " +
      (0 until 10).map(i => s"t$i").mkString(" "))
    val phrases = dupNs.zipWithIndex.map { case (n, ix) =>
      val phrase = (0 until n).map(j => s"ph${ix}_$j").mkString(" ")
      (20L + ix, phrase + " " + distinctTail.replace("f", s"g$ix") +
        " " + phrase)
    }
    // touching (not overlapping) duplicated runs: "A..E A..E" covers
    // positions 1..5 and 6..10 — contiguous across the boundary, so
    // the joining space IS duplicated mass (the r19 ADVICE fixture:
    // splitting islands at s == pm+1 undercounts by one char per
    // touching pair)
    val touching = "ta tb tc td te ta tb tc td te " +
      (0 until 20).map(i => s"z$i").mkString(" ")
    Seq(
      (1L, (0 until 30).map(i => s"c$i").mkString(" ")),
      (2L, dupLine),
      (3L, dupPara),
      (4L, topHeavy)) ++ phrases ++ Seq((40L, touching))
  }

  private def run(): Map[Long, (Seq[Double], Boolean)] = {
    import spark.implicits._
    val out = TextAnalysis.gopherRepetitionReport(
      corpus.toDF("doc_id", "text"), "text", "doc_id",
      topNs, dupNs, topThr, dupThr)
    out.collect().map { r =>
      r.getLong(0) -> (((1 to 13).map(r.getDouble).toSeq,
        r.getBoolean(14)))
    }.toMap
  }

  test("matches the driver-side reference on every planted doc and " +
      "every fraction") {
    val got = run()
    corpus.foreach { case (id, text) =>
      val want = reference(text)
      assert(got(id) == want, s"doc $id: ${got(id)} vs $want")
    }
  }

  test("streaming twin: per-batch repetition reports equal the batch " +
      "operator replayed, batch for batch (r18)") {
    import spark.implicits._
    val inDir = java.nio.file.Files.createTempDirectory("rep-in")
    val sink = java.nio.file.Files
      .createTempDirectory("rep-out").toString + "/t"
    val ckpt = java.nio.file.Files.createTempDirectory("rep-ck").toString
    val b1 = corpus.take(4)
    val b2 = corpus.drop(4)
    def replay(rows: Seq[(Long, String)]) = TextAnalysis
      .gopherRepetitionReport(rows.toDF("doc_id", "text"), "text",
        "doc_id", topNs, dupNs, topThr, dupThr)
      .collect().map(r => r.toSeq).toSet
    b1.toDF("doc_id", "text").coalesce(1)
      .write.parquet(inDir.resolve("b1").toString)
    val stream = spark.readStream
      .schema("doc_id LONG, text STRING")
      .parquet(inDir.toString + "/*")
    val q = graft.streaming.EventStreams.repetitionGateIngest(
      stream, "text", "doc_id", sink, ckpt)
    try {
      q.processAllAvailable()
      b2.toDF("doc_id", "text").coalesce(1)
        .write.parquet(inDir.resolve("b2").toString)
      q.processAllAvailable()
      val got = spark.read.parquet(sink).collect().map(_.toSeq).toSet
      // note: the streaming gate runs the operator's DEFAULT thresholds
      // — identical to this suite's constants by construction
      assert(got == (replay(b1) ++ replay(b2)),
        "stream rows diverged from the per-batch operator replay")
      val failing = spark.read.parquet(sink)
        .filter(!org.apache.spark.sql.functions.col("repetition_pass"))
        .count()
      assert(failing >= 9, s"planted offenders must fail: $failing")
    } finally q.stop()
  }

  test("each published threshold has a planted offender crossing it; " +
      "the control passes all 13 gates") {
    val got = run()
    assert(got(1L)._2, "control must pass")
    assert(got(1L)._1.forall(_ >= 0.0))
    // dup line: 4 of 10 lines are repeats -> 0.4 > 0.30
    assert(got(2L)._1(0) == 0.4 && !got(2L)._2)
    // dup para: 2 of 6 paragraphs are repeats -> 1/3 > 0.30
    assert(got(3L)._1(2) > 0.30 && !got(3L)._2)
    // top-2-gram chars: "a b" x10-ish dominates
    assert(got(4L)._1(4) > 0.20 && !got(4L)._2)
    // dup-n: the exactly-n phrase fires dup_n (two occurrences of an
    // n-token phrase) but NOT dup_{n+1} (no repeated n+1-gram exists)
    dupNs.zipWithIndex.foreach { case (n, ix) =>
      val fr = got(20L + ix)._1
      val dupIdx = 7 + ix // 4 unit + 3 top fractions precede
      assert(fr(dupIdx) > dupThr(ix),
        s"doc ${20 + ix}: dup_$n ${fr(dupIdx)} must cross ${dupThr(ix)}")
      if (ix < dupNs.length - 1)
        assert(fr(dupIdx + 1) == 0.0,
          s"doc ${20 + ix}: dup_${n + 1} must be untouched")
      assert(!got(20L + ix)._2)
    }
  }
}
