package graft

import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.SuffixArray

/** The persisted suffix-array index and its incremental probe (q230):
  * probe ≡ full-rebuild contamination, save/load round trip on the
  * IndexStore generation protocol, the doubling-loop convergence
  * early-exit equivalence, and the streaming serving twin. */
class SubstrIndexSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.session

  private def collectOut(df: DataFrame) = df.collect()
    .map(r => r.getLong(0) ->
      ((r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4))))
    .toMap

  private def seqText(from: Int, n: Int): String =
    (from until from + n).map(i => s"w$i").mkString(" ")

  // frozen corpus + probe batch with planted cross-side spans: exact
  // prefix copy, misaligned interior copy, a one-token-short near miss,
  // and clean docs on both sides
  private def corpusRows = Seq(
    (1L, seqText(0, 20)),
    (2L, seqText(100, 14) + " " + seqText(300, 4)),
    (3L, seqText(200, 9)))
  private def batchRows = Seq(
    (101L, seqText(0, 12)), // prefix of corpus doc 1
    (102L, "x0 x1 " + seqText(104, 10) + " x2"), // interior of doc 2
    (103L, seqText(400, 15)), // clean
    (104L, seqText(0, 9) + " zz " + seqText(9, 9)), // two near-miss halves
    (105L, seqText(13, 3) + " " + seqText(200, 6))) // short + sub-span

  test("probe against the frozen index equals full-rebuild " +
      "contamination, row for row (minSpan with and without doubling " +
      "rounds)") {
    import spark.implicits._
    for ((minSpan, baseSpan) <- Seq((10, 4), (6, 4), (8, 8))) {
      val corpus = corpusRows.toDF("doc_id", "text")
      val batch = batchRows.toDF("doc_id", "text")
      val ix = SuffixArray.buildSubstrIndex(corpus, "text", "doc_id",
        minSpan, baseSpan)
      val got = collectOut(
        SuffixArray.exactSubstrProbe(ix, batch, "text", "doc_id"))
      val want = collectOut(SuffixArray.exactSubstrContamination(
        batch, corpus, "text", "doc_id", minSpan, rounds = 5,
        baseSpan = baseSpan))
      assert(got == want, s"minSpan=$minSpan baseSpan=$baseSpan:\n" +
        s"$got\n  vs\n$want")
    }
  }

  test("planted spans behave: exact copy removed, near-miss kept, " +
      "clean doc untouched, probe output covers every batch doc") {
    import spark.implicits._
    val ix = SuffixArray.buildSubstrIndex(
      corpusRows.toDF("doc_id", "text"), "text", "doc_id",
      minSpan = 10, baseSpan = 4)
    val got = collectOut(SuffixArray.exactSubstrProbe(
      ix, batchRows.toDF("doc_id", "text"), "text", "doc_id"))
    assert(got.keySet == Set(101L, 102L, 103L, 104L, 105L))
    assert(got(101L)._2 > 0, "12-token prefix copy must be hit")
    assert(got(102L)._2 > 0, "interior 10-token copy must be hit")
    assert(got(103L) == ((15L, 0L, 0L, seqText(400, 15))))
    assert(got(104L)._2 == 0, "9-token halves are below minSpan")
    assert(got(105L)._2 == 0, "6-token sub-span is below minSpan")
  }

  test("probe REPORT against the frozen index equals the fresh " +
      "memorizationReport rebuild, row for row, counts included") {
    import spark.implicits._
    // duplicate corpus doc 1 so corpus frequencies ≥ 2 are exercised
    val corpus = (corpusRows :+ ((4L, seqText(0, 20))))
      .toDF("doc_id", "text")
    val batch = batchRows.toDF("doc_id", "text")
    for ((minSpan, baseSpan) <- Seq((10, 4), (8, 8))) {
      val ix = SuffixArray.buildSubstrIndex(corpus, "text", "doc_id",
        minSpan, baseSpan)
      def stats(df: DataFrame) = df.collect()
        .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
          r.getLong(3), r.getLong(4), r.getLong(5))))
        .toMap
      val got = stats(SuffixArray.exactSubstrProbeReport(
        ix, batch, "text", "doc_id"))
      val want = stats(SuffixArray.memorizationReport(
        corpus, batch, "text", "doc_id", minSpan, baseSpan))
      assert(got == want, s"minSpan=$minSpan baseSpan=$baseSpan:\n" +
        s"$got\n  vs\n$want")
      // the duplicated corpus doc makes batch 101's spans freq-2
      assert(got(101L)._4 == 2L, s"max_corpus_freq: ${got(101L)}")
      assert(got(103L) == ((15L, 0L, 0L, 0L, 0L)))
      // CROSS-baseSpan invariance (the q232 shared-index serving
      // path): the report depends only on which minSpan-token spans
      // occur at which corpus counts — a rebuild at a DIFFERENT
      // baseSpan names the same spans in a different rank space and
      // must produce the identical report
      val otherBase = if (baseSpan == 4) 8 else 4
      val wantOther = stats(SuffixArray.memorizationReport(
        corpus, batch, "text", "doc_id", minSpan, otherBase))
      assert(got == wantOther,
        s"probe@$baseSpan vs rebuild@$otherBase diverged:\n" +
          s"$got\n  vs\n$wantOther")
    }
  }

  test("duplicationSpectrum served from the counted index equals the " +
      "fresh spectrum build, across baseSpans") {
    import spark.implicits._
    // duplicate corpus doc 1 twice so a frequency-3 group exists
    // (bucket 1) alongside the freq-2 groups
    val corpus = (corpusRows ++ Seq((4L, seqText(0, 20)),
      (5L, seqText(0, 20)))).toDF("doc_id", "text")
    def rows(df: DataFrame) = df.collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    val minSpan = 10
    val want = rows(SuffixArray.duplicationSpectrum(
      corpus, "text", "doc_id", minSpan, baseSpan = 4))
    assert(want.nonEmpty && want.exists(_._1 == 1),
      s"fixture must occupy bucket 1 (freq 2-3): $want")
    for (ixBase <- Seq(4, 8)) {
      val ix = SuffixArray.buildSubstrIndex(corpus, "text", "doc_id",
        minSpan, ixBase)
      val got = rows(SuffixArray.duplicationSpectrumFromIndex(ix))
      assert(got == want, s"ixBase=$ixBase: $got vs $want")
    }
  }

  test("spectrum-from-index fail-fasts on an uncounted sig table") {
    import spark.implicits._
    val ix = SuffixArray.buildSubstrIndex(
      corpusRows.toDF("doc_id", "text"), "text", "doc_id",
      minSpan = 10, baseSpan = 4)
    val e = intercept[IllegalArgumentException] {
      SuffixArray.duplicationSpectrumFromIndex(
        ix.copy(sig = ix.sig.drop("cnt")))
    }
    assert(e.getMessage.contains("without occurrence counts"))
  }

  test("probe report fail-fasts on an index whose sig table carries " +
      "no occurrence counts") {
    import spark.implicits._
    val ix = SuffixArray.buildSubstrIndex(
      corpusRows.toDF("doc_id", "text"), "text", "doc_id",
      minSpan = 10, baseSpan = 4)
    val uncounted = ix.copy(sig = ix.sig.drop("cnt"))
    val e = intercept[IllegalArgumentException] {
      SuffixArray.exactSubstrProbeReport(uncounted,
        batchRows.toDF("doc_id", "text"), "text", "doc_id")
    }
    assert(e.getMessage.contains("without occurrence counts"))
  }

  test("save/load round trip: the loaded index probes identically; a " +
      "torn next generation is invisible; a completed save supersedes") {
    import spark.implicits._
    val corpus = corpusRows.toDF("doc_id", "text")
    val batch = batchRows.toDF("doc_id", "text")
    val ix = SuffixArray.buildSubstrIndex(corpus, "text", "doc_id",
      minSpan = 10, baseSpan = 4)
    val root = java.nio.file.Files.createTempDirectory("saix")
      .resolve("ix").toString
    SuffixArray.saveSubstrIndex(ix, root)
    val loaded = SuffixArray.loadSubstrIndex(spark, root)
    assert((loaded.minSpan, loaded.baseSpan, loaded.nSigCols) ==
      ((ix.minSpan, ix.baseSpan, ix.nSigCols)))
    val fresh = collectOut(
      SuffixArray.exactSubstrProbe(ix, batch, "text", "doc_id"))
    assert(collectOut(
      SuffixArray.exactSubstrProbe(loaded, batch, "text", "doc_id"))
      == fresh)
    // torn generation 2: frames land, the params commit marker never
    // does — the loader must keep serving generation 1
    val bigger = SuffixArray.buildSubstrIndex(
      corpus.unionByName(batch), "text", "doc_id", 10, 4)
    bigger.base.write.mode("overwrite").parquet(s"$root/g2/base")
    bigger.sig.write.mode("overwrite").parquet(s"$root/g2/sig")
    val afterTear = SuffixArray.loadSubstrIndex(spark, root)
    assert(collectOut(SuffixArray.exactSubstrProbe(
      afterTear, batch, "text", "doc_id")) == fresh)
    // completed save commits a fresh generation and wins
    SuffixArray.saveSubstrIndex(bigger, root)
    val after = SuffixArray.loadSubstrIndex(spark, root)
    // batch docs are now IN the indexed corpus: every gated span of the
    // probe's own docs is a hit (full self-contamination)
    val self = collectOut(SuffixArray.exactSubstrProbe(
      after, batch, "text", "doc_id"))
    assert(self(103L)._2 > 0, "post-absorb, doc 103 must self-hit")
  }

  test("convergence early-exit produces exactly the full-rounds dedup " +
      "output (generous rounds budget, fixture converges early)") {
    import spark.implicits._
    val docs = Seq(
      (1L, seqText(0, 30)),
      (2L, "pre " + seqText(5, 20) + " post"),
      (3L, seqText(500, 12)))
      .toDF("doc_id", "text")
    def run(early: Boolean) = collectOut(
      SuffixArray.exactSubstrDedupImpl(docs, "text", "doc_id",
        minSpan = 8, rounds = 9, baseSpan = 4, earlyExit = early))
    assert(run(early = true) == run(early = false))
  }

  test("normalized contamination catches the case/punct variant the " +
      "raw matcher provably misses, and removal maps back to RAW text") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val corpusRaw = Seq((1L,
      "Alpha beta Gamma, delta EPSILON zeta eta Theta iota kappa " +
        "lambda mu"))
    // the bench doc = the corpus doc's first 10 tokens, case-garbled
    // with different punctuation — invisible to the exact raw matcher
    val benchRaw = Seq((101L,
      "alpha BETA gamma Delta! epsilon ZETA eta theta Iota Kappa"))
    def tokNorm(c: org.apache.spark.sql.Column, sentinel: String) =
      concat_ws(" ", transform(split(c, "\\s+"), t => {
        val n = regexp_replace(lower(t), "[^a-z0-9]+", "")
        when(n === "", lit(sentinel)).otherwise(n)
      }))
    val corpus = corpusRaw.toDF("doc_id", "raw")
      .withColumn("norm", tokNorm(col("raw"), "c"))
    val bench = benchRaw.toDF("doc_id", "raw")
      .withColumn("norm", tokNorm(col("raw"), "b"))
    // raw matcher: zero removals — the variant evades it
    val rawOut = SuffixArray.exactSubstrContamination(
      corpusRaw.toDF("doc_id", "text"), benchRaw.toDF("doc_id", "text"),
      "text", "doc_id", minSpan = 10, rounds = 3, baseSpan = 4)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toMap
    assert(rawOut(1L) == 0L,
      "the raw matcher unexpectedly caught the case variant")
    // normalized matcher: the 10-token span goes, RAW tail survives
    val got = collectOut(SuffixArray.exactSubstrContaminationNormalized(
      corpus, bench, "raw", "norm", "doc_id",
      minSpan = 10, rounds = 3, baseSpan = 4))
    assert(got(1L) == ((12L, 1L, 10L, "lambda mu")), got(1L).toString)
  }

  test("normalized contamination fail-fasts when normalization breaks " +
      "the 1:1 token map") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val corpus = Seq((1L, "a b c d e f g h i j"))
      .toDF("doc_id", "raw")
      .withColumn("norm", lit("a b")) // token counts diverge
    val bench = Seq((2L, "a b c d e f g h i j"))
      .toDF("doc_id", "raw").withColumn("norm", col("raw"))
    val e = intercept[Exception] {
      SuffixArray.exactSubstrContaminationNormalized(corpus, bench,
        "raw", "norm", "doc_id", minSpan = 8, rounds = 2, baseSpan = 4)
        .collect()
    }
    assert(e.getMessage != null)
  }

  test("streaming twin: substrDecontamIngest replays the batch probe, " +
      "batch for batch, against the persisted index") {
    import spark.implicits._
    val corpus = corpusRows.toDF("doc_id", "text")
    val ix = SuffixArray.buildSubstrIndex(corpus, "text", "doc_id",
      minSpan = 10, baseSpan = 4)
    val root = java.nio.file.Files.createTempDirectory("saix-s")
      .resolve("ix").toString
    SuffixArray.saveSubstrIndex(ix, root)
    val inDir = java.nio.file.Files.createTempDirectory("sa-in")
    val sink = java.nio.file.Files
      .createTempDirectory("sa-out").toString + "/t"
    val ckpt = java.nio.file.Files.createTempDirectory("sa-ck").toString
    val b1 = batchRows.take(2)
    val b2 = batchRows.drop(2)
    b1.toDF("doc_id", "text").coalesce(1)
      .write.parquet(inDir.resolve("b1").toString)
    val stream = spark.readStream
      .schema("doc_id LONG, text STRING")
      .parquet(inDir.toString + "/*")
    val q = graft.streaming.EventStreams.substrDecontamIngest(
      stream, root, "text", "doc_id", sink, ckpt)
    q.processAllAvailable()
    b2.toDF("doc_id", "text").coalesce(1)
      .write.parquet(inDir.resolve("b2").toString)
    q.processAllAvailable()
    q.stop()
    val streamed = collectOut(spark.read.parquet(sink))
    val replayed = collectOut(SuffixArray.exactSubstrProbe(
        ix, b1.toDF("doc_id", "text"), "text", "doc_id")) ++
      collectOut(SuffixArray.exactSubstrProbe(
        ix, b2.toDF("doc_id", "text"), "text", "doc_id"))
    assert(streamed == replayed)
  }

  test("accumulating streaming twin: each batch is probed against the " +
      "index GROWN by every prior batch (batch-2 copy of a batch-1 " +
      "span is rejected), checkpoint-save cadence included") {
    import spark.implicits._
    val corpus = corpusRows.toDF("doc_id", "text")
    val ix = SuffixArray.buildSubstrIndex(corpus, "text", "doc_id",
      minSpan = 10, baseSpan = 4)
    val root = java.nio.file.Files.createTempDirectory("saix-acc")
      .resolve("ix").toString
    SuffixArray.saveSubstrIndex(ix, root)
    val inDir = java.nio.file.Files.createTempDirectory("saacc-in")
    val sink = java.nio.file.Files
      .createTempDirectory("saacc-out").toString + "/t"
    val ckpt = java.nio.file.Files
      .createTempDirectory("saacc-ck").toString
    val b1 = Seq((201L, seqText(500, 15)), (202L, seqText(0, 12)))
    val b2 = Seq((301L, seqText(500, 12)), (302L, seqText(700, 12)))
    b1.toDF("doc_id", "text").coalesce(1)
      .write.parquet(inDir.resolve("b1").toString)
    val stream = spark.readStream
      .schema("doc_id LONG, text STRING")
      .parquet(inDir.toString + "/*")
    // checkpointEvery = 1: every batch exercises the save + reload lane
    val q = graft.streaming.EventStreams.substrDecontamIngestAccumulating(
      stream, root, "text", "doc_id", sink, ckpt, checkpointEvery = 1)
    q.processAllAvailable()
    b2.toDF("doc_id", "text").coalesce(1)
      .write.parquet(inDir.resolve("b2").toString)
    q.processAllAvailable()
    q.stop()
    val streamed = collectOut(spark.read.parquet(sink))
    // sequential replay: probe b1 on the seed, absorb b1's cleaned
    // text, probe b2 on the grown index
    val c1 = SuffixArray.exactSubstrProbe(ix,
      b1.toDF("doc_id", "text"), "text", "doc_id")
    val grown = SuffixArray.absorbSubstrIndex(ix,
      c1.select("doc_id", "text"), "text", "doc_id")
    val replayed = collectOut(c1) ++
      collectOut(SuffixArray.exactSubstrProbe(grown,
        b2.toDF("doc_id", "text"), "text", "doc_id"))
    assert(streamed == replayed)
    // the loop actually closed: 301 copies a batch-1-only span
    assert(streamed(301L)._2 > 0,
      s"batch-2 copy of a batch-1 span must be rejected: $streamed")
    assert(streamed(302L)._2 == 0)
    // the persisted root serves the fully-grown corpus after the run
    val served = SuffixArray.loadSubstrIndex(spark, root)
    val probeAgain = collectOut(SuffixArray.exactSubstrProbe(served,
      Seq((401L, seqText(500, 11))).toDF("doc_id", "text"),
      "text", "doc_id"))
    assert(probeAgain(401L)._2 > 0,
      s"persisted generation must carry batch-1 spans: $probeAgain")
  }

  test("absorb == rebuild: probe and frequency report against the " +
      "absorbed index equal a fresh build over corpus UNION batch, " +
      "and a batch-2 copy of a batch-1-only span is now rejected") {
    import spark.implicits._
    val corpus = corpusRows.toDF("doc_id", "text")
    // batch 1: one novel doc, one copy of a corpus prefix (so the
    // count merge is exercised on BOTH novel and existing tuples)
    val batch1 = Seq(
      (201L, seqText(500, 15)),
      (202L, seqText(0, 12))).toDF("doc_id", "text")
    // batch 2: a copy of batch 1's NOVEL span (invisible to the
    // original corpus), and fresh content
    val batch2 = Seq(
      (301L, seqText(500, 12)),
      (302L, seqText(700, 12))).toDF("doc_id", "text")
    val ix = SuffixArray.buildSubstrIndex(corpus, "text", "doc_id",
      minSpan = 10, baseSpan = 4)
    val absorbed = SuffixArray.absorbSubstrIndex(ix, batch1,
      "text", "doc_id")
    val rebuilt = SuffixArray.buildSubstrIndex(
      corpus.unionByName(batch1), "text", "doc_id",
      minSpan = 10, baseSpan = 4)
    assert(collectOut(SuffixArray.exactSubstrProbe(absorbed, batch2,
        "text", "doc_id")) ==
      collectOut(SuffixArray.exactSubstrProbe(rebuilt, batch2,
        "text", "doc_id")))
    def stats(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))))
      .toMap
    val gotRep = stats(SuffixArray.exactSubstrProbeReport(absorbed,
      batch2, "text", "doc_id"))
    assert(gotRep == stats(SuffixArray.exactSubstrProbeReport(rebuilt,
      batch2, "text", "doc_id")))
    // the closing-the-loop property: the original index does NOT
    // reject batch 2's copy of the batch-1-only span; the absorbed
    // index does — and fresh content stays clean either way
    val before = collectOut(SuffixArray.exactSubstrProbe(ix, batch2,
      "text", "doc_id"))
    val after = collectOut(SuffixArray.exactSubstrProbe(absorbed,
      batch2, "text", "doc_id"))
    assert(before(301L)._2 == 0, s"corpus never saw w500..: $before")
    assert(after(301L)._2 > 0, s"absorbed index must reject: $after")
    assert(before(302L)._2 == 0 && after(302L)._2 == 0)
    // count semantics survive the merge: doc 202 duplicated a corpus
    // prefix, so a batch-2 probe of that prefix now sees frequency 3
    // (corpus doc 1 + corpus-prefix positions + batch-1 copy)
    val probe3 = Seq((401L, seqText(0, 10))).toDF("doc_id", "text")
    val rep3 = stats(SuffixArray.exactSubstrProbeReport(absorbed,
      probe3, "text", "doc_id"))
    val rep3Rebuilt = stats(SuffixArray.exactSubstrProbeReport(rebuilt,
      probe3, "text", "doc_id"))
    assert(rep3 == rep3Rebuilt, s"$rep3 vs $rep3Rebuilt")
    assert(rep3(401L)._4 >= 2L, s"merged count must be >= 2: $rep3")
  }

  test("absorbed index persists as a NEW generation under the same " +
      "root: reload serves the absorbed corpus") {
    import spark.implicits._
    val corpus = corpusRows.toDF("doc_id", "text")
    val batch1 = Seq((201L, seqText(500, 15))).toDF("doc_id", "text")
    val probe = Seq((301L, seqText(500, 12))).toDF("doc_id", "text")
    val ix = SuffixArray.buildSubstrIndex(corpus, "text", "doc_id",
      minSpan = 10, baseSpan = 4)
    val root = java.nio.file.Files.createTempDirectory("saix-a")
      .resolve("ix").toString
    SuffixArray.saveSubstrIndex(ix, root)
    SuffixArray.saveSubstrIndex(
      SuffixArray.absorbSubstrIndex(
        SuffixArray.loadSubstrIndex(spark, root), batch1,
        "text", "doc_id"),
      root)
    val served = SuffixArray.loadSubstrIndex(spark, root)
    val out = collectOut(SuffixArray.exactSubstrProbe(served, probe,
      "text", "doc_id"))
    assert(out(301L)._2 > 0,
      s"reloaded generation must carry the absorbed batch: $out")
  }
}
