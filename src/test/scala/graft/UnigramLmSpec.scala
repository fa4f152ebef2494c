package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.TextAnalysis

/** Unigram-LM tokenizer (Kudo 2018 in exact fixed point): the EM
  * trainer and Viterbi segmenter against a corpus small enough to run
  * by hand, plus the fertility wiring and determinism.
  *
  * Hand computation for corpus "ab ab abc" (quant 1000, maxPiece 2,
  * minFreq 1, iters 2):
  *   - word counts: ab×2, abc×1
  *   - c₀ (occurrence-weighted substrings): a:3 b:3 ab:3 c:1 bc:1,
  *     T=11 → q₀: a:272 b:272 ab:272 c:90 bc:90
  *   - E-step 1: "ab" → [ab] (1 piece beats [a,b]); "abc" → [ab,c]
  *     vs [a,bc] tie on cost (2·big−362) broken by shorter LAST piece
  *     → [ab,c]
  *   - c₁: ab:3 c:1, chars a,b ride at 0; T=4 → q₁: ab:750 c:250
  *     a:0 b:0 (bc pruned)
  *   - E-step 2 reproduces the same segmentations → fixed point:
  *     final model {ab:(3,750), c:(1,250), a:(0,0), b:(0,0)} */
class UnigramLmSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.session
  import spark.implicits._

  private def corpus = Seq((1L, "ab ab abc")).toDF("doc_id", "text")

  test("trainer reproduces the hand-computed EM fixed point") {
    val model = TextAnalysis.unigramLmTrain(corpus, "text", iters = 2,
        quant = 1000L, maxPiece = 2, maxWord = 8, minFreq = 1L)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(model == Set(("ab", 3L, 750L), ("c", 1L, 250L),
      ("a", 0L, 0L), ("b", 0L, 0L)), model.toString)
  }

  test("segmenter follows the trained scores; ties break on shorter " +
      "last piece; overlong and uncoverable words pass uncovered") {
    val model = TextAnalysis.unigramLmTrain(corpus, "text", iters = 2,
      quant = 1000L, maxPiece = 2, maxWord = 8, minFreq = 1L)
    val toSeg = Seq((1L, "ab abc abababababab xyz")).toDF("doc_id", "text")
    val seg = TextAnalysis.unigramLmSegment(toSeg, "text", model,
        maxPiece = 2, maxWord = 8)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2),
        r.getBoolean(3))).toSet
    assert(seg == Set(
      ("ab", 1L, "ab", true),
      ("abc", 2L, "ab|c", true),
      // 18 chars > maxWord 8: the byte-fallback lane
      ("abababababab", 1L, "abababababab", false),
      // chars x/y/z absent from the model: uncoverable in range
      ("xyz", 1L, "xyz", false)), seg.toString)
  }

  test("byteFallbackSegment: a non-ASCII/long-word corpus segments " +
      "TOTALLY — every word covered, fallback pieces are UTF-8 bytes " +
      "that reconstruct the word exactly") {
    val model = TextAnalysis.unigramLmTrain(corpus, "text", iters = 2,
      quant = 1000L, maxPiece = 2, maxWord = 8, minFreq = 1L)
    // 'héllo' (non-ASCII, in range), '日本語' (3 chars, 9 bytes),
    // 'abababababab' (over-long), plus covered words
    val toSeg = Seq((1L, "ab abc héllo 日本語 abababababab"))
      .toDF("doc_id", "text")
    val seg = TextAnalysis.byteFallbackSegment(
        TextAnalysis.unigramLmSegment(toSeg, "text", model,
          maxPiece = 2, maxWord = 8))
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getString(2),
        r.getBoolean(3), r.getBoolean(4))))
      .toMap
    // total coverage: the covered column is identically true
    assert(seg.values.forall(_._3), s"coverage must be 1.0: $seg")
    // covered lane untouched, fallback = false
    assert(seg("ab") == ((1L, "ab", true, false)))
    assert(seg("abc") == ((2L, "ab|c", true, false)))
    // fallback lanes: n_pieces = UTF-8 byte count, pieces decode back
    def reconstruct(pieces: String): String = {
      val bytes = pieces.split("\\|").map { p =>
        assert(p.matches("<0x[0-9A-F]{2}>"), s"bad byte piece $p")
        Integer.parseInt(p.substring(3, 5), 16).toByte
      }
      new String(bytes, "UTF-8")
    }
    Seq("héllo" -> 6L, "日本語" -> 9L, "abababababab" -> 12L)
      .foreach { case (w, nBytes) =>
        val (n, pieces, _, fb) = seg(w)
        assert(fb, s"$w must take the byte lane")
        assert(n == nBytes, s"$w: n_pieces $n != byte count $nBytes")
        assert(reconstruct(pieces) == w,
          s"$w failed to reconstruct from $pieces")
      }
  }

  test("model persists bit-exactly; trainOrLoadUnigramModel builds " +
      "once and the loaded model segments identically") {
    implicit val s = spark
    val m = TextAnalysis.unigramLmTrain(corpus, "text", iters = 2,
      quant = 1000L, maxPiece = 2, maxWord = 8, minFreq = 1L)
    val path = java.nio.file.Files.createTempDirectory("uni-model")
      .toString + "/m"
    var builds = 0
    def build = { builds += 1; m }
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val first = TextAnalysis.trainOrLoadUnigramModel(path)(build)
    assert(builds == 1)
    assert(rows(first) == rows(m), "persisted model diverged")
    val second = TextAnalysis.trainOrLoadUnigramModel(path)(build)
    assert(builds == 1, "second call re-trained instead of loading")
    assert(second.inputFiles.nonEmpty, "load not backed by the file")
    def seg(model: org.apache.spark.sql.DataFrame) =
      TextAnalysis.unigramLmSegment(corpus, "text", model, 2, 8)
        .collect().map(r => (r.getString(0), r.getString(2))).toSet
    assert(seg(second) == seg(m), "loaded model segments differently")
  }

  test("unigramTokenCounts: per-doc tokenizer budget (tf x n_pieces, " +
      "uncovered words count 1)") {
    val m = TextAnalysis.unigramLmTrain(corpus, "text", iters = 2,
      quant = 1000L, maxPiece = 2, maxWord = 8, minFreq = 1L)
    // "ab"=1 piece, "abc"=2 pieces, "xyz" uncovered=1 piece
    val docs = Seq((1L, "ab abc ab"), (2L, "xyz abc")).toDF("doc_id", "text")
    val got = TextAnalysis.unigramTokenCounts(docs, "text", "doc_id",
        m, 2, 8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((1L, 4L), (2L, 3L)), got.toString)
  }

  test("tokenizedPackIngest: micro-batches pack as the continuation " +
      "of the stream under the static model (stream == batch replay)") {
    val m = TextAnalysis.unigramLmTrain(corpus, "text", iters = 2,
      quant = 1000L, maxPiece = 2, maxWord = 8, minFreq = 1L)
      .localCheckpoint(true)
    val inDir = java.nio.file.Files.createTempDirectory("tp-in")
    val sink = java.nio.file.Files
      .createTempDirectory("tp-out").toString + "/t"
    val ckpt = java.nio.file.Files.createTempDirectory("tp-ck").toString
    val b1 = Seq((1L, "ab abc ab"), (2L, "abc abc"))       // 4 + 4 tokens
    val b2 = Seq((3L, "ab ab ab"))                          // 3 tokens
    b1.toDF("doc_id", "text").coalesce(1)
      .write.parquet(inDir.resolve("b1").toString)
    val stream = spark.readStream
      .schema("doc_id LONG, text STRING")
      .parquet(inDir.toString + "/*")
    val q = graft.streaming.EventStreams.tokenizedPackIngest(stream,
      "text", "doc_id", m, seqLen = 5L, sink, ckpt, 2, 8)
    try {
      q.processAllAvailable()
      b2.toDF("doc_id", "text").coalesce(1)
        .write.parquet(inDir.resolve("b2").toString)
      q.processAllAvailable()
      val rows = spark.read.parquet(sink).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getLong(3))).toSet
      // batch replay with the same running offset
      import graft.operators.{Packing, TextAnalysis => TA}
      val c1 = TA.unigramTokenCounts(b1.toDF("doc_id", "text"),
        "text", "doc_id", m, 2, 8)
      val c2 = TA.unigramTokenCounts(b2.toDF("doc_id", "text"),
        "text", "doc_id", m, 2, 8)
      val expect = (Packing.packSequences(c1, "n_tokens", "doc_id", 5L)
          .collect() ++
        Packing.packSequences(c2, "n_tokens", "doc_id", 5L,
          baseOffset = 8L).collect())
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getLong(3))).toSet
      assert(rows == expect, s"stream $rows != replay $expect")
      // doc 3 continues the sequence doc 2 left open (offset 8 -> seq 1)
      assert(rows.exists(r => r._1 == 3L && r._2 == 1L),
        "cross-batch sequence must keep filling")
    } finally q.stop()
  }

  test("training is deterministic run to run and fertility wires over " +
      "the unigram segmentation") {
    def model() = TextAnalysis.unigramLmTrain(corpus, "text", iters = 2,
        quant = 1000L, maxPiece = 2, maxWord = 8, minFreq = 1L)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .toSet
    assert(model() == model(), "two identical trainings diverged")
    val docs = Seq((1L, "en", "ab abc"), (2L, "de", "ab ab"))
      .toDF("doc_id", "lang", "text")
    val seg = TextAnalysis.unigramLmSegment(docs, "text",
      TextAnalysis.unigramLmTrain(corpus, "text", 2, 1000L, 2, 8, 1L),
      maxPiece = 2, maxWord = 8)
    val fert = TextAnalysis.tokenizerFertility(docs, "text", "lang",
        seg, quant = 1000L)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(4))).toSet
    // en: ab(1 piece) + abc(2 pieces) over 2 occurrences -> 1500
    // de: ab + ab -> 1000
    assert(fert == Set(("en", 2L, 3L, 1500L), ("de", 2L, 2L, 1000L)),
      fert.toString)
  }
}
