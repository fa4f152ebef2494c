package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.TextAnalysis

/** WordPiece-style integer-DP segmentation (q195): hand-checked DP
  * optimality, reconstruction invariants, and vocab-membership
  * behavior. */
class WordpieceSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.session
  import spark.implicits._

  test("DP picks fewest pieces, beating greedy longest-match when " +
      "greedy paints itself into a corner") {
    // vocab hand-built: {abc, cd, ab, cde, and chars}. For "abcde":
    // greedy longest-match takes abc + ... then 'de' absent -> abc|d|e
    // (3); the DP finds ab|cde (2).
    val vocab = Seq(("abc", 50L), ("cd", 40L), ("ab", 30L),
      ("cde", 20L), ("a", 9L), ("b", 8L), ("c", 7L), ("d", 6L),
      ("e", 5L)).toDF("piece", "freq")
    val out = TextAnalysis.wordpieceSegment(
        Seq((1L, "abcde")).toDF("doc_id", "text"), "text", vocab)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getString(2), r.getBoolean(3))).toMap
    assert(out("abcde") == ((2L, "ab|cde", true)),
      s"got ${out("abcde")}")
  }

  test("frequency tie-break: among equal piece counts the DP takes " +
      "the higher-frequency pieces") {
    // "abcd" splits 2 ways into two pieces: ab|cd (30+40) vs a|bcd —
    // give bcd enormous freq; a|bcd (9+100) loses to ab|cd? 70 < 109:
    // the DP must take a|bcd
    val vocab = Seq(("ab", 30L), ("cd", 40L), ("bcd", 100L),
      ("a", 9L), ("b", 8L), ("c", 7L), ("d", 6L))
      .toDF("piece", "freq")
    val out = TextAnalysis.wordpieceSegment(
        Seq((1L, "abcd")).toDF("doc_id", "text"), "text", vocab)
      .collect().map(r => r.getString(0) -> r.getString(2)).toMap
    assert(out("abcd") == "a|bcd", s"got ${out("abcd")}")
  }

  test("in-range word the vocab cannot cover passes through with " +
      "covered = false (one row per distinct word, always)") {
    // vocab from a corpus with no 'z': "zap" (length 3 <= maxWord)
    // reaches no full-cover DP state — it must still come back
    val vocab = Seq(("a", 9L), ("p", 8L), ("ap", 20L))
      .toDF("piece", "freq")
    val out = TextAnalysis.wordpieceSegment(
        Seq((1L, "zap ap")).toDF("doc_id", "text"), "text", vocab)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getString(2), r.getBoolean(3))).toMap
    assert(out.keySet == Set("zap", "ap"))
    assert(out("zap") == ((1L, "zap", false)), s"got ${out("zap")}")
    assert(out("ap") == ((1L, "ap", true)))
  }

  test("n_pieces is the DP piece count, not a re-split of the " +
      "'|'-joined string (words containing a literal '|')") {
    // word "a|b": chars a, |, b -> 3 pieces, pieces string "a|||b"
    // (which a naive re-split would count as 4)
    val vocab = Seq(("a", 9L), ("|", 8L), ("b", 7L))
      .toDF("piece", "freq")
    val out = TextAnalysis.wordpieceSegment(
        Seq((1L, "a|b")).toDF("doc_id", "text"), "text", vocab)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getString(2), r.getBoolean(3))).toMap
    assert(out("a|b") == ((3L, "a|||b", true)), s"got ${out("a|b")}")
  }

  test("vocab persistence: save/load round-trips bit-exactly and " +
      "trainOrLoad builds once then serves the parquet copy") {
    implicit val s = spark
    val docs = Seq((1L, "low lower"), (2L, "low lowest"))
      .toDF("doc_id", "text")
    val vocab = TextAnalysis.wordpieceVocab(docs, "text", 8, 4)
    val path = java.nio.file.Files.createTempDirectory("wpvocab")
      .resolve("v").toString
    TextAnalysis.saveWordpieceVocab(vocab, path)
    val loaded = TextAnalysis.loadWordpieceVocab(path)
    def m(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(m(loaded) == m(vocab))
    // trainOrLoad: second call must NOT rebuild (poison the builder)
    var built = 0
    val v1 = TextAnalysis.trainOrLoadWordpieceVocab(path + "2") {
      built += 1; vocab }
    val v2 = TextAnalysis.trainOrLoadWordpieceVocab(path + "2") {
      built += 1; fail("rebuilt despite persisted model") }
    assert(built == 1 && m(v1) == m(vocab) && m(v2) == m(vocab))
    // and segmentation from the loaded vocab equals from the built one
    assert(m(TextAnalysis.wordpieceSegment(docs, "text", loaded)
        .select(col("word"), col("n_pieces"))) ==
      m(TextAnalysis.wordpieceSegment(docs, "text", vocab)
        .select(col("word"), col("n_pieces"))))
  }

  test("corpus invariants: pieces reconstruct the word, covered words " +
      "obey the length cap, vocab words segment to one piece") {
    val docs = Tables.load(spark, "/root/testdata/sf0.01", "documents")
    val vocab = TextAnalysis.wordpieceVocab(docs, "text")
    val vocabSet = vocab.collect().map(_.getString(0)).toSet
    val out = TextAnalysis.wordpieceSegment(docs, "text", vocab)
      .collect().map(r => (r.getString(0), r.getLong(1),
        r.getString(2), r.getBoolean(3)))
    assert(out.nonEmpty)
    out.foreach { case (word, n, pieces, covered) =>
      if (covered) {
        assert(pieces.replace("|", "") == word,
          s"pieces of '$word' reconstruct '${pieces.replace("|", "")}'")
        assert(pieces.split('|').length.toLong == n)
        assert(pieces.split('|').forall(vocabSet.contains),
          s"'$word' used an out-of-vocab piece: $pieces")
        if (vocabSet.contains(word))
          assert(n == 1L, s"vocab word '$word' split into $pieces")
      } else assert(word.length > 16)
    }
  }

  test("tokenizerFertility: occurrence-weighted pieces-per-word and " +
      "coverage per group, exact fixed point") {
    val vocab = Seq(("ab", 30L), ("cd", 40L), ("a", 9L), ("b", 8L),
      ("c", 7L), ("d", 6L)).toDF("piece", "freq")
    val docs = Seq(
      (1L, "aa", "ab ab cd"),
      (2L, "bb", "abcd zz")).toDF("doc_id", "lang", "text")
    val seg = TextAnalysis.wordpieceSegment(docs, "text", vocab)
    val out = TextAnalysis
      .tokenizerFertility(docs, "text", "lang", seg, quant = 1000L)
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))
      .toMap
    // aa: ab x2 + cd x1, all single vocab pieces -> fertility 1.000
    assert(out("aa") == ((3L, 3L, 3L, 1000L, 1000L)), s"${out("aa")}")
    // bb: abcd -> ab|cd (2 pieces, covered); zz uncoverable (1 piece,
    // not covered) -> fertility 3/2 = 1.500, coverage 1/2 = 0.500
    assert(out("bb") == ((2L, 3L, 1L, 1500L, 500L)), s"${out("bb")}")
  }
}
