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
}
