package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.TextAnalysis

class TextAnalysisSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.session
  import spark.implicits._

  test("token counting") {
    val df = Seq("the quick brown fox", "one", "a  b\t c").toDF("text")
    val got = df.select(TextAnalysis.tokenCount(col("text")).as("n"))
      .collect().map(_.getInt(0)).toSeq
    assert(got == Seq(4, 1, 3))
  }

  test("subword count splits letter/digit/punct runs") {
    val df = Seq("abc123!x", "hello world").toDF("text")
    val got = df.select(TextAnalysis.subwordCount(col("text")).as("n"))
      .collect().map(_.getInt(0)).toSeq
    assert(got == Seq(4, 2)) // abc | 123 | ! | x ; hello | world
  }

  test("ratios are in [0,1] and respond to noise") {
    val clean = "the cat sat on the mat with a hat for the rat"
    val noisy = "x!!! 4455 @@ ## $$ %% ^^"
    val df = Seq(clean, noisy).toDF("text")
    val rows = df.select(
      TextAnalysis.punctRatio(col("text")).as("p"),
      TextAnalysis.digitRatio(col("text")).as("d"),
      TextAnalysis.stopwordRatio(col("text")).as("s"),
      TextAnalysis.qualityScore(col("text")).as("q")).collect()
    val (cp, cs, cq) = (rows(0).getDouble(0), rows(0).getDouble(2), rows(0).getDouble(3))
    val (np, ns, nq) = (rows(1).getDouble(0), rows(1).getDouble(2), rows(1).getDouble(3))
    assert(cp == 0.0 && np > 0.3)
    assert(cs > 0.3 && ns == 0.0)
    assert(cq > nq, s"quality($clean)=$cq should beat quality($noisy)=$nq")
    rows.foreach { r =>
      Seq(0, 1, 2, 3).foreach(i => assert(r.getDouble(i) >= 0 && r.getDouble(i) <= 1))
    }
  }

  test("langId picks the marker-dominant language, 'und' when none hit") {
    val df = Seq(
      "the cat is on the mat and that is that",
      "el perro y la casa de los vecinos por la tarde",
      "der Hund ist nicht auf das Sofa und die Katze",
      "xyzzy plugh qwerty").toDF("text")
    val got = df.select(TextAnalysis.langId(col("text")).as("l"))
      .collect().map(_.getString(0)).toSeq
    assert(got == Seq("en", "es", "de", "und"))
  }

  test("fingerprint is whitespace/case-insensitive, content-sensitive") {
    val df = Seq(
      ("a", "Hello  World"), ("b", "hello world"), ("c", "hello worlds"))
      .toDF("id", "text")
    val got = df.select(TextAnalysis.fingerprint(col("text")).as("f"))
      .collect().map(_.getString(0)).toSeq
    assert(got(0) == got(1))
    assert(got(0) != got(2))
  }

  test("winnowFingerprint (simhash over 3-grams) is edit-robust") {
    val a = "the quick brown fox jumps over the lazy dog again and again"
    val b = "the quick brown fox jumps over the lazy cat again and again"
    val c = "completely different text with nothing shared at all here now"
    val df = Seq(a, b, c).toDF("text")
    val got = df.select(TextAnalysis.winnowFingerprint(col("text")).as("w"))
      .collect().map(_.getLong(0))
    def hamming(x: Long, y: Long) = java.lang.Long.bitCount(x ^ y)
    assert(hamming(got(0), got(1)) < hamming(got(0), got(2)))
  }

  test("profile emits all metrics in one pass") {
    val df = Seq((1L, "the quick brown fox")).toDF("doc_id", "text")
    val p = TextAnalysis.profile(df, "text")
    val expected = Seq("n_tokens", "n_subwords", "punct_ratio", "digit_ratio",
      "mean_token_len", "stopword_ratio", "quality", "lang_id", "fingerprint")
    expected.foreach(c => assert(p.columns.contains(c)))
    assert(p.count() == 1)
  }
}
