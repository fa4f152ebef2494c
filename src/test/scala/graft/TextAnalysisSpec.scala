package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.TextAnalysis

class TextAnalysisSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.session
  import spark.implicits._

  test("repetitionStats: top-word and duplicated-char fractions, tie-break to smallest word") {
    val docs = Seq(
      (1L, "b b a a c"),      // tie a/b at 2 -> top_word "a"; dup chars 4/5
      (2L, "x y z"),          // no repeats
      (3L, "w w w w"))        // fully repetitious
      .toDF("doc_id", "text")
    val got = TextAnalysis.repetitionStats(docs, "text", "doc_id")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3), r.getLong(4),
          r.getDouble(5), r.getDouble(6)))).toMap
    assert(got(1L) == ((5L, 3L, "a", 2L, 0.4, 0.8)))
    assert(got(2L) == ((3L, 3L, "x", 1L, 1.0 / 3, 0.0)))
    assert(got(3L) == ((4L, 1L, "w", 4L, 1.0, 1.0)))
  }

  test("repetitionStats: whitespace-only doc yields NULL dup_char_frac, not 0/0") {
    val docs = Seq((1L, "   "), (2L, "a a")).toDF("doc_id", "text")
    val got = TextAnalysis.repetitionStats(docs, "text", "doc_id")
      .select("doc_id", "dup_char_frac").collect()
      .map(r => r.getLong(0) -> Option(r.get(1))).toMap
    assert(got(1L).isEmpty)       // one empty-string token, zero chars -> NULL
    assert(got(2L).contains(1.0))
  }

  test("ngramRepetitionStats: occurrences counted (no dedup), short docs excluded") {
    val docs = Seq(
      (1L, "a b a b a"), // bigrams: "a b","b a","a b","b a" -> tie, top "a b"
      (2L, "x y z"),     // "x y","y z" -> no repeats
      (3L, "q"))         // 1 word < n=2 -> excluded
      .toDF("doc_id", "text")
    val got = TextAnalysis.ngramRepetitionStats(docs, "text", "doc_id", 2)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3), r.getLong(4),
          r.getDouble(5), r.getDouble(6)))).toMap
    assert(got.keySet == Set(1L, 2L))
    assert(got(1L) == ((4L, 2L, "a b", 2L, 0.5, 1.0)))
    assert(got(2L) == ((2L, 2L, "x y", 1L, 0.5, 0.0)))
  }

  test("gopherQuality: bounds and stopword gate, single scan with no shuffle") {
    val longGood = (("the cat sat on a mat of fur and felt to rest " * 5).trim)
    val tooShort = "the quick brown fox of june"
    val noStops = (("zzzz yyyy xxxx wwww vvvv uuuu tttt ssss rrrr qqqq " * 5).trim)
    val docs = Seq((1L, longGood), (2L, tooShort), (3L, noStops))
      .toDF("doc_id", "text")
    val out = TextAnalysis.gopherQuality(docs, "text", "doc_id",
      minWords = 40L, minMeanLen = 2.0)
    val got = out.collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(4), r.getBoolean(5))))
      .toMap
    assert(got(1L)._1 == 60L && got(1L)._2 == 5L && got(1L)._3) // keep
    assert(got(2L)._1 == 6L && !got(2L)._3)                     // too short
    assert(got(3L)._2 == 0L && !got(3L)._3)                     // no stopwords
    // map-only contract: the physical plan must contain no exchange
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"gopherQuality must not shuffle:\n$plan")
  }

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

  test("collocations: lift matches hand-computed PMI rationals; the count " +
      "floor prunes hapax pairs") {
    // corpus: "a b" ×3 and "a c a d" — tokens: a=5 b=3... recount:
    //   docs: "a b", "a b", "a b", "a c a d"
    //   unigrams: a=5, b=3, c=1, d=1  → N_uni = 10
    //   bigrams:  (a,b)=3, (a,c)=1, (c,a)=1, (a,d)=1 → N_bi = 6
    //   lift(a,b) = 3·100 / (5·3·6) = 300/90
    val df = Seq("a b", "a b", "a b", "a c a d").map(Tuple1(_)).toDF("text")
    val got = TextAnalysis.collocations(df, "text", minPairCount = 1L)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5))).toMap
    assert(got(("a", "b")) == ((3L, 5L, 3L, 300.0 / 90)))
    assert(got(("a", "c")) == ((1L, 5L, 1L, 100.0 / 30)))
    assert(got(("c", "a")) == ((1L, 1L, 5L, 100.0 / 30)))
    assert(got(("a", "d")) == ((1L, 5L, 1L, 100.0 / 30)))
    assert(got.size == 4)
    // the count floor prunes the tail before the unigram joins — the
    // PMI-hapax inflation artifact is exactly why the floor exists
    assert(TextAnalysis.collocations(df, "text", minPairCount = 2L)
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq
      == Seq(("a", "b")))
  }

  test("collocations: single-token docs contribute unigrams but no pairs") {
    val df = Seq("a", "b", "a b").map(Tuple1(_)).toDF("text")
    val got = TextAnalysis.collocations(df, "text", minPairCount = 1L)
      .collect().map(r => ((r.getString(0), r.getString(1)), r.getDouble(5)))
      .toMap
    // unigrams a=2, b=2, N_uni=4; bigrams (a,b)=1, N_bi=1
    // lift = 1·16/(2·2·1) = 4
    assert(got == Map(("a", "b") -> 4.0))
  }

  test("bigramFamiliarity: hand-computed conditionals separate fluent " +
      "from gibberish; OOV scores 0; sub-bigram docs are absent") {
    import spark.implicits._
    // reference: the→cat 2/4, cat→sat 2/2, sat→on 2/2, on→the 2/2,
    // the→mat 1/4, the→rug 1/4
    val ref = Seq((1L, "the cat sat on the mat"),
      (2L, "the cat sat on the rug")).toDF("doc_id", "text")
    val docs = Seq(
      (10L, "the cat sat"),          // 500000 + 1000000 over 2 bigrams
      (11L, "zebra quantum piano"),  // both bigrams OOV
      (12L, "hello"))                // single token: no bigrams
      .toDF("doc_id", "text")
    val got = TextAnalysis.bigramFamiliarity(docs, ref, "text", "doc_id")
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        r.getDouble(3)))).toMap
    assert(got.keySet == Set(10L, 11L))
    assert(got(10L) == ((2L, 1500000L, 0.75)))
    assert(got(11L) == ((2L, 0L, 0.0)))
  }
}
