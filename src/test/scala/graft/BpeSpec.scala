package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{exprs, BpeKernel}
import graft.operators.TextAnalysis

/** Greedy BPE application + training (Sennrich et al. 2016 semantics),
  * hand-computed cases — including the self-merge runs the q153 oracle
  * deliberately excludes (string replace cannot replay them; the
  * kernel's leftmost-skip scan is the ground truth here). */
class BpeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.session

  private def enc(word: String, merges: (String, String)*): Seq[String] =
    BpeKernel.encodeWord(word,
      merges.map(m => Array(m._1, m._2)).toArray).toSeq

  test("kernel: chained merges apply in table order") {
    assert(enc("the") == Seq("t", "h", "e"))
    assert(enc("the", ("t", "h")) == Seq("th", "e"))
    assert(enc("the", ("t", "h"), ("th", "e")) == Seq("the"))
    // order matters: ("th","e") before ("t","h") never fires
    assert(enc("the", ("th", "e"), ("t", "h")) == Seq("th", "e"))
    assert(enc("thethe", ("t", "h"), ("th", "e")) == Seq("the", "the"))
  }

  test("kernel: self-merge runs pair from the left edge (leftmost-greedy " +
      "with skip — the case plain string replace gets wrong)") {
    assert(enc("aa", ("a", "a")) == Seq("aa"))
    assert(enc("aaa", ("a", "a")) == Seq("aa", "a"))
    assert(enc("aaaa", ("a", "a")) == Seq("aa", "aa"))
    assert(enc("aaaaa", ("a", "a")) == Seq("aa", "aa", "a"))
    assert(enc("aaaa", ("a", "a"), ("aa", "aa")) == Seq("aaaa"))
    assert(enc("aaaaaa", ("a", "a"), ("aa", "aa")) == Seq("aaaa", "aa"))
    // merged symbols are atomic: (a,a) never matches inside "aa"+"b"
    assert(enc("aab", ("a", "a"), ("a", "b")) == Seq("aa", "b"))
  }

  test("kernel: a merge never crosses a word boundary; segment joins " +
      "all words' tokens with single spaces") {
    val m = Array(Array("a", "b"))
    assert(BpeKernel.segment("ab a b", m) == "ab a b")
    assert(BpeKernel.segment("", m) == "")
    assert(BpeKernel.segment("ab", Array.empty[Array[String]]) == "a b")
  }

  test("expression: bpe_segment matches the kernel row-for-row and " +
      "stays inside whole-stage codegen") {
    val merges = Seq(("t", "h"), ("th", "e"), ("e", "r"))
    // a parquet-backed frame so the projection runs through whole-stage
    // codegen instead of collapsing into a LocalTableScan
    val df = Tables.load(spark, "/root/testdata/sf0.001", "documents")
      .filter(col("doc_id") < 20)
      .select(col("text"), exprs.bpe_segment(col("text"), merges).as("seg"))
    df.collect().foreach { r =>
      assert(r.getString(1) == BpeKernel.segment(r.getString(0),
        merges.map(m => Array(m._1, m._2)).toArray))
    }
    val plan = df.queryExecution.executedPlan.toString
    assert("\\*\\(\\d+\\)".r.findAllIn(plan).nonEmpty,
      s"bpe_segment fell out of codegen:\n${plan.take(800)}")
  }

  test("learner: recovers the frequency-ordered merges of a hand corpus, " +
      "deterministic tie-break, and application round-trips") {
    import spark.implicits._
    // "lo" dominates (low lower lowest x3 words), then "low" (lo+w)
    val docs = Seq("low lower lowest", "low low lowest").toDF("text")
    val merges = TextAnalysis.learnBpeMerges(docs, "text", 3)
    assert(merges.take(2) == Seq(("l", "o"), ("lo", "w")), merges.toString)
    // the learned table tokenizes the corpus it was trained on
    val toks = TextAnalysis.bpeTokens(
        docs.withColumn("id", lit(1L)), "text", "id", merges)
      .groupBy("token").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(toks.contains("low"), toks.toString)
    // exhaustion: a corpus with no repeated pair stops early
    val tiny = Seq("ab").toDF("text")
    assert(TextAnalysis.learnBpeMerges(tiny, "text", 5).length <= 5)
  }

  test("batched learner: certified batching reproduces the EXACT " +
      "sequential merge order at every batch size") {
    import spark.implicits._
    val docs = Seq("low lower lowest", "low low lowest",
      "new newer newest", "wide wider widest").toDF("text")
    val seq8 = TextAnalysis.learnBpeMerges(docs, "text", 8)
    assert(seq8.length == 8)
    // the certified acceptance rule must NEVER diverge — chained
    // symbols (lo -> low) force conservative stops, not wrong merges
    Seq(1, 2, 4, 8, 64).foreach { b =>
      val batched = TextAnalysis.learnBpeMergesBatched(docs, "text", 8, b)
      assert(batched == seq8, s"batch=$b: $batched vs $seq8")
    }
    // adversarial tight counts: every pair count equal — certification
    // degrades to one merge per pass, still exactly sequential
    val tight = Seq("ab cd ef gh").toDF("text")
    val seqT = TextAnalysis.learnBpeMerges(tight, "text", 4)
    assert(TextAnalysis.learnBpeMergesBatched(tight, "text", 4, 4) == seqT)
    // and on the real corpus slice
    val corpus = Tables.load(spark, "/root/testdata/sf0.001", "documents")
      .filter(col("doc_id") < 40).select(col("text"))
    val seqC = TextAnalysis.learnBpeMerges(corpus, "text", 6)
    assert(TextAnalysis.learnBpeMergesBatched(corpus, "text", 6, 6) == seqC)
  }

  test("merge-table persistence: save/load round-trips order-exactly " +
      "and trainOrLoad trains once") {
    implicit val s = spark
    import spark.implicits._
    val docs = Seq("low lower lowest", "low low lowest").toDF("text")
    val merges = TextAnalysis.learnBpeMerges(docs, "text", 4)
    assert(merges.nonEmpty)
    val path = java.nio.file.Files.createTempDirectory("bpemerges")
      .resolve("m").toString
    TextAnalysis.saveBpeMerges(merges, path)
    assert(TextAnalysis.loadBpeMerges(path) == merges)
    var built = 0
    assert(TextAnalysis.trainOrLoadBpeMerges(path + "2") {
      built += 1; merges } == merges)
    assert(TextAnalysis.trainOrLoadBpeMerges(path + "2") {
      built += 1; fail("rebuilt despite persisted model") } == merges)
    assert(built == 1)
    // application under the loaded table is identical
    val ids = docs.withColumn("id", lit(1L))
    def toks(m: Seq[(String, String)]) = TextAnalysis
      .bpeTokens(ids, "text", "id", m)
      .groupBy("token").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(toks(TextAnalysis.loadBpeMerges(path)) == toks(merges))
  }

  test("q153 pre-condition: the oracle's replace replay equals the " +
      "kernel on the actual corpus merge table (l != r throughout)") {
    val p = SketchParams.q153
    assert(p.merges.forall(m => m._1 != m._2))
    // randomized cross-check of replace-chain vs kernel on corpus-like
    // words (the oracle correctness argument, executed)
    val rnd = new scala.util.Random(42)
    val mergeArr = p.merges.map(m => Array(m._1, m._2)).toArray
    (1 to 2000).foreach { _ =>
      val w = (1 to (1 + rnd.nextInt(12)))
        .map(_ => "theranodi".charAt(rnd.nextInt(9))).mkString
      var s = "|" + w.map(c => s"$c|").mkString
      p.merges.foreach { case (l, r) =>
        s = s.replace(s"|$l|$r|", s"|$l$r|").replace(s"|$l|$r|", s"|$l$r|")
      }
      val viaReplace = s.split('|').filter(_.nonEmpty).toSeq
      assert(viaReplace == BpeKernel.encodeWord(w, mergeArr).toSeq,
        s"word $w: $viaReplace vs kernel")
    }
  }
}
