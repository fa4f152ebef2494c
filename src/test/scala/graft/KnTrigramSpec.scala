package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.TextAnalysis

/** Interpolated Kneser–Ney trigram gate (q188): hand-computed
  * probabilities on a tiny reference, the KN continuation property
  * (frequent-but-predictable words get LESS unseen-context mass than
  * versatile ones), backoff mass for unseen trigrams (the q127
  * hard-zero fixed), and the CCNet bucket direction. */
class KnTrigramSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.session
  import spark.implicits._

  private def gate(docs: Seq[(Long, String)], ref: Seq[(Long, String)],
      quant: Long = 1000000L) =
    TextAnalysis.knTrigramGate(docs.toDF("doc_id", "text"),
      ref.toDF("doc_id", "text"), "text", "doc_id", quant)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3), r.getString(4)))
      .toMap

  test("hand-computed KN probability on a one-doc reference") {
    // reference "a b c a b c a b d":
    //   trigrams: abc:2 abd:1 bca:1 bcA? -> positions: (a b c) (b c a)
    //   (c a b) (a b c) (b c a)?? enumerate: tokens a b c a b c a b d
    //   i=1..7: abc, bca, cab, abc, bca, cab? no — (c a b) at i=3?
    //   i:1 abc, 2 bca, 3 cab, 4 abc, 5 bca, 6 cab, 7 abd
    //   c3: abc=2, bca=2, cab=2, abd=1; ctx3(ab)=3, n3(ab)=2
    //   bigram TYPES: ab, bc, ca, bd -> BT=4
    //   vocab {a,b,c,d} -> V=4
    //   continuation: cc2 from trigram types {abc,bca,cab,abd}:
    //     (w2,w3): (b,c):1 (c,a):1 (a,b):1 (b,d):1
    //     ctxc2(b)=2, nm(b)=2
    //   cc1(w3=c) = distinct w2 preceding c in bigram types = |{b}| = 1
    // score trigram (a b c):
    //   P1(c) = (1+1)/(4+4+1) = 2/9
    //   P2(c|b) = (max(1-.75,0) + .75*2*(2/9)) / 2 = (0.25 + 1/3)/2
    //           = 0.2916666...
    //   P3(c|ab) = (max(2-.75,0) + .75*2*P2) / 3
    //            = (1.25 + 1.5*0.2916666...)/3 = 0.5625/1.6875/3?
    //   = (1.25 + 0.4375)/3 = 1.6875/3 = 0.5625
    val ref = Seq((0L, "a b c a b c a b d"))
    val out = gate(Seq((1L, "a b c")), ref)
    val (n, sum, mean, _) = out(1L)
    assert(n == 1L)
    assert(sum == 562500L, s"floor(1e6 * P3(c|ab)) = 562500, got $sum")
    assert(math.abs(mean - 0.5625) < 1e-12)
  }

  test("unseen trigram in a seen context gets backoff mass, not zero") {
    val ref = Seq((0L, "a b c a b c a b d"))
    // "a b a": trigram (a b a) unseen, context (a b) seen with mass
    // D*n3/ctx3 to distribute; (b a) bigram-continuation unseen too,
    // so it falls through to the unigram base — still > 0
    val out = gate(Seq((1L, "a b a")), ref)
    val (_, sum, _, _) = out(1L)
    assert(sum > 0L, s"backoff mass should be positive, got $sum")
  }

  test("KN continuation property: a word seen in many contexts beats " +
      "an equally-frequent single-context word under unseen contexts") {
    // 'x' appears 4 times, ALWAYS after 'q' (the "Francisco" shape);
    // 'y' appears 4 times after 4 DIFFERENT predecessors
    val ref = Seq((0L, "q x q x q x q x a y b y c y d y"))
    // both scored in an unseen context (z z _): everything backs off
    // to the continuation unigram, where cc1(x)=1 but cc1(y)=4
    val out = gate(Seq((1L, "z z x"), (2L, "z z y")), ref)
    val sx = out(1L)._2
    val sy = out(2L)._2
    assert(sy > sx,
      s"versatile 'y' ($sy) should outscore predictable 'x' ($sx)")
  }

  test("sketch-threshold bucketing (the documented at-scale swap) " +
      "agrees with the exact ntile away from tercile boundaries") {
    val docs = Tables.load(spark, "/root/testdata/sf0.01", "documents")
    val exact = TextAnalysis.knTrigramGate(
        docs.filter(col("doc_id") % 3 =!= 0),
        docs.filter(col("doc_id") % 3 === 0), "text", "doc_id")
      .select(col("doc_id"), col("kn_mean"), col("bucket"))
      .collect().map(r => r.getLong(0) -> (r.getDouble(1),
        r.getString(2))).toMap
    val scored = TextAnalysis.knTrigramScore(
      docs.filter(col("doc_id") % 3 =!= 0),
      TextAnalysis.knTrigramModel(
        docs.filter(col("doc_id") % 3 === 0), "text"),
      "text", "doc_id")
    val (lo, hi) = TextAnalysis.tercileThresholds(scored, "kn_mean")
    assert(lo <= hi)
    val approx = TextAnalysis
      .bucketByThresholds(scored, "kn_mean", lo, hi)
      .select(col("doc_id"), col("bucket"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val agree = exact.count { case (id, (_, b)) => approx(id) == b }
    assert(agree.toDouble / exact.size >= 0.9,
      s"sketch buckets agree on only $agree/${exact.size}")
    // orientation identical: every exact-head doc with a score above
    // hi must be approx-head too
    exact.foreach { case (id, (m, b)) =>
      if (m >= hi) assert(approx(id) == "head",
        s"doc $id score $m >= hi=$hi but approx bucket ${approx(id)}")
    }
  }

  test("KN model persists bit-exactly; trainOrLoadKnModel builds once " +
      "and scores from the persisted tables identically") {
    implicit val s = spark
    val ref = Seq((0L, "a b c a b c a b d")).toDF("doc_id", "text")
    val docs = Seq((1L, "a b c"), (2L, "a b a")).toDF("doc_id", "text")
    val fresh = TextAnalysis.knTrigramModel(ref, "text")
    val root = java.nio.file.Files.createTempDirectory("kn-model")
      .toString + "/m"
    var builds = 0
    def build = { builds += 1; fresh }
    val loaded = TextAnalysis.trainOrLoadKnModel(root)(build)
    assert(builds == 1)
    val again = TextAnalysis.trainOrLoadKnModel(root)(build)
    assert(builds == 1, "second call re-trained instead of loading")
    def scores(m: TextAnalysis.KnTrigramModel) =
      TextAnalysis.knTrigramScore(docs, m, "text", "doc_id")
        .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    assert(scores(loaded) == scores(fresh),
      "persisted model scores diverged from the fresh model")
    assert(again.rTri.inputFiles.nonEmpty,
      "load not backed by the model files")
  }

  test("bucket direction: reference-like text lands ahead of gibberish") {
    val ref = (0L to 9L).map(i => (i, "the cat sat on the mat " * 3))
    val docs = Seq(
      (100L, "the cat sat on the mat the cat sat"),
      (101L, "zzq qqz zqq qzz zzz qqq zqz qzq zzq"),
      (102L, "the cat zzq on qqz mat the qzz sat"))
    val out = gate(docs, ref)
    assert(out(100L)._3 > out(102L)._3 && out(102L)._3 > out(101L)._3,
      "scores should order fluent > mixed > gibberish")
    assert(out(100L)._4 == "head" && out(102L)._4 == "middle" &&
      out(101L)._4 == "tail")
  }

  test("mooreLewisSelect: in-domain-like candidates selected, " +
      "general-like rejected, diff = kn_in - kn_gen exactly") {
    import spark.implicits._
    val refIn = (0L to 9L)
      .map(i => (i, "the cat sat on the mat " * 3)).toDF("doc_id", "text")
    val refGen = (0L to 9L)
      .map(i => (i, "stock market index fell sharply today " * 3))
      .toDF("doc_id", "text")
    val cands = Seq(
      (100L, "the cat sat on the mat"),
      (101L, "stock market index fell sharply"),
      (102L, "the cat sat on the index today")).toDF("doc_id", "text")
    val out = graft.operators.Selection
      .mooreLewisSelect(cands, refIn, refGen, "text", "doc_id")
      .collect()
      .map(r => r.getLong(0) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getBoolean(5)))
      .toMap
    assert(out(100L)._4 && out(100L)._3 > 0,
      s"in-domain candidate must be selected: ${out(100L)}")
    assert(!out(101L)._4 && out(101L)._3 < 0,
      s"general candidate must be rejected: ${out(101L)}")
    out.values.foreach { case (kin, kgen, diff, sel) =>
      assert(diff == kin - kgen && sel == (diff > 0)) }
  }
}
