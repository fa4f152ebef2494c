package graft

import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.TextAnalysis

/** Hashed linear quality classifier: feature-count arithmetic, the md5
  * weight derivation cross-checked against an in-test reference, and
  * determinism. */
class QualityClassifierSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.session
  import spark.implicits._

  /** In-test twin of the operator's hash chain: md5-hex → first 15
    * nibbles as a long → bucket → seeded multiplicative hash → weight. */
  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
  private def refWeight(feature: String, nBuckets: Int,
      weightRange: Int, seed: Int): Long = {
    val bucket = java.lang.Long.parseLong(
      md5hex(feature).take(15), 16) % nBuckets
    (bucket + seed) * 2654435761L % (2L * weightRange + 1L) - weightRange
  }

  test("score equals the sum of reference weights over unigrams+bigrams") {
    val text = "alpha beta gamma"
    val out = TextAnalysis.hashedLinearScore(
        Seq((1L, text)).toDF("doc_id", "text"), "text", "doc_id")
      .collect().head
    val feats = Seq("alpha", "beta", "gamma",
      "alpha beta", "beta gamma")
    assert(out.getAs[Long]("n_feats") == feats.size)
    val want = feats.map(refWeight(_, 4096, 1000, 7)).sum
    assert(out.getAs[Long]("score") == want)
    assert(out.getAs[Boolean]("keep") == (want > 0))
  }

  test("n_feats = 2n-1; token-less docs absent; whitespace-insensitive") {
    val docs = Seq(
      (1L, "one"),                       // 1 feat
      (2L, "  one\t two \n"),            // 3 feats, messy whitespace
      (3L, "one two three four"),        // 7 feats
      (4L, "   \t ")                     // absent
    ).toDF("doc_id", "text")
    val out = TextAnalysis.hashedLinearScore(docs, "text", "doc_id")
      .collect().map(r => r.getAs[Long]("doc_id") ->
        r.getAs[Long]("n_feats")).toMap
    assert(out == Map(1L -> 1L, 2L -> 3L, 3L -> 7L))
    // same tokens → same score regardless of whitespace shape
    val s = TextAnalysis.hashedLinearScore(
        Seq((10L, "one two"), (11L, " one \n two ")).toDF("doc_id", "text"),
        "text", "doc_id")
      .collect().map(r => r.getAs[Long]("score")).distinct
    assert(s.size == 1, s.toSeq)
  }

  test("fast path: same feature counts as portable, deterministic, bounded") {
    val docs = (1L to 30L).map(i => (i, s"shared words plus tok$i here"))
      .toDF("doc_id", "text")
    val portable = TextAnalysis.hashedLinearScore(docs, "text", "doc_id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val fast = TextAnalysis.hashedLinearScoreFast(docs, "text", "doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(fast.map(f => f._1 -> f._2).toMap == portable,
      "identical tokenization => identical n_feats")
    fast.foreach { case (_, n, s) => assert(math.abs(s) <= n * 1000L) }
    val again = TextAnalysis.hashedLinearScoreFast(docs.repartition(7),
        "text", "doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(fast.sorted.toSeq == again.sorted.toSeq)
  }

  test("trained-weights path reproduces the derived weights exactly") {
    val docs = (1L to 20L).map(i => (i, s"alpha beta tok$i gamma"))
      .toDF("doc_id", "text")
    // the derived weight vector materialized as a model table
    val model = spark.range(4096).select(col("id").as("bucket"),
      (((col("id") + 7) * 2654435761L) % 2001L - 1000L).as("weight"))
    val trained = TextAnalysis.linearScoreWithWeights(
        docs, "text", "doc_id", model)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sorted.toSeq
    val derived = TextAnalysis.hashedLinearScore(docs, "text", "doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sorted.toSeq
    assert(trained == derived)
    // missing buckets contribute 0, not dropped features: an empty
    // model scores 0 but keeps every feature counted
    val empty = model.filter(col("bucket") < 0)
    val zeroed = TextAnalysis.linearScoreWithWeights(
        docs, "text", "doc_id", empty)
      .collect().map(r => (r.getLong(1), r.getLong(2)))
    assert(zeroed.forall { case (n, s) => n == 7L && s == 0L })
  }

  test("deterministic, and score bounded by n_feats * weightRange") {
    val docs = (1L to 50L).map(i =>
      (i, s"doc $i with shared words and unique token tok$i"))
      .toDF("doc_id", "text")
    val run1 = TextAnalysis.hashedLinearScore(docs, "text", "doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted
    val run2 = TextAnalysis.hashedLinearScore(docs.repartition(5),
        "text", "doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted
    assert(run1.toSeq == run2.toSeq)
    run1.foreach { case (_, n, score) =>
      assert(math.abs(score) <= n * 1000L, (n, score))
    }
  }
}
