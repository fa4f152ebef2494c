package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Selection

/** DSIR-style targeted selection: candidates sharing the seed corpus's
  * vocabulary must outscore vocabulary-disjoint ones. */
class SelectionSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.session
  import spark.implicits._

  test("targetAffinity ranks seed-like candidates above disjoint ones") {
    val docs = Seq(
      // seed corpus: a distinctive shared vocabulary
      (1L, "quantum physics entangles particles across spacetime fields"),
      (2L, "particles and fields define quantum states in spacetime"),
      // candidate A: heavy seed-vocabulary overlap
      (10L, "quantum fields and particles form entangled states"),
      // candidate B: fully disjoint vocabulary
      (11L, "banana smoothie recipes delight tropical breakfast tables"),
      // candidate C: empty after normalization → absent from output
      (12L, "   ")
    ).toDF("doc_id", "text")
    val out = Selection.targetAffinity(docs, "text", "doc_id",
        col("doc_id") < 10L, nBuckets = 4096)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("affinity"), r.getAs[Double]("rel_affinity"))).toMap
    assert(!out.contains(1L) && !out.contains(2L), "seed rows must not score")
    assert(!out.contains(12L), "token-less doc must be absent")
    assert(out(10L)._1 > 0L)
    assert(out(10L)._2 > out(11L)._2,
      s"seed-like ${out(10L)} must outrank disjoint ${out(11L)}")
    // determinism: md5 hashing, integer arithmetic
    val again = Selection.targetAffinity(docs, "text", "doc_id",
        col("doc_id") < 10L, nBuckets = 4096)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("affinity"), r.getAs[Double]("rel_affinity"))).toMap
    assert(again == out)
  }

  test("importanceRatio reproduces the hand-computed quantized ratio") {
    import spark.implicits._
    // one word, one bucket: target doc 0 = "x x" (T = 2), candidate
    // doc 1 = "x x x", reference = everything (R = 5). q = 100000,
    // nb = 4096:
    //   pt = 300000 DIV 4098 = 73;  pr = 600000 DIV 4101 = 146
    //   rho = (100000 * 74) DIV 147 = 50340
    //   doc 1: n_tokens = 3, ratio_sum = 151020, mean = 0.5034
    val docs = Seq((0L, "x x"), (1L, "x x x")).toDF("doc_id", "text")
    val out = Selection.importanceRatio(docs, "text", "doc_id",
        isTarget = col("doc_id") === 0L, isReference = lit(true))
      .as[(Long, Long, Long, Double)].collect()
    assert(out.toSeq == Seq((1L, 3L, 3L * 50340L,
      (3L * 50340L).toDouble / 300000.0)))
  }

  test("importanceRatio separates target-like from reference-typical " +
      "candidates (the signal targetAffinity's single profile lacks)") {
    import spark.implicits._
    val common = "the of and to in is for on with as" // everywhere
    val docs = Seq(
      // target seed: distinctive vocabulary + the common words
      (1L, s"quantum spacetime entanglement $common"),
      (2L, s"entanglement quantum fields $common"),
      // bulk reference: common words + off-target vocabulary
      (3L, s"banana smoothie $common"), (4L, s"recipes tropical $common"),
      (5L, s"breakfast tables $common"), (6L, s"delight banana $common"),
      // candidate A: target vocabulary; candidate B: pure boilerplate
      (10L, s"quantum entanglement spacetime fields"),
      (11L, common)
    ).toDF("doc_id", "text")
    val out = Selection.importanceRatio(docs, "text", "doc_id",
        isTarget = col("doc_id") <= 2L, isReference = lit(true))
      .collect().map(r => r.getAs[Long]("doc_id") ->
        r.getAs[Double]("mean_ratio")).toMap
    assert(!out.contains(1L) && !out.contains(2L), "seeds must not score")
    assert(out(10L) > out(11L),
      s"target-vocab ${out(10L)} must outrank boilerplate ${out(11L)}")
    // reference docs are still scored (they are candidates too)
    assert(out.contains(3L))
    assert(out(10L) > out(3L))
  }

  test("importanceRatio bigrams: word ORDER enters the score — a " +
      "bag-identical candidate with alien order ranks below the " +
      "order-preserving one; n_tokens counts unigrams + bigrams") {
    import spark.implicits._
    // target repeats one fixed phrase; candidates share ITS WORD BAG
    val phrase = "alpha beta gamma delta"
    val docs = (
      (1L to 6L).map(i => (i, phrase)) ++ Seq(
        (10L, phrase),                       // order preserved
        (11L, "delta gamma beta alpha"))     // same bag, reversed
      ).toDF("doc_id", "text")
    val out = Selection.importanceRatio(docs, "text", "doc_id",
        isTarget = col("doc_id") <= 6L, isReference = lit(true),
        bigrams = true)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_tokens"), r.getAs[Double]("mean_ratio")))
      .toMap
    // 4 unigrams + 3 bigrams = 7 grams per candidate
    assert(out(10L)._1 == 7L && out(11L)._1 == 7L, out.toString)
    assert(out(10L)._2 > out(11L)._2,
      s"order-preserving ${out(10L)} must outrank reversed ${out(11L)}")
    // the unigram form cannot tell them apart
    val uni = Selection.importanceRatio(docs, "text", "doc_id",
        isTarget = col("doc_id") <= 6L, isReference = lit(true))
      .collect().map(r => r.getAs[Long]("doc_id") ->
        r.getAs[Double]("mean_ratio")).toMap
    assert(uni(10L) == uni(11L),
      "unigram scores must tie on identical bags")
  }
}
