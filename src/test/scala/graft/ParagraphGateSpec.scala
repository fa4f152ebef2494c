package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.TextAnalysis

/** CCNet-style paragraph gate (q160): span decomposition, the
  * worst-span lever (one garbage paragraph flags a doc whose mean
  * still looks fine — the reason CCNet scores paragraphs, not
  * documents), exact-arithmetic invariants, and ntile balance. */
class ParagraphGateSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.session
  import spark.implicits._

  private val Quant = 1000000L

  // reference: fluent "language" with highly predictable transitions
  private lazy val ref = Seq.tabulate(20)(i =>
    (1000L + i, "the cat sat on the mat " * 4))
    .toDF("doc_id", "text")

  test("the worst-span lever: appending one garbage span tanks " +
      "min_para_fp to 0 while the overall score stays positive") {
    val fluent = "the cat sat on the mat the cat sat on the mat"
    val garbage = "zz qq xx vv kk jj ww yy"          // exactly one 8-word span
    val docs = Seq(
      (1L, fluent),
      (2L, fluent + " " + garbage)).toDF("doc_id", "text")
    val out = TextAnalysis.paragraphFamiliarityGate(
        docs, ref, "text", "doc_id", spanWords = 8, quant = Quant)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    val (_, _, famClean, minClean) = out(1L)
    val (nParas, _, famDirty, minDirty) = out(2L)
    assert(famClean > 0 && minClean > 0, s"clean doc scored $famClean/$minClean")
    assert(minDirty == 0L,
      s"garbage span not caught: min_para_fp = $minDirty")
    assert(famDirty > 0L,
      s"overall mean should survive one bad span, got $famDirty")
    assert(nParas >= 2, s"expected the garbage span to be its own para")
  }

  test("exact-arithmetic invariants on the real corpus: min_para_fp <= " +
      "fam_fp, scores within [0, quant], ntile buckets balanced, " +
      "short docs form a single span") {
    val out = SparkEntry.queries("q160_paragraph_gate")(
      spark, "/root/testdata/sf0.01")
    val rows = out.collect().map(r => (r.getLong(0), r.getLong(1),
      r.getLong(2), r.getLong(3), r.getLong(4), r.getString(5)))
    assert(rows.nonEmpty)
    rows.foreach { case (id, nParas, nBg, fam, minP, bucket) =>
      assert(minP <= fam, s"doc $id: min $minP > mean $fam")
      assert(fam >= 0 && fam <= Quant, s"doc $id fam $fam out of range")
      assert(nParas >= 1 && nBg >= nParas, s"doc $id paras/bigrams")
      assert(Set("head", "middle", "tail")(bucket))
    }
    val byBucket = rows.groupBy(_._6).view.mapValues(_.size).toMap
    assert(byBucket.keySet == Set("head", "middle", "tail"))
    assert(byBucket.values.max - byBucket.values.min <= 1,
      s"ntile buckets unbalanced: $byBucket")
    // head scores dominate tail scores (ordering actually ordered)
    val headMin = rows.filter(_._6 == "head").map(_._4).min
    val tailMax = rows.filter(_._6 == "tail").map(_._4).max
    assert(headMin >= tailMax, s"head min $headMin < tail max $tailMax")
    // a short doc: 5 words -> one span, 4 bigrams
    val one = TextAnalysis.paragraphFamiliarityGate(
        Seq((9L, "the cat sat on the")).toDF("doc_id", "text"),
        ref, "text", "doc_id", spanWords = 8, quant = Quant)
      .collect()
    assert(one.length == 1 && one(0).getLong(1) == 1L &&
      one(0).getLong(2) == 4L, s"short-doc span shape: ${one.toSeq}")
  }
}
