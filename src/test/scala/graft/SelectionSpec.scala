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
}
