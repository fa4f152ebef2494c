package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Deep diagnostics for q109 (grouped `percentile_approx`, the 100 TB
  * sweep sibling of q102's exact percentiles). The sketch's picked
  * elements are engine-specific, so the hash gate instead pins the
  * IN-PLAN rank-bound proof (`q109ApproxQuantiles`' boolean columns,
  * TRUE per group in the DuckDB twin); this spec asserts the same
  * contract per percentile with full diagnostics: every returned value
  * is (a) an actual element of its group and (b) within rank error
  * n/accuracy of the target rank. Runs at sf0.1 — large enough that
  * the Greenwald–Khanna summary actually compresses (group sizes
  * exceed the accuracy parameter), so the bound is exercised, not
  * vacuously exact. */
class ApproxQuantileSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.session
  private val dir = "/root/testdata/sf0.1"

  test("approx quantiles are group elements within the documented rank error") {
    val docs = Tables.load(spark, dir, "documents")
      .select(col("lang"), col("n_chars"))
    val ap = SparkEntry.q109ApproxQuantileValues(spark, dir)
    // one pass over the data computes, per group and per percentile, the
    // closed rank interval [lo, hi] the approx value occupies
    val joined = docs.join(broadcast(ap), Seq("lang"))
    def lo(c: String) = sum(when(col("n_chars") < col(c), 1L).otherwise(0L))
    def hi(c: String) = sum(when(col("n_chars") <= col(c), 1L).otherwise(0L))
    val ranks = joined.groupBy(col("lang")).agg(
      first(col("n_docs")).as("n"),
      lo("ap25").as("lo25"), hi("ap25").as("hi25"),
      lo("ap50").as("lo50"), hi("ap50").as("hi50"),
      lo("ap75").as("lo75"), hi("ap75").as("hi75"))
      .collect()
    assert(ranks.nonEmpty)
    val acc = SparkEntry.ApproxQuantileAccuracy
    var compressedGroups = 0
    for (r <- ranks) {
      val lang = r.getString(0)
      val n = r.getLong(1)
      if (n > acc) compressedGroups += 1
      for ((p, i) <- Seq(0.25 -> 2, 0.5 -> 4, 0.75 -> 6)) {
        val (rLo, rHi) = (r.getLong(i), r.getLong(i + 1))
        // (a) element of the group: some row equals the returned value
        assert(rHi > rLo, s"$lang p$p: approx value not an element (lo=$rLo hi=$rHi)")
        // (b) rank error: the value's rank interval must come within
        // n/accuracy (+1 for integer rank rounding) of the target rank
        val target = p * n
        val bound = n.toDouble / acc + 1.0
        assert(rLo - bound <= target && target <= rHi + bound,
          s"$lang p$p: target rank $target outside [$rLo - $bound, $rHi + $bound] (n=$n)")
      }
    }
    // the bound must be exercised by at least one group the sketch
    // actually compressed; otherwise shrink accuracy or grow sf
    assert(compressedGroups > 0,
      s"no group exceeded accuracy=$acc; bound is vacuous at this sf")
  }

  test("gate form: every group's in-plan rank-bound proof is TRUE") {
    val gate = SparkEntry.q109ApproxQuantiles(spark, dir).collect()
    assert(gate.nonEmpty)
    for (r <- gate; i <- 2 to 4)
      assert(r.getBoolean(i), s"${r.getString(0)} col $i")
  }
}
