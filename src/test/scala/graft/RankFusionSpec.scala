package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.TextAnalysis

/** Reciprocal rank fusion: exact-integer contributions against a hand
  * computation, absent-item semantics, tie-break and cutoff. */
class RankFusionSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.session

  private val B = 1L << 40

  test("fused scores are the exact BIGINT contribution sums; order and " +
      "cutoff follow (score DESC, item ASC)") {
    import spark.implicits._
    // source 1 ranks a,b,c ; source 2 ranks c,a — b absent from s2,
    // d absent everywhere
    val s1 = Seq(("g", "a", 1L), ("g", "b", 2L), ("g", "c", 3L))
      .toDF("grp", "item", "rnk")
    val s2 = Seq(("g", "c", 1L), ("g", "a", 2L))
      .toDF("grp", "item", "rnk")
    val k = 60
    val got = TextAnalysis.reciprocalRankFusion(Seq(s1, s2),
        "grp", "item", "rnk", k, topN = 2)
      .collect()
      .map(r => (r.getString(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._3)
    def c(r: Long) = B / (k + r)
    val expA = c(1) + c(2)
    val expC = c(3) + c(1)
    assert(expA > expC) // 1st+2nd beats 3rd+1st at K=60
    assert(got.toSeq == Seq(("a", expA, 1L), ("c", expC, 2L)))
    // without the cutoff, b appears with its single-source sum
    val all = TextAnalysis.reciprocalRankFusion(Seq(s1, s2),
        "grp", "item", "rnk", k, topN = 10)
      .collect().map(r => r.getString(1) -> r.getLong(2)).toMap
    assert(all("b") == c(2))
    assert(all.size == 3)
  }

  test("ties on fused score break to the smaller item; groups fuse " +
      "independently") {
    import spark.implicits._
    // two items with identical rank profiles in one group; a second
    // group with its own ranking
    val s1 = Seq(("g1", "x", 1L), ("g1", "y", 1L), ("g2", "z", 1L))
      .toDF("grp", "item", "rnk")
    val got = TextAnalysis.reciprocalRankFusion(Seq(s1),
        "grp", "item", "rnk", 60, topN = 1)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(got == Set(("g1", "x"), ("g2", "z")))
  }
}
