package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Hybrid retrieval (q191): the BM25 ⊕ ANN ⊕ RRF composition on the
  * sf0.01 split — both signals must actually shape the fused list,
  * and the fused ranking must obey the RRF contract. */
class HybridRetrievalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.session
  private val dir = "/root/testdata/sf0.01"

  test("both rankings contribute: fused list contains items only one " +
      "side ranked, per-query depth respected, ranks contiguous") {
    val out = SparkEntry.queries("q191_hybrid_retrieval")(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.nonEmpty)
    val byQuery = out.groupBy(_._1)
    byQuery.foreach { case (q, rows) =>
      assert(rows.length <= 8, s"query $q returned ${rows.length} > k")
      val ranks = rows.map(_._4).sorted.toSeq
      assert(ranks == (1L to rows.length).toSeq,
        s"query $q ranks not contiguous: $ranks")
      // rrf_q strictly ordered along fused_rank (ties broken by id,
      // so rrf_q itself is non-increasing)
      val byRank = rows.sortBy(_._4).map(_._3).toSeq
      assert(byRank == byRank.sorted.reverse,
        s"query $q rrf_q not non-increasing along fused_rank")
    }
    // a doc ranked by only ONE source scores at most 2^40/(60+1); a doc
    // ranked #1 by BOTH scores ~2*that. Assert the corpus produces both
    // single-source and double-source survivors — i.e. neither signal
    // is subsumed by the other.
    val single = (1L << 40) / 61
    assert(out.exists(_._3 > single),
      "no fused item carried contributions from both rankings")
    assert(out.exists(_._3 <= single),
      "every fused item came from both rankings — suspicious overlap")
  }
}
