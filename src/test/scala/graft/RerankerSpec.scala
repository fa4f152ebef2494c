package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Ann

/** Trained reranker over the hybrid candidates (q224): the learned
  * second stage must not LOSE recall versus the fixed-RRF fusion on
  * held-out queries, and its plumbing must respect the train/serve
  * split. */
class RerankerSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.session
  private val dir = "/root/testdata/sf0.01"

  private def goldSets: Map[Long, Set[Long]] = {
    val p152 = SketchParams.q152
    val p = SketchParams.q157
    val pr = SketchParams.q224
    val emb = Tables.load(spark, dir, "embeddings")
    Ann.exactTopKPortable(
        emb.filter(col("vec_id") % p.batchMod =!= 0),
        emb.filter(col("vec_id") % p.batchMod === 0),
        "embedding", "vec_id", "vec_id", pr.gold, p152.scale)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
  }

  test("held-out reranked recall@k >= RRF recall@k against exact gold; " +
      "only held-out queries are served; ranks contiguous") {
    val p = SketchParams.q157
    val gold = goldSets
    val reranked = SparkEntry.queries("q224_trained_reranker")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(3)))
    assert(reranked.nonEmpty, "reranker returned nothing")
    // only odd (query_id / batchMod) queries are served
    assert(reranked.forall { case (q, _, _) => (q / p.batchMod) % 2 != 0 },
      "a training-split query leaked into the served output")
    reranked.groupBy(_._1).foreach { case (q, rows) =>
      val ranks = rows.map(_._3).sorted.toSeq
      assert(ranks == (1L to rows.length).toSeq,
        s"query $q ranks not contiguous: $ranks")
    }
    val fused = SparkEntry.queries("q191_hybrid_retrieval")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .filter { case (q, _) => (q / p.batchMod) % 2 != 0 }
    def recall(pairs: Seq[(Long, Long)]): Double = {
      val byQ = pairs.groupBy(_._1)
      val per = byQ.collect { case (q, rows) if gold.contains(q) =>
        rows.count(r => gold(q).contains(r._2)).toDouble /
          gold(q).size.toDouble
      }
      assert(per.nonEmpty, "no held-out query had gold")
      per.sum / per.size
    }
    val rrfRecall = recall(fused.toSeq)
    val rerankRecall = recall(reranked.map(r => (r._1, r._2)).toSeq)
    assert(rerankRecall >= rrfRecall,
      f"reranked recall $rerankRecall%.4f < RRF recall $rrfRecall%.4f " +
        "on held-out queries")
  }

  test("the r19 raw-score features do not lose held-out recall vs the " +
      "rank-only model") {
    val gold = goldSets
    def recallOf(extended: Boolean): Double = {
      val pairs = SparkEntry.q224Reranked(spark, dir, extended)
        .collect().map(r => (r.getLong(0), r.getLong(1)))
      val byQ = pairs.groupBy(_._1)
      val per = byQ.collect { case (q, rows) if gold.contains(q) =>
        rows.count(r => gold(q).contains(r._2)).toDouble /
          gold(q).size.toDouble
      }
      assert(per.nonEmpty, "no held-out query had gold")
      per.sum / per.size
    }
    val rankOnly = recallOf(extended = false)
    val ext = recallOf(extended = true)
    assert(ext >= rankOnly,
      f"extended-feature recall $ext%.4f < rank-only $rankOnly%.4f")
  }
}
