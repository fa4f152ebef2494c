package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Ann

/** Contrastive triplet mining (q192): structural invariants — a
  * negative is never the anchor or one of its graph neighbors, each
  * anchor with full heaps yields perTriplet triplets, distances are
  * exact, and mining is deterministic (the reproducible-dataset
  * contract). */
class TripletMiningSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.session
  private val dir = "/root/testdata/sf0.01"
  private val K = 4

  private lazy val corpus = Tables.load(spark, dir, "embeddings")
    .filter(col("vec_id") < 150)
  private lazy val graph =
    Ann.nnDescentPortable(corpus, "embedding", "vec_id", K, 3, 1000)
      .cache()

  private def mine() = Ann.tripletMining(graph, corpus, "embedding",
      "vec_id", K, perTriplet = 2)
    .collect()
    .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
      r.getLong(4), r.getLong(5)))

  test("invariants: negatives avoid anchor and its neighbors; " +
      "perTriplet triplets per anchor; positives carry graph distances") {
    val out = mine()
    val edges = graph.collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(3)).toMap
    assert(out.nonEmpty)
    out.foreach { case (a, pos, neg, rank, posD, negD) =>
      assert(neg != a, s"anchor $a mined itself as a negative")
      assert(!edges.contains((a, neg)),
        s"anchor $a mined its own neighbor $neg as a negative")
      assert(edges((a, pos)) == posD,
        s"pos_d for ($a, $pos) diverged from the graph")
      assert(rank == 1L || rank == 2L)
      assert(negD >= 0L)
    }
    val perAnchor = out.groupBy(_._1).map(_._2.length)
    assert(perAnchor.forall(_ == 2),
      "an anchor with a full heap yielded fewer than perTriplet triplets")
    assert(out.map(_._1).toSet.size == 150,
      "every corpus node should anchor triplets")
  }

  test("mining is deterministic (reproducible training datasets)") {
    assert(mine().toSet == mine().toSet)
  }

  test("semi-hard filter has material yield: on structure-free data " +
      "most ring negatives are farther than the graph positive") {
    val out = mine()
    val semiHard = out.count { case (_, _, _, _, posD, negD) =>
      negD > posD }
    // positives are nearest-neighbor heap members; uniform ring
    // negatives should rarely beat them
    assert(semiHard.toDouble / out.length >= 0.8,
      s"only $semiHard/${out.length} triplets semi-hard — positives " +
        "are not actually near")
  }
}
