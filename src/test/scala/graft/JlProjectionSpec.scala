package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Ann

/** Signed random projection (q163): the JL distance-preservation
  * property measured on real pairs, and the end-to-end payoff — kNN in
  * the 4×-cheaper projected space still recovers most true neighbors
  * on clustered data. */
class JlProjectionSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.session
  import spark.implicits._

  private val Scale = 1000
  private val Dim = 64
  private val OutDims = 16

  private def h(s: String): Double = {
    val dig = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    (dig(0) & 0xff) / 255.0
  }

  private lazy val clustered = (0 until 150).map { i =>
    (i.toLong, (0 until Dim).map(dd =>
      (h(s"c${i % 8}:$dd") - 0.5) * 2.0 +
        (h(s"n$i:$dd") - 0.5) * 0.12).toArray)
  }.toDF("vec_id", "embedding")

  private def quantized(df: org.apache.spark.sql.DataFrame) =
    df.select(col("vec_id"), transform(col("embedding"),
        x => floor(x.cast("double") * Scale).cast("long")).as("q"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toIndexedSeq).toMap

  private def sq(a: Seq[Long], b: Seq[Long]): Long =
    a.lazyZip(b).map((x, y) => (x - y) * (x - y)).sum

  test("distance preservation: the pd/od ratio concentrates around " +
      "outDims (E||Px||^2 = outDims * ||x||^2) with bounded tails") {
    val qv = quantized(clustered)
    val pv = clustered.select(col("vec_id"),
        Ann.signedProjection(col("embedding"), Dim, OutDims, Scale).as("p"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toIndexedSeq).toMap
    // sample pairs (i, i + 7): mixes within- and across-cluster distances
    val ratios = (0L until 140L).map { i =>
      val (a, b) = (i, i + 7)
      sq(pv(a), pv(b)).toDouble / (sq(qv(a), qv(b)).toDouble * OutDims)
    }.sorted
    val median = ratios(ratios.size / 2)
    assert(median > 0.5 && median < 1.5, s"median normalized ratio $median")
    // JL tails: no pair collapses to nothing or blows up absurdly
    assert(ratios.head > 0.05, s"worst contraction ${ratios.head}")
    assert(ratios.last < 5.0, s"worst expansion ${ratios.last}")
  }

  test("kNN in the projected space recovers most true neighbors at a " +
      "quarter of the per-distance cost") {
    val K = 10
    val qv = quantized(clustered)
    val gold = (0L until 8L).map { i =>
      i -> qv.keysIterator.filter(_ != i)
        .map(j => (j, sq(qv(i), qv(j)))).toSeq
        .sortBy { case (j, d) => (d, j.toString) }
        .take(K).map(_._1).toSet
    }.toMap
    val got = Ann.projectedTopK(clustered,
        clustered.filter(col("vec_id") < 8), "embedding", "vec_id",
        "vec_id", k = K, outDims = OutDims, scale = Scale)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val byQ = got.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val recall = gold.map { case (q, g) =>
      g.intersect(byQ.getOrElse(q, Set())).size }.sum.toDouble /
      gold.values.map(_.size).sum
    assert(recall >= 0.7, s"projected-space recall $recall")
    // shape: full heaps, ranks 1..k
    got.groupBy(_._1).foreach { case (q, rows) =>
      assert(rows.map(_._3).sorted.toSeq == (1L to K).toSeq, s"query $q ranks")
    }
  }
}
