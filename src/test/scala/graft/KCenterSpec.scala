package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Selection

/** Greedy k-center selection (q161): the farthest-point guarantee in
  * action — on planted clusters the greedy sweep covers every cluster
  * and beats an arbitrary selection's radius by a wide margin — plus
  * the exact-arithmetic invariants the oracle relies on. */
class KCenterSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.session
  import spark.implicits._

  private val Scale = 1000
  private val NClusters = 16

  private def h(s: String): Double = {
    val dig = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    (dig(0) & 0xff) / 255.0
  }

  // 160 vectors in 16 well-separated clusters, tight md5 noise
  private lazy val clustered = (0 until 160).map { i =>
    (i.toLong, (0 until 32).map(d =>
      (h(s"c${i % NClusters}:$d") - 0.5) * 4.0 +
        (h(s"n$i:$d") - 0.5) * 0.05).toArray)
  }.toDF("vec_id", "embedding")

  test("on planted clusters, k = #clusters greedy selection lands one " +
      "center per cluster and every point is assigned within its own " +
      "cluster") {
    val centers = Selection.kCenterSelect(
      clustered, "embedding", "vec_id", NClusters, Scale)
    assert(centers.map(_._2).distinct.size == NClusters, "duplicate centers")
    assert(centers.map(_._2.toInt % NClusters).distinct.size == NClusters,
      s"clusters missed: ${centers.map(_._2 % NClusters).sorted}")
    val assign = Selection.kCenterAssignment(
        clustered, "embedding", "vec_id", NClusters, Scale)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(3)))
    assert(assign.length == 160)
    assign.foreach { case (id, cid, _) =>
      assert(id % NClusters == cid % NClusters,
        s"vector $id assigned across clusters to center $cid")
    }
    // coverage radius: within-cluster noise only, far below the
    // first-k-by-id baseline which collapses k centers into few clusters
    val greedyRadius = assign.map(_._3).max
    val firstK = clustered.filter(col("vec_id") < NClusters / 4)
    // baseline centers = first 4 ids (4 clusters); radius spans clusters
    val qv = clustered.select(col("vec_id"),
        transform(col("embedding"),
          x => floor(x.cast("double") * Scale).cast("long")).as("q"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    def sq(a: Seq[Long], b: Seq[Long]): Long =
      a.lazyZip(b).map((x, y) => (x - y) * (x - y)).sum
    val baseIds = (0L until (NClusters / 4).toLong)
    val baseRadius = qv.keysIterator
      .map(i => baseIds.map(c => sq(qv(i), qv(c))).min).max
    assert(greedyRadius * 10 < baseRadius,
      s"greedy radius $greedyRadius vs arbitrary-4 radius $baseRadius")
  }

  test("selection invariants: radii non-increasing from rank 2, seed " +
      "radius 0, assignment d consistent with the selected centers") {
    val k = 6
    val centers = Selection.kCenterSelect(
      clustered, "embedding", "vec_id", k, Scale)
    assert(centers.map(_._1) == (1 to k), "ranks 1..k in order")
    assert(centers.head._3 == 0L, "seed radius must be 0")
    val radii = centers.drop(1).map(_._3)
    assert(radii.zip(radii.tail).forall { case (a, b) => b <= a },
      s"radii increased: $radii")
    // every assignment distance equals the true min over the center set
    val qv = clustered.select(col("vec_id"),
        transform(col("embedding"),
          x => floor(x.cast("double") * Scale).cast("long")).as("q"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    def sq(a: Seq[Long], b: Seq[Long]): Long =
      a.lazyZip(b).map((x, y) => (x - y) * (x - y)).sum
    Selection.kCenterAssignment(clustered, "embedding", "vec_id", k, Scale)
      .collect().foreach { r =>
        val (id, d) = (r.getLong(0), r.getLong(3))
        val expect = centers.map(c => sq(qv(id), c._4)).min
        assert(d == expect, s"vector $id: assigned d $d != min $expect")
      }
  }
}
