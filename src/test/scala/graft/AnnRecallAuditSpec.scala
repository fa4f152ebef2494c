package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Ann

/** ANN recall audit (q168): the audit must ORDER index configurations
  * correctly — a bigger probe/code budget audits higher — and its
  * arithmetic must be exact. The q168 gate itself (at sf0.01, the
  * oracle-sized q162 config) honestly reports near-zero recall on the
  * structure-free embeddings: that an undertuned index FAILS its audit
  * is the point of having one. */
class AnnRecallAuditSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.session
  import spark.implicits._

  private val Scale = 1000

  private def h(s: String): Double = {
    val dig = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    (dig(0) & 0xff) / 255.0
  }

  private lazy val clustered = (0 until 150).map { i =>
    (i.toLong, (0 until 64).map(dd =>
      (h(s"c${i % 8}:$dd") - 0.5) * 2.0 +
        (h(s"n$i:$dd") - 0.5) * 0.12).toArray)
  }.toDF("vec_id", "embedding")
  private lazy val queries = clustered.filter(col("vec_id") < 8)

  private def auditOf(nprobe: Int, m: Int, ks: Int): Map[Long, (Long, Long, Double)] =
    Ann.annRecallAudit(
        Ann.exactTopKPortable(clustered, queries, "embedding", "vec_id",
          "vec_id", k = 10, scale = Scale),
        Ann.ivfPqTopK(clustered, queries, "embedding", "vec_id", "vec_id",
          k = 10, nlist = 8, nprobe = nprobe, m = m, ks = ks,
          iters = 1, scale = Scale))
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap

  test("the audit orders configurations: full probing + finer codes " +
      "audit strictly higher than the starved configuration, and the " +
      "arithmetic is exact") {
    val good = auditOf(nprobe = 8, m = 8, ks = 16)
    val starved = auditOf(nprobe = 1, m = 2, ks = 4)
    def mean(a: Map[Long, (Long, Long, Double)]) =
      a.values.map(_._3).sum / a.size
    assert(good.size == 8 && starved.size == 8)
    good.values.foreach { case (nExact, nHits, recall) =>
      assert(nExact == 10L, s"n_exact $nExact")
      assert(nHits >= 0L && nHits <= 10L)
      assert(math.abs(recall - nHits.toDouble / nExact) < 1e-12)
    }
    assert(mean(good) > mean(starved),
      s"audit failed to order configs: good=${mean(good)} starved=${mean(starved)}")
    assert(mean(good) >= 0.6, s"well-budgeted config audits at ${mean(good)}")
  }

  test("exact ground truth matches a driver-side recomputation") {
    val qv = clustered.select(col("vec_id"), transform(col("embedding"),
        x => floor(x.cast("double") * Scale).cast("long")).as("q"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toIndexedSeq).toMap
    def sq(a: Seq[Long], b: Seq[Long]): Long =
      a.lazyZip(b).map((x, y) => (x - y) * (x - y)).sum
    val expect = (0L until 8L).map { i =>
      i -> qv.keysIterator.filter(_ != i)
        .map(j => (j, sq(qv(i), qv(j)))).toSeq
        .sortBy { case (j, d) => (d, j.toString) }
        .take(10).map(_._1).toSeq
    }.toMap
    val got = Ann.exactTopKPortable(clustered, queries, "embedding",
        "vec_id", "vec_id", k = 10, scale = Scale)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1).view
      .mapValues(_.sortBy(_._3).map(_._2).toSeq).toMap
    assert(got == expect)
  }
}
