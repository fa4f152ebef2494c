package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Ann

/** IVF-PQ (q162): the two claims that make IVFADC the billion-scale
  * index — residual codes resolve finer than raw-vector codes at the
  * same bit budget, and probing bounds the scanned fraction — plus the
  * structural invariants. Clustered corpus as in PqSpec (the operating
  * regime; coarse centroids absorb the cluster offsets so residuals
  * concentrate near zero). */
class IvfPqSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.session
  import spark.implicits._

  private val Scale = 1000
  private val K = 10

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

  private lazy val qv: Map[Long, IndexedSeq[Long]] = clustered
    .select(col("vec_id"), transform(col("embedding"),
      x => floor(x.cast("double") * Scale).cast("long")).as("q"))
    .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toIndexedSeq).toMap

  private def sq(a: Seq[Long], b: Seq[Long]): Long =
    a.lazyZip(b).map((x, y) => (x - y) * (x - y)).sum

  private lazy val gold: Map[Long, Set[Long]] =
    qv.keysIterator.filter(_ < 8).map { i =>
      i -> qv.keysIterator.filter(_ != i)
        .map(j => (j, sq(qv(i), qv(j)))).toSeq
        .sortBy { case (j, dd) => (dd, j.toString) }
        .take(K).map(_._1).toSet
    }.toMap

  private def recallOf(rows: Array[(Long, Long)]): Double = {
    val got = rows.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    gold.map { case (q, g) => g.intersect(got.getOrElse(q, Set())).size }
      .sum.toDouble / gold.values.map(_.size).sum
  }

  test("residual PQ beats raw-vector PQ at the same code budget when " +
      "every list is probed (the IVFADC rationale, measured)") {
    val resid = Ann.ivfPqTopK(clustered, queries, "embedding", "vec_id",
        "vec_id", k = K, nlist = 8, nprobe = 8, m = 2, ks = 4,
        iters = 1, scale = Scale)
      .select("query_id", "neighbor_id")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val raw = Ann.pqTopK(clustered, queries, "embedding", "vec_id",
        "vec_id", k = K, m = 2, ks = 4, iters = 1, scale = Scale)
      .select("query_id", "neighbor_id")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val (rResid, rRaw) = (recallOf(resid), recallOf(raw))
    assert(rResid > rRaw,
      s"residual recall $rResid not above raw-PQ recall $rRaw")
    assert(rResid >= 0.5, s"residual recall $rResid")
  }

  test("exact refine (q225): refined recall@k >= ADC recall@k at the " +
      "same candidate depth, exact d is the true distance, ranks " +
      "follow d") {
    val r = 30
    val adc = Ann.ivfPqTopK(clustered, queries, "embedding", "vec_id",
        "vec_id", k = K, nlist = 8, nprobe = 3, m = 2, ks = 4,
        iters = 1, scale = Scale)
      .select("query_id", "neighbor_id")
      .collect().map(x => (x.getLong(0), x.getLong(1)))
    val refined = Ann.ivfPqRefineTopK(clustered, queries, "embedding",
        "vec_id", "vec_id", k = K, r = r, nlist = 8, nprobe = 3, m = 2,
        ks = 4, iters = 1, scale = Scale)
      .collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getLong(2), x.getLong(3)))
    assert(refined.nonEmpty)
    // d is the EXACT integer distance, not the ADC estimate
    refined.foreach { case (q, n, _, d) =>
      assert(d == sq(qv(q), qv(n)), s"($q,$n): d $d != exact")
    }
    // ranks follow (d, id-as-string) per query
    refined.groupBy(_._1).foreach { case (q, rows) =>
      val byRank = rows.sortBy(_._3).map(r2 => (r2._4, r2._2.toString))
      assert(byRank.sameElements(byRank.sortBy(identity)),
        s"query $q rank order diverges from (d, id)")
    }
    val rAdc = recallOf(adc)
    val rRef = recallOf(refined.map(x => (x._1, x._2)))
    assert(rRef >= rAdc,
      s"refined recall $rRef below ADC recall $rAdc at equal depth")
  }

  test("probing prunes: every returned neighbor lives in one of the " +
      "query's nprobe nearest lists, and shrinking nprobe never expands " +
      "the candidate scope") {
    val nlist = 8; val nprobe = 2
    val cents = clustered
      .select(col("vec_id"), transform(col("embedding"),
        x => floor(x.cast("double") * Scale).cast("long")).as("q"))
      .withColumn("__key", graft.functions.PortableHash.md5Long60(
        concat(col("vec_id").cast("string"), lit(":ivf"))))
      .orderBy(col("__key"), col("vec_id")).limit(nlist)
      .select("q").collect().map(_.getSeq[Long](0).toIndexedSeq)
    def listOf(v: Seq[Long]): Int =
      cents.zipWithIndex.map { case (c, i) => (sq(v, c), i) }.min._2
    def probesOf(v: Seq[Long]): Set[Int] =
      cents.zipWithIndex.map { case (c, i) => (sq(v, c), i) }
        .sorted.take(nprobe).map(_._2).toSet
    val out = Ann.ivfPqTopK(clustered, queries, "embedding", "vec_id",
        "vec_id", k = K, nlist = nlist, nprobe = nprobe, m = 2, ks = 4,
        iters = 1, scale = Scale)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.nonEmpty)
    out.foreach { case (q, n, _) =>
      assert(probesOf(qv(q)).contains(listOf(qv(n))),
        s"neighbor $n of query $q outside the probed lists")
    }
    // ranks well-formed per query (probing may leave < k candidates)
    out.groupBy(_._1).foreach { case (q, rows) =>
      assert(rows.map(_._3).sorted.toSeq == (1L to rows.length).toSeq,
        s"query $q ranks: ${rows.map(_._3).sorted.toSeq}")
    }
  }
}
