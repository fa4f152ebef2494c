package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Ann

/** Product quantization (q158) graded against exact integer kNN on the
  * sf0.01 embeddings — recall at a working configuration, bit-exact
  * ADC-distance recomputation (pins the LUT flattening and the code
  * assignment, not just the ranking), and output invariants. The same
  * near-uniform caveat as NnDescentSpec applies: structure-free vectors
  * are PQ's worst case (reproduction error is isotropic, neighbors are
  * barely separated), so the floors here are conservative and clustered
  * production embeddings only do better. */
class PqSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.session
  private val dir = "/root/testdata/sf0.01"
  private val Scale = 1000
  private val K = 10

  private lazy val emb = Tables.load(spark, dir, "embeddings")
    .filter(col("vec_id") < 150)
  private lazy val queries = emb.filter(col("vec_id") < 8)

  // quantized vectors, driver-side (the operator's exact integer domain)
  private lazy val qv: Map[Long, IndexedSeq[Long]] = emb.select(col("vec_id"),
      transform(col("embedding"),
        x => floor(x.cast("double") * Scale).cast("long")).as("q"))
    .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toIndexedSeq).toMap

  private def sq(a: Seq[Long], b: Seq[Long]): Long =
    a.lazyZip(b).map((x, y) => (x - y) * (x - y)).sum

  // exact top-k for the 8 query ids under (d, id-as-string) order
  private def goldTop(k: Int): Map[Long, Seq[Long]] =
    qv.keysIterator.filter(_ < 8).map { i =>
      i -> qv.keysIterator.filter(_ != i)
        .map(j => (j, sq(qv(i), qv(j)))).toSeq
        .sortBy { case (j, d) => (d, j.toString) }
        .take(k).map(_._1)
    }.toMap

  private def pqTop(m: Int, ks: Int): Map[Long, Seq[Long]] =
    Ann.pqTopK(emb, queries, "embedding", "vec_id", "vec_id",
        k = K, m = m, ks = ks, iters = 2, scale = Scale)
      .select(col("query_id"), col("neighbor_id"), col("rank"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1).view
      .mapValues(_.sortBy(_._3).map(_._2).toSeq).toMap

  private def recall(got: Map[Long, Seq[Long]], gold: Map[Long, Seq[Long]]): Double = {
    val hits = gold.map { case (q, g) =>
      g.toSet.intersect(got.getOrElse(q, Nil).toSet).size }.sum
    hits.toDouble / gold.values.map(_.size).sum
  }

  test("recall@10 vs exact integer kNN: on a clustered corpus (PQ's " +
      "operating regime) the working configuration (m=8, ks=16) recovers " +
      "nearly all true neighbors; on the structure-free embeddings the " +
      "finer codebook still beats the oracle-sized one") {
    // deterministic clustered corpus: 16 md5-derived centers in 64 dims,
    // each vector = its center + small md5 noise — neighbor separation
    // >> reproduction error, the regime real embedding corpora live in
    def h(s: String): Double = {
      val dig = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8"))
      (dig(0) & 0xff) / 255.0
    }
    val clustered = spark.createDataFrame(
      (0 until 150).map { i =>
        (i.toLong, (0 until 64).map(dd =>
          (h(s"c${i % 16}:$dd") - 0.5) * 2.0 +
            (h(s"n$i:$dd") - 0.5) * 0.12).toArray)
      }).toDF("vec_id", "embedding")
    val cq = clustered.select(col("vec_id"),
        transform(col("embedding"),
          x => floor(x.cast("double") * Scale).cast("long")).as("q"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toIndexedSeq).toMap
    val cGold = cq.keysIterator.filter(_ < 8).map { i =>
      i -> cq.keysIterator.filter(_ != i)
        .map(j => (j, sq(cq(i), cq(j)))).toSeq
        .sortBy { case (j, d) => (d, j.toString) }
        .take(K).map(_._1)
    }.toMap
    val cGot = Ann.pqTopK(clustered, clustered.filter(col("vec_id") < 8),
        "embedding", "vec_id", "vec_id", k = K, m = 8, ks = 16,
        iters = 2, scale = Scale)
      .select(col("query_id"), col("neighbor_id"), col("rank"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1).view
      .mapValues(_.sortBy(_._3).map(_._2).toSeq).toMap
    val clusteredRecall = recall(cGot, cGold)
    assert(clusteredRecall >= 0.8, s"clustered recall $clusteredRecall")
    // the near-uniform sf0.01 embeddings are the WORST case (isotropic
    // reproduction error ~ neighbor separation): measured fine ~0.31,
    // coarse ~0.19 — assert the ordering and a loose floor, and let the
    // clustered corpus above carry the quality grade
    val gold = goldTop(K)
    val fine = recall(pqTop(8, 16), gold)
    val coarse = recall(pqTop(2, 4), gold)
    assert(fine > coarse, s"finer PQ not better: $fine vs $coarse")
    assert(fine >= 0.2, s"m=8/ks=16 uniform-data recall $fine")
  }

  test("approx_d is the exact sum of sub-centroid distances: driver-side " +
      "re-encode + LUT recomputation matches the operator bit-for-bit") {
    val m = 2; val ks = 4; val d = 64 / m
    val books = Ann.pqCodebooksPortable(emb, "embedding", "vec_id",
      m, ks, iters = 2, scale = Scale)
    assert(books.length == m && books.forall(_.length == ks) &&
      books.forall(_.forall(_.length == d)), "codebook shape m × ks × d")
    def subs(v: IndexedSeq[Long]): IndexedSeq[IndexedSeq[Long]] =
      (0 until m).map(j => v.slice(j * d, (j + 1) * d))
    def encode(v: IndexedSeq[Long]): IndexedSeq[Int] =
      subs(v).zipWithIndex.map { case (s, j) =>
        books(j).zipWithIndex.map { case (c, i) => (sq(s, c), i) }.min._2 }
    val got = Ann.pqTopK(emb, queries, "embedding", "vec_id", "vec_id",
        k = K, m = m, ks = ks, iters = 2, scale = Scale)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(3)))
    assert(got.nonEmpty)
    got.foreach { case (q, n, approxD) =>
      val expect = subs(qv(q)).lazyZip(encode(qv(n))).zipWithIndex
        .map { case ((qs, c), j) => sq(qs, books(j)(c)) }.sum
      assert(approxD == expect,
        s"($q,$n): operator approx_d $approxD != recomputed $expect")
    }
  }

  test("output invariants: exactly k rows per query, ranks 1..k, order " +
      "replays the BottomK (approx_d, id-as-string) total order, no self") {
    val rows = Ann.pqTopK(emb, queries, "embedding", "vec_id", "vec_id",
        k = K, m = 2, ks = 4, iters = 2, scale = Scale)
      .collect().map(r => (r.getLong(0), r.getLong(1),
        r.getLong(2), r.getLong(3)))
    val byQ = rows.groupBy(_._1)
    assert(byQ.size == 8, s"${byQ.size} queries")
    byQ.foreach { case (q, nbrs) =>
      assert(nbrs.length == K, s"query $q has ${nbrs.length} rows")
      assert(!nbrs.exists(_._2 == q), s"query $q returned itself")
      val ordered = nbrs.sortBy(_._3)
      assert(ordered.map(_._3).toSeq == (1L to K).toSeq)
      val keys = ordered.map(t => (t._4, t._2.toString)).toSeq
      assert(keys == keys.sorted, s"query $q rank order: $keys")
    }
  }
}
