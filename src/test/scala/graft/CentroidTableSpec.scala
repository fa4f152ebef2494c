package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Ann, Dedup}

/** Literal-chain vs broadcast-table centroid assignment: the two paths
  * must be BIT-IDENTICAL on both domains, because the auto-switch at
  * [[Ann.centroidTableThreshold]] (plan-size/codegen guard for
  * production nlist ≈ 10⁴) must never change results.
  *
  *   - column-level: nearest index and the full sorted (d, i) array
  *     agree exactly at small and large nlist, integer and double;
  *   - operator-level: `semanticDedup` and `ivfTopKPortable` forced
  *     through the table path reproduce the literal-path output
  *     row-for-row;
  *   - the large-nlist shape (> threshold) actually runs — the codegen
  *     wall the table path exists to dodge.
  */
class CentroidTableSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.session
  private val dir = "/root/testdata/sf0.001"

  private def emb = spark.read.parquet(s"$dir/embeddings.parquet")

  /** Deterministic fake centroid matrix (integer domain). */
  private def centsL(nlist: Int, dim: Int): Seq[Seq[Long]] =
    (0 until nlist).map(i =>
      (0 until dim).map(d => ((i * 31 + d * 17) % 101 - 50).toLong))

  private def centsD(nlist: Int, dim: Int): Seq[Seq[Double]] =
    centsL(nlist, dim).map(_.map(_.toDouble / 7.0))

  private def dim: Int = Ann.dimOf(emb, "embedding")

  private def forceTable[A](body: => A): A = {
    val saved = Ann.centroidTableThreshold
    Ann.centroidTableThreshold = 0
    try body finally Ann.centroidTableThreshold = saved
  }

  private def collectCol(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.orderBy("vec_id").select(col("out").cast("string"))
      .collect().map(_.getString(0)).toSeq

  test("integer domain: table path == literal path (nearest + sorted), small and large nlist") {
    val q = emb.select(col("vec_id"), Ann.quantizeVec(col("embedding"), 1000).as("qv"))
    for (nlist <- Seq(8, 300)) {
      val cs = centsL(nlist, dim)
      val lit = collectCol(
        Ann.withNearestCentroidL(q, cs, col("qv"), "out"))
      val tab = collectCol(forceTable(
        Ann.withNearestCentroidL(q, cs, col("qv"), "out")))
      assert(lit === tab, s"nearest L diverged at nlist=$nlist")
      val litS = collectCol(
        Ann.withSortedCentroidDistsL(q, cs, col("qv"), "out"))
      val tabS = collectCol(forceTable(
        Ann.withSortedCentroidDistsL(q, cs, col("qv"), "out")))
      assert(litS === tabS, s"sorted L diverged at nlist=$nlist")
    }
  }

  test("double domain: table path == literal path (nearest + sorted), small and large nlist") {
    val q = emb.select(col("vec_id"),
      transform(col("embedding"), _.cast("double")).as("v"))
    for (nlist <- Seq(8, 300)) {
      val cs = centsD(nlist, dim)
      val lit = collectCol(
        Ann.withNearestCentroidD(q, cs, col("v"), "out"))
      val tab = collectCol(forceTable(
        Ann.withNearestCentroidD(q, cs, col("v"), "out")))
      assert(lit === tab, s"nearest D diverged at nlist=$nlist")
      val litS = collectCol(
        Ann.withSortedCentroidDistsD(q, cs, col("v"), "out"))
      val tabS = collectCol(forceTable(
        Ann.withSortedCentroidDistsD(q, cs, col("v"), "out")))
      assert(litS === tabS, s"sorted D diverged at nlist=$nlist")
    }
  }

  test("semanticDedup through the table path reproduces the literal path") {
    def run() = Dedup.semanticDedup(emb, "embedding", "vec_id",
        cosineThreshold = 0.3, nlist = 8)
      .orderBy("dup_id").collect().map(_.toString).toSeq
    val lit = run()
    val tab = forceTable(run())
    assert(lit === tab)
    assert(lit.nonEmpty, "fixture should produce at least one semantic dup")
  }

  test("ivfTopKPortable through the table path reproduces the literal path") {
    val queries = emb.filter(col("vec_id") < 8)
    def run() = Ann.ivfTopKPortable(emb, queries,
        "embedding", "vec_id", "vec_id", k = 5, nlist = 8, nprobe = 3)
      .orderBy("query_id", "rank").collect().map(_.toString).toSeq
    val lit = run()
    val tab = forceTable(run())
    assert(lit === tab)
  }

  test("large-nlist assignment (> threshold) runs via the table path") {
    // 1024 centroids: far past the literal chain's codegen comfort zone;
    // the auto-switch must route this through the broadcast table and
    // produce a sane partition (every cluster id within range).
    val cs = centsL(1024, dim)
    assert(cs.size > Ann.centroidTableThreshold)
    val q = emb.select(col("vec_id"), Ann.quantizeVec(col("embedding"), 1000).as("qv"))
    val clusters = Ann.withNearestCentroidL(q, cs, col("qv"), "out")
      .agg(min(col("out")), max(col("out")), count(lit(1))).head()
    assert(clusters.getInt(0) >= 0)
    assert(clusters.getInt(1) < 1024)
    assert(clusters.getLong(2) === emb.count())
  }
}
