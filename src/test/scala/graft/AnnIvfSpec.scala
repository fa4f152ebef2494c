package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Ann

/** IVF ANN: coarse-quantizer correctness properties.
  *
  *   - full probe (nprobe = nlist) must recover the exact brute-force
  *     top-k: probing every inverted list scores every corpus vector, and
  *     the ranking/tie-break is identical;
  *   - partial probe is a proper subset path: every (query, neighbor)
  *     it returns must appear in the brute-force scoring universe with
  *     the same cosine;
  *   - recall at a sane operating point stays above a loose floor;
  *   - determinism: two runs produce identical output (hash-sampled
  *     k-means init, no rand()).
  */
class AnnIvfSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.session
  private val dir = "/root/testdata/sf0.001"

  private def emb = spark.read.parquet(s"$dir/embeddings.parquet")
  private def queries = emb.filter(col("vec_id") < 8)

  private def asPairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long, Int)] =
    df.select(col("query_id").cast("long"), col("neighbor_id").cast("long"),
        col("rank").cast("int"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet

  test("nprobe = nlist recovers the exact brute-force result") {
    val exact = asPairs(Ann.bruteForceTopK(emb, queries,
      "embedding", "vec_id", "vec_id", k = 5))
    val full = asPairs(Ann.ivfTopK(emb, queries,
      "embedding", "vec_id", "vec_id", k = 5, nlist = 4, nprobe = 4))
    assert(full === exact)
  }

  test("partial probe keeps recall above the floor and ranks consistently") {
    val exact = asPairs(Ann.bruteForceTopK(emb, queries,
      "embedding", "vec_id", "vec_id", k = 5)).map(p => (p._1, p._2))
    val approx = Ann.ivfTopK(emb, queries,
      "embedding", "vec_id", "vec_id", k = 5, nlist = 8, nprobe = 3)
    val approxPairs = asPairs(approx).map(p => (p._1, p._2))
    val recall = (exact & approxPairs).size.toDouble / exact.size
    assert(recall >= 0.3, s"recall@5 too low: $recall")
    // ranks within each query are dense starting at 1
    val ranks = approx.groupBy("query_id")
      .agg(min("rank").as("mn"), max("rank").as("mx"), count(lit(1)).as("n"))
      .collect()
    ranks.foreach { r =>
      assert(r.getAs[Int]("mn") === 1)
      assert(r.getAs[Int]("mx").toLong === r.getAs[Long]("n"))
    }
  }

  test("ivfTopK is deterministic across runs") {
    def run() = asPairs(Ann.ivfTopK(emb, queries,
      "embedding", "vec_id", "vec_id", k = 5, nlist = 8, nprobe = 2))
    assert(run() === run())
  }

  test("kmeansCentroids returns nlist centroids of corpus dimensionality") {
    val cs = Ann.kmeansCentroids(emb, "embedding", "vec_id", nlist = 4)
    val dim = Ann.dimOf(emb, "embedding")
    assert(cs.size === 4)
    assert(cs.forall(_.size === dim))
    // Lloyd update moved centroids off the raw init vectors (means differ
    // from any single input unless a cluster is a singleton — allow some
    // equality but not all)
    assert(cs.distinct.size === 4)
  }

  test("kmeansCentroidsPortable refines the hash-sampled init, determinically") {
    val nlist = 4
    // iters = 0 is exactly the hash-sampled init
    val init = Ann.kmeansCentroidsPortable(emb, "embedding", "vec_id",
      nlist, iters = 0)
    val learned = Ann.kmeansCentroidsPortable(emb, "embedding", "vec_id",
      nlist, iters = 2)
    val dim = Ann.dimOf(emb, "embedding")
    assert(init.size === nlist && learned.size === nlist)
    assert(learned.forall(_.size === dim))
    // Lloyd moved centroids off the raw init vectors (a floor-divided
    // cluster mean equals a member vector only for singleton clusters)
    assert(init !== learned)
    // pure integer pipeline: bit-identical across runs
    assert(learned === Ann.kmeansCentroidsPortable(emb, "embedding",
      "vec_id", nlist, iters = 2))
    // refinement balances the partition: the max cluster population under
    // the learned quantizer must not exceed the init quantizer's
    def maxPop(cs: Seq[Seq[Long]]): Long =
      emb.select(Ann.quantizeVec(col("embedding"), 1000).as("q"))
        .select(element_at(Ann.centroidSortedDists(cs, col("q")), 1)
          .getField("i").as("c"))
        .groupBy("c").count().agg(max("count")).collect()(0).getLong(0)
    assert(maxPop(learned) <= maxPop(init),
      "Lloyd refinement made the worst cluster more populated")
  }

  test("IvfIndex: index-served ranking == recomputed, through a " +
      "parquet round trip, and trainOrLoad builds once") {
    implicit val s = spark
    val recomputed = asPairs(Ann.ivfTopKPortable(emb, queries,
      "embedding", "vec_id", "vec_id", k = 5, nlist = 4, nprobe = 2))
    val ix = Ann.ivfIndex(emb, "embedding", "vec_id", nlist = 4)
    assert(asPairs(Ann.ivfTopKFromIndex(ix, queries, "embedding",
      "vec_id", k = 5, nprobe = 2)) === recomputed)
    val root = java.nio.file.Files.createTempDirectory("ivfix")
      .resolve("ix").toString
    Ann.saveIvfIndex(ix, root)
    val loaded = Ann.loadIvfIndex(root)
    assert(loaded.nlist == 4 && loaded.scale == 1000)
    assert(loaded.centroids == ix.centroids)
    assert(asPairs(Ann.ivfTopKFromIndex(loaded, queries, "embedding",
      "vec_id", k = 5, nprobe = 2)) === recomputed)
    var builds = 0
    Ann.trainOrLoadIvfIndex(root + "2") { builds += 1; ix }
    val served = Ann.trainOrLoadIvfIndex(root + "2") {
      builds += 1; fail("rebuilt despite persisted index") }
    assert(builds == 1)
    assert(asPairs(Ann.ivfTopKFromIndex(served, queries, "embedding",
      "vec_id", k = 5, nprobe = 2)) === recomputed)
  }

  test("multi-probe LSH recall is a floor above single-probe") {
    val k = 5
    val exact = asPairs(Ann.bruteForceTopK(emb, queries,
      "embedding", "vec_id", "vec_id", k = k)).map(p => (p._1, p._2))
    val single = asPairs(Ann.lshTopKPortable(emb, queries,
      "embedding", "vec_id", "vec_id", k = k)).map(p => (p._1, p._2))
    val multi = asPairs(Ann.lshTopKMultiProbe(emb, queries,
      "embedding", "vec_id", "vec_id", k = k, nprobes = 3)).map(p => (p._1, p._2))
    // candidates are a strict superset (probe 0 is the exact bucket), so
    // at equal k the brute-force recall can only improve
    val rSingle = (exact & single).size.toDouble / exact.size
    val rMulti = (exact & multi).size.toDouble / exact.size
    assert(rMulti >= rSingle,
      s"multi-probe recall $rMulti below single-probe $rSingle")
    // and the probe expansion actually fires: more scored pairs overall
    assert(multi.size >= single.size)
    // full flip budget (nprobes = planes + 1) stays valid
    assert(Ann.lshTopKMultiProbe(emb, queries, "embedding", "vec_id",
      "vec_id", k = k, nprobes = 5).count() >= multi.size)
  }

  test("portableSignature matches a driver-side reference computation") {
    val rows = emb.limit(16)
      .select(col("vec_id"),
        transform(col("embedding"), _.cast("double")).as("v"),
        Ann.portableSignature(col("embedding"), Ann.dimOf(emb, "embedding"),
          planes = 4).as("sig"))
      .collect()
    rows.foreach { r =>
      val v = r.getSeq[Double](1)
      val expected = (0 until 4).map { j =>
        val proj = v.zipWithIndex.map { case (x, i0) =>
          math.floor(x * 1000).toLong * Ann.portableSign(j, i0 + 1)
        }.sum
        if (proj > 0) 1L << j else 0L
      }.sum
      assert(r.getLong(2) === expected, s"vec ${r.getLong(0)}")
    }
  }
}
