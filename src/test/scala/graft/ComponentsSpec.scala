package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Components, Dedup}

class ComponentsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.session

  test("components converge to the minimum id, incl. chains") {
    import spark.implicits._
    // components: {1,2,3,4 (chain)}, {10,11}, {20 isolated via corpus}
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L))
      .toDF("id_a", "id_b")
    val got = Components.connectedComponents(pairs, "id_a", "id_b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L))
  }

  test("dedup assignments keep unpaired ids as their own representative") {
    import spark.implicits._
    val corpus = Seq(1L, 2L, 3L, 99L).toDF("doc_id")
    val pairs = Seq((1L, 2L), (2L, 3L)).toDF("id_a", "id_b")
    val got = Components.dedupAssignments(corpus, "doc_id", pairs, "id_a", "id_b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 99L -> 99L))
  }

  test("random graph matches a union-find reference") {
    import spark.implicits._
    val rng = new scala.util.Random(42)
    val n = 200
    val edges = Seq.fill(150)((rng.nextInt(n).toLong, rng.nextInt(n).toLong))
      .filter { case (a, b) => a != b }
    // union-find reference
    val parent = Array.tabulate(n)(identity)
    def find(x: Int): Int = { if (parent(x) != x) parent(x) = find(parent(x)); parent(x) }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a.toInt), find(b.toInt))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val want = (0 until n).map { i =>
      // canonical representative = min id in component
      val root = find(i)
      val minId = (0 until n).filter(j => find(j) == root).min
      i.toLong -> minId.toLong
    }.toMap
    val got = Components.connectedComponents(
        edges.toDF("id_a", "id_b"), "id_a", "id_b", maxIter = 20)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // only vertices that appear in edges are labeled by the operator
    got.foreach { case (id, comp) =>
      assert(comp == want(id.toInt), s"vertex $id: got $comp want ${want(id.toInt)}")
    }
    assert(got.nonEmpty)
  }

  test("end-to-end: minhash pairs -> components -> one keeper per cluster") {
    import spark.implicits._
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog today"),
      (2L, "the quick brown fox jumps over the lazy dog today"),  // dup of 1
      (3L, "the quick brown fox jumps over the lazy dog"),        // near-dup
      (4L, "completely different text about spark sql engines"))
      .toDF("doc_id", "text")
    val pairs = Dedup.minhashLsh(docs, "text", "doc_id",
      ngram = 2, numHashes = 16, bands = 8, jaccardThreshold = 0.5)
    val keep = Components.dedupAssignments(docs, "doc_id", pairs, "id_a", "id_b")
    val byKeeper = keep.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(byKeeper(1L) == 1L && byKeeper(2L) == 1L && byKeeper(3L) == 1L)
    assert(byKeeper(4L) == 4L)
  }
}
