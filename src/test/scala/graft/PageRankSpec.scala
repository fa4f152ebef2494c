package graft

import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.PageRank

/** Fixed-point PageRank: exact agreement with an in-test integer
  * reference, partition-layout independence, and the obvious ordinal
  * property (the hub of a star outranks its leaves). */
class PageRankSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.session
  import spark.implicits._

  /** Single-threaded integer reference: same floor-division fixed-point
    * recurrence the operator documents. */
  private def ref(edges: Seq[(String, String)], iters: Int,
      scale: Long, dampPct: Int): Map[String, Long] = {
    val e = edges.distinct
    val deg = e.groupBy(_._1).map { case (k, v) => k -> v.size.toLong }
    val nodes = (e.map(_._1) ++ e.map(_._2)).distinct
    val teleport = scale * (100 - dampPct) / 100
    var r = nodes.map(_ -> scale).toMap
    (1 to iters).foreach { _ =>
      val mass = scala.collection.mutable.Map.empty[String, Long]
        .withDefaultValue(0L)
      e.foreach { case (s, d) => mass(d) += r(s) / deg(s) }
      r = nodes.map(n => n -> (teleport + dampPct * mass(n) / 100)).toMap
    }
    r
  }

  /** Path a-b-c-d plus spur b-e, symmetrized. */
  private val undirected = {
    val one = Seq("a" -> "b", "b" -> "c", "c" -> "d", "b" -> "e")
    one ++ one.map(_.swap)
  }

  test("matches the integer reference exactly (3 iterations)") {
    val got = PageRank.pageRankFixedPoint(
        undirected.toDF("src", "dst"), "src", "dst", iters = 3)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == ref(undirected, 3, 1000000L, 85), got.toSeq.sorted)
  }

  test("hub outranks leaves; every rank at least teleport mass") {
    val got = PageRank.pageRankFixedPoint(
        undirected.toDF("src", "dst"), "src", "dst", iters = 4)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(Seq("a", "c", "d", "e").forall(n => got("b") > got(n)), got)
    assert(got.values.forall(_ >= 150000L), got)
  }

  test("result is independent of input partition layout") {
    def run(parts: Int): Map[String, Long] =
      PageRank.pageRankFixedPoint(
          undirected.toDF("src", "dst").repartition(parts),
          "src", "dst", iters = 3)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(run(1) == run(7))
  }

  test("duplicate edges are deduplicated; zero iterations returns scale") {
    val dup = (undirected ++ undirected).toDF("src", "dst")
    val got3 = PageRank.pageRankFixedPoint(dup, "src", "dst", iters = 3)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got3 == ref(undirected, 3, 1000000L, 85))
    val got0 = PageRank.pageRankFixedPoint(dup, "src", "dst", iters = 0)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got0.values.toSet == Set(1000000L))
  }

  test("weighted: mass splits by weight; w=1 equals the unweighted form") {
    import spark.implicits._
    // a -> b (w=3), a -> c (w=1): b receives 3/4 of a's damped mass
    val edges = Seq(("a", "b", 3L), ("a", "c", 1L)).toDF("s", "d", "w")
    val got = PageRank.weightedPageRankFixedPoint(edges, "s", "d",
        Some("w"), iters = 1)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got("a") == 150000L)
    assert(got("b") == 150000L + 85L * (1000000L * 3L / 4L) / 100L)
    assert(got("c") == 150000L + 85L * (1000000L * 1L / 4L) / 100L)
    // uniform weights reduce to the unweighted operator exactly
    val uni = undirected.map { case (s, d) => (s, d, 1L) }.toDF("s", "d", "w")
    val w1 = PageRank.weightedPageRankFixedPoint(uni, "s", "d",
        Some("w"), iters = 3)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(w1 == ref(undirected, 3, 1000000L, 85))
    // repeated rows fold into the edge weight: duplicating every edge
    // doubles w and Σw together, leaving the split unchanged
    val doubled = (undirected ++ undirected)
      .map { case (s, d) => (s, d, 1L) }.toDF("s", "d", "w")
    val w2 = PageRank.weightedPageRankFixedPoint(doubled, "s", "d",
        Some("w"), iters = 3)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(w2 == w1)
  }

  test("non-positive edge weights fail loudly, not silently diverge") {
    // the positive-weight contract (scaladoc) is enforced: Spark DIV
    // truncates toward zero on negatives while floor-division engines
    // round down, so misuse must error rather than produce
    // engine-divergent ranks
    for (bad <- Seq(-1L, 0L)) {
      val edges = Seq(("a", "b", 2L), ("a", "c", bad)).toDF("s", "d", "w")
      val e = intercept[Exception] {
        PageRank.weightedPageRankFixedPoint(edges, "s", "d",
          Some("w"), iters = 1).collect()
      }
      def msgs(t: Throwable): Seq[String] =
        Option(t).toSeq.flatMap(x => x.getMessage +: msgs(x.getCause))
      assert(msgs(e).exists(m =>
        m != null && m.contains("non-positive aggregated edge weight")), e)
    }
    // weights summing to a positive total through negatives still fail:
    // the guard runs on the aggregated edge, catching (+3, -3) = 0
    val cancel = Seq(("a", "b", 3L), ("a", "b", -3L)).toDF("s", "d", "w")
    intercept[Exception] {
      PageRank.weightedPageRankFixedPoint(cancel, "s", "d",
        Some("w"), iters = 1).collect()
    }
  }

  test("dangling nodes keep teleport-only rank (directed chain)") {
    // directed a->b->c: c is a sink (dangling); a receives nothing
    val directed = Seq("a" -> "b", "b" -> "c")
    val got = PageRank.pageRankFixedPoint(
        directed.toDF("src", "dst"), "src", "dst", iters = 2)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == ref(directed, 2, 1000000L, 85), got.toSeq.sorted)
    assert(got("a") == 150000L, got) // never any inbound mass
  }

  test("personalized: teleport reaches seeds only; mass flows outward; " +
      "nodes with no path from a seed stay at zero") {
    import spark.implicits._
    // directed 1→2 and 3→1, seed {1}, one iteration at scale 10⁶:
    //   pr(1) = teleport (150000) + 0.85·mass(3→1: rank 0)  = 150000
    //   pr(2) = 0 (non-seed)      + 0.85·(rank(1)=10⁶ DIV 1) = 850000
    //   pr(3) = 0 — no in-edges, not a seed
    val got = PageRank.personalizedPageRankFixedPoint(
        Seq(1L -> 2L, 3L -> 1L).toDF("src", "dst"), "src", "dst",
        Seq(Tuple1(1L)).toDF("node"), "node", iters = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 150000L, 2L -> 850000L, 3L -> 0L), got)
  }

  test("personalized: seeds absent from the graph are ignored; empty " +
      "seed set drains every rank to zero") {
    import spark.implicits._
    val edges = Seq(1L -> 2L).toDF("src", "dst")
    val gotGhost = PageRank.personalizedPageRankFixedPoint(
        edges, "src", "dst",
        Seq(Tuple1(99L)).toDF("node"), "node", iters = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(gotGhost == Map(1L -> 0L, 2L -> 0L), gotGhost)
    val gotEmpty = PageRank.personalizedPageRankFixedPoint(
        edges, "src", "dst",
        Seq.empty[Tuple1[Long]].toDF("node"), "node", iters = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(gotEmpty == Map(1L -> 0L, 2L -> 0L), gotEmpty)
  }

  test("HITS: hand-computed max-normalized fixpoint on a bipartite graph") {
    import spark.implicits._
    // 1→10, 2→10, 2→11, 3→11 at scale 100:
    //   a1 raw: 10 ← h1+h2 = 200, 11 ← h2+h3 = 200; max 200 → both 100
    //   h1 raw: 1 ← 100, 2 ← 200, 3 ← 100; max 200 → (50, 100, 50)
    //   iteration 2 reproduces the same values — a true fixpoint
    val edges = Seq((1L, 10L), (2L, 10L), (2L, 11L), (3L, 11L))
      .toDF("s", "d")
    def run(iters: Int) = operators.PageRank
      .hitsFixedPoint(edges, "s", "d", iters, scale = 100L)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    val want = Map(
      1L -> (50L, 0L), 2L -> (100L, 0L), 3L -> (50L, 0L),
      10L -> (0L, 100L), 11L -> (0L, 100L))
    assert(run(2) == want)
    assert(run(3) == want) // stable under further iterations
  }

  test("HITS: duplicate edges collapse; zero iterations seeds hubs at " +
      "scale; empty edges yield empty output") {
    import spark.implicits._
    val dup = Seq((1L, 10L), (1L, 10L), (2L, 10L)).toDF("s", "d")
    val got = operators.PageRank
      .hitsFixedPoint(dup, "s", "d", iters = 1, scale = 100L)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    // both hubs feed the single authority equally: symmetric scores
    assert(got(1L) == got(2L) && got(1L)._1 == 100L)
    assert(got(10L) == ((0L, 100L)))
    val seeded = operators.PageRank
      .hitsFixedPoint(dup, "s", "d", iters = 0, scale = 100L)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    assert(seeded(1L) == ((100L, 0L)) && seeded(10L) == ((0L, 0L)))
    val empty = Seq.empty[(Long, Long)].toDF("s", "d")
    assert(operators.PageRank
      .hitsFixedPoint(empty, "s", "d", iters = 3).count() == 0)
  }

  test("converged: exits on the terminal orbit (fixed point or period-2 " +
      "ulp cycle), bit-identical to fixed-iters at the same parity") {
    import spark.implicits._
    // symmetric triangle + pendant: the exact integer recurrence lands
    // in a period-2 ulp cycle after ~28 rounds (verified by an offline
    // integer replay) — the shape a fixed-point-only check would miss
    val e0 = Seq((1L, 2L), (2L, 3L), (3L, 1L), (3L, 4L)).toDF("s", "d")
    val edges = e0.union(e0.select(col("d").as("s"), col("s").as("d")))
    val (ranks, itersRun) = operators.PageRank
      .pageRankConverged(edges, "s", "d", maxIters = 100)
    assert(itersRun < 100, "terminal orbit never reached within budget")
    val got = ranks.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // bit-identity with the fixed-iters form at the exit point AND at
    // larger budgets of the same parity — the repeating-orbit guarantee
    for (n <- Seq(itersRun, itersRun + 2, itersRun + 4)) {
      val fixed = operators.PageRank
        .pageRankFixedPoint(edges, "s", "d", iters = n)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(fixed == got, s"diverged from fixed-iters at iters=$n")
    }
    // maxIters = 0 runs nothing and reports 0
    val (r0, i0) = operators.PageRank
      .pageRankConverged(edges, "s", "d", maxIters = 0)
    assert(i0 == 0 && r0.collect().forall(_.getLong(1) == 1000000L))
    // a true fixed point (isolated-ish star, teleport-dominated) exits
    // on the unchanged check and is stable at EVERY larger budget
    val star = Seq((10L, 11L), (11L, 10L)).toDF("s", "d")
    val (rs, is) = operators.PageRank
      .pageRankConverged(star, "s", "d", maxIters = 100)
    assert(is < 100)
    val sGot = rs.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    for (n <- Seq(is, is + 1, is + 3)) {
      val f = operators.PageRank.pageRankFixedPoint(star, "s", "d", n)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(f == sGot, s"star diverged at iters=$n")
    }
  }

  test("personalized converged: same guarantee, seed-gated teleport") {
    import spark.implicits._
    val e0 = Seq((1L, 2L), (2L, 3L), (3L, 1L), (3L, 4L)).toDF("s", "d")
    val edges = e0.union(e0.select(col("d").as("s"), col("s").as("d")))
    val seeds = Seq(1L).toDF("n")
    val (ranks, itersRun) = operators.PageRank
      .personalizedPageRankConverged(edges, "s", "d", seeds, "n",
        maxIters = 100)
    assert(itersRun < 100)
    val got = ranks.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    for (n <- Seq(itersRun, itersRun + 2)) {
      val fixed = operators.PageRank
        .personalizedPageRankFixedPoint(edges, "s", "d", seeds, "n",
          iters = n)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(fixed == got, s"diverged at iters=$n")
    }
    // seed holds the most rank; everything reachable is positive
    assert(got(1L) == got.values.max && got.values.forall(_ >= 0L))
  }
}
