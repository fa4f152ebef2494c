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

  test("large-star/small-star: long chain converges in O(log) rounds to min roots") {
    import spark.implicits._
    // a 64-node chain has diameter 63: label propagation needs 63 rounds,
    // the star algorithm a handful — 10 iterations must suffice here
    val chain = (0L until 63L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val got = Components.connectedComponentsStar(chain, "id_a", "id_b",
        maxIter = 10)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.size == 64)
    assert(got.values.forall(_ == 0L))
  }

  test("large-star/small-star matches the union-find reference on a random graph") {
    import spark.implicits._
    val rng = new scala.util.Random(7)
    val n = 300
    val edges = Seq.fill(260)((rng.nextInt(n).toLong, rng.nextInt(n).toLong))
      .filter { case (a, b) => a != b }
    val parent = Array.tabulate(n)(identity)
    def find(x: Int): Int = { if (parent(x) != x) parent(x) = find(parent(x)); parent(x) }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a.toInt), find(b.toInt))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val minOf = (0 until n).groupBy(find).map { case (_, ids) => ids.min }
      .toSet // component minima
    val want = (0 until n).map { i =>
      val root = find(i)
      i.toLong -> (0 until n).filter(j => find(j) == root).min.toLong
    }.toMap
    val got = Components.connectedComponentsStar(
        edges.toDF("id_a", "id_b"), "id_a", "id_b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    got.foreach { case (id, comp) =>
      assert(comp == want(id.toInt), s"vertex $id: got $comp want ${want(id.toInt)}")
    }
    assert(got.nonEmpty && got.values.toSet.subsetOf(minOf.map(_.toLong)))
    // and agrees with label propagation on the same graph
    val lp = Components.connectedComponents(
        edges.toDF("id_a", "id_b"), "id_a", "id_b", maxIter = 30)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == lp)
  }

  /** Run `f` with the driver-union-find cap forced to `cap` (0 ⇒ the
    * distributed loop always runs; unset ⇒ the default 2¹⁷). */
  private def withComponentsCap[T](cap: Option[Long])(f: => T): T = {
    val key = "spark.graft.components.small"
    val old = spark.conf.getOption(key)
    cap match {
      case Some(v) => spark.conf.set(key, v.toString)
      case None => spark.conf.unset(key)
    }
    try f finally {
      old match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }
  }

  test("exhausting the iteration budget throws instead of returning wrong labels") {
    import spark.implicits._
    // the budget is a property of the DISTRIBUTED loop — force it (the
    // count-adaptive driver path always converges)
    withComponentsCap(Some(0L)) {
      // diameter-5 chain: min label needs 5 propagation rounds to reach the
      // tail — maxIter = 2 must fail fast, not hand back a split clustering
      val chain = (0L until 5L).map(i => (i, i + 1)).toDF("id_a", "id_b")
      val ex = intercept[IllegalStateException] {
        Components.connectedComponents(chain, "id_a", "id_b", maxIter = 2)
      }
      assert(ex.getMessage.contains("did not converge"))
      val ex2 = intercept[IllegalStateException] {
        Components.connectedComponentsStar(chain, "id_a", "id_b", maxIter = 1)
      }
      assert(ex2.getMessage.contains("did not converge"))
    }
  }

  test("count-adaptive driver paths == the distributed loops: CC, star " +
      "CC, and MSF agree across the threshold on long and string ids, " +
      "tie-heavy weights, and the empty graph") {
    import spark.implicits._
    val rng = new scala.util.Random(23)
    val longEdges = Seq.tabulate(300)(_ =>
      (rng.nextInt(80).toLong, rng.nextInt(80).toLong)).toDF("a", "b")
    val strEdges = Seq.tabulate(200)(_ =>
      (s"n${rng.nextInt(50)}", s"n${rng.nextInt(50)}")).toDF("a", "b")
    val wEdges = Seq.tabulate(350)(_ =>
      (rng.nextInt(70).toLong, rng.nextInt(70).toLong,
        1L + rng.nextInt(3))).toDF("a", "b", "w")
    val empty = Seq.empty[(Long, Long)].toDF("a", "b")
    def ccMap(df: org.apache.spark.sql.DataFrame) =
      Components.connectedComponents(df, "a", "b", maxIter = 30)
        .collect().map(r => r.get(0) -> r.get(1)).toMap
    def starMap(df: org.apache.spark.sql.DataFrame) =
      Components.connectedComponentsStar(df, "a", "b")
        .collect().map(r => r.get(0) -> r.get(1)).toMap
    def msfSet(df: org.apache.spark.sql.DataFrame) =
      Components.minimumSpanningForest(df, "a", "b", "w")
        .collect().map(r => (r.get(0), r.get(1), r.get(2))).toSet
    for (df <- Seq(longEdges, strEdges, empty)) {
      assert(withComponentsCap(None)(ccMap(df)) ==
        withComponentsCap(Some(0L))(ccMap(df)), "connectedComponents")
      assert(withComponentsCap(None)(starMap(df)) ==
        withComponentsCap(Some(0L))(starMap(df)), "connectedComponentsStar")
    }
    assert(withComponentsCap(None)(msfSet(wEdges)) ==
      withComponentsCap(Some(0L))(msfSet(wEdges)), "minimumSpanningForest")
    // a sub-threshold graph plans NO exchange on the small path (the
    // whole point): the result frame is one driver-built partition
    withComponentsCap(None) {
      val planned = Components.connectedComponentsStar(longEdges, "a", "b")
      assert(planned.rdd.getNumPartitions == 1)
    }
  }

  test("large-star/small-star: empty pair list yields empty labels") {
    import spark.implicits._
    val empty = Seq.empty[(Long, Long)].toDF("id_a", "id_b")
    assert(Components.connectedComponentsStar(empty, "id_a", "id_b").count() == 0)
  }

  test("triangles: K4 plus a tail — 3 per clique corner, tail excluded") {
    import spark.implicits._
    // K4 on {1,2,3,4} has 4 triangles, every corner in 3 of them; the
    // pendant edge 4-5 and the disconnected path 10-11-12 close nothing.
    // Reversed duplicates and a self-loop must normalize away.
    val edges = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L),
        (3L, 4L), (4L, 3L), (2L, 2L), (4L, 5L), (10L, 11L), (11L, 12L))
      .toDF("a", "b")
    val got = Components.triangleCounts(edges, "a", "b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
  }

  test("triangles: star graph (heavy hitter) has none") {
    import spark.implicits._
    val star = (1L to 50L).map(i => (0L, i)).toDF("a", "b")
    assert(Components.triangleCounts(star, "a", "b").count() == 0)
  }

  test("triangles: random graph matches the adjacency-intersection reference") {
    import spark.implicits._
    val rng = new scala.util.Random(9)
    val n = 40
    val edges = Seq.fill(220)((rng.nextInt(n).toLong, rng.nextInt(n).toLong))
      .filter { case (a, b) => a != b }
    val adj = Array.fill(n)(collection.mutable.Set.empty[Int])
    edges.foreach { case (a, b) =>
      adj(a.toInt) += b.toInt; adj(b.toInt) += a.toInt
    }
    val want = collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
    for (u <- 0 until n; v <- adj(u) if v > u; w <- adj(u) if w > v
         if adj(v).contains(w)) {
      want(u.toLong) += 1; want(v.toLong) += 1; want(w.toLong) += 1
    }
    val got = Components.triangleCounts(edges.toDF("a", "b"), "a", "b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == want.toMap)
    assert(got.nonEmpty)
  }

  test("clustering coefficients: K4 corners are 1.0, bridges dilute, " +
      "triangle-free and degree-1 nodes are 0.0") {
    import spark.implicits._
    // K4 {1,2,3,4} + pendant 4-5 + path 10-11-12
    val edges = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L),
        (3L, 4L), (4L, 5L), (10L, 11L), (11L, 12L)).toDF("a", "b")
    val got = Components.clusteringCoefficients(edges, "a", "b")
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toMap
    assert(got(1L) == ((3L, 3L, 1.0)))          // pure clique corner
    assert(got(4L) == ((4L, 3L, 0.5)))          // 2·3 / (4·3): bridge node
    assert(got(5L) == ((1L, 0L, 0.0)))          // degree-1
    assert(got(11L) == ((2L, 0L, 0.0)))         // triangle-free middle
    assert(got.keySet ==
      Set(1L, 2L, 3L, 4L, 5L, 10L, 11L, 12L))  // every edge endpoint rates
  }

  test("coOccurrenceEdges: pairs within groups, duplicates collapsed, " +
      "megagroups dropped by the cap") {
    import spark.implicits._
    val inc = Seq(
      (1L, 10L), (1L, 20L), (1L, 30L),      // group 1 → 3 pairs
      (2L, 10L), (2L, 20L), (2L, 10L),      // dup incidence collapses
      (3L, 40L), (3L, 41L), (3L, 42L), (3L, 43L)) // megagroup at cap 3
      .toDF("g", "item")
    val got = Components.coOccurrenceEdges(inc, "g", "item",
        maxGroupSize = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // (10,20) from both groups 1 and 2 appears once; group 3 is dropped
    assert(got == Set((10L, 20L), (10L, 30L), (20L, 30L)))
    val uncapped = Components.coOccurrenceEdges(inc, "g", "item",
        maxGroupSize = Int.MaxValue)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(uncapped.size == 3 + 6) // + C(4,2) pairs of group 3
  }

  test("kCore: cycle survives k=2, attached tail cascades away round by " +
      "round; too-high k empties") {
    import spark.implicits._
    // 5-cycle {0..4} + tail 4-10-11-12: every tail node eventually drops
    // (12 first, then 11, then 10 — a genuine cascade, not one filter)
    val edges = ((0L to 4L).map(i => (i, (i + 1) % 5)) ++
      Seq((4L, 10L), (10L, 11L), (11L, 12L))).toDF("a", "b")
    val got = Components.kCore(edges, "a", "b", k = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == (0L to 4L).map(_ -> 2L).toMap)
    assert(Components.kCore(edges, "a", "b", k = 3).count() == 0)
  }

  test("kCore: random graph matches an iterative-peel reference") {
    import spark.implicits._
    val rng = new scala.util.Random(5)
    val n = 60
    val raw = Seq.fill(400)((rng.nextInt(n).toLong, rng.nextInt(n).toLong))
      .filter { case (a, b) => a != b }
    val k = 8
    // reference peel over the normalized edge set
    var es = raw.map { case (a, b) => (math.min(a, b), math.max(a, b)) }
      .distinct
    var stable = false
    while (!stable) {
      val deg = es.flatMap { case (a, b) => Seq(a, b) }
        .groupBy(identity).map { case (v, o) => v -> o.size }
      val next = es.filter { case (a, b) => deg(a) >= k && deg(b) >= k }
      stable = next.size == es.size
      es = next
    }
    val want = es.flatMap { case (a, b) => Seq(a, b) }
      .groupBy(identity).map { case (v, o) => v -> o.size.toLong }
    val got = Components.kCore(raw.toDF("a", "b"), "a", "b", k)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == want)
    assert(got.nonEmpty)
  }

  test("kCore: exhausting the round budget throws, empty input is empty") {
    import spark.implicits._
    // 6-chain at k=2 peels one end pair per round — 2 rounds can't finish
    val chain = (0L until 6L).map(i => (i, i + 1)).toDF("a", "b")
    val ex = intercept[IllegalStateException] {
      Components.kCore(chain, "a", "b", k = 2, maxIter = 2)
    }
    assert(ex.getMessage.contains("did not converge"))
    val empty = Seq.empty[(Long, Long)].toDF("a", "b")
    assert(Components.kCore(empty, "a", "b", k = 1).count() == 0)
  }

  test("bfsHopDistance: exact levels on a directed path + diamond") {
    import spark.implicits._
    // 1→2→3→4→5 plus a shortcut 1→4: node 4 settles at hop 1 (via the
    // shortcut), NOT 3 — minimum-hop semantics. 6→1 is upstream of the
    // seed and must stay unreachable. maxHops=3 cuts node 5 off at 4's
    // settled hop + 1... 5 IS within 2 of 4, so it lands at hop 2.
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (1L, 4L),
      (6L, 1L)).toDF("src", "dst")
    val seeds = Seq(Tuple1(1L)).toDF("node")
    val got = Components.bfsHopDistance(edges, "src", "dst", seeds,
        "node", maxHops = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 0L, 2L -> 1L, 4L -> 1L, 3L -> 2L, 5L -> 2L))
  }

  test("bfsHopDistance: maxHops cap, multi-seed min, early exit") {
    import spark.implicits._
    val chain = (0L until 10L).map(i => (i, i + 1)).toDF("src", "dst")
    val seeds = Seq(0L, 8L).map(Tuple1(_)).toDF("node")
    // seed 8 reaches 9 and 10; seed 0 walks the head; cap at 2
    val got = Components.bfsHopDistance(chain, "src", "dst", seeds,
        "node", maxHops = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(0L -> 0L, 1L -> 1L, 2L -> 2L, 8L -> 0L,
      9L -> 1L, 10L -> 2L))
    // maxHops=0 → seeds only; empty seed set → empty output
    assert(Components.bfsHopDistance(chain, "src", "dst", seeds,
      "node", maxHops = 0).collect().map(_.getLong(0)).toSet == Set(0L, 8L))
    assert(Components.bfsHopDistance(chain, "src", "dst",
      Seq.empty[Tuple1[Long]].toDF("node"), "node", maxHops = 3)
      .count() == 0)
  }

  test("labelPropagation: two triangles + bridge resolve to two " +
      "communities (hand-traced sync rounds)") {
    import spark.implicits._
    // triangles {1,2,3} and {4,5,6}, bridge 3–4: one connected
    // component, but neighbor-majority keeps the triangles apart.
    // Hand trace (sync, min-label ties): after 4 rounds {1,2,3}→1,
    // {4,5,6}→3
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L),
      (4L, 5L), (5L, 6L), (4L, 6L), (3L, 4L)).toDF("s", "d")
    val got = Components.labelPropagation(edges, "s", "d", iters = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L,
      4L -> 3L, 5L -> 3L, 6L -> 3L), got)
    // sanity: connected components would merge everything into ONE
    val comps = Components.connectedComponents(edges, "s", "d")
      .collect().map(_.getLong(1)).distinct
    assert(comps.length == 1)
  }

  test("labelPropagation: string node ids work; zero iterations returns " +
      "self-labels") {
    import spark.implicits._
    val edges = Seq(("x", "y"), ("y", "z")).toDF("s", "d")
    val it0 = Components.labelPropagation(edges, "s", "d", iters = 0)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(it0 == Map("x" -> "x", "y" -> "y", "z" -> "z"))
    // one round on the path: x adopts y, y adopts min(x,z)=x, z adopts y
    val it1 = Components.labelPropagation(edges, "s", "d", iters = 1)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(it1 == Map("x" -> "y", "y" -> "x", "z" -> "y"))
  }

  test("weightedLabelPropagation: a heavy edge outvotes a count " +
      "majority; w=1 equals the unweighted form") {
    import spark.implicits._
    // z's neighbors: x (w=5) vs y1,y2 (w=1 each, and y1-y2 linked).
    // Unweighted: z sees three labels once each -> tie -> min label 1.
    // Weighted: x's 5 outvotes -> z adopts 9.
    val edges = Seq((5L, 9L, 5L), (5L, 1L, 1L), (5L, 2L, 1L),
      (1L, 2L, 1L)).toDF("s", "d", "w")
    val w1 = Components.weightedLabelPropagation(edges, "s", "d", "w",
        iters = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(w1(5L) == 9L, w1)
    val u1 = Components.labelPropagation(edges.drop("w"), "s", "d",
        iters = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(u1(5L) == 1L, u1)
    // uniform weights reduce to the unweighted operator exactly
    val uni = Components.weightedLabelPropagation(
        edges.withColumn("w", org.apache.spark.sql.functions.lit(1L)),
        "s", "d", "w", iters = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val plain = Components.labelPropagation(edges.drop("w"), "s", "d",
        iters = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(uni == plain)
    // repeated rows fold into the weight: three (5,9) rows at w=2
    // behave as one w=6 edge
    val rep = Seq((5L, 9L, 2L), (5L, 9L, 2L), (5L, 9L, 2L),
      (5L, 1L, 1L), (5L, 2L, 1L), (1L, 2L, 1L)).toDF("s", "d", "w")
    val wr = Components.weightedLabelPropagation(rep, "s", "d", "w",
        iters = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(wr(5L) == 9L, wr)
  }

  test("modularity: hand-computed Q on two triangles + bridge; the " +
      "all-one-community labeling scores exactly zero") {
    import spark.implicits._
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L),
      (4L, 5L), (5L, 6L), (4L, 6L), (3L, 4L)).toDF("s", "d")
    // perfect labeling {1,2,3} vs {4,5,6}: m=7, each community has
    // L_c=3 intra edges, D_c=7 ⇒ Q = 2·(4·7·3 − 49)/(4·49) = 70/196
    val perfect = Seq((1L, 1L), (2L, 1L), (3L, 1L),
      (4L, 2L), (5L, 2L), (6L, 2L)).toDF("n", "l")
    val got = Components.modularity(edges, "s", "d", perfect, "n", "l")
      .collect()(0)
    assert(got.getLong(0) == 2L && got.getLong(1) == 7L)
    assert(got.getDouble(2) == 70.0 / 196.0)
    // one community holding everything: L=m, D=2m ⇒ Q = 0 exactly
    val one = (1L to 6L).map(i => (i, 9L)).toDF("n", "l")
    val z = Components.modularity(edges, "s", "d", one, "n", "l")
      .collect()(0)
    assert(z.getLong(0) == 1L && z.getDouble(2) == 0.0)
    // LPA's own labeling on this graph recovers the perfect split, so
    // its modularity matches the hand value
    val lpa = Components.labelPropagation(edges, "s", "d", iters = 4)
    val qLpa = Components.modularity(edges, "s", "d", lpa, "node", "label")
      .collect()(0)
    assert(qLpa.getDouble(2) == 70.0 / 196.0)
    // empty graph: defined zero row
    val none = Seq.empty[(Long, Long)].toDF("s", "d")
    val e = Components.modularity(none, "s", "d", perfect, "n", "l")
      .collect()(0)
    assert(e.getLong(0) == 0L && e.getLong(1) == 0L &&
      e.getDouble(2) == 0.0)
  }

  test("randIndex: hand pair counts; label names irrelevant; identical " +
      "labelings score 1.0") {
    import spark.implicits._
    val a = Seq((1L, "x"), (2L, "x"), (3L, "y")).toDF("n", "l")
    val b = Seq((1L, "p"), (2L, "q"), (3L, "q")).toDF("n", "l")
    // pairs: (1,2) A-same/B-diff, (2,3) A-diff/B-same -> disagree;
    // (1,3) separated by both -> agree. RI = 1/3
    val r = Components.randIndex(a, "n", "l", b, "n", "l").collect()(0)
    assert(r.getLong(0) == 3L && r.getLong(1) == 0L &&
      r.getLong(2) == 1L && r.getLong(3) == 3L)
    assert(r.getDouble(4) == 1.0 / 3.0)
    // identical labelings, and a label-renamed copy, both score 1.0
    val ident = Components.randIndex(a, "n", "l", a, "n", "l")
      .collect()(0).getDouble(4)
    assert(ident == 1.0)
    val renamed = a.withColumn("l",
      org.apache.spark.sql.functions.concat(
        org.apache.spark.sql.functions.lit("z_"), col("l")))
    val ren = Components.randIndex(a, "n", "l", renamed, "n", "l")
      .collect()(0).getDouble(4)
    assert(ren == 1.0)
    // disjoint node sets -> empty support -> defined 1.0 on zero pairs
    val c = Seq((9L, "w")).toDF("n", "l")
    val z = Components.randIndex(a, "n", "l", c, "n", "l").collect()(0)
    assert(z.getLong(3) == 0L && z.getDouble(4) == 1.0)
  }

  test("labelPropagationConverged: fixed point exits early, bit-identical " +
      "to every larger fixed budget") {
    import spark.implicits._
    // two triangles + bridge settle to a fixed point quickly
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L),
      (4L, 5L), (5L, 6L), (4L, 6L), (3L, 4L)).toDF("s", "d")
    val (labels, n) =
      Components.labelPropagationConverged(edges, "s", "d", maxIters = 50)
    assert(n < 50, s"expected early exit, ran $n rounds")
    val got = labels.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // a fixed point matches EVERY larger budget, both parities
    for (extra <- 0 to 2) {
      val fb = Components.labelPropagation(edges, "s", "d", iters = n + extra)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == fb, s"budget ${n + extra}")
    }
  }

  test("labelPropagationConverged: period-2 oscillation (bipartite) exits " +
      "early, bit-identical to fixed budgets of the SAME parity") {
    import spark.implicits._
    // complete bipartite K3,3 (evens vs odds): sync LPA oscillates
    // side-vs-side forever — the q135-diagnosed mode
    val evens = Seq(0L, 2L, 4L); val odds = Seq(1L, 3L, 5L)
    val edges = (for (a <- evens; b <- odds) yield (a, b)).toDF("s", "d")
    val (labels, n) =
      Components.labelPropagationConverged(edges, "s", "d", maxIters = 50)
    assert(n < 50, s"expected early exit, ran $n rounds")
    val got = labels.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val same = Components.labelPropagation(edges, "s", "d", iters = n)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val same2 = Components.labelPropagation(edges, "s", "d", iters = n + 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val other = Components.labelPropagation(edges, "s", "d", iters = n + 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == same && got == same2, "same-parity budgets must agree")
    assert(got != other, "a true period-2 orbit differs at opposite parity")
  }

  test("labelPropagationConverged: maxIters=0 returns self-labels; " +
      "weighted converged matches weighted fixed budget at parity") {
    import spark.implicits._
    val edges = Seq((1L, 2L), (2L, 3L)).toDF("s", "d")
    val (l0, n0) =
      Components.labelPropagationConverged(edges, "s", "d", maxIters = 0)
    assert(n0 == 0)
    assert(l0.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap ==
      Map(1L -> 1L, 2L -> 2L, 3L -> 3L))
    val w = Seq((5L, 9L, 5L), (5L, 1L, 1L), (5L, 2L, 1L), (1L, 2L, 1L))
      .toDF("s", "d", "w")
    val (wl, wn) = Components.weightedLabelPropagationConverged(
      w, "s", "d", "w", maxIters = 50)
    assert(wn < 50)
    val wf = Components.weightedLabelPropagation(w, "s", "d", "w",
        iters = wn)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(wl.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap == wf)
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

  // ------------------------------------------------ minimum spanning forest

  /** Kruskal with the operator's exact total order (w, lo, hi) — the
    * unique MSF of the perturbed weights, so Borůvka must match it
    * edge-for-edge, not just in total weight. */
  private def kruskal(edges: Seq[(Long, Long, Long)]): Set[(Long, Long, Long)] = {
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    val norm = edges.filter(e => e._1 != e._2)
      .map(e => (math.min(e._1, e._2), math.max(e._1, e._2), e._3))
      .groupBy(e => (e._1, e._2))
      .map { case ((a, b), es) => (a, b, es.map(_._3).min) }.toSeq
    val out = scala.collection.mutable.Set[(Long, Long, Long)]()
    norm.sortBy(e => (e._3, e._1, e._2)).foreach { case (a, b, w) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) { parent(ra) = rb; out += ((a, b, w)) }
    }
    out.toSet
  }

  test("minimumSpanningForest: hand graph picks the classic MST") {
    import spark.implicits._
    val edges = Seq((1L, 2L, 1L), (2L, 3L, 2L), (3L, 4L, 1L),
      (1L, 4L, 3L), (1L, 3L, 5L)).toDF("a", "b", "w")
    val got = Components.minimumSpanningForest(edges, "a", "b", "w")
      .as[(Long, Long, Long)].collect().toSet
    assert(got == Set((1L, 2L, 1L), (3L, 4L, 1L), (2L, 3L, 2L)))
  }

  test("minimumSpanningForest == Kruskal on a random multigraph with " +
      "heavy weight ties, parallel edges, and self loops") {
    import spark.implicits._
    val rng = new scala.util.Random(11)
    // two islands (nodes 0-39 and 100-139) -> a FOREST, not a tree;
    // weights drawn from only 3 values so ties dominate
    val raw = Seq.tabulate(400) { _ =>
      val island = if (rng.nextBoolean()) 0L else 100L
      (island + rng.nextInt(40), island + rng.nextInt(40),
        1L + rng.nextInt(3))
    }
    val want = kruskal(raw)
    val got = Components.minimumSpanningForest(
        raw.toDF("a", "b", "w"), "a", "b", "w")
      .as[(Long, Long, Long)].collect()
    assert(got.length == got.toSet.size, "duplicate forest edges")
    assert(got.toSet == want)
    // forest invariant: acyclic, so |E| < |touched nodes|
    val touched = raw.filter(e => e._1 != e._2)
      .flatMap(e => Seq(e._1, e._2)).toSet
    assert(got.length <= touched.size - 1)
  }

  test("minimumSpanningForest: dendrogram cut at threshold t equals the " +
      "t-threshold connected components (single-linkage contract)") {
    import spark.implicits._
    val rng = new scala.util.Random(5)
    val raw = Seq.tabulate(300)(_ =>
      (rng.nextInt(60).toLong, rng.nextInt(60).toLong,
        1L + rng.nextInt(10)))
    val df = raw.toDF("a", "b", "w")
    val forest = Components.minimumSpanningForest(df, "a", "b", "w")
      .localCheckpoint(true)
    for (t <- Seq(3L, 6L)) {
      // star CC: a threshold-cut MST is mostly long paths, past the
      // fixed-budget label-prop form's diameter bound
      val viaForest = Components.connectedComponentsStar(
          forest.filter(col("weight") <= t), "id_a", "id_b")
        .as[(Long, Long)].collect().toMap
      val direct = Components.connectedComponentsStar(
          df.filter(col("a") =!= col("b") && col("w") <= t), "a", "b")
        .as[(Long, Long)].collect().toMap
      // same node partition: identical co-membership on the common support
      assert(viaForest.keySet == direct.keySet, s"t=$t support")
      val pairsF = viaForest.groupBy(_._2).values
        .map(_.keys.toSeq.sorted).toSet
      val pairsD = direct.groupBy(_._2).values
        .map(_.keys.toSeq.sorted).toSet
      assert(pairsF == pairsD, s"t=$t clustering differs")
    }
  }

  test("minimumSpanningForest: empty and self-loop-only inputs give an " +
      "empty forest") {
    import spark.implicits._
    val selfOnly = Seq((1L, 1L, 5L), (2L, 2L, 1L)).toDF("a", "b", "w")
    assert(Components.minimumSpanningForest(selfOnly, "a", "b", "w")
      .count() == 0L)
  }

  test("q179 degree assortativity: star = -1 exactly, disjoint regular " +
      "cliques = +1 exactly, a regular graph degenerates to NaN") {
    import spark.implicits._
    def r(edges: Seq[(Long, Long)]): Double =
      Components.degreeAssortativity(edges.toDF("a", "b"), "a", "b")
        .head().getDouble(4)
    // star K1,5: every edge joins degree 5 to degree 1 -> perfectly
    // disassortative
    assert(math.abs(r((1L to 5L).map(i => (0L, i))) - (-1.0)) < 1e-12)
    // K3 (degrees 2) disjoint-union K4 (degrees 3): every edge joins
    // equal degrees of two distinct levels -> perfectly assortative
    val k3 = Seq((1L, 2L), (1L, 3L), (2L, 3L))
    val k4 = for (i <- 10L to 13L; j <- (i + 1) to 13L) yield (i, j)
    assert(math.abs(r(k3 ++ k4) - 1.0) < 1e-12)
    // cycle C4: all degrees equal -> zero variance -> NULL (try_divide)
    assert(Components.degreeAssortativity(
        Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L)).toDF("a", "b"),
        "a", "b")
      .head().isNullAt(4))
  }

  test("softDedupWeights: every doc keeps floor(quant/cluster_size), " +
      "so each cluster contributes ~one doc-mass; singletons full") {
    import spark.implicits._
    val corpus = (1L to 6L).toDF("doc_id")
    val pairs = Seq((1L, 2L), (2L, 3L), (4L, 5L)).toDF("id_a", "id_b")
    val out = Components.softDedupWeights(
        corpus, "doc_id", pairs, "id_a", "id_b", quant = 1000000L)
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    assert(out.keySet == (1L to 6L).toSet, "one row per corpus doc")
    Seq(1L, 2L, 3L).foreach(id =>
      assert(out(id) == ((1L, 3L, 333333L)), s"doc $id: ${out(id)}"))
    Seq(4L, 5L).foreach(id =>
      assert(out(id) == ((4L, 2L, 500000L)), s"doc $id: ${out(id)}"))
    assert(out(6L) == ((6L, 1L, 1000000L)))
    // cluster mass: sum of weights per cluster is quant - (rounding)
    val mass = out.values.groupBy(_._1)
      .map { case (c, v) => c -> v.map(_._3).sum }
    assert(mass(1L) == 999999L && mass(4L) == 1000000L &&
      mass(6L) == 1000000L)
  }
}
