package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Ann

/** NN-Descent kNN-graph construction vs exact brute-force kNN on the
  * sf0.01 embeddings — graded, not just shape-checked. These embeddings
  * are near-uniform in 64 dims (their true 4-NN agree with the planted
  * label only 16% of the time), which is NN-Descent's WORST case: no
  * cluster structure for neighbor-of-neighbor transitivity to exploit.
  * The spec grades at working degree k=10 (Dong et al. report K in the
  * tens; tiny K starves the candidate pool) and still demands most of
  * the exact graph back — on production embedding corpora, which are
  * clustered by construction, convergence is strictly easier. */
class NnDescentSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.session
  private val dir = "/root/testdata/sf0.01"
  private val K = 10
  private val Scale = 1000

  private lazy val emb = Tables.load(spark, dir, "embeddings")
    .filter(col("vec_id") < 150)

  // exact gold kNN under the operator's exact order: integer squared L2
  // over floor-quantized vectors, ties by (d, neighbor-id-as-string)
  private lazy val qv: Map[Long, Seq[Long]] = emb.select(col("vec_id"),
      transform(col("embedding"),
        x => floor(x.cast("double") * Scale).cast("long")).as("q"))
    .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap

  private def goldTop(k: Int): Set[(Long, Long)] =
    qv.keySet.flatMap { i =>
      qv.keysIterator.filter(_ != i).map { j =>
        val d = qv(i).lazyZip(qv(j)).map((a, b) => (a - b) * (a - b)).sum
        (j, d)
      }.toSeq.sortBy { case (j, d) => (d, j.toString) }
        .take(k).map { case (j, _) => (i, j) }
    }

  private def graphAt(rounds: Int, k: Int = K): Set[(Long, Long)] =
    Ann.nnDescentPortable(emb, "embedding", "vec_id", k, rounds, Scale)
      .select(col("id"), col("neighbor_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("descent converges toward the exact kNN graph on structure-free " +
      "data: ring init is near-random, five rounds recover most of it") {
    val gold = goldTop(K)
    def recall(g: Set[(Long, Long)]) =
      g.intersect(gold).size.toDouble / gold.size
    val r0 = recall(graphAt(0))
    val r2 = recall(graphAt(2))
    val r5 = recall(graphAt(5))
    assert(r0 < 0.3, s"ring init already at recall $r0 — gold too easy")
    // measured trajectory on this corpus: 0.06 -> 0.39 -> 0.86; the
    // floors leave slack without letting a broken round slip through
    assert(r2 >= 0.3, s"recall after 2 rounds = $r2 (init $r0)")
    assert(r5 >= 0.8, s"recall after 5 rounds = $r5 (round 2: $r2)")
    assert(r5 > r2 && r2 > r0, s"recall not improving: $r0, $r2, $r5")
    // and the graph keeps collecting the TRUE top-4: ~90% of the exact
    // 4-NN edges sit inside the found degree-10 graph
    val gold4 = goldTop(4)
    val cov = graphAt(5).intersect(gold4).size.toDouble / gold4.size
    assert(cov >= 0.85, s"true-4NN coverage at k=10 = $cov")
  }

  test("graph invariants: exactly k neighbors per node, no self-loops, " +
      "ranks 1..k ascending by (d, id-as-string)") {
    val k = 4
    val rows = Ann.nnDescentPortable(emb, "embedding", "vec_id",
        k, 2, Scale)
      .collect().map(r => (r.getLong(0), r.getLong(1),
        r.getLong(2), r.getLong(3)))
    val n = emb.count()
    val byNode = rows.groupBy(_._1)
    assert(byNode.size == n, s"${byNode.size} nodes with neighbors, want $n")
    byNode.foreach { case (id, nbrs) =>
      assert(nbrs.length == k, s"node $id has ${nbrs.length} neighbors")
      assert(!nbrs.exists(_._2 == id), s"node $id lists itself")
      val ordered = nbrs.sortBy(_._3)
      assert(ordered.map(_._3).toSeq == (1L to k).toSeq,
        s"node $id ranks: ${ordered.map(_._3).toSeq}")
      val keys = ordered.map(t => (t._4, t._2.toString)).toSeq
      assert(keys == keys.sorted,
        s"node $id rank order violates (d, id-string): $keys")
    }
  }

  test("q157 incremental probe: batch arrivals recover most of their " +
      "true corpus neighbors without re-running the descent; the " +
      "graph-edge expansion beats seeding alone") {
    import graft.operators.Ann
    val all = Tables.load(spark, dir, "embeddings")
    val old = all.filter(col("vec_id") % 10 =!= 0)
    val batch = all.filter(col("vec_id") % 10 === 0)
    // a converged working-degree-10 base graph (the operating point the
    // ring-init test grades); the probe's expansion quality is bounded
    // by the graph it walks
    val k = 4
    val graph = Ann.nnDescentPortable(old, "embedding", "vec_id",
      10, 5, Scale)
    def probe(rounds: Int): Set[(Long, Long)] =
      Ann.knnGraphProbePortable(graph, old, batch, "embedding",
          "vec_id", k, expandRounds = rounds, Scale)
        .select(col("id"), col("neighbor_id"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // exact batch->corpus kNN ground truth
    val ov = old.select(col("vec_id"),
        transform(col("embedding"),
          x => floor(x.cast("double") * Scale).cast("long")).as("q"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val bv = batch.select(col("vec_id"),
        transform(col("embedding"),
          x => floor(x.cast("double") * Scale).cast("long")).as("q"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val gold = bv.keySet.flatMap { i =>
      ov.keysIterator.map { j =>
        val d = bv(i).lazyZip(ov(j)).map((a, b) => (a - b) * (a - b)).sum
        (j, d)
      }.toSeq.sortBy { case (j, d) => (d, j.toString) }
        .take(k).map { case (j, _) => (i, j) }
    }
    def recall(g: Set[(Long, Long)]) =
      g.intersect(gold).size.toDouble / gold.size
    val seedOnly = recall(probe(0))
    val expanded = recall(probe(2))
    assert(expanded >= seedOnly,
      s"expansion hurt recall: $seedOnly -> $expanded")
    assert(expanded >= 0.5,
      s"probe recall $expanded (seeding alone: $seedOnly)")
    // every batch node that seeded got exactly k ranked neighbors
    val rows = Ann.knnGraphProbePortable(graph, old, batch, "embedding",
        "vec_id", k, 1, Scale)
      .groupBy(col("id")).count().collect()
    assert(rows.forall(_.getLong(1) == k), "ragged probe heaps")
  }

  test("q180 merge: absorbing a 10% batch lands within ε of a full " +
      "re-descent; heaps stay exactly-k over old ∪ batch") {
    val all = Tables.load(spark, dir, "embeddings")
      .filter(col("vec_id") < 300)
    val old = all.filter(col("vec_id") % 10 =!= 0)
    val batch = all.filter(col("vec_id") % 10 === 0)
    val k = 10
    val rounds = 5
    val graph = Ann.nnDescentPortable(old, "embedding", "vec_id",
      k, rounds, Scale)
    val merged = Ann.knnGraphMerge(graph, old, batch, "embedding",
      "vec_id", k, expandRounds = 2, Scale)
    val full = Ann.nnDescentPortable(all, "embedding", "vec_id",
      k, rounds, Scale)
    // exact gold kNN over the FULL corpus (old ∪ batch), operator order
    val av = all.select(col("vec_id"),
        transform(col("embedding"),
          x => floor(x.cast("double") * Scale).cast("long")).as("q"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val gold = av.keySet.flatMap { i =>
      av.keysIterator.filter(_ != i).map { j =>
        val d = av(i).lazyZip(av(j)).map((a, b) => (a - b) * (a - b)).sum
        (j, d)
      }.toSeq.sortBy { case (j, d) => (d, j.toString) }
        .take(k).map { case (j, _) => (i, j) }
    }
    def edges(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] = df
      .select(col("id"), col("neighbor_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    def recall(g: Set[(Long, Long)]) =
      g.intersect(gold).size.toDouble / gold.size
    val rm = recall(edges(merged))
    val rf = recall(edges(full))
    // the merge sees only batch-incident candidates, so it can trail a
    // full re-descent — but only by ε: the batch is where the new
    // information is, and the old graph was already converged
    assert(rm >= rf - 0.05, s"merge recall $rm vs full re-descent $rf")
    // structural contract: every node of old ∪ batch has exactly k
    // ranked neighbors, no self-loops
    val counts = merged.groupBy(col("id")).count().collect()
    assert(counts.length == av.size, s"${counts.length} nodes, want ${av.size}")
    assert(counts.forall(_.getLong(1) == k), "ragged merged heaps")
    assert(merged.filter(col("id") === col("neighbor_id")).count() == 0)
  }

  test("q154 composition: the MSF-cut clusters equal the connected " +
      "components of the directly-thresholded kNN edges (the dendrogram " +
      "identity, end-to-end on the real pipeline)") {
    import graft.operators.Components
    val p = SketchParams.q154
    val viaDendrogram = SparkEntry
      .queries("q154_semantic_linkage")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    // direct route: threshold the kNN edges FIRST, then components —
    // no forest anywhere
    val knn = SparkEntry.queries("q152_knn_graph")(spark, dir)
    val under = knn.filter(col("d") <= p.cutWeight)
      .select(least(col("id"), col("neighbor_id")).as("a"),
        greatest(col("id"), col("neighbor_id")).as("b"))
      .distinct()
    val comp = Components.connectedComponentsStar(under, "a", "b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val direct = knn.select(col("id")).distinct().collect()
      .map(_.getLong(0)).map(n => n -> comp.getOrElse(n, n)).toMap
    assert(viaDendrogram == direct,
      s"dendrogram-cut and direct-threshold clusterings diverge on " +
        s"${viaDendrogram.toSet.diff(direct.toSet).take(3)}")
    // and the clustering is non-trivial at this cut (real structure)
    val sizes = viaDendrogram.values.groupBy(identity).map(_._2.size)
    assert(sizes.exists(_ >= 3), "no cluster of size >= 3 at the cut")
    assert(sizes.count(_ >= 2) >= 20, "almost no multi-member clusters")
  }

  test("caller-supplied init replaces the ring (the no-global-rank scale " +
      "path): multi-table LSH seeding converges; a single table's " +
      "disjoint bucket cliques trap the descent — init must connect") {
    val gold = goldTop(K)
    def recall(g: Set[(Long, Long)]) =
      g.intersect(gold).size.toDouble / gold.size
    // two independent 4-plane bucketings from one 8-plane signature
    // (low/high nibble); their union overlaps buckets into one
    // component w.h.p. — the production no-global-rank init
    val sig = emb.select(col("vec_id"),
      Ann.portableSignature(col("embedding"), dim = 64, planes = 8)
        .as("__s8"))
    def coBucket(bucket: org.apache.spark.sql.Column => org.apache.spark.sql.Column) = {
      val b = sig.select(col("vec_id"), bucket(col("__s8")).as("__b"))
      b.as("x").join(b.as("y"),
          col("x.__b") === col("y.__b") &&
            col("x.vec_id") =!= col("y.vec_id"))
        .select(col("x.vec_id").as("id"), col("y.vec_id").as("nb"))
    }
    val lo = coBucket(s => s % 16)
    val hi = coBucket(s => floor(s / 16).cast("long"))
    val g2 = Ann.nnDescentPortable(emb, "embedding", "vec_id", K, 5,
        Scale, init = Some(lo.unionByName(hi)))
      .select(col("id"), col("neighbor_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(recall(g2) >= 0.7, s"two-table LSH-seeded recall ${recall(g2)}")
    // the cautionary half: ONE table's init is 16 disjoint cliques, and
    // co-neighbor candidate generation cannot cross a component — the
    // descent stalls at in-bucket recall no matter the rounds (this is
    // what the operator scaladoc's connectivity requirement means)
    val g1 = Ann.nnDescentPortable(emb, "embedding", "vec_id", K, 5,
        Scale, init = Some(lo))
      .select(col("id"), col("neighbor_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(recall(g1) < 0.5,
      s"single-table recall ${recall(g1)} — expected the clique trap")
  }
}
