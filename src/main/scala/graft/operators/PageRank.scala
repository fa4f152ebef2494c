package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Fixed-point PageRank over a DataFrame edge list — the graph-quality
  * signal web-scale curation pipelines attach to crawled documents
  * (domain/host authority à la Common Crawl's harmonic-centrality ranks;
  * the original algorithm: Page et al. 1999, "The PageRank Citation
  * Ranking"). Complements [[Components]]: components answer "which rows
  * are the same thing", PageRank answers "which nodes matter".
  *
  * All arithmetic is exact BIGINT fixed-point (ranks carry `scale`
  * implicit decimals; per-edge contributions and the damping step use
  * integer floor division), so the result is independent of partition
  * count and merge order — integer sums commute where double sums don't.
  * That makes a run bit-reproducible across engines and cluster layouts,
  * which is what lets the DuckDB oracle replicate it (q99) and what you
  * want for auditable curation decisions.
  *
  * Scale shape: textbook Pregel-on-DataFrames. Each iteration is one
  * shuffle join (edges ⋈ ranks on src, both sides hash-partitioned on
  * the join key) plus one partial-aggregated groupBy(dst); out-degrees
  * are joined onto the edge list once, not re-derived per step. Nothing
  * reaches the driver; at 1000 executors the edge list just needs a sane
  * partitioning on src, which the join enforces.
  *
  * Lineage control: for shallow runs (the common 3–10 power iterations)
  * the whole recurrence stays ONE declarative plan — Catalyst sees every
  * step, and the repeated edge/degree subtrees execute once via
  * ReusedExchange, so nothing is pinned in executor storage. Deep runs
  * truncate lineage every `checkpointInterval` iterations
  * (localCheckpoint) so optimizer time and plan depth stay bounded —
  * the [[Components.connectedComponents]] discipline. Superseded
  * interval checkpoints are freed as soon as their successor
  * materializes ([[CheckpointHygiene]]), so live storage stays ≤ 2
  * generations at any depth; interval (not per-step) checkpointing
  * additionally keeps shallow runs one declarative plan.
  *
  * Dangling nodes (out-degree 0) simply leak their rank mass — the
  * standard simplified formulation. Callers who need a strongly
  * connected structure should symmetrize the edge list first (pass each
  * edge both ways), after which every node has out-degree >= 1.
  */
object PageRank {

  /** @param edges directed edge list (deduplicated internally)
    * @param iters number of power iterations (exact, not converged-to)
    * @param scale fixed-point multiplier: initial rank = `scale` = 1.0
    * @param dampPct damping factor in percent (85 = the classic 0.85)
    * @param checkpointInterval truncate lineage after this many
    *   iterations without a checkpoint; `iters` below this stay one plan
    * @return (node, pr) — BIGINT fixed-point rank after `iters` steps */
  def pageRankFixedPoint(
      edges: DataFrame, srcCol: String, dstCol: String,
      iters: Int, scale: Long = 1000000L, dampPct: Int = 85,
      checkpointInterval: Int = 8): DataFrame =
    weightedPageRankFixedPoint(edges, srcCol, dstCol, None,
      iters, scale, dampPct, checkpointInterval)

  /** Weighted variant: each edge carries a POSITIVE BIGINT weight (a
    * shipment count, a link multiplicity, a co-occurrence strength —
    * positivity is part of the contract: on negative operands Spark's
    * `DIV` truncates toward zero while floor-division engines round
    * down, so a negative weight would silently break the cross-engine
    * bit-reproducibility this operator exists to provide) and a node's
    * rank mass splits proportionally —
    * `contrib(u→v) = (rank(u) * w(u→v)) DIV Σ_x w(u→x)` — instead of
    * uniformly. Same exact-integer contract; the unweighted form is this
    * with w ≡ 1 (then `rank * 1 DIV outdeg` is the classic floor
    * division). Duplicate (src, dst) rows are pre-summed into one
    * weighted edge, so multiplicity can be expressed either as a weight
    * column or as repeated rows.
    *
    * Overflow bound: `rank * w` must stay under 2^63 — rank is at most
    * ~scale·N/damping-sink, so keep `scale * maxWeight * N` well under
    * 9.2e18 (at scale=1e6 that allows weights into the tens of
    * thousands on million-node graphs; reduce `scale` for heavier
    * graphs). */
  def weightedPageRankFixedPoint(
      edges: DataFrame, srcCol: String, dstCol: String,
      weightCol: Option[String],
      iters: Int, scale: Long = 1000000L, dampPct: Int = 85,
      checkpointInterval: Int = 8): DataFrame =
    weightedCore(edges, srcCol, dstCol, weightCol, iters, scale, dampPct,
      checkpointInterval, convergeDelta = false)._1

  /** Converged variant: iterate until the terminal orbit of the exact
    * integer recurrence — a fixed point (an iteration that changes no
    * rank) or the period-2 cycle that floor rounding produces on many
    * graphs (successive iterates oscillating by an ulp of the fixed
    * point; real graphs routinely terminate this way, so a
    * fixed-point-only check would never fire) — or `maxIters`,
    * whichever first. Because the arithmetic is exact BIGINT, the
    * returned frame is BIT-IDENTICAL to [[weightedPageRankFixedPoint]]
    * at `itersRun` (it is that iterate), and to every larger budget of
    * the same parity on a cycle / every larger budget outright on a
    * fixed point — early exit stops paying for provably-repeating
    * rounds (each saved round is one shuffle stage on a cluster — the
    * BFS empty-frontier pattern, [[Components.bfsHopDistance]]).
    *
    * Cost of the check: each iteration is eagerly localCheckpointed
    * (the per-round materialization HITS already pays) and the delta
    * check is an equi-join on the node id against the two previous
    * materialized frames + ONE scalar to the driver; live checkpoint
    * storage is ≤ 3 generations.
    *
    * @return (ranks, itersRun) — itersRun counts executed iterations,
    *         including the final round that proved the orbit */
  def weightedPageRankConverged(
      edges: DataFrame, srcCol: String, dstCol: String,
      weightCol: Option[String],
      maxIters: Int, scale: Long = 1000000L, dampPct: Int = 85)
      : (DataFrame, Int) =
    weightedCore(edges, srcCol, dstCol, weightCol, maxIters, scale,
      dampPct, checkpointInterval = 1, convergeDelta = true)

  /** Unweighted [[weightedPageRankConverged]]. */
  def pageRankConverged(
      edges: DataFrame, srcCol: String, dstCol: String,
      maxIters: Int, scale: Long = 1000000L, dampPct: Int = 85)
      : (DataFrame, Int) =
    weightedPageRankConverged(edges, srcCol, dstCol, None, maxIters,
      scale, dampPct)

  /** true iff `next` assigns every node the same rank as `prev` (fixed
    * point) or as `prev2` (period-2 orbit) — ONE pass: a single
    * equi-join against both prior materialized frames and one
    * min-aggregated scalar row ([[Components.orbitReached]]; node sets
    * are identical by construction — all frames map the same `nodes`
    * relation). */
  private def orbit(prev: DataFrame, prev2: DataFrame,
      next: DataFrame): Boolean =
    Components.orbitReached(prev, prev2, next, "node", "pr")

  private def weightedCore(
      edges: DataFrame, srcCol: String, dstCol: String,
      weightCol: Option[String],
      iters: Int, scale: Long, dampPct: Int,
      checkpointInterval: Int, convergeDelta: Boolean)
      : (DataFrame, Int) = {
    require(iters >= 0 && scale > 0 && dampPct >= 0 && dampPct <= 100)
    require(checkpointInterval >= 1)
    val e = weightCol match {
      case Some(w) => edges
        .select(col(srcCol).as("src"), col(dstCol).as("dst"),
          col(w).cast("long").as("__w"))
        .groupBy(col("src"), col("dst")).agg(sum(col("__w")).as("__w"))
        // positivity is enforced, not just documented: a non-positive
        // aggregated weight would otherwise yield engine-divergent ranks
        // (Spark DIV truncates toward zero, floor-division engines round
        // down) or a silent NULL-drop on a zero-outdeg source — fail the
        // job with the offending edge instead
        .withColumn("__w",
          when(col("__w") > 0, col("__w")).otherwise(raise_error(concat(
            lit("weightedPageRankFixedPoint: non-positive aggregated edge weight "),
            col("__w").cast("string"), lit(" on edge ("),
            col("src").cast("string"), lit(" -> "), col("dst").cast("string"),
            lit("); the positive-weight contract is required for cross-engine "),
            lit("exactness"))).cast("long")))
      case None => edges
        .select(col(srcCol).as("src"), col(dstCol).as("dst"))
        .distinct()
        .withColumn("__w", lit(1L))
    }
    val deg = e.groupBy(col("src")).agg(sum(col("__w")).as("outdeg"))
    val eDeg = e.join(deg, Seq("src"))
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node")))
      .distinct()
    val teleport = (scale * (100L - dampPct)) / 100L
    var ranks = nodes.withColumn("pr", lit(scale))
    var prev2: DataFrame = null
    var prevCkpt: Seq[org.apache.spark.rdd.RDD[_]] = Nil
    var prevPrevCkpt: Seq[org.apache.spark.rdd.RDD[_]] = Nil
    var i = 0
    var converged = false
    while (i < iters && !converged) {
      // per-edge contribution: floor(rank / outdeg), exact on BIGINT
      // (DIV, not fp division — double rounding would diverge at scale)
      val inbound = eDeg
        .join(ranks.withColumnRenamed("node", "src"), Seq("src"))
        .select(col("dst").as("node"),
          expr("(pr * __w) DIV outdeg").as("contrib"))
        .groupBy(col("node"))
        .agg(sum(col("contrib")).as("mass"))
      val next = nodes.join(inbound, Seq("node"), "left")
        .select(col("node"),
          (lit(teleport) +
            expr(s"(${dampPct}L * coalesce(mass, 0L)) DIV 100L")).as("pr"))
      if (convergeDelta) {
        // converged mode: materialize every round (eager, so superseded
        // blocks free immediately) and exit when this round reproduces
        // the previous frame (fixed point) or the one before it
        // (period-2 ulp cycle); both comparands are materialized
        // checkpoints (or the trivial initial frame), so each compare
        // is a cheap join + limit-1 action
        val (ck, ckpt) =
          CheckpointHygiene.checkpointTracked(next, eager = true)
        converged = orbit(ranks, prev2, ck)
        CheckpointHygiene.free(prevPrevCkpt)
        prevPrevCkpt = prevCkpt
        prevCkpt = ckpt
        prev2 = ranks
        ranks = ck
      } else {
        // deep runs only: bound plan depth; never checkpoint the final
        // frame — the caller gets the real plan, not an RDD scan.
        // Interval checkpoints are EAGER so the superseded one can be
        // freed on the spot (a lazy chain would need its predecessor's
        // blocks to materialize later) — live storage stays ≤ 2
        // generations at any depth instead of growing with
        // iters/interval
        ranks = if ((i + 1) % checkpointInterval == 0 && i < iters - 1) {
          val (ck, ckpt) =
            CheckpointHygiene.checkpointTracked(next, eager = true)
          CheckpointHygiene.free(prevCkpt)
          prevCkpt = ckpt
          ck
        } else next
      }
      i += 1
    }
    (ranks, i)
  }

  /** Personalized PageRank (Page et al. 1999 §6; Haveliwala 2002,
    * "Topic-Sensitive PageRank"): teleport mass returns ONLY to a seed
    * set instead of uniformly — rank becomes "relevance to these
    * trusted seeds", the standard seed-propagation signal a curation
    * pipeline uses to score domains/hosts near known-good ones
    * (TrustRank is exactly this shape). Ranks start at `scale` on
    * seeds and 0 elsewhere; the teleport term is seed-gated; nodes
    * unreachable from the seed set stay at 0 — that IS the signal.
    *
    * Same exact-BIGINT fixed-point contract and Pregel-on-DataFrames
    * shape as [[pageRankFixedPoint]] (one hash join + one partial agg
    * per iteration, interval checkpointing with freed generations).
    * Seeds arrive as a DataFrame of any size — the flag attaches via a
    * hash join on the node id, no broadcast assumption; seeds absent
    * from the graph are ignored. Unweighted edges (dedup'd); compose
    * with the weighted variant's pre-aggregation if multiplicity
    * matters. */
  def personalizedPageRankFixedPoint(
      edges: DataFrame, srcCol: String, dstCol: String,
      seeds: DataFrame, seedCol: String,
      iters: Int, scale: Long = 1000000L, dampPct: Int = 85,
      checkpointInterval: Int = 8): DataFrame =
    personalizedCore(edges, srcCol, dstCol, seeds, seedCol, iters, scale,
      dampPct, checkpointInterval, convergeDelta = false)._1

  /** Converged [[personalizedPageRankFixedPoint]] — the exact-fixed-point
    * early exit of [[weightedPageRankConverged]], same bit-identity
    * guarantee and per-round cost. */
  def personalizedPageRankConverged(
      edges: DataFrame, srcCol: String, dstCol: String,
      seeds: DataFrame, seedCol: String,
      maxIters: Int, scale: Long = 1000000L, dampPct: Int = 85)
      : (DataFrame, Int) =
    personalizedCore(edges, srcCol, dstCol, seeds, seedCol, maxIters,
      scale, dampPct, checkpointInterval = 1, convergeDelta = true)

  private def personalizedCore(
      edges: DataFrame, srcCol: String, dstCol: String,
      seeds: DataFrame, seedCol: String,
      iters: Int, scale: Long, dampPct: Int,
      checkpointInterval: Int, convergeDelta: Boolean)
      : (DataFrame, Int) = {
    require(iters >= 0 && scale > 0 && dampPct >= 0 && dampPct <= 100)
    require(checkpointInterval >= 1)
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .distinct()
    val deg = e.groupBy(col("src")).agg(count(lit(1)).as("outdeg"))
    val eDeg = e.join(deg, Seq("src"))
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct()
    val flagged = nodes.join(
        seeds.select(col(seedCol).as("node")).distinct()
          .withColumn("__seed", lit(1)),
        Seq("node"), "left")
      .select(col("node"), coalesce(col("__seed"), lit(0)).as("__seed"))
    val teleport = (scale * (100L - dampPct)) / 100L
    var ranks = flagged.select(col("node"),
      when(col("__seed") === 1, lit(scale)).otherwise(lit(0L)).as("pr"))
    var prev2: DataFrame = null
    var prevCkpt: Seq[org.apache.spark.rdd.RDD[_]] = Nil
    var prevPrevCkpt: Seq[org.apache.spark.rdd.RDD[_]] = Nil
    var i = 0
    var converged = false
    while (i < iters && !converged) {
      val inbound = eDeg
        .join(ranks.withColumnRenamed("node", "src"), Seq("src"))
        .select(col("dst").as("node"),
          expr("pr DIV outdeg").as("contrib"))
        .groupBy(col("node"))
        .agg(sum(col("contrib")).as("mass"))
      val next = flagged.join(inbound, Seq("node"), "left")
        .select(col("node"),
          (when(col("__seed") === 1, lit(teleport)).otherwise(lit(0L)) +
            expr(s"(${dampPct}L * coalesce(mass, 0L)) DIV 100L")).as("pr"))
      if (convergeDelta) {
        val (ck, ckpt) =
          CheckpointHygiene.checkpointTracked(next, eager = true)
        converged = orbit(ranks, prev2, ck)
        CheckpointHygiene.free(prevPrevCkpt)
        prevPrevCkpt = prevCkpt
        prevCkpt = ckpt
        prev2 = ranks
        ranks = ck
      } else {
        ranks = if ((i + 1) % checkpointInterval == 0 && i < iters - 1) {
          val (ck, ckpt) =
            CheckpointHygiene.checkpointTracked(next, eager = true)
          CheckpointHygiene.free(prevCkpt)
          prevCkpt = ckpt
          ck
        } else next
      }
      i += 1
    }
    (ranks, i)
  }

  /** HITS hubs & authorities (Kleinberg 1999, "Authoritative sources in
    * a hyperlinked environment") — BIGINT fixed-point with
    * MAX-normalization. The textbook formulation renormalizes each
    * half-step by the L2 norm (a sqrt — not engine-portable); dividing
    * by the half-step's MAXIMUM instead keeps every operation an exact
    * integer (sum, max, floor division), converges to the same
    * principal-eigenvector direction (the iteration is scale-invariant,
    * so any positive renormalization works), and pins the top
    * hub/authority at exactly `scale`.
    *
    * Same Pregel-on-DataFrames shape as PageRank: each half-step is one
    * hash join on an endpoint + one partial-aggregated groupBy. The
    * per-half-step max is ONE scalar to the driver (the
    * Packing-subtotal class of model-state boundary — bytes ∝ 1, not
    * data size); because the max is an action, each half-step frame is
    * localCheckpointed before it, which doubles as the per-iteration
    * lineage truncation.
    *
    * On a bipartite graph (q120: customer→supplier purchase edges)
    * hub scores rank the left side and authority scores the right —
    * the two-sided importance measure one PageRank pass cannot give.
    *
    * Overflow headroom: a raw half-step score is ≤ max-degree·scale and
    * is then multiplied by `scale`, so max-degree·scale² must stay under
    * 2^63 — at the default scale 10^6 that allows degrees to ~9·10^6;
    * web-scale celebrity nodes beyond that need a smaller `scale`.
    *
    * @param iters full HITS iterations (authorities from hubs, then
    *              hubs from the new authorities — exact, not converged)
    * @return (node, hub, auth) over every edge endpoint; a node with no
    *         out-edges has hub 0, with no in-edges auth 0 */
  def hitsFixedPoint(
      edges: DataFrame, srcCol: String, dstCol: String,
      iters: Int, scale: Long = 1000000L): DataFrame = {
    require(iters >= 0 && scale > 0)
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .distinct().localCheckpoint(false)
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct()
    var h = e.select(col("src").as("node")).distinct()
      .withColumn("h", lit(scale))
    var a = e.select(col("dst").as("node")).distinct()
      .withColumn("a", lit(0L))
    val noEdges = e.isEmpty
    var prevCkpt: Seq[org.apache.spark.rdd.RDD[_]] = Nil
    var i = 0
    while (i < iters && !noEdges) {
      val (aRaw, aCkpt) = CheckpointHygiene.checkpointTracked(
        e.join(h.withColumnRenamed("node", "src"), Seq("src"))
          .groupBy(col("dst").as("node"))
          .agg(sum(col("h")).as("raw")))
      val maxA = aRaw.agg(max(col("raw"))).collect()(0).getLong(0)
      a = aRaw.select(col("node"),
        expr(s"(raw * ${scale}L) DIV ${maxA}L").as("a"))
      val (hRaw, hCkpt) = CheckpointHygiene.checkpointTracked(
        e.join(a.withColumnRenamed("node", "dst"), Seq("dst"))
          .groupBy(col("src").as("node"))
          .agg(sum(col("a")).as("raw")))
      val maxH = hRaw.agg(max(col("raw"))).collect()(0).getLong(0)
      h = hRaw.select(col("node"),
        expr(s"(raw * ${scale}L) DIV ${maxH}L").as("h"))
      // both max actions materialized this round's half-step
      // checkpoints; the previous round's blocks are unreferenced now
      CheckpointHygiene.free(prevCkpt)
      prevCkpt = aCkpt ++ hCkpt
      i += 1
    }
    nodes
      .join(h, Seq("node"), "left")
      .join(a, Seq("node"), "left")
      .select(col("node"),
        coalesce(col("h"), lit(0L)).as("hub"),
        coalesce(col("a"), lit(0L)).as("auth"))
  }
}
