package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Ann

/** Beam-search serving over a kNN-graph backbone (q183) — the four
  * properties its scaladoc promises, graded against exact brute-force
  * ground truth on the sf0.01 embeddings:
  *
  *   1. `knnGraphProbePortable` IS `beamSearchStats(ef = k,
  *      dedupVisited = false, stopOnNoImprove = false)` — row-for-row.
  *   2. recall@k vs [[Ann.exactTopKPortable]] is monotone in the beam
  *      width `ef` (the quality dial).
  *   3. visited-set dedup changes the BUDGET, never the RESULT (an
  *      evicted pair re-scores to the same distance and the per-query
  *      kth-best only improves, so it stays evicted) — which is what
  *      makes "beam ≥ probe recall at ≤ scored-pairs budget" an honest
  *      comparison, asserted on the measured stats.
  *   4. early-stop is sound: a converged beam is a fixed point, so the
  *      stop-enabled run is bit-identical to the maxRounds-capped run
  *      while spending strictly less budget.
  */
class BeamSearchSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.session
  private val dir = "/root/testdata/sf0.01"
  private val K = 4
  private val Scale = 1000

  private lazy val corpus = Tables.load(spark, dir, "embeddings")
    .filter(col("vec_id") < 150)
  private lazy val queries = Tables.load(spark, dir, "embeddings")
    .filter(col("vec_id") >= 150 && col("vec_id") < 165)
  // degree-10 backbone, 3 descent rounds — the q157/q180/q183 shape
  private lazy val graph =
    Ann.nnDescentPortable(corpus, "embedding", "vec_id", 10, 3, Scale)
      .cache()

  private def rows(df: DataFrame): Set[(Long, Long, Long, Long)] =
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
      r.getLong(3))).toSet

  private lazy val exactPairs: Set[(Long, Long)] =
    Ann.exactTopKPortable(corpus, queries,
        "embedding", "vec_id", "vec_id", K, Scale)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  private def recall(beam: DataFrame): Double = {
    val got = beam.select(col("id"), col("neighbor_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    got.intersect(exactPairs).size.toDouble / exactPairs.size
  }

  test("probe parity: knnGraphProbePortable == beamSearchStats with " +
      "ef=k, no dedup, no early-stop — row for row") {
    val probe = Ann.knnGraphProbePortable(graph, corpus, queries,
      "embedding", "vec_id", K, expandRounds = 2, Scale)
    val (beam, _) = Ann.beamSearchStats(graph, corpus, queries,
      "embedding", "vec_id", K, ef = K, maxRounds = 2,
      stopOnNoImprove = false, dedupVisited = false, Scale)
    assert(rows(beam) == rows(probe),
      "beam(ef=k, no dedup, no stop) diverged from the probe")
  }

  test("recall@k is monotone in ef, and a wide beam recovers most of " +
      "the exact top-k") {
    val rs = Seq(4, 8, 16).map { ef =>
      val (beam, _) = Ann.beamSearchStats(graph, corpus, queries,
        "embedding", "vec_id", K, ef, maxRounds = 3, scale = Scale)
      ef -> recall(beam)
    }.toMap
    assert(rs(8) >= rs(4), s"recall fell 4->8: $rs")
    assert(rs(16) >= rs(8), s"recall fell 8->16: $rs")
    assert(rs(16) > rs(4), s"widening the beam 4x bought nothing: $rs")
    assert(rs(16) >= 0.8, s"ef=16 recall ${rs(16)} — serving loop weak")
  }

  test("dedup changes budget, not results; beam beats probe recall at " +
      "a smaller scored-pairs budget") {
    val (probe, probeBudget) = Ann.beamSearchStats(graph, corpus,
      queries, "embedding", "vec_id", K, ef = K, maxRounds = 3,
      stopOnNoImprove = false, dedupVisited = false, Scale)
    val (dedup, dedupBudget) = Ann.beamSearchStats(graph, corpus,
      queries, "embedding", "vec_id", K, ef = K, maxRounds = 3,
      stopOnNoImprove = false, dedupVisited = true, Scale)
    assert(rows(dedup) == rows(probe),
      "visited-set dedup changed the served results")
    assert(dedupBudget < probeBudget,
      s"dedup spent $dedupBudget >= probe's $probeBudget")
    // spend the saved budget on width instead: a wider deduped beam
    // must match-or-beat the probe's recall without exceeding the
    // probe's scored-pairs budget
    val (wide, wideBudget) = Ann.beamSearchStats(graph, corpus,
      queries, "embedding", "vec_id", K, ef = 2 * K, maxRounds = 3,
      stopOnNoImprove = true, dedupVisited = true, Scale)
    assert(wideBudget <= probeBudget,
      s"wide beam budget $wideBudget > probe budget $probeBudget")
    assert(recall(wide) >= recall(probe),
      s"wide beam recall ${recall(wide)} < probe ${recall(probe)} " +
        s"at budgets $wideBudget vs $probeBudget")
  }

  test("early-stop: converged beam is bit-identical to the " +
      "maxRounds-capped run, at strictly smaller budget") {
    // dedup off so the capped run keeps re-scoring its (unchanging)
    // frontier after convergence — the budget gap is then strict
    // evidence the stop actually fired before the round cap
    val (capped, cappedBudget) = Ann.beamSearchStats(graph, corpus,
      queries, "embedding", "vec_id", K, ef = 8, maxRounds = 8,
      stopOnNoImprove = false, dedupVisited = false, Scale)
    val (stopped, stoppedBudget) = Ann.beamSearchStats(graph, corpus,
      queries, "embedding", "vec_id", K, ef = 8, maxRounds = 8,
      stopOnNoImprove = true, dedupVisited = false, Scale)
    assert(rows(stopped) == rows(capped),
      "early-stop changed the served results")
    assert(stoppedBudget < cappedBudget,
      s"early-stop never fired in 8 rounds: $stoppedBudget vs " +
        s"$cappedBudget")
  }

  // ------------------------------------ hierarchical (q189) serving

  private lazy val layerCorpus = corpus.filter(col("vec_id") % 3 === 1)
  private lazy val layerGraph =
    Ann.nnDescentPortable(layerCorpus, "embedding", "vec_id", 10, 3,
      Scale).cache()

  test("hierarchical serving: layer seeding matches flat recall at a " +
      "smaller or comparable budget, and is deterministic") {
    val (flat, flatBudget) = Ann.beamSearchStats(graph, corpus, queries,
      "embedding", "vec_id", K, ef = 8, maxRounds = 2, scale = Scale)
    val (hier, hierBudget) = Ann.hierarchicalBeamSearchStats(graph,
      corpus, layerGraph, layerCorpus, queries, "embedding", "vec_id",
      K, ef = 8, maxRounds = 2, efL1 = 8, maxRoundsL1 = 1,
      scale = Scale)
    val rFlat = recall(flat)
    val rHier = recall(hier)
    // geometry-driven seeding should not lose to hash buckets: allow a
    // small slack for this tiny corpus, but require near-parity recall
    assert(rHier >= rFlat - 0.05,
      s"hierarchical recall $rHier far below flat $rFlat")
    assert(rHier >= 0.7, s"hierarchical recall $rHier — seeding weak")
    // the layer replaces |q|*bucket-load seed scoring with an
    // efL1-wide beam over a third of the corpus; total spend must not
    // balloon past flat
    assert(hierBudget <= flatBudget * 2,
      s"hierarchical budget $hierBudget vs flat $flatBudget")
    val again = Ann.hierarchicalBeamSearch(graph, corpus, layerGraph,
      layerCorpus, queries, "embedding", "vec_id", K, ef = 8,
      maxRounds = 2, efL1 = 8, maxRoundsL1 = 1, scale = Scale)
    assert(rows(again) == rows(hier),
      "hierarchical serving is not deterministic")
  }

  test("hierarchical recall is monotone in the layer width efL1") {
    val rs = Seq(2, 8).map { efL1 =>
      val (beam, _) = Ann.hierarchicalBeamSearchStats(graph, corpus,
        layerGraph, layerCorpus, queries, "embedding", "vec_id", K,
        ef = 8, maxRounds = 2, efL1 = efL1, maxRoundsL1 = 1,
        scale = Scale)
      efL1 -> recall(beam)
    }.toMap
    assert(rs(8) >= rs(2), s"recall fell as the layer widened: $rs")
  }
}
