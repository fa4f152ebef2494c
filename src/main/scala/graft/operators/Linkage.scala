package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Fellegi–Sunter probabilistic record linkage (Fellegi & Sunter 1969,
  * JASA, "A Theory for Record Linkage") — the classical model behind
  * production entity-matching engines, re-expressed relationally as the
  * probabilistic sibling of the rule/fuzzy [[Cascade]]:
  *
  *   - per comparison field f: `m_f = P(agree | match)` estimated from
  *     labeled gold pairs, `u_f = P(agree | non-match)` estimated from
  *     the value distribution (the probability two RANDOM records agree,
  *     `Σ_v c_v² / N²` — the standard frequency-based u);
  *   - a candidate pair scores `Π_f w_f` where `w_f = (m_f/u_f)` on
  *     agreement and `(1−m_f)/(1−u_f)` on disagreement — the ODDS-RATIO
  *     product, i.e. exp of the textbook log-weight sum. Log is monotone,
  *     so thresholding/ranking the product IS thresholding the
  *     Fellegi–Sunter weight (the q117 no-libm transform);
  *   - pairs at/above `threshold` are matches.
  *
  * Engine-portable by construction: every statistic is an exact BIGINT
  * rational (Laplace-smoothed: `m = (agree+1)/(n_gold+2)`,
  * `u = (Σc²+1)/(N²+2)` — smoothing also keeps 1−m and 1−u nonzero), and
  * the per-field weights are fixed SHAPES of IEEE ops over those exact
  * integers — `(mNum/mDen) / (uNum/uDen)`, multiplied in field order —
  * so an external engine recomputing the same integers reproduces the
  * scores bit-for-bit (q123's DuckDB oracle replays estimation AND
  * scoring).
  *
  * Scale shape: estimation is one hash aggregation per field for u (value
  * histogram, map-side partial) plus one gold⋈records⋈records join for
  * all m's together; only the F-row weight table reaches the driver (the
  * Packing-subtotal model-state class). Scoring is two hash joins of the
  * candidate list against the records (on each id) followed by a pure
  * map — candidates come from the caller's blocking strategy
  * ([[Cascade]] blocks, [[Dedup]] LSH buckets), so no all-pairs shape
  * exists anywhere. Overflow: `Σ_v c_v²` ≤ N², so N up to ~3·10⁹ rows
  * fits BIGINT (past that, estimate u on a hash-sample).
  *
  * Null semantics: a NULL on either side of a field is a DISAGREEMENT
  * (never an agreement), and NULL values are excluded from u's value
  * histogram while N stays the full record count — consistent between
  * estimation and scoring.
  */
object Linkage {

  /** Per-field match/non-match agreement statistics as exact rationals.
    * `agreeWeight`/`disagreeWeight` derive the double odds-ratios with a
    * FIXED op shape — the same shape the SQL oracle writes, so the
    * doubles agree across engines. */
  final case class FieldWeight(field: String,
      mNum: Long, mDen: Long, uNum: Long, uDen: Long) {
    require(mNum > 0 && mNum < mDen && uNum > 0 && uNum < uDen,
      s"degenerate weight for $field: m=$mNum/$mDen u=$uNum/$uDen")
    def agreeWeight: Double =
      (mNum.toDouble / mDen.toDouble) / (uNum.toDouble / uDen.toDouble)
    def disagreeWeight: Double =
      ((mDen - mNum).toDouble / mDen.toDouble) /
        ((uDen - uNum).toDouble / uDen.toDouble)
  }

  private def agreeCol(f: String): Column =
    col(s"__a_$f").isNotNull && col(s"__b_$f").isNotNull &&
      col(s"__a_$f") === col(s"__b_$f")

  private def sides(records: DataFrame, idCol: String,
      fields: Seq[String]): (DataFrame, DataFrame) = (
    records.select(col(idCol).as("id_a") +:
      fields.map(f => col(f).as(s"__a_$f")): _*),
    records.select(col(idCol).as("id_b") +:
      fields.map(f => col(f).as(s"__b_$f")): _*))

  /** Estimate [[FieldWeight]]s: m from `goldPairs` (an (id_a, id_b)
    * frame of known matches — agreement rate per field, Laplace
    * smoothed), u from the records' own value distribution
    * (`(Σ_v c_v² + 1) / (N² + 2)`). One aggregate per field plus one
    * three-way join; F rows to the driver. */
  def estimateWeights(records: DataFrame, idCol: String,
      fields: Seq[String], goldPairs: DataFrame): Seq[FieldWeight] = {
    val n = records.count()
    val (a, b) = sides(records, idCol, fields)
    val gj = goldPairs.select(col("id_a"), col("id_b"))
      .join(a, Seq("id_a")).join(b, Seq("id_b"))
    val mRow = gj.agg(count(lit(1)).as("__n"),
      fields.map(f => sum(when(agreeCol(f), 1L).otherwise(0L))
        .as(s"__agree_$f")): _*).collect()(0)
    val nGold = mRow.getAs[Long]("__n")
    require(nGold > 0, "estimateWeights needs a non-empty gold pair set")
    fields.map { f =>
      val uSum = records.filter(col(f).isNotNull)
        .groupBy(col(f)).agg(count(lit(1)).as("__c"))
        .agg(sum(col("__c") * col("__c"))).collect()(0).getLong(0)
      FieldWeight(f,
        mNum = mRow.getAs[Long](s"__agree_$f") + 1L, mDen = nGold + 2L,
        uNum = uSum + 1L, uDen = n * n + 2L)
    }
  }

  /** Score candidate pairs and decide matches: two hash joins on the ids
    * + a pure map. Output: (id_a, id_b, n_agree, score, is_match),
    * with `score` the odds-ratio product (doubles multiplied in `fields`
    * order — the oracle-replicable shape) and `is_match` =
    * score ≥ threshold. */
  def scorePairs(records: DataFrame, idCol: String, fields: Seq[String],
      candidates: DataFrame, weights: Seq[FieldWeight],
      threshold: Double): DataFrame = {
    val byField = weights.map(w => w.field -> w).toMap
    require(fields.forall(byField.contains), "weight per field required")
    scorePairsRaw(records, idCol, fields, candidates,
      fields.map(f => f -> (byField(f).agreeWeight,
        byField(f).disagreeWeight)).toMap, threshold)
  }

  /** Scoring projection shared by every entry point: the joined frame
    * must carry `id_a`, `id_b` and the `__a_f`/`__b_f` field pairs. */
  private def scored(joined: DataFrame, fields: Seq[String],
      weights: Map[String, (Double, Double)],
      threshold: Double): DataFrame = {
    require(fields.forall(weights.contains), "weight per field required")
    val score = fields.map { f =>
      val (wa, wd) = weights(f)
      when(agreeCol(f), lit(wa)).otherwise(lit(wd))
    }.reduce(_ * _)
    val nAgree = fields.map(f =>
      when(agreeCol(f), 1L).otherwise(0L)).reduce(_ + _)
    joined.select(col("id_a"), col("id_b"),
      nAgree.as("n_agree"), score.as("score"),
      (score >= lit(threshold)).as("is_match"))
  }

  /** [[scorePairs]] with raw double odds-ratio weights per field —
    * the entry point for EM-calibrated parameters
    * ([[EmParams.toWeights]]) or externally supplied models. */
  def scorePairsRaw(records: DataFrame, idCol: String,
      fields: Seq[String], candidates: DataFrame,
      weights: Map[String, (Double, Double)],
      threshold: Double): DataFrame = {
    val (a, b) = sides(records, idCol, fields)
    scored(candidates.select(col("id_a"), col("id_b"))
      .join(a, Seq("id_a")).join(b, Seq("id_b")),
      fields, weights, threshold)
  }

  /** Batch-vs-reference linkage probe — the SERVING shape: block an
    * incoming batch against a static reference on `blockCol` equality
    * and score every blocked candidate (batch side = `id_a`, reference
    * side = `id_b`) with a pre-calibrated model. Per-call cost is the
    * batch times its blocked reference population — never the reference
    * size — so the SAME call serves a backfill batch or a
    * `foreachBatch` micro-batch
    * ([[graft.streaming.EventStreams.linkageIngest]]); batch ≡ stream
    * is spec'd. */
  def scoreAgainstReference(batch: DataFrame, reference: DataFrame,
      idCol: String, blockCol: String, fields: Seq[String],
      weights: Map[String, (Double, Double)],
      threshold: Double): DataFrame = {
    val a = batch.select(
      Seq(col(idCol).as("id_a"), col(blockCol).as("__blk")) ++
        fields.map(f => col(f).as(s"__a_$f")): _*)
    val b = reference.select(
      Seq(col(idCol).as("id_b"), col(blockCol).as("__blk")) ++
        fields.map(f => col(f).as(s"__b_$f")): _*)
    scored(a.join(b, Seq("__blk")), fields, weights, threshold)
  }

  /** EM-calibrated Fellegi–Sunter parameters: match proportion π and
    * per-field (m, u). */
  final case class EmParams(pi: Double,
      m: Map[String, Double], u: Map[String, Double]) {
    /** Odds-ratio weights for [[scorePairsRaw]]: (m/u on agreement,
      * (1−m)/(1−u) on disagreement) per field. */
    def toWeights: Map[String, (Double, Double)] =
      m.keys.map(f => f ->
        (m(f) / u(f), (1.0 - m(f)) / (1.0 - u(f)))).toMap
  }

  /** UNSUPERVISED (π, m_f, u_f) estimation by EM over the candidate
    * pairs' agreement patterns — no labeled gold needed (Winkler 1988,
    * "Using the EM algorithm for weight computation in the
    * Fellegi–Sunter model"; the two-class latent mixture over binary
    * agreement vectors):
    *
    *   E: w(pair) = π·Π_f p_f / (π·Π_f p_f + (1−π)·Π_f q_f)
    *      with p_f = m_f or 1−m_f, q_f = u_f or 1−u_f by agreement;
    *   M: π = Σw/n,  m_f = Σ(w·γ_f)/Σw,  u_f = Σ((1−w)·γ_f)/Σ(1−w).
    *
    * QUANTIZED EM — the engine-portability move: responsibilities are
    * floor-quantized to 2⁻³⁰ (and clamped interior, which also bans
    * division-by-zero states) BEFORE the M-step sums, so every
    * cross-pair reduction is an ORDER-INDEPENDENT BIGINT sum and the
    * whole calibration replays bit-for-bit in an external engine (the
    * repo's fixed-point convention; the ≤2⁻³⁰-per-pair bias is far
    * below EM's statistical error). Every double the E-step consumes
    * is derived from those BIGINTs by fixed op shapes.
    *
    * Scale shape: the agreement-flag frame is computed ONCE (two hash
    * joins, checkpointed, freed on exit); each iteration is one pure
    * map + one (2F+1)-column aggregate; driver state is 2F+1 longs per
    * iteration (the model-state boundary). Overflow: Σ w_fx ≤ n·2³⁰ —
    * safe to ~8·10⁹ candidate pairs, far past any blocked pair list
    * that should exist. */
  def estimateWeightsEM(records: DataFrame, idCol: String,
      fields: Seq[String], candidates: DataFrame, iters: Int = 4,
      pi0: Double = 0.2, m0: Double = 0.9, u0: Double = 0.1): EmParams = {
    require(iters >= 1, "need at least one EM iteration")
    val (a, b) = sides(records, idCol, fields)
    val (flags, flagsCkpt) = CheckpointHygiene.checkpointTracked(
      candidates.select(col("id_a"), col("id_b"))
        .join(a, Seq("id_a")).join(b, Seq("id_b"))
        .select(fields.map(f => agreeCol(f).as(s"__g_$f")): _*))
    try emLoop(flags, fields, iters, pi0, m0, u0)
    finally CheckpointHygiene.free(flagsCkpt)
  }

  /** The quantized-responsibility expression for one E-step at the
    * given parameters — left-assoc field order (the oracle-replicable
    * shape), floor-quantized to 2⁻³⁰ and clamped interior. */
  private def responsibilityQ(fields: Seq[String], pi: Double,
      m: Map[String, Double], u: Map[String, Double]): Column = {
    val Q = 1L << 30
    val pm = fields.foldLeft(lit(pi))((acc, f) =>
      acc * when(col(s"__g_$f"), lit(m(f))).otherwise(lit(1.0 - m(f))))
    val pu = fields.foldLeft(lit(1.0 - pi))((acc, f) =>
      acc * when(col(s"__g_$f"), lit(u(f))).otherwise(lit(1.0 - u(f))))
    least(greatest(
      floor((pm / (pm + pu)) * lit(Q.toDouble)).cast("long"),
      lit(1L)), lit(Q - 1L))
  }

  /** The EM parameter loop over a materialized agreement-flag frame
    * (extra columns — e.g. pair ids — are carried but ignored). */
  private def emLoop(flags: DataFrame, fields: Seq[String], iters: Int,
      pi0: Double, m0: Double, u0: Double): EmParams = {
    val Q = 1L << 30
    val n = flags.count()
    require(n > 0, "estimateWeightsEM needs a non-empty candidate set")
    var pi = pi0
    var m = fields.map(_ -> m0).toMap
    var u = fields.map(_ -> u0).toMap
    (1 to iters).foreach { _ =>
      // E-step per pair, then M-step as order-independent BIGINT sums
      val wfx = responsibilityQ(fields, pi, m, u)
      val row = flags
        .select(wfx.as("__w") +: fields.map(f => col(s"__g_$f")): _*)
        .agg(sum(col("__w")).as("__sw"),
          fields.flatMap(f => Seq(
            sum(when(col(s"__g_$f"), col("__w")).otherwise(0L))
              .as(s"__swf_$f"),
            sum(when(col(s"__g_$f"), lit(Q) - col("__w")).otherwise(0L))
              .as(s"__sgf_$f"))): _*)
        .collect()(0)
      val sw = row.getAs[Long]("__sw")
      pi = sw.toDouble / (n * Q).toDouble
      m = fields.map(f => f ->
        row.getAs[Long](s"__swf_$f").toDouble / sw.toDouble).toMap
      u = fields.map(f => f ->
        row.getAs[Long](s"__sgf_$f").toDouble /
          (n * Q - sw).toDouble).toMap
    }
    EmParams(pi, m, u)
  }

  /** Per-pair posterior match probabilities under the EM-calibrated
    * model: run [[estimateWeightsEM]]'s loop, then ONE more E-step over
    * the same candidate pairs emitting each pair's quantized
    * responsibility `posterior_q` ∈ [1, 2³⁰−1] (the match probability
    * × 2³⁰, floor-quantized) — the per-pair surface a pipeline
    * thresholds, routes to clerical review, or joins back onto match
    * candidates, where the parameter estimator alone reports one global
    * row. The same quantization contract as the loop, so the full
    * per-pair frame replays bit-for-bit in an external engine (q131).
    *
    * Scale shape: the agreement-flag frame (two hash joins on the
    * record ids) is built ONCE with the pair ids attached and
    * checkpointed; the parameter loop aggregates over it ignoring the
    * ids, and the final E-step is a pure map over the same frame — no
    * additional join or shuffle beyond the calibration itself. Output
    * is pair-proportional; nothing new reaches the driver. */
  def emPosteriors(records: DataFrame, idCol: String,
      fields: Seq[String], candidates: DataFrame, iters: Int = 4,
      pi0: Double = 0.2, m0: Double = 0.9, u0: Double = 0.1): DataFrame = {
    require(iters >= 1, "need at least one EM iteration")
    val (a, b) = sides(records, idCol, fields)
    // checkpoint blocks stay live: the returned frame reads them (the
    // converged-PageRank discipline — the final generation belongs to
    // the caller's result)
    val (flags, _) = CheckpointHygiene.checkpointTracked(
      candidates.select(col("id_a"), col("id_b"))
        .join(a, Seq("id_a")).join(b, Seq("id_b"))
        .select(col("id_a") +: col("id_b") +:
          fields.map(f => agreeCol(f).as(s"__g_$f")): _*))
    val params = emLoop(flags, fields, iters, pi0, m0, u0)
    flags.select(col("id_a"), col("id_b"),
      responsibilityQ(fields, params.pi, params.m, params.u)
        .as("posterior_q"))
  }

  /** Blocking-scheme evaluation (the standard record-linkage triple;
    * Christen 2012, "Data Matching", ch. 7) — grade a candidate
    * generator BEFORE paying for pair scoring:
    *
    *   - reduction ratio  = 1 − |cand| / (N·(N−1)/2) — how much of the
    *     quadratic pair space the blocking avoided;
    *   - pair completeness = |cand ∩ gold| / |gold| — the recall the
    *     blocking CAPS for every downstream stage;
    *   - pairs quality     = |cand ∩ gold| / |cand| — candidate
    *     precision.
    *
    * Both pair sets are normalized to unordered distinct (lo, hi) so
    * orientation/duplicates can't skew counts. One row out; each
    * metric is ONE double division of exact BIGINTs (the q116
    * convention — engine-exact, zero when the denominator is zero).
    * Scale: a semi-join on the pair key + three 1-row aggregates;
    * N·(N−1)/2 fits BIGINT to N ≈ 4.3·10⁹ records. */
  def evaluateBlocking(records: DataFrame, idCol: String,
      candidates: DataFrame, goldPairs: DataFrame): DataFrame = {
    val n = records.select(col(idCol)).distinct().count()
    val totalPairs = n * (n - 1) / 2
    def norm(pairs: DataFrame): DataFrame = pairs
      .select(least(col("id_a"), col("id_b")).as("id_a"),
        greatest(col("id_a"), col("id_b")).as("id_b"))
      .filter(col("id_a") =!= col("id_b")).distinct()
    val cand = norm(candidates)
    val gold = norm(goldPairs)
    val covered = gold.join(cand, Seq("id_a", "id_b"), "left_semi")
    cand.agg(count(lit(1)).as("n_candidates"))
      .crossJoin(broadcast(gold.agg(count(lit(1)).as("n_gold"))))
      .crossJoin(broadcast(covered.agg(count(lit(1)).as("n_covered"))))
      .select(col("n_candidates"), col("n_gold"), col("n_covered"),
        (lit(totalPairs) - col("n_candidates")).cast("double")
          ./(lit(totalPairs).cast("double")).as("reduction_ratio"),
        when(col("n_gold") > 0, col("n_covered").cast("double") /
          col("n_gold").cast("double")).otherwise(lit(0.0))
          .as("pair_completeness"),
        when(col("n_candidates") > 0, col("n_covered").cast("double") /
          col("n_candidates").cast("double")).otherwise(lit(0.0))
          .as("pairs_quality"))
  }

  /** Sorted-neighborhood candidate generation (Hernández & Stolfo 1995,
    * SIGMOD, "The merge/purge problem for large databases") — the third
    * classic blocking family next to equi-key blocking ([[Cascade]]) and
    * LSH buckets ([[Dedup]]): sort all records by a fuzzy blocking key
    * and emit every pair whose positions in that order are less than
    * `window` apart. Near-duplicates with NO field exactly equal (so
    * equi-blocking misses them) still sort adjacently when the key is
    * chosen well, and the candidate count is exactly
    * (window−1)·n − C(window,2) — linear in n, never all-pairs.
    *
    * The global rank is computed WITHOUT a global window sort — the
    * [[Ranks.globalRowNumber]] machinery (range-repartition on
    * (key, id), local ranks, broadcast per-partition offsets; factored
    * out in r18 for the [[SuffixArray]] doubling loop). Candidate
    * emission is a `sequence(1, window−1)` explode +
    * ONE equi-join on the rank — no range/theta join, no cartesian.
    *
    * Determinism: (key, id) is a total order (ids unique by contract),
    * so the rank — and therefore the pair set — is independent of
    * partition count and boundary sampling; the q142 DuckDB twin
    * replays it with one `row_number`. NULL keys are dropped up front
    * (a NULL blocking key blocks nothing — and engines disagree on
    * NULL sort order, so excluding them is also what keeps the twin
    * exact). Output: (id_a, id_b, key_a, key_b) with rank(a) <
    * rank(b); feed [[evaluateBlocking]] to grade the key choice, or
    * [[scorePairs]] to score the candidates.
    *
    * Multi-pass practice: run once per key (name-prefix pass, postcode
    * pass, …) and union — each pass is this operator; the union's
    * distinct is the caller's (they may want pass provenance). */
  def sortedNeighborhood(records: DataFrame, idCol: String,
      keyCol: String, window: Int): DataFrame = {
    require(window >= 2, "window must cover at least adjacent records")
    val ranked = Ranks.globalRowNumber(
        records.select(col(idCol).as("id"), col(keyCol).as("__k"))
          .filter(col("__k").isNotNull),
        Seq(col("__k"), col("id")), out = "__r")
      .select(col("id"), col("__k"), col("__r"))
    val probe = ranked
      .select(col("id").as("id_a"), col("__k").as("key_a"), col("__r"),
        explode(sequence(lit(1L), lit((window - 1).toLong))).as("__d"))
      .select(col("id_a"), col("key_a"), (col("__r") + col("__d")).as("__r2"))
    probe.join(ranked.select(col("id").as("id_b"), col("__k").as("key_b"),
        col("__r").as("__r2")), Seq("__r2"))
      .select(col("id_a"), col("id_b"), col("key_a"), col("key_b"))
  }

  /** Mutual-best one-to-one assignment — the deterministic resolution
    * step after pair scoring: a scored pair (a, b) survives iff b is
    * a's best-scoring partner AND a is b's (the "symmetric best match"
    * rule, the relational stand-in for greedy/Hungarian assignment that
    * record-linkage systems apply so one source record can't claim two
    * targets). Mutual-best is ORDER-FREE — unlike greedy-by-score it
    * needs no sequential pass, so it distributes as two hash steps —
    * and its output is one-to-one by construction: a node's best
    * partner is unique (ties broken by highest score then SMALLEST
    * partner id, a total order), so each id appears in at most one
    * surviving pair.
    *
    * Input: unordered scored pairs (`id_a` < `id_b` as produced by
    * [[scorePairs]]); both orientations are considered for "best".
    * Output: (id_a, id_b, score) of the surviving pairs.
    *
    * Scale shape: one union (no shuffle), ONE hash aggregation on the
    * node id (`min_by` over a (−score, partner) struct — partial
    * map-side agg, no window sort), one self-equi-join of the per-node
    * best table against itself on the partner id. Cost ∝ pairs + nodes;
    * no all-pairs shape. Engine-portable: the tie-break is a total
    * order over exact values, so any engine replaying it (q128's
    * DuckDB twin uses `row_number`) lands on the identical pair set.
    * Ids may be ANY orderable type (numeric, string, …): only the
    * score — numeric by contract — is negated, never the id. */
  def mutualBestAssignment(scoredPairs: DataFrame,
      scoreCol: String = "score"): DataFrame = {
    val p = scoredPairs.select(col("id_a"), col("id_b"),
      col(scoreCol).as("__s"))
    val directed = p.unionByName(
      p.select(col("id_b").as("id_a"), col("id_a").as("id_b"),
        col("__s")))
    val best = directed
      .groupBy(col("id_a").as("node"))
      .agg(min_by(struct(col("id_b"), col("__s")),
        struct((-col("__s")).as("__ns"), col("id_b").as("__tb"))).as("bp"))
      .select(col("node"), col("bp.id_b").as("partner"),
        col("bp.__s").as("__s"))
    best.as("x")
      .join(best.as("y"),
        col("x.partner") === col("y.node") &&
          col("y.partner") === col("x.node") &&
          col("x.node") < col("y.node"))
      .select(col("x.node").as("id_a"), col("x.partner").as("id_b"),
        col("x.__s").as("score"))
  }
}
