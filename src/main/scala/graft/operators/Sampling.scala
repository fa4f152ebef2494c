package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.{BottomK, KmvSketch}

/** Deterministic sampling for training-data pipelines, built on the
  * [[graft.functions.BottomK]] bounded-state aggregate: sample = the k
  * rows with the smallest `xxhash64(id, seed)` — uniform, reproducible,
  * mergeable across partitions, and immune to the task-retry
  * re-execution hazards of `rand()`-based sampling.
  */
object Sampling {

  /** Global deterministic k-sample of id values. */
  def deterministicSample(df: DataFrame, idCol: String, k: Int,
      seed: Int = 42): DataFrame =
    df.agg(BottomK.bottom_k(
        xxhash64(col(idCol), lit(seed)), col(idCol), k).as("sample"))
      .select(explode(col("sample")).as("s"))
      .select(col("s.value").cast("long").as(idCol))

  /** Per-group deterministic k-sample (stratified). */
  def stratifiedSample(df: DataFrame, groupCol: String, idCol: String,
      k: Int, seed: Int = 42): DataFrame =
    stratifiedSampleByKey(df, groupCol, idCol, k,
      xxhash64(col(idCol), lit(seed)))

  /** Engine-portable deterministic sort key: the first 60 bits of
    * `md5("<id>:<seed>")`. Any md5-capable engine reproduces it
    * (`('0x'||substr(md5(id||':'||seed),1,15))::BIGINT` in DuckDB), which
    * lets an external oracle verify the sample exactly; `xxhash64` stays
    * the fast default key. Key collisions don't break parity: BottomK
    * orders by (key, value-as-string), so the oracle's
    * `ORDER BY key, id::VARCHAR` reproduces the pick even on a collision. */
  def portableKey(id: org.apache.spark.sql.Column, seed: Int): org.apache.spark.sql.Column =
    graft.functions.PortableHash.md5Long60(
      concat(id.cast("string"), lit(s":$seed")))

  /** Leakage-safe train/val/test split — the contamination guard a
    * training pipeline needs BEFORE splitting: near-duplicate documents
    * must never straddle a split boundary, or eval leaks (near-copies
    * of) training data. The split decision is therefore made per dedup
    * CLUSTER, not per document: near-dup pairs → connected components
    * ([[Components.dedupAssignments]]) → every member inherits its
    * cluster representative's assignment; unpaired docs are their own
    * singleton cluster.
    *
    * Assignment is md5-deterministic on (cluster id, seed) — retry-safe,
    * mergeable, engine-portable (the [[mixtureSample]] argument) — with
    * integer permille thresholds: bucket < testPermille → "test",
    * < testPermille+valPermille → "val", else "train". Expected mass is
    * permille-accurate over CLUSTERS (the atomic unit of assignment), so
    * realized doc-level ratios drift with cluster-size variance — the
    * price of leakage safety.
    *
    * Scale shape: components over the pair list (pairs are the tiny
    * output of a banded dedup screen, not the corpus), one left join
    * corpus←labels on id, then map-only hashing — nothing here touches
    * document payloads. */
  def leakageSafeSplit(corpus: DataFrame, idCol: String,
      pairs: DataFrame, aCol: String, bCol: String,
      valPermille: Int = 100, testPermille: Int = 100, seed: Int = 17,
      maxIter: Int = 10): DataFrame = {
    require(valPermille >= 0 && testPermille >= 0 &&
      valPermille + testPermille <= 1000,
      "permille thresholds must be nonnegative and sum to <= 1000")
    val bucket = portableKey(col("keep_id"), seed) % 1000
    Components.dedupAssignments(corpus, idCol, pairs, aCol, bCol, maxIter)
      .select(col("id").as(idCol), col("keep_id").as("cluster_id"),
        when(bucket < testPermille, "test")
          .when(bucket < testPermille + valPermille, "val")
          .otherwise("train").as("split"))
  }

  /** Leakage-safe k-fold assignment — [[leakageSafeSplit]]'s
    * contamination guard applied to cross-validation: every near-dup
    * CLUSTER (not document) draws one md5-deterministic fold in 0..k−1,
    * so no fold ever holds a near-copy of another fold's data. Same
    * plan shape and portability as the 3-way split; fold mass is
    * 1/k-accurate over clusters. */
  def leakageSafeFolds(corpus: DataFrame, idCol: String,
      pairs: DataFrame, aCol: String, bCol: String,
      k: Int, seed: Int = 23, maxIter: Int = 10): DataFrame = {
    require(k >= 2, "need at least 2 folds")
    Components.dedupAssignments(corpus, idCol, pairs, aCol, bCol, maxIter)
      .select(col("id").as(idCol), col("keep_id").as("cluster_id"),
        (portableKey(col("keep_id"), seed) % k).as("fold"))
  }

  /** Per-group bottom-k by an arbitrary deterministic key column. */
  def stratifiedSampleByKey(df: DataFrame, groupCol: String, idCol: String,
      k: Int, key: org.apache.spark.sql.Column): DataFrame =
    df.groupBy(col(groupCol))
      .agg(BottomK.bottom_k(key, col(idCol), k).as("sample"))
      .select(col(groupCol), explode(col("sample")).as("s"))
      .select(col(groupCol), col("s.value").cast("long").as(idCol))

  /** Deterministic source-mixture sampling — the training-data "mixing"
    * primitive (sample each source at its target rate to hit a corpus
    * recipe, as in The Pile / Dolma): keep a row iff
    * `portableKey(id, seed) mod resolution < floor(rate(group)·resolution)`.
    *
    * Purely map-side (no shuffle, no `rand()` re-execution hazard): the
    * keep decision is a deterministic function of (id, seed), so retries,
    * re-runs, and an external oracle all select the identical subset, and
    * the realized rate converges to the target at 1/sqrt(n) per source.
    * Rates are resolved to integer thresholds once on the driver; unknown
    * groups drop (threshold 0). */
  def mixtureSample(df: DataFrame, idCol: String, groupCol: String,
      rates: Map[String, Double], seed: Int = 7,
      resolution: Long = 1000000L): DataFrame = {
    require(rates.values.forall(r => r >= 0.0 && r <= 1.0),
      "rates must be in [0, 1]")
    val thresholds = rates.map { case (g, r) =>
      g -> math.floor(r * resolution).toLong }
    val thresholdExpr = thresholds.foldLeft(lit(0L)) { case (acc, (g, t)) =>
      when(col(groupCol) === lit(g), lit(t)).otherwise(acc) }
    df.filter(portableKey(col(idCol), seed) % resolution < thresholdExpr)
  }

  /** Training-mix PLANNING — the step before [[mixtureSample]]: given
    * per-domain token inventories, target mixture weights, and a total
    * token budget (the Pile/Dolma/DoReMi recipe inputs), compute what
    * each domain must contribute and HOW — a sampling rate for
    * over-represented domains, an epoch count for under-represented
    * ones (the standard up-sampling-by-repetition practice). Feed the
    * `sample_rate` column to [[mixtureSample]] and the plan executes.
    *
    * Exact integer arithmetic: weights are PARTS PER MILLION (the
    * [[mixtureSample]] resolution), and the target
    * `floor(budget·ppm/10⁶)` is computed as
    * `(budget DIV 10⁶)·ppm + ((budget MOD 10⁶)·ppm) DIV 10⁶` — the
    * exact same floor, overflow-safe across the whole BIGINT budget
    * range (a 25-trillion-token 100 TB budget multiplied by a ppm
    * weight would overflow the naive product). The only doubles are
    * the final `sample_rate` division and nothing else; `epochs` is
    * an exact ceiling DIV.
    *
    * Domains missing from `weightsPpm` plan to zero (target 0, rate 0,
    * epochs 0) — an explicit "not in the recipe" row rather than a
    * silent drop. Weights for domains absent from the inventory have
    * nothing to plan and are ignored; callers validating a recipe
    * should check Σ target vs budget downstream (an empty domain
    * contributes nothing regardless of its weight).
    *
    * Scale shape: input is the per-domain aggregate (domains rows, not
    * corpus rows); weights fold in as a literal CASE chain (the
    * [[mixtureSample]] threshold pattern); the whole plan is one
    * map over that tiny frame — zero shuffles beyond whatever built
    * the inventory. */
  def mixturePlan(domainTokens: DataFrame, domainCol: String,
      tokensCol: String, weightsPpm: Map[String, Long],
      budgetTokens: Long): DataFrame = {
    require(budgetTokens >= 0, "budget must be nonnegative")
    require(weightsPpm.values.forall(w => w >= 0L && w <= 1000000L),
      "weights must be ppm in [0, 1e6]")
    require(weightsPpm.values.sum <= 1000000L,
      s"weights sum to ${weightsPpm.values.sum} ppm > 1e6 — not a mixture")
    val ppmExpr = weightsPpm.foldLeft(lit(0L)) { case (acc, (g, w)) =>
      when(col(domainCol) === lit(g), lit(w)).otherwise(acc) }
    val q = budgetTokens / 1000000L
    val r = budgetTokens % 1000000L
    domainTokens
      .select(col(domainCol), col(tokensCol).cast("long").as("n_tokens"),
        ppmExpr.as("weight_ppm"))
      .select(col(domainCol), col("n_tokens"), col("weight_ppm"),
        (lit(q) * col("weight_ppm") +
          expr(s"(${r}L * weight_ppm) DIV 1000000")).as("target_tokens"))
      .select(col(domainCol), col("n_tokens"), col("weight_ppm"),
        col("target_tokens"),
        when(col("n_tokens") === 0L, lit(0.0))
          .otherwise(least(lit(1.0), col("target_tokens").cast("double") /
            col("n_tokens").cast("double"))).as("sample_rate"),
        when(col("n_tokens") === 0L, lit(0L))
          .otherwise(expr(
            "(target_tokens + n_tokens - 1) DIV n_tokens"))
          .as("epochs"))
  }

  /** Temperature-scaled mixture plan — the multilingual sampling
    * standard (the p_i ∝ n_i^α rule of XLM-R / mT5, Conneau et al.
    * 2020 §3.1): each group's share of the token budget is
    * proportional to its inventory raised to α, flattening the mix —
    * at α = 1/2 a 100× bigger language gets 10× the target, at 1/4
    * about 3.2×. The library's THIRD mixture strategy, between
    * explicit recipe weights ([[mixturePlan]]) and UniMax
    * waterfilling ([[tokenBudgetAllocate]]).
    *
    * EXACT and engine-portable by construction: α is restricted to
    * {1/2, 1/4} so the scaling is one or two IEEE `sqrt`s —
    * correctly-rounded REQUIRED ops (unlike pow/log) — and the scaled
    * weight is floor-quantized to a BIGINT (`s_q = floor(sqrt^k(n)·
    * quant)`), after which every share is integer arithmetic:
    * `target_i = budget·s_q_i DIV Σs_q` in arbitrary precision
    * (driver `BigInt`; the DuckDB twin uses HUGEINT — both truncate
    * identically on nonnegative operands). Runs DRIVER-SIDE over the
    * #groups-row inventory (the model-state boundary, the
    * [[tokenBudgetAllocate]] totals convention — a mixture plan's
    * input is per-language totals, never rows).
    *
    * @param domainTokens pre-aggregated inventory: one row per group
    * @return (domainCol, n_tokens, s_q, target_tokens, sample_rate,
    *         epochs) */
  def temperaturePlan(domainTokens: DataFrame, domainCol: String,
      tokensCol: String, budgetTokens: Long, alphaHalvings: Int = 1,
      quant: Long = 1000000L): DataFrame = {
    require(budgetTokens >= 0, "budget must be nonnegative")
    require(alphaHalvings >= 1 && alphaHalvings <= 2,
      "alphaHalvings in {1, 2}: alpha = 1/2 or 1/4")
    require(quant >= 1, "quant must be positive")
    val spark = domainTokens.sparkSession
    import spark.implicits._
    val rows = domainTokens
      .select(col(domainCol).cast("string"), col(tokensCol).cast("long"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
      .sortBy(_._1)
    val sq = rows.map { case (_, n) =>
      require(n >= 0, s"negative inventory for a group: $n")
      var s = math.sqrt(n.toDouble)
      if (alphaHalvings == 2) s = math.sqrt(s)
      math.floor(s * quant.toDouble).toLong
    }
    val total = sq.map(BigInt(_)).sum
    rows.zip(sq).map { case ((g, n), s) =>
      val target =
        if (total == 0) 0L
        else ((BigInt(budgetTokens) * s) / total).toLong
      val rate =
        if (n == 0L) 0.0
        else math.min(1.0, target.toDouble / n.toDouble)
      val epochs = if (n == 0L) 0L else (target + n - 1) / n
      (g, n, s, target, rate, epochs)
    }.toSeq.toDF(domainCol, "n_tokens", "s_q", "target_tokens",
      "sample_rate", "epochs")
  }

  /** UniMax-style token-budget allocation (Chung et al. 2023, "UniMax:
    * Fairer and More Effective Language Sampling for Large-Scale
    * Multilingual Pretraining"): split a total token budget across
    * groups (languages/domains) by integer WATERFILLING — low-resource
    * groups are taken whole, and their unused share redistributes
    * across the rest, round by round, until every surviving group gets
    * the equal share — then fill each group's budget greedily with
    * whole docs in deterministic md5 order ([[portableKey]]).
    *
    * Exact integer arithmetic throughout: each round's share is
    * `remaining DIV pending` (the ≤ pending−1 remainder tokens of the
    * final share stay unallocated — deterministic, documented); rounds
    * ≤ #groups since every round either retires a group or terminates.
    * Group totals are a #groups-row driver collect (the model-state
    * boundary); the greedy fill is ONE [[Packing.assignShards]]-style
    * two-phase scan with a GROUP axis — range-partitioned on
    * (group, md5-order), per-(partition, group) subtotals to the
    * driver, windows partitioned by (partition, group) — so the corpus
    * is read once regardless of the group count (never #groups filter
    * passes) and no window task ever holds a whole language
    * (at 100 TB one language IS the corpus).
    *
    * @return one row per doc: (idCol, groupCol, n_tokens,
    *         group_budget, tok_offset, kept) — `kept` iff the doc fits
    *         entirely within its group's remaining budget at its md5
    *         position. Empty input → empty output (same schema). */
  def tokenBudgetAllocate(docs: DataFrame, groupCol: String,
      tokenCol: String, idCol: String, budgetTokens: Long,
      seed: Int = 13): DataFrame = {
    require(budgetTokens >= 0, "budget must be nonnegative")
    val spark = docs.sparkSession
    import spark.implicits._
    val totals = docs.groupBy(col(groupCol).cast("string").as("__g"))
      .agg(sum(col(tokenCol).cast("long")).as("__t"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
      .sortBy(_._1)
    var remaining = budgetTokens
    var pending = totals.toList
    val alloc = scala.collection.mutable.Map.empty[String, Long]
    while (pending.nonEmpty) {
      val share = remaining / pending.size
      val (small, big) = pending.partition(_._2 <= share)
      if (small.isEmpty) {
        big.foreach { case (g, _) => alloc(g) = share }
        remaining -= share * big.size
        pending = Nil
      } else {
        small.foreach { case (g, t) => alloc(g) = t; remaining -= t }
        pending = big
      }
    }
    val allocDf = alloc.toSeq.sortBy(_._1)
      .toDF("__g", "group_budget")
    // ONE two-phase prefix scan over all groups (the assignShards
    // algorithm with a group dimension): contiguous (group, order-key)
    // ranges per partition, pid pinned by materializing.
    val parts = spark.sessionState.conf.numShufflePartitions
    val parted = docs
      .select(col(idCol), col(tokenCol).cast("long").as("__tok"),
        col(groupCol).cast("string").as("__g"),
        portableKey(col(idCol), seed).as("__ord"))
      .repartitionByRange(parts, col("__g"), col("__ord"), col(idCol))
      .withColumn("__pid", spark_partition_id())
      .localCheckpoint(false)
    // per-(pid, group) subtotals — ≤ partitions + #groups cells (each
    // range partition spans at most a few group boundaries) — prefix-
    // summed into per-group exclusive offsets on the driver
    val subtotals = parted.groupBy(col("__pid"), col("__g"))
      .agg(sum(col("__tok")).as("__t"))
      .collect()
      .map(r => (r.getAs[Int]("__pid"), r.getAs[String]("__g"),
        r.getAs[Long]("__t")))
    val offsets = subtotals.groupBy(_._2).toSeq.flatMap {
      case (g, cells) =>
        val byPid = cells.sortBy(_._1)
        byPid.map(_._1).zip(
          byPid.map(_._3).scanLeft(0L)(_ + _).init)
          .map { case (pid, off) =>
            org.apache.spark.sql.Row(pid, g, off) }
    }
    val offSchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("__pid",
        org.apache.spark.sql.types.IntegerType, nullable = false),
      org.apache.spark.sql.types.StructField("__g",
        org.apache.spark.sql.types.StringType, nullable = true),
      org.apache.spark.sql.types.StructField("__off",
        org.apache.spark.sql.types.LongType, nullable = false)))
    val offsetsDf = spark.createDataFrame(
      spark.sparkContext.parallelize(offsets, 1), offSchema)
    val win = org.apache.spark.sql.expressions.Window
      .partitionBy(col("__pid"), col("__g"))
      .orderBy(col("__ord"), col(idCol))
      .rowsBetween(
        org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    parted
      .join(broadcast(offsetsDf), Seq("__pid", "__g"))
      .withColumn("tok_offset",
        sum(col("__tok")).over(win) + col("__off") - col("__tok"))
      .join(broadcast(allocDf), Seq("__g"))
      .select(col(idCol), col("__g").as(groupCol),
        col("__tok").as("n_tokens"), col("group_budget"),
        col("tok_offset"),
        (col("tok_offset") + col("__tok") <= col("group_budget"))
          .as("kept"))
  }

  /** Per-group approximate distinct count via the [[KmvSketch]] bounded
    * k-minimum-values sketch: exact when the group holds < k distinct
    * values (the sketch simply contains them all), otherwise the standard
    * KMV estimator (k-1)·2^60 / R_k with ~1/sqrt(k-2) relative error.
    * The `exact_distinct` column is the verification twin (an exact
    * distinct aggregate) — at 100 TB you'd emit only the sketch columns
    * and skip that shuffle-heavy exact pass. */
  def kmvDistinct(df: DataFrame, groupCol: String, valueCol: String,
      k: Int, seed: Int = 42): DataFrame = {
    // (k-1)·2^60 as one exact double literal (63·2^60 has a 6-bit
    // mantissa) — the oracle SQL embeds the identical literal
    val numer = (k - 1).toDouble * math.pow(2, 60)
    df.groupBy(col(groupCol))
      .agg(
        KmvSketch.kmv_sketch(portableKey(col(valueCol), seed), k).as("__sk"),
        countDistinct(col(valueCol)).as("exact_distinct"))
      .select(col(groupCol),
        col("exact_distinct"),
        size(col("__sk")).cast("long").as("sketch_size"),
        when(size(col("__sk")) < k, size(col("__sk")).cast("double"))
          .otherwise(lit(numer) / element_at(col("__sk"), k).cast("double"))
          .as("est_distinct"))
  }

  /** Uniform-share resampling across groups — the "balance the language
    * / domain mix" pass of a training-data pipeline, supporting BOTH
    * down-sampling (weight < 1) and up-sampling (weight > 1, docs
    * repeated): each group's target size is `grand_total / n_groups`
    * units of `sizeCol`, its weight w = target / group_total, and every
    * row is emitted `floor(w)` times plus one more with md5-Bernoulli
    * probability `frac(w)` — in expectation every group contributes the
    * same unit volume. Returns (id, group, rep) with rep = 1..copies.
    *
    * Deterministic end-to-end: the weight is a fixed chain of IEEE
    * divisions of exact integer totals, the Bernoulli draw is the
    * [[portableKey]] md5 residue against `floor(frac(w)·resolution)` —
    * an external engine reproduces the exact copy count per row.
    *
    * Scale shape: one narrow per-group agg (a handful of rows),
    * broadcast back; the selection/explode is map-only and output-bounded
    * (≤ ceil(w) rows per input row). No corpus-sized shuffle. */
  def balancedResample(df: DataFrame, groupCol: String, sizeCol: String,
      idCol: String, seed: Int = 7,
      resolution: Long = 1000000L): DataFrame = {
    val totals = df.groupBy(col(groupCol)).agg(sum(col(sizeCol)).as("__t"))
    val grand = totals.agg(sum(col("__t")).as("__g"),
      count(lit(1)).as("__n"))
    // (g / n) / t — written with the same association in the oracle SQL
    val w = (col("__g").cast("double") / col("__n").cast("double")) /
      col("__t").cast("double")
    val wf = floor(w) // LongType in Spark; the oracle casts its floor()
    val copies = wf +
      when(portableKey(col(idCol), seed) % resolution <
        floor((w - wf.cast("double")) * resolution.toDouble).cast("long"),
        1L).otherwise(0L)
    df.join(broadcast(totals), groupCol)
      .crossJoin(broadcast(grand))
      .withColumn("__copies", copies)
      .filter(col("__copies") > 0)
      .select(col(idCol), col(groupCol),
        explode(sequence(lit(1L), col("__copies"))).as("rep"))
  }

  /** Priority sampling (Duffield, Lund & Thorup, "Priority sampling for
    * estimation of arbitrary subset sums", JACM 2007) — weighted
    * sampling WITHOUT replacement with unbiased subset-sum estimation,
    * the importance-weighted cousin of [[deterministicSample]]: item i
    * draws uniform u_i ∈ (0,1] and gets priority q_i = w_i / u_i; the
    * sample is the k highest priorities, the threshold τ is the
    * (k+1)-th, and every sampled item carries estimator weight
    * max(w_i, τ) — E[Σ_sample max(w,τ)·1(i∈S)] = Σ w_i exactly, for
    * ANY subset. The pipeline use: subsample a corpus by
    * quality/length weight while keeping downstream token-count
    * estimates unbiased.
    *
    * Deterministic and engine-portable: u_i is the [[portableKey]] md5
    * residue, `(h+1) / 2^60`, and the priority is a fixed two-division
    * IEEE shape over exact integers — an external engine replays the
    * identical doubles (q130's DuckDB twin). Ties (identical priority)
    * break on smaller id: a total order.
    *
    * Scale shape: priorities are map-only; the top-(k+1) runs as
    * TakeOrderedAndProject — each partition keeps k+1 rows, the driver
    * merges P·(k+1) — no global sort, no shuffle. τ is a one-row
    * broadcast. Driver state is O(k): the same budget class as the
    * quantile boundaries. Weights must be positive (rows with NULL or
    * non-positive weight are rejected up front — silently dropping
    * them would bias the estimator).
    *
    * @return (id, weight, priority, est_weight), the k sampled rows */
  def prioritySample(df: DataFrame, idCol: String, weightCol: String,
      k: Int, seed: Int = 7): DataFrame = {
    require(k >= 1, "k must be positive")
    val pri = df.select(col(idCol).as("id"),
        col(weightCol).cast("double").as("weight"))
      // reject NULL / non-positive weights up front: a NULL weight would
      // yield a NULL priority (silently ranked last), a w ≤ 0 a
      // non-positive priority that can still be drawn — either biases
      // the subset-sum estimator the docstring promises is unbiased
      .filter(col("weight").isNotNull && col("weight") > 0.0)
      .withColumn("priority",
        col("weight") /
          ((portableKey(col("id"), seed) + lit(1L)).cast("double") /
            lit(1152921504606846976.0))) // 2^60
    // TakeOrderedAndProject: per-partition top-(k+1), driver merge
    val top = pri.orderBy(col("priority").desc, col("id").asc)
      .limit(k + 1)
    // rank the ≤ k+1 survivors via ONE packed sorted array (the
    // Ranks.runningOffsets idiom) instead of an unpartitioned window:
    // the input is bounded at k+1 rows, but WindowExec still plans a
    // single-partition sort and fires the global-window warning the
    // r21 suite-wide sweep forbids. Priorities are strictly positive
    // (weight > 0, u ≥ 2⁻⁶⁰), so negation gives the exact descending
    // order with the same id tie-break; ranks — and the hash — are
    // identical to the window form's.
    val ranked = top
      .agg(sort_array(collect_list(struct(
        (-col("priority")).as("__np"), col("id").as("id"),
        col("weight").as("weight"), col("priority").as("priority"))))
        .as("__a"))
      .select(posexplode(col("__a")).as(Seq("__i", "__x")))
      .select(col("__x.id").as("id"), col("__x.weight").as("weight"),
        col("__x.priority").as("priority"),
        (col("__i") + 1).as("__rn"))
    val tau = ranked.agg(
      coalesce(max(when(col("__rn") === k + 1, col("priority"))),
        lit(0.0)).as("__tau"))
    ranked.filter(col("__rn") <= k)
      .crossJoin(broadcast(tau))
      .select(col("id"), col("weight"), col("priority"),
        greatest(col("weight"), col("__tau")).as("est_weight"))
  }

  /** Per-group [[prioritySample]]: k rows WITHOUT replacement from EVERY
    * group, each row carrying the group-local unbiased subset-sum
    * estimator weight max(w, τ_g) with τ_g the group's (k+1)-th priority
    * (0 when a group has ≤ k weighted rows, collapsing the estimator to
    * the true weight). The stratified form of the corpus-subsampling
    * use: cap every language/source/domain at k docs while keeping
    * per-group token-total estimates unbiased — where the global form
    * would let one giant group crowd out the rest.
    *
    * Same deterministic md5 priorities and NULL/non-positive-weight
    * rejection as [[prioritySample]]; identical doubles in an external
    * replay (q132's DuckDB twin).
    *
    * Scale shape: ONE shuffle (hash on the group) + per-group
    * in-partition rank — no global sort, no driver merge; τ_g comes
    * from the already-ranked rows by a group-keyed aggregation that
    * reuses the window's partitioning (no second shuffle), joined back
    * group-keyed. Memory per task ∝ its groups' rows, the usual
    * window-function bound (salt pathological megagroups BEFORE
    * sampling if one group dominates a partition).
    *
    * @return (group, id, weight, priority, est_weight) — k rows per
    *         group (fewer where the group is smaller) */
  def prioritySampleByGroup(df: DataFrame, groupCol: String,
      idCol: String, weightCol: String, k: Int,
      seed: Int = 7): DataFrame = {
    require(k >= 1, "k must be positive")
    val pri = df.select(col(groupCol).as("grp"), col(idCol).as("id"),
        col(weightCol).cast("double").as("weight"))
      .filter(col("weight").isNotNull && col("weight") > 0.0)
      .withColumn("priority",
        col("weight") /
          ((portableKey(col("id"), seed) + lit(1L)).cast("double") /
            lit(1152921504606846976.0))) // 2^60
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("grp"))
      .orderBy(col("priority").desc, col("id").asc)
    val ranked = pri.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= k + 1)
    val tau = ranked.groupBy(col("grp"))
      .agg(coalesce(max(when(col("__rn") === k + 1, col("priority"))),
        lit(0.0)).as("__tau"))
    ranked.filter(col("__rn") <= k)
      .join(tau, Seq("grp"))
      .select(col("grp").as(groupCol), col("id"), col("weight"),
        col("priority"),
        greatest(col("weight"), col("__tau")).as("est_weight"))
  }

  /** Poisson(1) CDF × 10⁶, floored — the integer thresholds both
    * engines compare against (identical literals, so the per-row weight
    * is exact). Mass beyond 7 (≈ 10⁻⁵) caps at weight 7. */
  val poissonCdf6: Seq[Long] =
    Seq(367879L, 735758L, 919698L, 981011L, 996340L, 999405L, 999916L)

  /** Poisson bootstrap — the SINGLE-PASS resampling scheme for
    * uncertainty on corpus metrics at scale (Chamandy, Muralidharan,
    * Najmi & Naidu 2012, Google tech report, "Estimating uncertainty
    * for massive data streams"): instead of B with-replacement
    * resamples (B corpus shuffles), every row draws B independent
    * Poisson(1) WEIGHTS — the multinomial resample count's limit —
    * and each replicate b aggregates Σ w_b·x in the same pass. One
    * explode(B) + one hash agg over the corpus; output is B rows.
    *
    * Weights are deterministic md5 draws against [[poissonCdf6]]
    * integer thresholds — exact and engine-replayable (q173), so the
    * bootstrap itself is hash-verified, not just spot-checked. The
    * replicate means' spread IS the sampling distribution: report
    * their percentiles as the CI.
    *
    * @return (replicate, n_eff, value_sum, mean) — n_eff the total
    *         resampled weight, mean one double division of exact
    *         BIGINTs */
  def poissonBootstrap(df: DataFrame, valueCol: String, idCol: String,
      replicates: Int = 32, seedTag: String = "boot"): DataFrame = {
    require(replicates >= 1, "need at least one replicate")
    val cdf = typedlit(poissonCdf6)
    val u = graft.functions.PortableHash.md5Long60(
      concat(col(idCol).cast("string"), lit(":"), col("replicate"),
        lit(s":$seedTag"))) % 1000000L
    df.select(col(idCol), col(valueCol).cast("long").as("__v"),
        explode(sequence(lit(0), lit(replicates - 1))).as("replicate"))
      .withColumn("__w",
        size(filter(cdf, c => c <= u)).cast("long"))
      .groupBy(col("replicate").cast("long").as("replicate"))
      .agg(sum(col("__w")).as("n_eff"),
        sum(col("__w") * col("__v")).as("value_sum"))
      .select(col("replicate"), col("n_eff"), col("value_sum"),
        (col("value_sum").cast("double") / col("n_eff").cast("double"))
          .as("mean"))
  }
}
