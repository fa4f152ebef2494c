package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Targeted data selection for training-mix construction.
  *
  * [[targetAffinity]] is the relational core of DSIR (Xie et al. 2023,
  * "Data Selection for Language Models via Importance Resampling",
  * arXiv:2302.03169): rank a raw candidate pool by similarity to a small
  * TARGET (seed) corpus through hashed word features. DSIR proper scores
  * the log-likelihood ratio of two hashed n-gram bag models; this
  * variant keeps the identical pipeline shape — hash features into
  * `nBuckets`, aggregate the target profile, score each candidate
  * against it — but the score is the exact integer bilinear affinity
  * Σ_b count_doc(b)·count_target(b), so the whole selection decision is
  * engine-reproducible (md5 feature hashing, BIGINT arithmetic; the only
  * double is one final normalization divide of exact integers — the q68
  * argument).
  *
  * Scale shape: tokenization is map-only; candidate features shuffle as
  * (doc, bucket, count) partial-aggregated rows; the target profile is
  * at most `nBuckets` rows, built by a distributed aggregation and
  * BROADCAST back — nothing reaches the driver; the scoring join is an
  * equi-join on the bucket id. At 100 TB the target corpus is the small
  * curated seed (DSIR's setting), so the profile stays tiny by
  * construction.
  */
object Selection {

  /** Moore–Lewis cross-entropy-difference selection (Moore & Lewis
    * 2010, ACL, "Intelligent selection of language model training
    * data"): train one Kneser–Ney trigram model on an IN-DOMAIN
    * reference and one on a GENERAL reference
    * ([[TextAnalysis.knTrigramModel]]), score the same candidate
    * documents with both, and select where the in-domain model finds
    * the text likelier. Both scores are the engine's exact-replay
    * quantized KN sums; the candidate trigram set is identical on
    * both sides, so the SUM difference orders documents exactly like
    * the per-trigram mean difference (the paper's per-word
    * cross-entropy difference, sign-flipped: probabilities, not
    * entropies).
    *
    * Scale shape: two independent KN train/score passes (chained
    * hash-aggs + natural-key shuffle joins, no broadcast assumption —
    * see [[TextAnalysis.knTrigramGate]]) and one final doc-keyed
    * join. Docs with < 3 tokens carry no trigram and are absent (the
    * KN contract).
    *
    * @return (id, n_trigrams, kn_in, kn_gen, ml_diff, selected) */
  def mooreLewisSelect(candidates: DataFrame, refInDomain: DataFrame,
      refGeneral: DataFrame, textCol: String, idCol: String,
      quant: Long = 1000000L): DataFrame = {
    val mIn = TextAnalysis.knTrigramModel(refInDomain, textCol)
    val mGen = TextAnalysis.knTrigramModel(refGeneral, textCol)
    val sIn = TextAnalysis
      .knTrigramScore(candidates, mIn, textCol, idCol, quant)
      .select(col(idCol), col("n_trigrams"), col("kn_sum").as("kn_in"))
    val sGen = TextAnalysis
      .knTrigramScore(candidates, mGen, textCol, idCol, quant)
      .select(col(idCol), col("kn_sum").as("kn_gen"))
    sIn.join(sGen, Seq(idCol))
      .select(col(idCol), col("n_trigrams"), col("kn_in"),
        col("kn_gen"), (col("kn_in") - col("kn_gen")).as("ml_diff"),
        (col("kn_in") > col("kn_gen")).as("selected"))
  }

  /** Per-candidate affinity to the target profile. `isTarget` marks the
    * seed rows (scored rows are the complement). Output:
    * (doc_id, n_tokens, affinity, rel_affinity) — `rel_affinity` the
    * length-normalized score to rank by; token-less docs contribute no
    * features and are absent. */
  def targetAffinity(
      docs: DataFrame, textCol: String, idCol: String,
      isTarget: Column, nBuckets: Int = 4096): DataFrame = {
    require(nBuckets >= 1, "nBuckets must be >= 1")
    val norm = trim(regexp_replace(col(textCol), "[ \\t\\n\\x0B\\f\\r]+", " "))
    val toks = docs.select(col(idCol).as("doc_id"), isTarget.as("__tgt"),
        explode(split(norm, " ")).as("__w"))
      .filter(col("__w") =!= "")
      .select(col("doc_id"), col("__tgt"),
        (graft.functions.PortableHash.md5Long60(col("__w")) % nBuckets)
          .as("bucket"))
    val target = toks.filter(col("__tgt"))
      .groupBy(col("bucket")).agg(count(lit(1)).as("__tcount"))
    val cand = toks.filter(!col("__tgt"))
      .groupBy(col("doc_id"), col("bucket"))
      .agg(count(lit(1)).as("__c"))
    cand.join(broadcast(target), Seq("bucket"), "left")
      .groupBy(col("doc_id"))
      .agg(sum(col("__c")).as("n_tokens"),
        sum(col("__c") * coalesce(col("__tcount"), lit(0L))).as("affinity"))
      .select(col("doc_id"), col("n_tokens"), col("affinity"),
        (col("affinity").cast("double") / col("n_tokens").cast("double"))
          .as("rel_affinity"))
  }

  /** Two-distribution importance scoring — the piece of DSIR that
    * [[targetAffinity]]'s single-profile affinity lacks: each candidate
    * is scored by how much more likely its hashed word features are
    * under the TARGET distribution than under a RAW-REFERENCE
    * distribution, so features that are merely common everywhere (stop
    * words, boilerplate) cancel instead of dominating. DSIR proper sums
    * log p_t/p_r per feature (a geometric-mean ratio); logs aren't
    * bit-portable across engines, so this scores the ARITHMETIC mean of
    * the per-bucket likelihood ratios — same monotone signal per
    * bucket, weight clipping built in (importance-sampling practice),
    * and every step exact BIGINT (the no-libm transform convention of
    * [[graft.operators.Linkage]]).
    *
    * Per bucket b, with T/R total target/reference tokens, nB buckets:
    *
    *   pt_b = (quant·(tcount_b+1)) DIV (T+nB)   — Laplace-smoothed,
    *   pr_b = (quant·(rcount_b+1)) DIV (R+nB)     quantized probability
    *   ρ_b  = (quant·(pt_b+1)) DIV (pr_b+1)     — quantized ratio,
    *                                              self-clipped ≤ quant²
    *
    * A doc's `ratio_sum` is Σ over its token occurrences of ρ_bucket;
    * `mean_ratio` = ratio_sum / (n_tokens·quant) ≈ the mean p_t/p_r
    * (≈1 target-indifferent, >1 target-like) — the ONE final double
    * division. Overflow bound: quant·(count+1) needs
    * (T+nB) < 2⁶³/quant — at the default quant 10⁵, ~9·10¹³ tokens,
    * past any single profile build (hash-sample the profiles beyond).
    *
    * Scale shape: both profiles are ≤ nBuckets rows built by partial
    * aggregation and BROADCAST; candidate work is one map + one
    * (doc, bucket) partial agg + a broadcast equi-join on the bucket —
    * identical to [[targetAffinity]], plus the second broadcast
    * profile. Selection is the caller's: rank by `mean_ratio` and take
    * the token budget ([[graft.operators.Sampling.prioritySample]]
    * with these as weights is Gumbel-free importance resampling). */
  def importanceRatio(
      docs: DataFrame, textCol: String, idCol: String,
      isTarget: Column, isReference: Column,
      nBuckets: Int = 4096, quant: Long = 100000L,
      bigrams: Boolean = false): DataFrame = {
    require(nBuckets >= 1, "nBuckets must be >= 1")
    require(quant > 0, "quant must be positive")
    val norm = trim(regexp_replace(col(textCol), "[ \\t\\n\\x0B\\f\\r]+", " "))
    // `bigrams = true` is DSIR's actual feature space (hashed unigrams
    // ∪ bigrams, Xie et al. §2.2): bigram grams are "w1 w2" strings
    // hashed through the same md5 bucket map, so order information
    // enters the profiles. Default stays unigram (the q145 contract).
    val base = docs.select(col(idCol).as("doc_id"), isTarget.as("__tgt"),
      isReference.as("__ref"), split(norm, " ").as("__a"))
    val uni = base.select(col("doc_id"), col("__tgt"), col("__ref"),
        explode(col("__a")).as("__g"))
      .filter(col("__g") =!= "")
    val grams = if (!bigrams) uni else uni.unionByName(
      base.filter(size(col("__a")) >= 2)
        .select(col("doc_id"), col("__tgt"), col("__ref"),
          explode(transform(sequence(lit(0), size(col("__a")) - 2),
            i => concat_ws(" ", element_at(col("__a"), i + 1),
              element_at(col("__a"), i + 2)))).as("__g")))
    val toks = grams
      .select(col("doc_id"), col("__tgt"), col("__ref"),
        (graft.functions.PortableHash.md5Long60(col("__g")) % nBuckets)
          .as("bucket"))
    def profile(flag: Column, cname: String): DataFrame = toks.filter(flag)
      .groupBy(col("bucket")).agg(count(lit(1)).as(cname))
    val target = profile(col("__tgt"), "__tc")
    val ref = profile(col("__ref"), "__rc")
    val totT = target.agg(coalesce(sum(col("__tc")), lit(0L)).as("__T"))
    val totR = ref.agg(coalesce(sum(col("__rc")), lit(0L)).as("__R"))
    // ρ per bucket: dense over the bucket space via a full-outer join of
    // the two (tiny) profiles — a bucket absent from one side smooths to
    // count 0, exactly as the formulas prescribe
    val rho = target.join(ref, Seq("bucket"), "full_outer")
      .crossJoin(broadcast(totT)).crossJoin(broadcast(totR))
      .select(col("bucket"),
        expr(s"($quant * ((coalesce(__tc, 0) + 1) * $quant DIV " +
          s"(__T + $nBuckets) + 1)) DIV " +
          s"((coalesce(__rc, 0) + 1) * $quant DIV (__R + $nBuckets) + 1)")
          .as("__rho"))
    // candidates = every non-target doc; reference membership does NOT
    // exclude a doc from scoring (DSIR's usual setting has the raw pool
    // BE the reference corpus)
    val cand = toks.filter(!col("__tgt"))
      .groupBy(col("doc_id"), col("bucket"))
      .agg(count(lit(1)).as("__c"))
    // a candidate bucket with NO profile row (neither corpus hit it)
    // smooths to ρ = (quant·1) DIV 1 · ... — compute the same default
    // the formulas give for tcount=rcount=0 rather than dropping tokens
    val defaultRho = totT.crossJoin(broadcast(totR))
      .select(expr(s"($quant * (1 * $quant DIV (__T + $nBuckets) + 1)) " +
        s"DIV (1 * $quant DIV (__R + $nBuckets) + 1)").as("__rho0"))
    cand.join(broadcast(rho), Seq("bucket"), "left")
      .crossJoin(broadcast(defaultRho))
      .groupBy(col("doc_id"))
      .agg(sum(col("__c")).as("n_tokens"),
        sum(col("__c") * coalesce(col("__rho"), col("__rho0")))
          .as("ratio_sum"))
      .select(col("doc_id"), col("n_tokens"), col("ratio_sum"),
        (col("ratio_sum").cast("double") /
          (col("n_tokens") * lit(quant)).cast("double")).as("mean_ratio"))
  }

  /** Greedy k-center selection (Gonzalez 1985, "Clustering to minimize
    * the maximum intercluster distance" — the classic farthest-point
    * 2-approximation): pick a deterministic md5-keyed seed, then k−1
    * times add the point FARTHEST from the current center set. The
    * selected centers are a DIVERSE subset — the coreset/diversity
    * primitive of data curation (cover the embedding space with k
    * exemplars; dedup the rest against them), dual to density-seeking
    * k-means.
    *
    * All distances are exact integer squared L2 over floor-quantized
    * vectors (the [[Ann]] domain), the per-round argmax resolves ties
    * by (distance DESC, id ASC), and the seed is the smallest
    * (md5("<id>:kcenter"), id) — every choice replayable by an external
    * engine, so q161 unrolls the whole greedy loop as CTEs.
    *
    * Scale shape: each round is ONE scan computing min-distance to the
    * (≤ k, broadcast-as-literal) center set and a `min_by` aggregate —
    * exactly one row reaches the driver per round; the quantized
    * projection is persisted across the k scans. k scans of the corpus
    * is the honest cost of exact farthest-point at 100 TB — run it on
    * the IVF/PQ-compressed representation or a uniform pre-sample when
    * k·scan is too much (the selection is a 2-approx either way; a
    * pre-sample only loosens the approximation).
    *
    * @return centers in selection order: (center_rank 1..k, center_id,
    *         radius — the max-min distance the pick covered; radius(1)
    *         = 0 by convention, radii non-increasing from rank 3 on) */
  def kCenterSelect(
      df: DataFrame, vecCol: String, idCol: String, k: Int,
      scale: Int = 1000): Seq[(Int, Long, Long, Seq[Long])] = {
    require(k >= 1, "k must be >= 1")
    val qvecs = df.select(col(idCol).cast("long").as("__id"),
        graft.operators.Ann.quantizeVec(col(vecCol), scale).as("__q"))
      .persist()
    try {
      def sqDistLit(c: Seq[Long]): Column =
        graft.functions.exprs.sq_l2_long(col("__q"), typedlit(c)) // codegen (r21)
      val seed = qvecs
        .withColumn("__key", graft.functions.PortableHash.md5Long60(
          concat(col("__id").cast("string"), lit(":kcenter"))))
        .orderBy(col("__key"), col("__id")).limit(1)
        .select(col("__id"), col("__q")).head()
      var centers = Vector((1, seed.getLong(0), 0L,
        seed.getSeq[Long](1).toIndexedSeq: Seq[Long]))
      (2 to k).foreach { r =>
        val dmin = array_min(array(
          centers.map(c => sqDistLit(c._4)): _*))
        val pick = qvecs.agg(min_by(
          struct(col("__id"), col("__q"), dmin.as("__d")),
          struct((-dmin).as("nd"), col("__id"))).as("m")).head().getStruct(0)
        centers = centers :+ ((r, pick.getLong(0),
          pick.getLong(2), pick.getSeq[Long](1).toIndexedSeq: Seq[Long]))
      }
      centers
    } finally { qvecs.unpersist() }
  }

  /** Assignment view of [[kCenterSelect]]: every vector labeled with its
    * nearest selected center (ties to the lower selection rank) and the
    * exact integer distance — one map over the corpus with the k centers
    * folded in as literals, no join, no shuffle. Output:
    * (idCol, center_id, center_rank, d). */
  def kCenterAssignment(
      df: DataFrame, vecCol: String, idCol: String, k: Int,
      scale: Int = 1000): DataFrame = {
    val centers = kCenterSelect(df, vecCol, idCol, k, scale)
    val q = graft.operators.Ann.quantizeVec(col(vecCol), scale)
    def sqDistLit(v: Column, c: Seq[Long]): Column =
      graft.functions.exprs.sq_l2_long(v, typedlit(c)) // codegen (r21)
    df.select(col(idCol).cast("long").as(idCol), q.as("__q"))
      .withColumn("__best", array_min(array(centers.map { case (r, cid, _, cv) =>
        struct(sqDistLit(col("__q"), cv).as("d"),
          lit(r).cast("long").as("center_rank"),
          lit(cid).as("center_id")) }: _*)))
      .select(col(idCol), col("__best.center_id").as("center_id"),
        col("__best.center_rank").as("center_rank"),
        col("__best.d").as("d"))
  }
}
