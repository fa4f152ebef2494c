package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed suffix-array exact-substring deduplication — the real
  * EXACTSUBSTR of Lee et al. 2022 ("Deduplicating Training Data Makes
  * Language Models Better", ACL, §4.1), built from relational pieces:
  *
  *   1. SUFFIX RANKS by prefix doubling (Manber–Myers): a base round
  *      ranks every suffix by its first `baseSpan` tokens directly,
  *      then each doubling round ranks span m → 2m using the key
  *      (rank_m(s), rank_m(s + m)) — log(maxlen/baseSpan) rounds, each
  *      ONE equi-self-join on (doc, pos+m) plus ONE dense rank
  *      computed WITHOUT a global window ([[Ranks.globalDenseRank]],
  *      the q142 range-exchange trick ranking rows in place).
  *   2. SUFFIX ARRAY = the total order (rank_{2^R}, doc_id, pos); ties
  *      in rank_{2^R} are exactly identical suffix strings.
  *   3. ADJACENT-RANK LCP: a duplicated span is found where NEIGHBORING
  *      suffixes in SA order share an LCP ≥ `minSpan` tokens. The LCP
  *      certificate is the classic binary decomposition over the saved
  *      doubling tables — e.g. minSpan 50 at base span 8 checks
  *      rank_32(s)=rank_32(s'), rank_16(s+32)=rank_16(s'+32),
  *      rank_8(s+42)=rank_8(s'+42) (the tail window OVERLAPS — sound,
  *      [[decompose]]) — PLUS the explicit length gate
  *      `len − pos + 1 ≥ minSpan` on both sides: rank_m equality on a
  *      suffix SHORTER than m only certifies "identical short
  *      suffixes", so without the gate two identical 49-token tails
  *      would pass a 50-token certificate.
  *   4. SPAN REMOVAL, q77-style first-occurrence policy: suffixes
  *      sharing the same `minSpan`-token prefix form a CONTIGUOUS run
  *      in SA order (a common prefix is an interval in lexicographic
  *      order), so the adjacency-qualified suffixes are exactly the
  *      members of runs of size ≥ 2. Each run keeps its globally-first
  *      member (min (doc_id, pos) struct — lexicographic, no overflow
  *      at any id scale); every
  *      other run member starts a removed `minSpan`-token span. Spans
  *      merge per doc (interval union — merged intervals are disjoint
  *      and ≥ minSpan long, so ≤ len/minSpan per doc) and the doc is
  *      reassembled from the uncovered tokens.
  *
  * Versus the strided-window relational cousin
  * ([[Dedup.exactSubstringDupJoin]], q76/q93): the suffix array finds
  * EVERY duplicated span of ≥ minSpan tokens regardless of alignment —
  * the strided form's general variant only guarantees detection at
  * length ≥ window+stride−1 and reports doc pairs, not span positions.
  * The price is the honest n·log(maxlen) shuffle bill of the doubling
  * loop.
  *
  * 100 TB design notes: every round's frames are corpus-token-scale
  * rows of a few longs (never text — tokens leave the pipeline after
  * the base round's window rank); all joins are equi-joins on
  * (doc, pos) or on rank pairs; the only per-round global step is
  * [[Ranks.globalDenseRank]]'s one-row-per-partition offset table.
  * Rounds grow with log(max DOC length) — document length, not corpus
  * size, so 20 rounds covers million-token docs. Superseded round
  * checkpoints are freed as soon as their successor materializes
  * ([[CheckpointHygiene]]), keeping live storage at O(needed tables).
  */
object SuffixArray {

  /** `minSpan` decomposed into (span exponent k, prefix offset) parts
    * covering [0, minSpan): the LCP ≥ minSpan certificate checks
    * rank_{2^k} equality at pos+offset for each part. Only spans ≥ the
    * base span (2^baseLog) are available, so a sub-base remainder is
    * covered by one OVERLAPPING base-span window anchored at
    * minSpan − 2^baseLog — overlap is sound (rank equality over any
    * sub-window of an equal prefix holds) and keeps coverage exact.
    * decompose(50, 3) = Seq((5,0), (4,32), (3,42)). */
  private[graft] def decompose(minSpan: Int, baseLog: Int): Seq[(Int, Int)] = {
    val base = 1 << baseLog
    require(minSpan >= base,
      s"minSpan $minSpan must be >= the base span $base")
    var rem = minSpan
    var off = 0
    val out = Seq.newBuilder[(Int, Int)]
    while (rem >= base) {
      val k = 31 - Integer.numberOfLeadingZeros(rem)
      out += ((k, off))
      off += 1 << k
      rem -= 1 << k
    }
    if (rem > 0) out += ((baseLog, minSpan - base))
    out.result()
  }

  /** EXACTSUBSTR dedup over whitespace-tokenized documents: remove every
    * non-first occurrence of any duplicated run of ≥ `minSpan` tokens
    * and reassemble. Output: (doc_id, n_tokens, n_removed_starts,
    * n_dropped, text) — n_removed_starts counts the removed duplicate
    * span STARTS, n_dropped the tokens actually dropped (their merged
    * interval union), text the reassembled survivor.
    *
    * `baseSpan` (a power of two) is the span of the DIRECT base
    * ranking: round 0 dense-ranks every suffix by its first baseSpan
    * tokens in one shot (order by the token-slice ARRAY — array order
    * is element-wise lexicographic with shorter-prefix-first in both
    * Spark and SQL engines, exactly the suffix order), replacing
    * log2(baseSpan) doubling rounds with one. `rounds` is the number
    * of doublings after that: baseSpan·2^rounds must reach the longest
    * document's token count (checked, fail-fast) — both are
    * fixture/config parameters so an external oracle can replay the
    * rounds as unrolled CTEs. Extra rounds beyond convergence are
    * idempotent (once ranks are distinct the doubling key is distinct
    * too), so a generous bound is safe, just wasted work.
    *
    * Shuffle shape per round: the partner self-join's two hash
    * exchanges on (doc, pos) plus the in-place dense rank's range +
    * local-window exchanges — all corpus-token-scale rows of a few
    * longs. (A doc_id pre-pin before each checkpoint would let the
    * self-join reuse one exchange, but under AQE `localCheckpoint`
    * reports UnknownPartitioning — the pin does not survive the
    * checkpoint, measured in `PlanQualitySpec` — so the operator does
    * not pay for one.) */
  def exactSubstrDedup(docs: DataFrame, textCol: String, idCol: String,
      minSpan: Int = 50, rounds: Int = 14, baseSpan: Int = 8): DataFrame =
    exactSubstrDedupImpl(docs, textCol, idCol, minSpan, rounds, baseSpan,
      earlyExit = true)

  /** [[exactSubstrDedup]] with the convergence early-exit switchable —
    * spec-pinned: earlyExit on ≡ off, row for row. */
  private[graft] def exactSubstrDedupImpl(docs: DataFrame, textCol: String,
      idCol: String, minSpan: Int, rounds: Int, baseSpan: Int,
      earlyExit: Boolean): DataFrame = {
    val st = buildSignatures(docs, textCol, idCol, minSpan, rounds,
      baseSpan, needSa = true, earlyExit = earlyExit)
    val sigCols = st.sigCols
    // adjacency in SA order, qualified by signature equality on both ends
    val qual = st.sa
      .select(col("doc_id").as("d1"), col("pos").as("p1"), col("__t"))
      .join(st.sa.select(col("doc_id").as("d2"), col("pos").as("p2"),
        (col("__t") - 1).as("__t")), Seq("__t"))
      .join(st.sig.select((col("doc_id").as("d1") +: col("pos").as("p1") +:
        sigCols.map(c => col(c).as(c + "a"))): _*), Seq("d1", "p1"))
      .join(st.sig.select((col("doc_id").as("d2") +: col("pos").as("p2") +:
        sigCols.map(c => col(c).as(c + "b"))): _*), Seq("d2", "p2"))
      .filter(sigCols.map(c => col(c + "a") === col(c + "b"))
        .reduce(_ && _))
    val starts = qual.select(col("d1").as("doc_id"), col("p1").as("pos"))
      .unionByName(qual.select(col("d2").as("doc_id"), col("p2").as("pos")))
      .distinct()
    // keeper per shared-prefix group: the signature IS the group key
    // (equal signature + length gate ⟺ equal minSpan-token prefix), and
    // group = maximal SA run, so the group min is the run's first
    // occurrence — the q77 policy without island detection. The min is
    // taken on the (doc_id, pos) STRUCT: structs order lexicographically
    // with no arithmetic, so unlike a doc_id·encF+pos encoding it can
    // neither overflow Long at large ids (encF reaches 2^41 at
    // baseLog+rounds = 40, so ids past ~2^22 would wrap silently) nor
    // assume the id column is numeric.
    val occ = struct(col("doc_id"), col("pos"))
    val grp = starts.join(st.sig, Seq("doc_id", "pos"))
    val keepers = grp.groupBy(sigCols.map(col): _*)
      .agg(min(occ).as("__keep"))
    val removed = grp.join(keepers, sigCols)
      .filter(occ =!= col("__keep"))
      .select(col("doc_id"), col("pos"))
    removeSpans(st.tokf, removed, minSpan)
  }

  /** Span-level EXACT-SUBSTRING DECONTAMINATION (Lee et al. 2022 §6.2's
    * train–test overlap, at the method's own granularity): every run of
    * ≥ `minSpan` tokens that a CORPUS document shares with ANY
    * benchmark document is removed from the corpus document — the
    * suffix-array-exact form of what the n-gram/Bloom decontamination
    * family ([[Dedup.decontaminate]], q74/q159) approximates at
    * fixed-n granularity. One generalized suffix array is built over
    * corpus ∪ benchmark; a corpus suffix is contaminated iff its
    * minSpan-prefix signature group contains a benchmark member (the
    * group IS a maximal SA run — same machinery as
    * [[exactSubstrDedup]], cross-side membership instead of
    * first-occurrence policy). Benchmark text itself is never
    * modified; ids must be DISJOINT across the two frames (the q74
    * convention). Output: the q222 shape over corpus docs only —
    * (doc_id, n_tokens, n_removed_starts, n_dropped, text). */
  def exactSubstrContamination(corpus: DataFrame, bench: DataFrame,
      textCol: String, idCol: String,
      minSpan: Int = 50, rounds: Int = 14, baseSpan: Int = 8)
      : DataFrame = {
    val union = corpus
      .select(col(idCol), col(textCol), lit(false).as("__bench"))
      .unionByName(bench.select(col(idCol), col(textCol),
        lit(true).as("__bench")))
      .localCheckpoint(false)
    // an id collision across sides would silently merge two documents'
    // suffixes — fail loudly instead (id-scale semi-join, one tiny
    // action against the frame the pipeline materializes anyway)
    val collisions = union.filter(col("__bench"))
      .select(col(idCol))
      .join(union.filter(!col("__bench")).select(col(idCol)),
        Seq(idCol), "left_semi")
      .limit(1).count()
    require(collisions == 0L,
      "exactSubstrContamination: corpus and benchmark ids must be " +
        "disjoint (an overlap would merge two documents' suffixes)")
    val st = buildSignatures(union, textCol, idCol, minSpan, rounds,
      baseSpan, needSa = false)
    val benchIds = union.filter(col("__bench"))
      .select(col(idCol).as("doc_id"))
    val benchSigs = st.sig.join(benchIds, Seq("doc_id"), "left_semi")
      .select(st.sigCols.map(col): _*).distinct()
    val contaminated = st.sig
      .join(benchIds, Seq("doc_id"), "left_anti")
      .join(benchSigs, st.sigCols, "left_semi")
      .select(col("doc_id"), col("pos"))
    val corpusToks = st.tokf.join(benchIds, Seq("doc_id"), "left_anti")
    removeSpans(corpusToks, contaminated, minSpan)
  }

  /** NORMALIZED-TEXT exact-substring decontamination — how Lee et al.
    * 2022 §6.2 actually run the matcher: matching happens on a
    * NORMALIZED view of the text (case folding, punctuation stripping,
    * Unicode NFC — without it, trivial case/punct variants of
    * benchmark text evade the exact matcher), while REMOVAL happens on
    * the raw text, via the token-index map the normalization must
    * preserve.
    *
    * The caller supplies BOTH columns: `rawCol` (what the output
    * reassembles) and `normCol` (what the suffix machinery matches
    * on), with the contract that the two tokenize to the SAME count —
    * per-token normalization preserves positions by construction, and
    * the operator fail-fasts on any row where the counts diverge
    * (a normalization that drops or splits tokens would silently
    * shift every removal window after the first divergence). Matched
    * span positions transfer 1:1 onto the raw token array. Output is
    * the q222 shape over corpus docs, text reassembled from RAW
    * tokens. */
  def exactSubstrContaminationNormalized(corpus: DataFrame,
      bench: DataFrame, rawCol: String, normCol: String, idCol: String,
      minSpan: Int = 50, rounds: Int = 14, baseSpan: Int = 8)
      : DataFrame = {
    val union = corpus
      .select(col(idCol), col(rawCol).as("__raw"),
        col(normCol).as("__norm"), lit(false).as("__bench"))
      .unionByName(bench.select(col(idCol), col(rawCol).as("__raw"),
        col(normCol).as("__norm"), lit(true).as("__bench")))
      // the 1:1 token map IS the correctness of the raw-offset
      // transfer — enforce it where the rows stream
      .filter(assert_true(
        size(split(coalesce(col("__raw"), lit("")), "\\s+")) ===
          size(split(coalesce(col("__norm"), lit("")), "\\s+")),
        lit("exactSubstrContaminationNormalized: raw and normalized " +
          "token counts diverge — per-token normalization must " +
          "preserve positions")).isNull)
      .localCheckpoint(false)
    val collisions = union.filter(col("__bench"))
      .select(col(idCol))
      .join(union.filter(!col("__bench")).select(col(idCol)),
        Seq(idCol), "left_semi")
      .limit(1).count()
    require(collisions == 0L,
      "exactSubstrContaminationNormalized: corpus and benchmark ids " +
        "must be disjoint")
    val st = buildSignatures(union, "__norm", idCol, minSpan, rounds,
      baseSpan, needSa = false)
    val benchIds = union.filter(col("__bench"))
      .select(col(idCol).as("doc_id"))
    val benchSigs = st.sig.join(benchIds, Seq("doc_id"), "left_semi")
      .select(st.sigCols.map(col): _*).distinct()
    val contaminated = st.sig
      .join(benchIds, Seq("doc_id"), "left_anti")
      .join(benchSigs, st.sigCols, "left_semi")
      .select(col("doc_id"), col("pos"))
    // removal over the RAW token array: positions transfer 1:1
    val rawTokf = union.filter(!col("__bench"))
      .select(col(idCol).as("doc_id"),
        split(coalesce(col("__raw"), lit("")), "\\s+").as("__toks"))
      .localCheckpoint(false)
    removeSpans(rawTokf, contaminated, minSpan)
  }

  /** MEMORIZATION-FREQUENCY report (the measurement behind Carlini et
    * al. 2022 "Quantifying Memorization Across Neural Language Models"
    * §4 and Lee et al. 2022 §6.2's overlap counts): for each BENCHMARK
    * document, how much of it occurs verbatim in the corpus and how
    * HOT the overlapping spans are. A benchmark suffix is memorized
    * iff its minSpan-token prefix occurs anywhere in the corpus; the
    * per-group corpus occurrence COUNT (not just membership — the
    * q229 decontamination's boolean, upgraded to a frequency) grades
    * the risk: a span the corpus repeats 100× is far likelier to be
    * emitted by a trained model than a singleton (Carlini et al.'s
    * central result: memorization grows log-linearly in duplication).
    *
    * Output, one row per benchmark doc (zero-filled when clean):
    *   - n_tokens: benchmark doc token count;
    *   - n_memorized_starts: positions whose minSpan-prefix occurs in
    *     the corpus;
    *   - covered_tokens: the interval union of those spans — the
    *     verbatim-recoverable fraction's numerator;
    *   - max_corpus_freq: the hottest overlapping span's corpus
    *     occurrence count;
    *   - total_corpus_hits: Σ over memorized starts of their span's
    *     corpus count (overlapping starts each count — the mass the
    *     training stream would present to the model).
    *
    * Same machinery as [[exactSubstrContamination]] (one generalized
    * sig-only build, 2–3 doubling rounds, no SA totalization, no
    * document-length ceiling), with the corpus side's signature groups
    * AGGREGATED to counts instead of distinct'd to a membership set —
    * one extra map-side-combinable count over frames the
    * decontamination already builds. Ids must be disjoint across the
    * two frames (fail-fast, the q74/q229 convention). */
  def memorizationReport(corpus: DataFrame, bench: DataFrame,
      textCol: String, idCol: String,
      minSpan: Int = 50, baseSpan: Int = 8): DataFrame = {
    val union = corpus
      .select(col(idCol), col(textCol), lit(false).as("__bench"))
      .unionByName(bench.select(col(idCol), col(textCol),
        lit(true).as("__bench")))
      .localCheckpoint(false)
    val collisions = union.filter(col("__bench"))
      .select(col(idCol))
      .join(union.filter(!col("__bench")).select(col(idCol)),
        Seq(idCol), "left_semi")
      .limit(1).count()
    require(collisions == 0L,
      "memorizationReport: corpus and benchmark ids must be disjoint " +
        "(an overlap would merge two documents' suffixes)")
    val baseLog = 31 - Integer.numberOfLeadingZeros(baseSpan)
    val maxPartExp = decompose(minSpan, baseLog).map(_._1).max
    val st = buildSignatures(union, textCol, idCol, minSpan,
      rounds = math.max(1, maxPartExp - baseLog), baseSpan,
      needSa = false)
    val benchIds = union.filter(col("__bench"))
      .select(col(idCol).as("doc_id"))
    // corpus-side occurrence count per signature group (group ⟺ a
    // distinct minSpan-token prefix) — partial-aggregated map-side,
    // one row per distinct corpus span
    val corpusCnt = st.sig.join(benchIds, Seq("doc_id"), "left_anti")
      .groupBy(st.sigCols.map(col): _*)
      .agg(count(lit(1)).as("__c"))
    // benchmark starts that hit the corpus, annotated with the count;
    // one row per (doc, pos) — sig is per-suffix, corpusCnt per-group
    val hits = st.sig.join(benchIds, Seq("doc_id"), "left_semi")
      .join(corpusCnt, st.sigCols)
      .select(col("doc_id"), col("pos"), col("__c"))
      .localCheckpoint(false)
    val hstats = hits.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_memorized_starts"),
        max(col("__c")).as("max_corpus_freq"),
        sum(col("__c")).as("total_corpus_hits"))
    // covered-token interval union — the removeSpans gaps-and-islands
    // over PER-DOC windows, stats only (no reassembly needed here)
    val wOrd = Window.partitionBy(col("doc_id")).orderBy(col("s"))
    val cstats = hits
      .select(col("doc_id"), col("pos").as("s"),
        (col("pos") + (minSpan - 1)).as("e"))
      .withColumn("__pm",
        max(col("e")).over(wOrd.rowsBetween(Window.unboundedPreceding, -1)))
      .withColumn("__new",
        when(col("__pm").isNull || col("s") > col("__pm"), 1L)
          .otherwise(0L))
      .withColumn("__isl",
        sum(col("__new")).over(wOrd.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col("doc_id"), col("__isl"))
      .agg(min(col("s")).as("s"), max(col("e")).as("e"))
      .groupBy(col("doc_id"))
      .agg(sum(col("e") - col("s") + 1).as("covered_tokens"))
    union.filter(col("__bench"))
      .select(col(idCol).as("doc_id"),
        size(split(coalesce(col(textCol), lit("")), "\\s+"))
          .cast("long").as("n_tokens"))
      .join(hstats, Seq("doc_id"), "left")
      .join(cstats, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_tokens"),
        coalesce(col("n_memorized_starts"), lit(0L))
          .as("n_memorized_starts"),
        coalesce(col("covered_tokens"), lit(0L)).as("covered_tokens"),
        coalesce(col("max_corpus_freq"), lit(0L)).as("max_corpus_freq"),
        coalesce(col("total_corpus_hits"), lit(0L))
          .as("total_corpus_hits"))
  }

  /** DUPLICATION-FREQUENCY SPECTRUM (Lee et al. 2022 Fig. 1/4's
    * histogram): how much of the corpus's duplicated ≥ minSpan-token
    * mass sits at each occurrence-frequency scale. Signature groups
    * (⟺ distinct minSpan-token spans) are counted, singletons
    * dropped, and groups bucketed by floor(log2(count)) — computed as
    * binary-digit length − 1, EXACT integer logic in both engines
    * (never a floating log2, whose rounding at exact powers of two is
    * representation-dependent). Output, one row per occupied bucket:
    * (freq_bucket, bucket_lo = 2^bucket, n_groups = distinct
    * duplicated spans in the bucket, n_dup_suffixes = their total
    * occurrence mass). The spectrum is THE diagnostic read before
    * choosing dedup aggressiveness: a heavy high-frequency tail means
    * template/boilerplate flooding (dedup helps); mass concentrated
    * at 2–4 means organic quotation (dedup barely matters).
    *
    * Cost: the sig-only build (2–3 doubling rounds) plus two
    * map-side-combinable aggregations — corpus-token-scale rows in,
    * ≤ 63 rows out. */
  def duplicationSpectrum(corpus: DataFrame, textCol: String,
      idCol: String, minSpan: Int = 50, baseSpan: Int = 8): DataFrame = {
    val baseLog = 31 - Integer.numberOfLeadingZeros(baseSpan)
    val maxPartExp = decompose(minSpan, baseLog).map(_._1).max
    val st = buildSignatures(corpus, textCol, idCol, minSpan,
      rounds = math.max(1, maxPartExp - baseLog), baseSpan,
      needSa = false)
    spectrumOf(st.sig.groupBy(st.sigCols.map(col): _*)
      .agg(count(lit(1)).as("__c")).select(col("__c")))
  }

  /** [[duplicationSpectrum]] served from a FROZEN counted
    * [[SubstrIndex]] — the signature groups (⟺ distinct minSpan-token
    * spans) already carry their occurrence counts in `ix.sig`, so the
    * spectrum is two map-side-combinable aggregations over an
    * already-materialized frame: no tokenize, no rank build. Output ≡
    * the fresh [[duplicationSpectrum]] over the same corpus at ANY
    * baseSpan (spec-pinned): the histogram depends only on which
    * distinct spans exist at which counts, not on the rank space that
    * named them. */
  def duplicationSpectrumFromIndex(ix: SubstrIndex): DataFrame = {
    require(ix.sig.columns.contains("cnt"),
      "duplicationSpectrumFromIndex: this index was built without " +
        "occurrence counts — rebuild with buildSubstrIndex")
    spectrumOf(ix.sig.select(col("cnt").as("__c")))
  }

  /** The frequency-bucket histogram over a counted-group column:
    * singletons dropped, floor(log2 count) via binary-digit length −
    * 1 (EXACT integer logic in both engines). */
  private def spectrumOf(counts: DataFrame): DataFrame =
    counts
      .filter(col("__c") >= 2)
      .select((length(bin(col("__c"))) - 1).cast("int").as("freq_bucket"),
        col("__c"))
      .groupBy(col("freq_bucket"))
      .agg(count(lit(1)).as("n_groups"), sum(col("__c")).as("n_dup_suffixes"))
      .select(col("freq_bucket"),
        expr("shiftleft(1L, freq_bucket)").as("bucket_lo"),
        col("n_groups"), col("n_dup_suffixes"))

  /** A FROZEN, persistable suffix-array index over a corpus — the
    * serving form of the EXACTSUBSTR family (Lee et al. 2022 §6.2 is
    * run per training-set refresh, not once): everything a batch probe
    * needs to decide "does this ≥ minSpan-token span occur anywhere in
    * the corpus?" WITHOUT rebuilding the suffix array.
    *
    *   - `base`: the distinct (baseSpan-token window → base rank) map —
    *     the only content-addressable frame (token text survives the
    *     build solely here);
    *   - `roundMaps`: per doubling exponent e ∈ (baseLog, maxPartExp],
    *     the distinct ((rank_{m}(s), rank_{m}(s+m)) → rank_{2m}) key
    *     map of that round — a batch recomputes ITS suffixes' ranks in
    *     CORPUS rank space bottom-up through these maps (an absent key
    *     at any level means "this prefix occurs nowhere in the corpus",
    *     which propagates as NULL);
    *   - `sig`: the corpus's distinct LCP ≥ minSpan certificate tuples
    *     (the [[decompose]] parts in the same rank space), each with
    *     its corpus occurrence COUNT `cnt` — membership probes ignore
    *     it ([[exactSubstrProbe]]'s semi-join), frequency probes read
    *     it ([[exactSubstrProbeReport]]'s Carlini-style grading).
    *
    * Only exponents up to log2(minSpan) are stored — the certificate
    * never reads beyond them — so the index build costs 2–3 doubling
    * rounds, not the SA's full budget, and has NO document-length
    * ceiling. Frame sizes are ≤ one row per distinct corpus prefix per
    * level (≤ corpus tokens each). */
  final case class SubstrIndex(base: DataFrame,
      roundMaps: Seq[(Int, DataFrame)], sig: DataFrame, nSigCols: Int,
      minSpan: Int, baseSpan: Int)

  /** Build a [[SubstrIndex]] over `corpus` — one sig-only
    * [[buildSignatures]] pass with the content/key maps retained. */
  def buildSubstrIndex(corpus: DataFrame, textCol: String, idCol: String,
      minSpan: Int = 50, baseSpan: Int = 8): SubstrIndex = {
    val baseLog = 31 - Integer.numberOfLeadingZeros(baseSpan)
    val maxPartExp = decompose(minSpan, baseLog).map(_._1).max
    val st = buildSignatures(corpus, textCol, idCol, minSpan,
      rounds = math.max(1, maxPartExp - baseLog), baseSpan,
      needSa = false, collectIndex = true)
    SubstrIndex(st.baseContent, st.roundMaps,
      st.sig.groupBy(st.sigCols.map(col): _*)
        .agg(count(lit(1)).as("cnt"))
        .localCheckpoint(true),
      st.sigCols.length, minSpan, baseSpan)
  }

  /** Index MAINTENANCE — absorb a batch of documents into a frozen
    * [[SubstrIndex]] without re-ranking the corpus: the streaming-
    * decontam analog of [[graft.operators.Dedup.updateCorpusIndex]],
    * closing the serving loop (probe batch → remove contaminated →
    * absorb survivors → the NEXT batch's probe also rejects copies of
    * THIS batch's spans).
    *
    * Mechanics: batch suffixes re-rank themselves through the frozen
    * maps exactly as in [[exactSubstrProbe]], except that a missing
    * key — a window or rank pair the corpus has never seen — mints a
    * FRESH rank (dense rank over the novel keys, offset past the
    * level's existing maximum) instead of propagating NULL, and the
    * extended key maps are retained. The batch's certificate tuples
    * then MERGE into the counted `sig` table (occurrence counts sum on
    * matching tuples, novel tuples insert). Probe semantics need rank
    * INJECTIVITY per level, not the rebuild's exact dense values, so
    * probes against the absorbed index answer identically to a fresh
    * [[buildSubstrIndex]] over corpus ∪ batch — membership AND counts
    * (spec-gated in `SubstrIndexSpec`). Cost ∝ batch: every join is
    * batch-scale against a stored map; the corpus is never re-read.
    *
    * The returned index is in-memory; persist it with
    * [[saveSubstrIndex]] under the SAME root — the IndexStore writes a
    * new generation and readers atomically see the newer corpus. */
  def absorbSubstrIndex(ix: SubstrIndex, batch: DataFrame,
      textCol: String, idCol: String): SubstrIndex = {
    val baseLog = 31 - Integer.numberOfLeadingZeros(ix.baseSpan)
    val parts = decompose(ix.minSpan, baseLog)
    require(parts.length == ix.nSigCols,
      s"absorbSubstrIndex: index has ${ix.nSigCols} certificate parts " +
        s"but minSpan=${ix.minSpan}, baseSpan=${ix.baseSpan} decompose " +
        s"into ${parts.length} — artifact params are inconsistent")
    require(ix.sig.columns.contains("cnt"),
      "absorbSubstrIndex: this index carries no occurrence counts — " +
        "rebuild with buildSubstrIndex")
    val tokf = batch
      .select(col(idCol).as("doc_id"),
        split(coalesce(col(textCol), lit("")), "\\s+").as("__toks"))
      .localCheckpoint(false)
    val sfx = tokf
      .select(col("doc_id"), size(col("__toks")).cast("long").as("n"),
        col("__toks"), posexplode(col("__toks")).as(Seq("__p0", "__tk")))
      .select(col("doc_id"), (col("__p0") + 1).cast("long").as("pos"),
        col("n"),
        concat_ws(" ",
          slice(col("__toks"), col("__p0") + 1, lit(ix.baseSpan)))
          .as("__w")) // string key — matches the index build (winOf)
      .localCheckpoint(false)
    // base level: known windows keep their corpus rank; novel windows
    // mint fresh ranks past the corpus maximum (dense over the novel
    // vocabulary — batch-scale, the only content-addressable frame)
    def maxOf(df: DataFrame, c: String): Long =
      df.agg(max(col(c))).head match {
        case r if r.isNullAt(0) => 0L
        case r => r.getLong(0)
      }
    val baseMax = maxOf(ix.base, "r")
    val novelWins = sfx.select(col("__w")).distinct()
      .join(ix.base.select(col("__w")), Seq("__w"), "left_anti")
    val base2 = ix.base.unionByName(
      Ranks.globalDenseRank(novelWins, Seq(col("__w")), "__nr")
        .select(col("__w"), (col("__nr") + baseMax).as("r")))
      .localCheckpoint(false)
    val tables = scala.collection.mutable.Map.empty[Int, DataFrame]
    tables(baseLog) = sfx
      .join(base2.select(col("__w"), col("r").as("__cr")), Seq("__w"))
      .select(col("doc_id"), col("pos"), col("n"), col("__cr").as("r"))
      .localCheckpoint(false)
    // doubling levels: extend each key map with the batch's novel
    // (r1, r2) pairs, same fresh-rank minting; the 0-sentinel for the
    // missing partner ROW mirrors the corpus build exactly
    val roundMaps2 = ix.roundMaps.map { case (e, rmap) =>
      val m = 1L << (e - 1)
      val prev = tables(e - 1)
      val partner = prev.select(col("doc_id"),
        (col("pos") - m).as("pos"), col("r").as("__r2"))
      val keyed = prev.join(partner, Seq("doc_id", "pos"), "left")
        .select(col("doc_id"), col("pos"), col("n"),
          col("r").as("__r1"),
          coalesce(col("__r2"), lit(0L)).as("__r2"))
      val rMax = maxOf(rmap, "r")
      val novelKeys = keyed.select(col("__r1").as("r1"),
          col("__r2").as("r2")).distinct()
        .join(rmap.select(col("r1"), col("r2")), Seq("r1", "r2"),
          "left_anti")
      val rmap2 = rmap.unionByName(
        Ranks.globalDenseRank(novelKeys,
            Seq(col("r1"), col("r2")), "__nr")
          .select(col("r1"), col("r2"), (col("__nr") + rMax).as("r")))
        .localCheckpoint(false)
      tables(e) = keyed
        .join(rmap2.select(col("r1").as("__r1"), col("r2").as("__r2"),
          col("r").as("__cr")), Seq("__r1", "__r2"))
        .select(col("doc_id"), col("pos"), col("n"), col("__cr").as("r"))
        .localCheckpoint(false)
      e -> rmap2
    }
    // batch certificate tuples in the extended rank space (every rank
    // resolves by construction), counted and merged into sig
    var bsig: DataFrame = tables(parts.map(_._1).max)
      .filter(col("n") - col("pos") + 1 >= ix.minSpan)
      .select(col("doc_id"), col("pos"))
    parts.zipWithIndex.foreach { case ((k, off), i) =>
      bsig = bsig.join(
        tables(k).select(col("doc_id"), (col("pos") - off).as("pos"),
          col("r").as(s"__s$i")),
        Seq("doc_id", "pos"))
    }
    val sigCols = parts.indices.map(i => s"__s$i")
    val batchCnt = bsig.groupBy(sigCols.map(col): _*)
      .agg(count(lit(1)).as("__bc"))
    val sig2 = ix.sig
      .join(batchCnt, sigCols, "full_outer")
      .select(sigCols.map(col) :+
        (coalesce(col("cnt"), lit(0L)) + coalesce(col("__bc"), lit(0L)))
          .as("cnt"): _*)
      .localCheckpoint(true)
    SubstrIndex(base2, roundMaps2, sig2, ix.nSigCols,
      ix.minSpan, ix.baseSpan)
  }

  /** Persist a [[SubstrIndex]] under `root` on the
    * [[graft.model.IndexStore]] crash-atomic generation protocol (the
    * convention shared with the LSH corpus index and the IVF index). */
  def saveSubstrIndex(ix: SubstrIndex, root: String): Unit = {
    val spark = ix.base.sparkSession
    import spark.implicits._
    graft.model.IndexStore.save(root,
      Seq("base" -> ix.base, "sig" -> ix.sig) ++
        ix.roundMaps.map { case (e, df) => s"round_$e" -> df },
      Seq((ix.minSpan, ix.baseSpan, ix.nSigCols,
        ix.roundMaps.map(_._1).mkString(","), substrIndexFormatVersion))
        .toDF("min_span", "base_span", "n_sig_cols", "round_exps",
          "format_version"))
    ()
  }

  /** On-disk [[SubstrIndex]] format version. v2 (r20): the base/round
    * window key `__w` is a space-joined STRING; v1 artifacts carried
    * an array<string> key, which a v2 probe/absorb would fail against
    * with an opaque join-type AnalysisException (ADVICE r20) — so the
    * version is written by [[saveSubstrIndex]] and required by
    * [[loadSubstrIndex]]. */
  private val substrIndexFormatVersion = 2

  /** Load a [[saveSubstrIndex]] artifact (newest complete generation);
    * bit-exact inverse — a loaded index probes identically to the
    * fresh one (spec-gated). */
  def loadSubstrIndex(spark: org.apache.spark.sql.SparkSession,
      root: String): SubstrIndex = {
    val (p, dir) = graft.model.IndexStore.load(spark, root)
    val ver =
      if (p.schema.fieldNames.contains("format_version"))
        p.getAs[Int]("format_version")
      else 1 // pre-r21 artifacts carried no version field
    require(ver == substrIndexFormatVersion,
      s"loadSubstrIndex: artifact at $root is format v$ver but this " +
        s"build reads v$substrIndexFormatVersion (the window-key " +
        "representation changed) — rebuild the index with " +
        "buildSubstrIndex + saveSubstrIndex")
    val (minSpan, baseSpan, nSig) = (p.getAs[Int]("min_span"),
      p.getAs[Int]("base_span"), p.getAs[Int]("n_sig_cols"))
    require(minSpan >= 2 && baseSpan >= 1 && nSig >= 1,
      s"loadSubstrIndex: bad params min_span=$minSpan " +
        s"base_span=$baseSpan n_sig_cols=$nSig")
    val exps = p.getAs[String]("round_exps") match {
      case "" => Seq.empty[Int]
      case ss => ss.split(",").toSeq.map(_.toInt)
    }
    SubstrIndex(
      spark.read.parquet(s"$dir/base"),
      exps.map(e => e -> spark.read.parquet(s"$dir/round_$e")),
      spark.read.parquet(s"$dir/sig"),
      nSig, minSpan, baseSpan)
  }

  /** Incremental EXACTSUBSTR decontamination/dedup PROBE: remove from
    * each `batch` document every run of ≥ minSpan tokens that occurs
    * anywhere in the FROZEN corpus behind `ix` — output is the q222
    * shape over batch docs, and ≡
    * [[exactSubstrContamination]](batch, corpus) exactly (spec-gated),
    * at cost proportional to the BATCH, not the corpus.
    *
    * Mechanics: batch suffixes rank themselves in CORPUS rank space —
    * the baseSpan window joins the content-addressable `base` map, then
    * each doubling level joins its (r1, r2) key map; a missing key
    * anywhere means no corpus suffix shares that prefix and the rank
    * goes NULL (nulls never equi-join, so the miss propagates for
    * free). The end-of-doc 0-sentinel is reproduced from the BATCH
    * side's own partner-row absence, mirroring the build. Gated batch
    * suffixes assemble the [[decompose]] certificate tuple and
    * semi-join the corpus `sig` set; hits are removed spans.
    *
    * Scale shape: every join is batch-suffix-scale rows against a
    * precomputed corpus-scale map — with a small batch Spark broadcasts
    * the BATCH side, so each level costs one map-side scan of the
    * stored table and zero shuffles of it; at warehouse scale the maps
    * would be bucketed by their join key to turn those scans into
    * partial reads. Nothing here re-reads or re-ranks the corpus. */
  def exactSubstrProbe(ix: SubstrIndex, batch: DataFrame,
      textCol: String, idCol: String): DataFrame = {
    val (tokf, sig, sigCols) = probeCertificates(ix, batch, textCol, idCol)
    val contaminated = sig
      .filter(sigCols.map(c => col(c).isNotNull).reduce(_ && _))
      .join(ix.sig, sigCols, "left_semi")
      .select(col("doc_id"), col("pos"))
    removeSpans(tokf, contaminated, ix.minSpan)
  }

  /** MEMORIZATION-FREQUENCY report served from a FROZEN [[SubstrIndex]]
    * — [[memorizationReport]]'s output shape (Carlini et al. frequency
    * grading: n_memorized_starts / covered_tokens / max_corpus_freq /
    * total_corpus_hits per batch doc) at cost proportional to the
    * BATCH, not the corpus: batch suffixes re-rank themselves through
    * the saved maps exactly as in [[exactSubstrProbe]], then the
    * certificate inner-joins the index's counted `sig` table instead
    * of semi-joining it. Spec-pinned ≡ the fresh
    * [[memorizationReport]](corpus, batch) rebuild. */
  def exactSubstrProbeReport(ix: SubstrIndex, batch: DataFrame,
      textCol: String, idCol: String): DataFrame = {
    require(ix.sig.columns.contains("cnt"),
      "exactSubstrProbeReport: this index was built without occurrence " +
        "counts (a pre-counted artifact) — rebuild with buildSubstrIndex")
    val (tokf, sig, sigCols) = probeCertificates(ix, batch, textCol, idCol)
    val hits = sig
      .filter(sigCols.map(c => col(c).isNotNull).reduce(_ && _))
      .join(ix.sig, sigCols)
      .select(col("doc_id"), col("pos"), col("cnt").as("__c"))
      .localCheckpoint(false)
    val hstats = hits.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_memorized_starts"),
        max(col("__c")).as("max_corpus_freq"),
        sum(col("__c")).as("total_corpus_hits"))
    val wOrd = Window.partitionBy(col("doc_id")).orderBy(col("s"))
    val cstats = hits
      .select(col("doc_id"), col("pos").as("s"),
        (col("pos") + (ix.minSpan - 1)).as("e"))
      .withColumn("__pm",
        max(col("e")).over(wOrd.rowsBetween(Window.unboundedPreceding, -1)))
      .withColumn("__new",
        when(col("__pm").isNull || col("s") > col("__pm"), 1L)
          .otherwise(0L))
      .withColumn("__isl",
        sum(col("__new")).over(wOrd.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col("doc_id"), col("__isl"))
      .agg(min(col("s")).as("s"), max(col("e")).as("e"))
      .groupBy(col("doc_id"))
      .agg(sum(col("e") - col("s") + 1).as("covered_tokens"))
    tokf
      .select(col("doc_id"),
        size(col("__toks")).cast("long").as("n_tokens"))
      .join(hstats, Seq("doc_id"), "left")
      .join(cstats, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_tokens"),
        coalesce(col("n_memorized_starts"), lit(0L))
          .as("n_memorized_starts"),
        coalesce(col("covered_tokens"), lit(0L)).as("covered_tokens"),
        coalesce(col("max_corpus_freq"), lit(0L)).as("max_corpus_freq"),
        coalesce(col("total_corpus_hits"), lit(0L))
          .as("total_corpus_hits"))
  }

  /** The shared batch-side probe chain: tokenize, re-rank the batch's
    * suffixes in CORPUS rank space through the index's base and
    * doubling-key maps (missing key ⇒ NULL rank ⇒ the miss
    * propagates), and assemble the [[decompose]] certificate tuple
    * over length-gated batch suffixes. Returns (token frame,
    * certificate frame, certificate column names). */
  private def probeCertificates(ix: SubstrIndex, batch: DataFrame,
      textCol: String, idCol: String)
      : (DataFrame, DataFrame, Seq[String]) = {
    val baseLog = 31 - Integer.numberOfLeadingZeros(ix.baseSpan)
    val parts = decompose(ix.minSpan, baseLog)
    require(parts.length == ix.nSigCols,
      s"exactSubstrProbe: index has ${ix.nSigCols} certificate parts " +
        s"but minSpan=${ix.minSpan}, baseSpan=${ix.baseSpan} decompose " +
        s"into ${parts.length} — artifact params are inconsistent")
    val tokf = batch
      .select(col(idCol).as("doc_id"),
        split(coalesce(col(textCol), lit("")), "\\s+").as("__toks"))
      .localCheckpoint(false)
    val sfx = tokf
      .select(col("doc_id"), size(col("__toks")).cast("long").as("n"),
        col("__toks"), posexplode(col("__toks")).as(Seq("__p0", "__tk")))
      .select(col("doc_id"), (col("__p0") + 1).cast("long").as("pos"),
        col("n"),
        concat_ws(" ",
          slice(col("__toks"), col("__p0") + 1, lit(ix.baseSpan)))
          .as("__w")) // string key — matches the index build (winOf)
    val tables = scala.collection.mutable.Map.empty[Int, DataFrame]
    tables(baseLog) = sfx
      .join(ix.base.select(col("__w"), col("r").as("__cr")),
        Seq("__w"), "left")
      .select(col("doc_id"), col("pos"), col("n"), col("__cr").as("r"))
      .localCheckpoint(false)
    ix.roundMaps.foreach { case (e, rmap) =>
      val m = 1L << (e - 1)
      val prev = tables(e - 1)
      // partner presence must be told apart from partner rank NULL: a
      // missing partner ROW is end-of-doc (the corpus build's
      // 0-sentinel); a present partner with NULL rank is
      // absent-from-corpus and must poison the key
      val partner = prev.select(col("doc_id"),
        (col("pos") - m).as("pos"), col("r").as("__r2"),
        lit(true).as("__pp"))
      val keyed = prev.join(partner, Seq("doc_id", "pos"), "left")
        .select(col("doc_id"), col("pos"), col("n"),
          col("r").as("__r1"),
          when(col("__pp").isNull, lit(0L)).otherwise(col("__r2"))
            .as("__r2"))
      tables(e) = keyed
        .join(rmap.select(col("r1").as("__r1"), col("r2").as("__r2"),
          col("r").as("__cr")), Seq("__r1", "__r2"), "left")
        .select(col("doc_id"), col("pos"), col("n"), col("__cr").as("r"))
        .localCheckpoint(false)
    }
    // certificate tuple over gated batch suffixes, in corpus rank space
    var sig: DataFrame = tables(parts.map(_._1).max)
      .filter(col("n") - col("pos") + 1 >= ix.minSpan)
      .select(col("doc_id"), col("pos"))
    parts.zipWithIndex.foreach { case ((k, off), i) =>
      sig = sig.join(
        tables(k).select(col("doc_id"), (col("pos") - off).as("pos"),
          col("r").as(s"__s$i")),
        Seq("doc_id", "pos"))
    }
    val sigCols = parts.indices.map(i => s"__s$i")
    (tokf, sig, sigCols)
  }

  /** The shared rank/signature machinery: builds the doubling tables,
    * the length-gated LCP ≥ minSpan signature frame (checkpointed),
    * and — when `needSa` — the totalized suffix-array order. Frees
    * every superseded rank checkpoint before returning.
    *
    * Round economics (r19): the LCP certificate itself only ever reads
    * tables at the certificate-part exponents, so a sig-only build
    * (`needSa = false` — contamination, memorization, spectrum) uses
    * the FLAT base certificate (stride-baseSpan windows, zero doubling
    * rounds — see the `flatSig` comment below) and has no
    * document-length ceiling; the serving-index build keeps the
    * [[decompose]] doubling (2–3 rounds) because its probe maps
    * re-rank a batch level by level. An SA build doubles toward `baseLog + rounds` but EXITS
    * EARLY once ranks converge (max rank == suffix count — every
    * suffix already has a distinct rank, so further doubling is the
    * identity): convergence arrives at ~log2(max doc length), rounds
    * is a safe over-budget, and the convergence probe is one tiny
    * aggregate per round over a frame that is already materialized.
    * Early-exit output ≡ full-rounds output (spec-pinned via the
    * `earlyExit` switch): rank equality at any span beyond convergence
    * is equality at convergence. */
  private[graft] final case class SigState(tokf: DataFrame, sig: DataFrame,
      sigCols: Seq[String], sa: DataFrame,
      baseContent: DataFrame, roundMaps: Seq[(Int, DataFrame)])

  private[graft] def buildSignatures(docs: DataFrame, textCol: String,
      idCol: String, minSpan: Int, rounds: Int, baseSpan: Int,
      needSa: Boolean, earlyExit: Boolean = true,
      collectIndex: Boolean = false): SigState = {
    require(minSpan >= 2,
      "minSpan 1 would mark every repeated token — use >= 2")
    require(rounds >= 1 && rounds <= 40, "rounds out of range")
    val baseLog = 31 - Integer.numberOfLeadingZeros(baseSpan)
    require(baseSpan >= 1 && (1 << baseLog) == baseSpan,
      s"baseSpan $baseSpan must be a power of two")
    require(baseLog + rounds <= 40, "baseSpan * 2^rounds out of range")
    // the span ceiling constrains only SA builds — a sig-only build's
    // certificate covers minSpan by decomposition into ≤ 2^maxPartExp
    // spans, independent of the doubling budget
    require(!needSa || minSpan <= (1L << math.min(baseLog + rounds, 30)),
      s"minSpan $minSpan exceeds the largest rank-table span " +
        s"baseSpan*2^rounds — raise rounds ($rounds)")
    // FLAT certificate (r19) for pure sig-only builds: equality of the
    // BASE ranks at stride-baseSpan offsets covering [0, minSpan) — the
    // tail window overlapping at minSpan − baseSpan, the same
    // sound-overlap argument as [[decompose]] — certifies prefix
    // equality directly, with ZERO doubling rounds (each doubling's
    // in-place dense rank costs a range + window exchange of the whole
    // suffix frame; the flat form trades them for a few extra long
    // columns on the sig frame, which shuffles anyway). Only the
    // serving-index build keeps the doubling (its probe maps re-rank a
    // batch level by level) and only SA builds totalize.
    val flatSig = !needSa && !collectIndex
    val parts: Seq[(Int, Int)] =
      if (flatSig) {
        // the flat path bypasses decompose(), so it re-states its
        // guard: with baseSpan > minSpan the offset list below would
        // be EMPTY and `offs.last` would throw an opaque
        // NoSuchElementException instead of this message (ADVICE r19)
        require(minSpan >= baseSpan,
          s"minSpan $minSpan must be >= the base span $baseSpan — the " +
            "certificate cannot cover a span shorter than its base " +
            "window")
        val offs = (0 to (minSpan - baseSpan) by baseSpan).toSeq
        (if (offs.last == minSpan - baseSpan) offs
         else offs :+ (minSpan - baseSpan)).map(o => (baseLog, o))
      } else decompose(minSpan, baseLog)
    val maxPartExp = parts.map(_._1).max
    // sig-only builds stop at the largest certificate span; SA builds
    // must totalize, i.e. double until the caller's budget (or until
    // ranks converge — checked per round below)
    val topExp = if (needSa) baseLog + rounds else maxPartExp
    val needed = parts.map(_._1).toSet + topExp

    // token frame is referenced by the suffix explode AND the final
    // reassembly — materialize once
    val tokf = docs
      .select(col(idCol).as("doc_id"),
        split(coalesce(col(textCol), lit("")), "\\s+").as("__toks"))
      .localCheckpoint(false)
    // suffix = (doc, pos): the token sequence from pos to ITS document's
    // end (generalized suffix array — no cross-document suffixes, which
    // is also what makes doc-unique end sentinels unnecessary: base
    // ranking by the truncated slice array and the doubling's 0-sentinel
    // both encode "end < any token"). The length ceiling applies only
    // to SA builds — sig-only certificate spans never exceed
    // 2^maxPartExp ≤ minSpan, so any doc length is fine there.
    val lenGuard =
      if (!needSa) size(col("__toks")).cast("long")
      else when(size(col("__toks")).cast("long") <= (1L << topExp),
        size(col("__toks")).cast("long"))
        .otherwise(raise_error(lit(
          s"exactSubstrDedup: a document exceeds baseSpan*2^$rounds " +
            "tokens — the doubling cannot totalize the suffix order; " +
            "raise rounds")).cast("long"))
    // window representation: SA builds need the token ARRAY
    // (lexicographic order of the rank must follow element-wise token
    // order — a joined string would mis-order tokens beginning below
    // 0x20, e.g. the q231 U+0001 sentinels); every sig-only path —
    // flat AND doubling/index — needs only rank EQUALITY structure
    // (certificates test equality, probes join keys, the 0-sentinel
    // needs ranks ≥ 1, never their order), and the space-joined
    // STRING is injective (tokens are \s+-split so they cannot
    // contain ' ') while being far cheaper to range-partition, sort,
    // and join than an array<string> key (r20: the array-keyed base
    // rank was ~70% of q229/q231's runtime). The index's probe/absorb
    // sides build the SAME string ([[probeCertificates]]).
    val winOf = (toks: Column, p0: Column) =>
      if (!needSa) concat_ws(" ", slice(toks, p0 + 1, lit(baseSpan)))
      else slice(toks, p0 + 1, lit(baseSpan))
    val sfx = tokf
      .select(col("doc_id"), lenGuard.as("n"), col("__toks"),
        posexplode(col("__toks")).as(Seq("__p0", "__tk")))
      .select(col("doc_id"), (col("__p0") + 1).cast("long").as("pos"),
        col("n"),
        winOf(col("__toks"), col("__p0")).as("__w"))
    // round 0: rank by the first baseSpan tokens directly — via the
    // DISTINCT windows (r19): dense-rank the window VOCABULARY (equal
    // windows share a rank either way, so the rank VALUES are
    // identical to ranking the suffix frame in place), then map ranks
    // onto suffixes by equi-join. The in-place form range-exchanged
    // the corpus-scale suffix frame ON THE WIDE WINDOW-ARRAY KEY and —
    // the measured killer — had the RangePartitioner collect
    // corpus-scale ARRAY samples to the driver (single-threaded sort +
    // GC, the §9z variance); the distinct form's vocabulary frame is
    // corpus-fraction-sized (map-side-combined distinct), its sampling
    // trivial, and the join-back is AQE-broadcastable when the
    // vocabulary is small. Each round's table is re-checkpointed so
    // every consumer scans ONE flat frame.
    val tables = scala.collection.mutable.Map.empty[Int, DataFrame]
    val handles =
      scala.collection.mutable.Map.empty[Int, Seq[org.apache.spark.rdd.RDD[_]]]
    // base round, ALL paths: dense-rank the DISTINCT window
    // vocabulary, then map ranks onto suffixes by equi-join. The
    // distinct stays even for cheap string keys (r20 soak): under
    // real duplication the vocabulary is corpus-FRACTION-sized (the
    // 30× replica corpus holds 15M suffixes but the same ~258k
    // distinct windows), so ranking in place would range-exchange and
    // sort the full suffix frame where the distinct form exchanges
    // only the vocabulary — measured 2× on the 30× memorization
    // report. The string key (flat path, see winOf) still halves the
    // rank+join-back cost vs the array key, and the §9z driver-side
    // array-sampling hazard is gone either way.
    val (wRanked, wRankedH) = {
      val (r0, h) = Ranks.globalDenseRankTracked(
        sfx.select(col("__w")).distinct(), Seq(col("__w")), out = "__br")
      val out = CheckpointHygiene.checkpointTracked(r0, eager = true)
      CheckpointHygiene.free(h)
      out
    }
    val (rk0c, rk0h) = CheckpointHygiene.checkpointTracked(
      sfx.join(wRanked, Seq("__w"))
        .select(col("doc_id"), col("pos"), col("n"), col("__br").as("r")),
      eager = true)
    // the probe index needs CONTENT-addressable ranks: the distinct
    // (window → base rank) map is the only place token text survives —
    // exactly the vocabulary frame the base rank was computed on (kept
    // alive for the index; freed here otherwise, the suffix table
    // carries the ranks from now on)
    val baseContent =
      if (collectIndex) wRanked.select(col("__w"), col("__br").as("r"))
      else { CheckpointHygiene.free(wRankedH); null }
    tables(baseLog) = rk0c; handles(baseLog) = rk0h
    val roundMaps = Seq.newBuilder[(Int, DataFrame)]
    // suffix universe size, for the convergence probe — counted NOW,
    // while the base table's checkpoint is certainly alive (it may be
    // freed as superseded inside the first loop iteration)
    val nSfx = if (earlyExit && needSa) rk0c.count() else -1L
    var builtTop = baseLog
    var converged = false
    (1 to (topExp - baseLog)).foreach { j =>
      val e = baseLog + j
      if (!converged) {
        val m = 1L << (e - 1)
        val prev = tables(e - 1)
        // partner rank at pos + m, fetched by shifting the table by −m so
        // the lookup is a plain (doc, pos) equi-join of the checkpointed
        // table with itself; 0-sentinel = "suffix ends before pos+m",
        // sorting before every real rank (end-of-doc < any token —
        // standard lexicographic shorter-prefix-first)
        val partner = prev.select(col("doc_id"),
          (col("pos") - m).as("pos"), col("r").as("__r2"))
        val keyed = prev.join(partner, Seq("doc_id", "pos"), "left")
          .select(col("doc_id"), col("pos"), col("n"),
            col("r").as("__r1"), coalesce(col("__r2"), lit(0L)).as("__r2"))
        // in-place dense rank of the (r1, r2) key — never a global
        // window, never a distinct + join-back
        val (ranked, rh) = Ranks.globalDenseRankTracked(keyed,
          Seq(col("__r1"), col("__r2")), out = "__nr")
        val (next, h) = CheckpointHygiene.checkpointTracked(
          ranked.select(col("doc_id"), col("pos"), col("n"),
            col("__nr").as("r")),
          eager = true)
        if (collectIndex && e <= maxPartExp)
          roundMaps += ((e, ranked
            .select(col("__r1").as("r1"), col("__r2").as("r2"),
              col("__nr").as("r"))
            .distinct().localCheckpoint(true)))
        CheckpointHygiene.free(rh)
        tables(e) = next; handles(e) = h
        builtTop = e
        // predecessor superseded — free unless the LCP certificate needs it
        if (!needed.contains(e - 1)) {
          CheckpointHygiene.free(handles(e - 1)); handles.remove(e - 1)
        }
        // convergence: once every suffix holds a distinct rank, further
        // doubling is the identity — stop paying for it. Only legal at
        // or beyond the largest certificate span (the parts tables must
        // exist physically)
        if (earlyExit && needSa && e >= maxPartExp && e < topExp)
          converged =
            next.agg(max(col("r"))).head.getLong(0) == nSfx
      }
    }
    // table lookup with convergence substitution: rank equality at any
    // span beyond the converged one is rank equality AT the converged
    // one (all ranks distinct ⇒ no equalities either way)
    def tbl(e: Int): DataFrame = tables(math.min(e, builtTop))
    // suffix array: the top rank totalized by (doc, pos) — referenced by
    // both adjacency sides, materialize once
    val sa =
      if (!needSa) null
      else {
        val (ranked, rh) = Ranks.globalRowNumberTracked(tbl(topExp),
          Seq(col("r"), col("doc_id"), col("pos")), out = "__t")
        val out = ranked
          .select(col("doc_id"), col("pos"), col("n"), col("__t"))
          .localCheckpoint(true)
        CheckpointHygiene.free(rh)
        out
      }
    // LCP ≥ minSpan signature: rank_{2^k} at pos+off for each
    // decomposition part, over suffixes long enough to hold the span
    // (the length gate). All parts exist (inner joins keep every gated
    // suffix: pos+off+2^k−1 ≤ pos+minSpan−1 ≤ n).
    val sigCols = parts.indices.map(i => s"__s$i")
    // base the gated frame on the top rank table (it already carries
    // (doc_id, pos, n) — sa would add a useless column to the joins)
    var sig: DataFrame =
      if (flatSig) {
        // every flat certificate part reads the SAME base table at a
        // fixed positive offset, so the whole tuple is ONE per-doc
        // window pass (`lead(r, off)` — each pos in 1..n is present
        // exactly once, so the lead at off IS the rank at pos + off,
        // and gated rows satisfy pos + off <= pos + minSpan − baseSpan
        // <= n so no lead is null): one doc-keyed exchange instead of
        // the join chain's |parts| suffix-table shuffles (r20 — q229/
        // q231 spent most of their time in those seven joins)
        val wDoc = org.apache.spark.sql.expressions.Window
          .partitionBy(col("doc_id")).orderBy(col("pos"))
        parts.zipWithIndex.foldLeft(tables(baseLog)) {
          case (df, ((_, off), i)) =>
            df.withColumn(s"__s$i",
              if (off == 0) col("r")
              else lead(col("r"), off).over(wDoc))
        }
          .filter(col("n") - col("pos") + 1 >= minSpan)
          .select(col("doc_id") +: col("pos") +: sigCols.map(col): _*)
      } else {
        var s0: DataFrame = tbl(topExp)
          .filter(col("n") - col("pos") + 1 >= minSpan)
          .select(col("doc_id"), col("pos"))
        parts.zipWithIndex.foreach { case ((k, off), i) =>
          s0 = s0.join(
            tbl(k).select(col("doc_id"), (col("pos") - off).as("pos"),
              col("r").as(s"__s$i")),
            Seq("doc_id", "pos"))
        }
        s0
      }
    sig = sig.localCheckpoint(true)
    handles.valuesIterator.foreach(CheckpointHygiene.free)
    SigState(tokf, sig, sigCols, sa, baseContent, roundMaps.result())
  }

  /** Shared span-removal tail: merge the removed (doc, pos) starts
    * into per-doc interval unions (gaps-and-islands; windows are
    * PER-DOC partitions, never corpus-scale) and reassemble each doc
    * from its uncovered tokens. */
  private def removeSpans(tokf: DataFrame, removedStarts: DataFrame,
      minSpan: Int): DataFrame = {
    val removed = removedStarts.localCheckpoint(false)
    val wOrd = Window.partitionBy(col("doc_id")).orderBy(col("s"))
    val iv = removed
      .select(col("doc_id"), col("pos").as("s"),
        (col("pos") + (minSpan - 1)).as("e"))
      .withColumn("__pm",
        max(col("e")).over(wOrd.rowsBetween(Window.unboundedPreceding, -1)))
      .withColumn("__new",
        when(col("__pm").isNull || col("s") > col("__pm"), 1L)
          .otherwise(0L))
      .withColumn("__isl",
        sum(col("__new")).over(wOrd.rowsBetween(Window.unboundedPreceding, 0)))
    val perDoc = iv.groupBy(col("doc_id"), col("__isl"))
      .agg(min(col("s")).as("s"), max(col("e")).as("e"))
      .groupBy(col("doc_id"))
      .agg(array_sort(collect_list(struct(col("s"), col("e")))).as("__ivs"),
        sum(col("e") - col("s") + 1).as("n_dropped"))
    val nRem = removed.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_removed_starts"))
    tokf
      .select(col("doc_id"), col("__toks"),
        size(col("__toks")).cast("long").as("n_tokens"))
      .join(nRem, Seq("doc_id"), "left")
      .join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_tokens"),
        coalesce(col("n_removed_starts"), lit(0L)).as("n_removed_starts"),
        coalesce(col("n_dropped"), lit(0L)).as("n_dropped"),
        when(col("__ivs").isNull, concat_ws(" ", col("__toks")))
          .otherwise(concat_ws(" ", filter(col("__toks"),
            (_: Column, i: Column) => !exists(col("__ivs"),
              iv => (i.cast("long") + 1L) >= iv.getField("s") &&
                (i.cast("long") + 1L) <= iv.getField("e")))))
          .as("text"))
  }
}
