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
      minSpan: Int = 50, rounds: Int = 14, baseSpan: Int = 8): DataFrame = {
    val st = buildSignatures(docs, textCol, idCol, minSpan, rounds,
      baseSpan, needSa = true)
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

  /** The shared rank/signature machinery: builds the doubling tables,
    * the length-gated LCP ≥ minSpan signature frame (checkpointed),
    * and — when `needSa` — the totalized suffix-array order. Frees
    * every superseded rank checkpoint before returning. */
  private[graft] final case class SigState(tokf: DataFrame, sig: DataFrame,
      sigCols: Seq[String], sa: DataFrame)

  private[graft] def buildSignatures(docs: DataFrame, textCol: String,
      idCol: String, minSpan: Int, rounds: Int, baseSpan: Int,
      needSa: Boolean): SigState = {
    require(minSpan >= 2,
      "minSpan 1 would mark every repeated token — use >= 2")
    require(rounds >= 1 && rounds <= 40, "rounds out of range")
    val baseLog = 31 - Integer.numberOfLeadingZeros(baseSpan)
    require(baseSpan >= 1 && (1 << baseLog) == baseSpan,
      s"baseSpan $baseSpan must be a power of two")
    require(baseLog + rounds <= 40, "baseSpan * 2^rounds out of range")
    require(minSpan <= (1L << math.min(baseLog + rounds, 30)),
      s"minSpan $minSpan exceeds the largest rank-table span " +
        s"baseSpan*2^rounds — raise rounds ($rounds)")
    val parts = decompose(minSpan, baseLog)
    val topExp = baseLog + rounds
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
    // both encode "end < any token")
    val lenGuard =
      when(size(col("__toks")).cast("long") <= (1L << topExp),
        size(col("__toks")).cast("long"))
        .otherwise(raise_error(lit(
          s"exactSubstrDedup: a document exceeds baseSpan*2^$rounds " +
            "tokens — the doubling cannot totalize the suffix order; " +
            "raise rounds")).cast("long"))
    val sfx = tokf
      .select(col("doc_id"), lenGuard.as("n"), col("__toks"),
        posexplode(col("__toks")).as(Seq("__p0", "__tk")))
      .select(col("doc_id"), (col("__p0") + 1).cast("long").as("pos"),
        col("n"),
        slice(col("__toks"), col("__p0") + 1, lit(baseSpan)).as("__w"))
    // round 0: rank by the first baseSpan tokens directly — one
    // in-place dense rank over the window arrays. Each round's table is
    // re-checkpointed after the (map-only) offset join so every
    // consumer scans ONE flat frame; the rank call's internal
    // consistency checkpoint is freed as soon as that lands
    val (rkBaseRanked, rkBaseH) =
      Ranks.globalDenseRankTracked(sfx, Seq(col("__w")), out = "__br")
    val tables = scala.collection.mutable.Map.empty[Int, DataFrame]
    val handles =
      scala.collection.mutable.Map.empty[Int, Seq[org.apache.spark.rdd.RDD[_]]]
    val (rk0c, rk0h) = CheckpointHygiene.checkpointTracked(
      rkBaseRanked
        .select(col("doc_id"), col("pos"), col("n"), col("__br").as("r")),
      eager = true)
    tables(baseLog) = rk0c; handles(baseLog) = rk0h
    CheckpointHygiene.free(rkBaseH)
    (1 to rounds).foreach { j =>
      val e = baseLog + j
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
      CheckpointHygiene.free(rh)
      tables(e) = next; handles(e) = h
      // predecessor superseded — free unless the LCP certificate needs it
      if (!needed.contains(e - 1)) {
        CheckpointHygiene.free(handles(e - 1)); handles.remove(e - 1)
      }
    }
    // suffix array: the top rank totalized by (doc, pos) — referenced by
    // both adjacency sides, materialize once
    val sa =
      if (!needSa) null
      else {
        val (ranked, rh) = Ranks.globalRowNumberTracked(tables(topExp),
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
    var sig: DataFrame = tables(topExp)
      .filter(col("n") - col("pos") + 1 >= minSpan)
      .select(col("doc_id"), col("pos"))
    parts.zipWithIndex.foreach { case ((k, off), i) =>
      sig = sig.join(
        tables(k).select(col("doc_id"), (col("pos") - off).as("pos"),
          col("r").as(s"__s$i")),
        Seq("doc_id", "pos"))
    }
    sig = sig.localCheckpoint(true)
    handles.valuesIterator.foreach(CheckpointHygiene.free)
    SigState(tokf, sig, sigCols, sa)
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
