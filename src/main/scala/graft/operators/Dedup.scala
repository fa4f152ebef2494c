package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Document-deduplication operators for large-scale training-data
  * pipelines. All are pure DataFrame programs: shuffles only on
  * hash/bucket keys, no driver-side loops, so they scale horizontally
  * (the LSH variants exist precisely so the 100 TB path never computes
  * an O(N²) pairwise product — candidate generation is an equi-join on
  * (band, signature) buckets).
  */
object Dedup {

  /** Candidate probability of MinHash-LSH banding at true Jaccard `s`
    * — the S-curve P(candidate) = 1 − (1 − s^rows)^bands. */
  def sCurve(bands: Int, rows: Int, s: Double): Double =
    1.0 - math.pow(1.0 - math.pow(s, rows), bands)

  /** Optimal (bands, rows) for MinHash-LSH banding: enumerate every
    * (b, r) with b·r ≤ `numHashesBudget` and pick the pair minimizing
    * the S-curve's total error mass around the target `threshold` —
    *
    *   ∫₀ᵗ P(cand|s) ds  (false-positive mass: verify work wasted on
    *                      below-threshold pairs)
    * + `fnWeight` · ∫ₜ¹ (1 − P(cand|s)) ds  (false-negative mass:
    *                      true near-dups the banding silently loses)
    *
    * integrated by a fixed 1000-point midpoint rule (deterministic —
    * no RNG, no closed form needed). `fnWeight` defaults to 10:
    * in a dedup sweep a lost duplicate is contamination that survives
    * into training data, while a false candidate only costs one exact
    * verify — the asymmetric pricing every curation pipeline
    * implicitly uses. Ties break (fewer hashes used, fewer rows,
    * fewer bands) — a total order, so the solver is deterministic.
    *
    * This is the TUNE side of the tune→measure loop: feed the chosen
    * pair to [[minhashLshPortable]] / `SketchParams`, then audit the
    * realized precision/recall on a corpus sample with
    * [[lshFidelity]] — the S-curve is i.i.d.-permutation theory, the
    * audit is the measured answer (q144). Pure driver-side
    * arithmetic over ≤ budget·H(budget) candidate pairs — nothing
    * distributed to optimize. */
  def optimalBanding(threshold: Double, numHashesBudget: Int,
      fnWeight: Double = 10.0): (Int, Int) = {
    require(threshold > 0.0 && threshold < 1.0,
      "threshold must be in (0, 1)")
    require(numHashesBudget >= 1, "budget must be >= 1")
    require(fnWeight >= 0.0, "fnWeight must be >= 0")
    val grid = 1000
    def objective(b: Int, r: Int): Double = {
      var fp = 0.0
      var fn = 0.0
      var i = 0
      while (i < grid) {
        val s = (i + 0.5) / grid
        val p = sCurve(b, r, s)
        if (s < threshold) fp += p else fn += (1.0 - p)
        i += 1
      }
      (fp + fnWeight * fn) / grid
    }
    val candidates = for {
      r <- 1 to numHashesBudget
      b <- 1 to numHashesBudget / r
    } yield (objective(b, r), b * r, r, b)
    val best = candidates.min
    (best._4, best._3)
  }

  /** Default posting-list cap for [[containmentJoin]]: a shingle
    * appearing in more than this many documents is treated as
    * boilerplate and excluded from the containment arithmetic (the
    * retained-space contract documented on the operator). 10k bounds
    * any single shingle's posting self-join at ~10⁸ pairs — heavy but
    * finite on a 1000-executor cluster — while sitting far above any
    * df a genuinely distinctive shingle reaches. */
  val DefaultContainmentMaxDf = 10000

  /** Exact dedup: group identical normalized texts, keep the minimum id.
    * One hash-partitioned aggregation; at scale, group on a 128-bit digest
    * of the text (not the text itself) to keep shuffle rows narrow. */
  def exact(docs: DataFrame, textCol: String, idCol: String): DataFrame =
    docs.groupBy(md5(col(textCol)).as("text_hash"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_copies"))

  /** Word n-gram shingle set (distinct) of a text column — one codegen'd
    * kernel pass ([[graft.functions.ShingleKernel]]). Equivalent builtin
    * chain (kept as the executable spec; `KernelPropertySpec` asserts
    * set-equality between the two): `array_distinct(transform(
    * sequence(0, size(toks)-n), i -> concat_ws(" ", slice(toks, i+1, n))))`
    * over `toks = split(trim(text), "\\s+")`, degrading to the single
    * all-tokens shingle below n tokens. The builtin form evaluates as
    * nested higher-order functions with per-element array slices — the
    * kernel is one scan with a reused buffer, which matters because the
    * shingle stage runs once per document in every sketch pipeline. */
  def shingles(text: Column, n: Int): Column =
    // the kernel is null-intolerant (null text -> NULL), but the shingle
    // contract predates it: null/empty docs yield the single empty shingle
    // [""] so they still pair with each other in the sketch pipelines.
    // coalesce restores that contract over the kernel's fast path.
    coalesce(graft.functions.exprs.word_ngrams(text, n), array(lit("")))

  /** The pure-builtin twin of [[shingles]] (the executable spec the
    * kernel is property-tested against). */
  def shinglesBuiltin(text: Column, n: Int): Column = {
    val toks = split(trim(text), "\\s+")
    when(size(toks) >= n,
      array_distinct(transform(
        sequence(lit(0), size(toks) - n),
        i => concat_ws(" ", slice(toks, i + lit(1), lit(n))))))
      .otherwise(array(concat_ws(" ", toks)))
  }

  /** Hashed word n-gram shingle set — one codegen'd kernel pass
    * ([[graft.functions.ShingleKernel.wordNgramHashesUTF8]]): tokens are
    * xxhash64'd in place over the UTF-8 bytes, windows of n token-hashes
    * seed-chained, distinct. Downstream shuffles carry 8-byte longs
    * instead of n-gram strings; collision probability per pair is ~2⁻⁶⁴.
    * Bit-identical to [[shingleHashSetBuiltin]] (property-asserted).
    * Returns (doc, sh) with `sh: array<bigint>`. */
  def shingleHashSet(docs: DataFrame, textCol: String, idCol: String,
      n: Int): DataFrame =
    docs.select(col(idCol).as("doc"),
      graft.functions.exprs.word_ngram_hashes(col(textCol), n).as("sh"))

  /** The pure-builtin twin of [[shingleHashSet]] (the executable spec the
    * kernel is property-tested against): tokens hashed ONCE into a
    * materialized intermediate column, then each window of n token-hashes
    * combined with a fixed-width `xxhash64`. The intermediate MUST be its
    * own projection — inlining it would make Catalyst re-evaluate the
    * token-hash transform for every element_at reference (O(tokens²·n)). */
  def shingleHashSetBuiltin(docs: DataFrame, textCol: String, idCol: String,
      n: Int): DataFrame = {
    val th = col("__th")
    docs
      .select(col(idCol).as("doc"),
        transform(split(trim(col(textCol)), "\\s+"), t => xxhash64(t))
          .as("__th"))
      .select(col("doc"),
        when(size(th) >= n,
          array_distinct(transform(
            sequence(lit(0), size(th) - n),
            i => xxhash64((1 to n).map(o => element_at(th, i + lit(o))): _*))))
          .otherwise(array(xxhash64(th))).as("sh"))
  }

  /** MinHash signature over hashed shingles: the k independent hash
    * functions re-hash the fixed-width shingle hash with a per-function
    * salt (`xxhash64(h, j)`) — overflow-free under ANSI mode (no raw
    * 64-bit multiplies). */
  def minhashSignature(shingleHashSet: Column, k: Int): Column =
    array((0 until k).map { j =>
      array_min(transform(shingleHashSet, h => xxhash64(h, lit(j))))
    }: _*)

  /** MinHash + LSH banding: returns candidate near-duplicate pairs
    * (id_a < id_b) with their estimated and exact n-gram Jaccard.
    *
    * Pipeline: shingle → k-minhash → b bands of r rows → explode bands →
    * self-equi-join on (band, band_signature) → distinct pairs → verify
    * with exact Jaccard over the shingle sets. The bucket join is the only
    * shuffle that grows with corpus size.
    */
  def minhashLsh(
      docs: DataFrame, textCol: String, idCol: String,
      ngram: Int = 3, numHashes: Int = 16, bands: Int = 4,
      jaccardThreshold: Double = 0.5,
      materialize: Boolean = true): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val rows = numHashes / bands
    // the shingle frame feeds candidate generation AND both verify joins;
    // DataFrame reuse duplicates subplans (no auto CTE materialization in
    // Spark), so stage-materialize it once — the same boundary a
    // production dedup pipeline gets by persisting candidates between
    // stages. lazy (eager=false): nothing runs until the query executes.
    val shRaw = shingleHashSet(docs, textCol, idCol, ngram)
    val sh0 = if (materialize) shRaw.localCheckpoint(false) else shRaw
    val sig = sh0.withColumn("sig", minhashSignature(col("sh"), numHashes))
    // bucket join carries ONLY (band, band_sig, doc id) — the shingle
    // arrays never enter the candidate-generation shuffle
    val banded = sig.select(
      col("doc"),
      posexplode(array((0 until bands).map { b =>
        xxhash64(concat_ws(",",
          (0 until rows).map(r => col("sig").getItem(b * rows + r)): _*))
      }: _*)).as(Seq("band", "band_sig")))
    val a = banded.select(col("band"), col("band_sig"), col("doc").as("id_a"))
    val b = banded.select(col("band"), col("band_sig"), col("doc").as("id_b"))
    val candidates = a.join(b, Seq("band", "band_sig"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()
    // verify each candidate pair exactly ONCE against the shingle sets
    val shA = sig.select(col("doc").as("id_a"), col("sh").as("sh_a"))
    val shB = sig.select(col("doc").as("id_b"), col("sh").as("sh_b"))
    candidates.join(shA, Seq("id_a")).join(shB, Seq("id_b"))
      .select(col("id_a"), col("id_b"),
        (size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
          size(array_union(col("sh_a"), col("sh_b")))).as("jaccard"))
      .filter(col("jaccard") >= jaccardThreshold)
  }

  /** Exact n-gram Jaccard similarity join via posting-list counting:
    * |A∩B| = the number of co-occurring distinct shingles = COUNT per pair
    * of the inverted-index self-join, and |A∪B| = |A|+|B|-|A∩B|. Per-doc
    * set sizes ride along on the posting rows (one window pass) so the
    * whole join needs exactly TWO evaluations of the shingle subplan and
    * never shuffles a shingle array. Ubiquitous shingles make the
    * self-join grow quadratically — that is inherent to inverted-index
    * candidate generation; at scale either cap them with `maxDf`
    * (standard in the dedup literature: shingles present in more than
    * `maxDf` docs carry no discriminative signal and are dropped BEFORE
    * the self-join; Jaccard is then computed exactly over the retained
    * shingle space, per-doc sizes re-counted after the filter) or use
    * MinHash-LSH as the sweep path. */
  def ngramJaccardJoin(
      docs: DataFrame, textCol: String, idCol: String,
      ngram: Int = 3, threshold: Double = 0.8,
      materialize: Boolean = true, maxDf: Option[Int] = None): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val shRaw = shingleHashSet(docs, textCol, idCol, ngram)
    // both posting branches re-evaluate the shingle subplan otherwise
    val sh = if (materialize) shRaw.localCheckpoint(false) else shRaw
    // explode_outer, NOT explode: InferFiltersFromGenerate would add
    // size(sh)>0 / isnotnull(sh) filters whose pushdown re-inlines the
    // whole shingle expression into a per-row Filter (catastrophic — the
    // subplan is expensive); the outer variant is exempt, and `sh` is
    // non-empty by construction so the semantics are identical
    val posting0 = sh.select(col("doc"), explode_outer(col("sh")).as("g"))
    val capped = maxDf match {
      case Some(cap) =>
        // keep-list semi-join, NOT a window over g: per-shingle df is a
        // map-side-combined aggregation, so a viral shingle never lands
        // as one giant window partition on a single task
        val keep = posting0.groupBy(col("g"))
          .agg(count(lit(1)).as("__df"))
          .filter(col("__df") <= cap).select(col("g"))
        posting0.join(keep, Seq("g"), "left_semi")
      case None => posting0
    }
    // per-doc sizes counted AFTER the cap so the Jaccard stays exact over
    // the retained shingle space
    val posting = capped
      .withColumn("n", count(lit(1)).over(Window.partitionBy(col("doc"))))
    val a = posting.select(col("g"), col("doc").as("id_a"), col("n").as("n_a"))
    val b = posting.select(col("g"), col("doc").as("id_b"), col("n").as("n_b"))
    a.join(b, Seq("g"))
      .filter(col("id_a") < col("id_b"))
      .groupBy("id_a", "id_b")
      .agg(count(lit(1)).as("c"), first("n_a").as("n_a"), first("n_b").as("n_b"))
      .select(col("id_a"), col("id_b"),
        (col("c").cast("double") / (col("n_a") + col("n_b") - col("c")))
          .as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  /** Prefix-filtered set-similarity self-join — the EXACT all-pairs
    * Jaccard join with PPJoin-family candidate pruning (Xiao et al.
    * 2011, "Efficient Similarity Joins for Near-Duplicate Detection",
    * TODS 36(3); prefix filtering from Chaudhuri et al., ICDE 2006).
    * Each doc's word set is ordered by ascending global document
    * frequency; two sets with Jaccard ≥ t MUST share a token in their
    * first `|s| − ceil(t·|s|) + 1` tokens, so the candidate self-join
    * runs over those short, rare-token prefixes instead of full posting
    * lists — the rarest tokens generate the fewest collisions, which is
    * why the df-ascending order matters. A length filter
    * (`t·max(|a|,|b|) ≤ min(|a|,|b|)`) prunes size-incompatible pairs
    * before verification. No false negatives (unlike MinHash): this is
    * the exact middle ground between [[ngramJaccardJoin]] (full posting
    * lists) and [[minhashLsh]] (probabilistic sweep).
    *
    * The threshold is a FRACTION `tNum/tDen` so the prefix length and
    * the final filter are pure integer arithmetic — `ceil(t·n)` as
    * `(tNum·n + tDen − 1) DIV tDen` — identical in any engine (a double
    * `ceil(0.6·5)` is 4, not 3, under IEEE rounding; the fraction form
    * has no such trap).
    *
    * Scale shape: df is one map-side-combined aggregation; the per-doc
    * rank window partitions by doc (sets are small); the candidate join
    * shuffles (token, doc, n) prefix rows only; verification joins the
    * candidate pairs back to the full token postings, cost proportional
    * to candidates × set size, never corpus². Viral tokens sort
    * df-last and rarely enter prefixes — more resistant to posting
    * blowup than [[ngramJaccardJoin]]'s `maxDf` cap (which changes
    * semantics; this doesn't).
    *
    * PRECONDITION for that selectivity: a Zipfian vocabulary with a
    * rare tail, which real text has. On a degenerate corpus where every
    * token is ubiquitous (the synthetic fixture has ~31 distinct words),
    * prefixes cannot discriminate and candidates degrade toward
    * all-pairs — exactness is preserved, runtime is not; use
    * [[minhashLsh]] as the sweep there. */
  def prefixFilterJoin(
      docs: DataFrame, textCol: String, idCol: String,
      tNum: Int = 1, tDen: Int = 2,
      materialize: Boolean = true): DataFrame = {
    require(tNum > 0 && tDen >= tNum, "threshold must be in (0, 1]")
    import org.apache.spark.sql.expressions.Window
    val norm = trim(regexp_replace(col(textCol), "[ \\t\\n\\x0B\\f\\r]+", " "))
    val toksRaw = docs.select(col(idCol).as("doc"),
        explode(filter(split(norm, " "), w => w =!= "")).as("w"))
      .distinct()
    // tokens feed df, the rank join, and BOTH verify joins
    val toks = if (materialize) toksRaw.localCheckpoint(false) else toksRaw
    val df = toks.groupBy(col("w")).agg(count(lit(1)).as("__df"))
    val wDoc = Window.partitionBy(col("doc"))
    val ranked = toks.join(df, Seq("w"))
      .withColumn("__rn",
        row_number().over(wDoc.orderBy(col("__df"), col("w"))))
      .withColumn("__n", count(lit(1)).over(wDoc))
    val prefix = ranked.filter(col("__rn") <=
      col("__n") - expr(s"($tNum * __n + ${tDen - 1}) DIV $tDen") + 1)
    val cand = prefix
      .select(col("w"), col("doc").as("id_a"), col("__n").as("n_a"))
      .join(prefix.select(col("w"), col("doc").as("id_b"),
        col("__n").as("n_b")), Seq("w"))
      .filter(col("id_a") < col("id_b"))
      .filter(greatest(col("n_a"), col("n_b")) * tNum <=
        least(col("n_a"), col("n_b")) * tDen)
      .select(col("id_a"), col("id_b"), col("n_a"), col("n_b"))
      .distinct()
    cand
      .join(toks.select(col("doc").as("id_a"), col("w")), Seq("id_a"))
      .join(toks.select(col("doc").as("id_b"), col("w")), Seq("id_b", "w"))
      .groupBy(col("id_a"), col("id_b"))
      .agg(count(lit(1)).as("n_shared"),
        first(col("n_a")).as("n_a"), first(col("n_b")).as("n_b"))
      .filter(col("n_shared") * tDen >=
        (col("n_a") + col("n_b") - col("n_shared")) * tNum)
      .select(col("id_a"), col("id_b"), col("n_shared"),
        (col("n_shared").cast("double") /
          (col("n_a") + col("n_b") - col("n_shared"))).as("jaccard"))
  }

  /** Cross-corpus MinHash-LSH join — the INCREMENTAL dedup form: find
    * near-duplicate pairs between a new batch and a historical corpus
    * without self-joining either side. Same banding as [[minhashLsh]];
    * candidate generation is an equi-join of the two banded sides, so a
    * small new batch probes a huge corpus at cost proportional to the
    * batch, not the corpus. */
  def minhashLshJoin(
      newDocs: DataFrame, corpus: DataFrame,
      textCol: String, idCol: String,
      ngram: Int = 3, numHashes: Int = 16, bands: Int = 4,
      jaccardThreshold: Double = 0.5): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val (newBanded, newSh) =
      bandedXx(newDocs, textCol, idCol, ngram, numHashes, bands,
        "new", eager = false)
    val (corpusBanded, corpusSh) =
      bandedXx(corpus, textCol, idCol, ngram, numHashes, bands,
        "corpus", eager = false)
    val candidates = newBanded.join(corpusBanded, Seq("band", "band_sig"))
      .select("new_id", "corpus_id").distinct()
    candidates
      .join(newSh, Seq("new_id"))
      .join(corpusSh, Seq("corpus_id"))
      .select(col("new_id"), col("corpus_id"),
        (size(array_intersect(col("sh_new"), col("sh_corpus"))).cast("double") /
          size(array_union(col("sh_new"), col("sh_corpus")))).as("jaccard"))
      .filter(col("jaccard") >= jaccardThreshold)
  }

  /** One side of the xxhash fast-path LSH join: banded signatures
    * `(band, band_sig, <side>_id)` plus the shingle sets
    * `(<side>_id, sh_<side>)` the verify join needs. The shingle frame is
    * checkpointed (eagerly when the caller will reuse the frames across
    * many probe batches, lazily for a one-shot join); posexplode_outer
    * dodges the InferFiltersFromGenerate re-inlining trap (the band array
    * is a non-empty literal array, so semantics are identical). */
  private def bandedXx(
      docs: DataFrame, textCol: String, idCol: String,
      ngram: Int, numHashes: Int, bands: Int,
      side: String, eager: Boolean): (DataFrame, DataFrame) = {
    val rows = numHashes / bands
    val sh = shingleHashSet(docs, textCol, idCol, ngram)
      .localCheckpoint(eager)
    val sig = sh.withColumn("sig", minhashSignature(col("sh"), numHashes))
    (sig.select(col("doc").as(s"${side}_id"),
      posexplode_outer(array((0 until bands).map { b =>
        xxhash64(concat_ws(",",
          (0 until rows).map(r => col("sig").getItem(b * rows + r)): _*))
      }: _*)).as(Seq("band", "band_sig"))),
      sh.select(col("doc").as(s"${side}_id"), col("sh").as(s"sh_$side")))
  }

  /** Corpus-side incremental-dedup state, computed ONCE and probed by any
    * number of batches: the distinct exact fingerprints, the banded LSH
    * signatures, and the shingle sets the verify join needs. All three
    * frames are eagerly materialized (localCheckpoint), so a probe pays
    * corpus-side cost zero times — the shape that keeps a streaming
    * ingest's per-batch latency proportional to the BATCH, not the
    * history. At durable-production scale the same three frames would
    * live as bucketed tables; the boundary (probe joins against
    * precomputed frames) is identical. */
  final case class PreparedCorpus private[operators] (
      fingerprints: DataFrame, // (__fp) distinct md5(text)
      banded: DataFrame,       // (band, band_sig, corpus_id)
      shingleSets: DataFrame,  // (corpus_id, sh_corpus)
      ngram: Int, numHashes: Int, bands: Int)

  def prepareCorpus(
      corpus: DataFrame, textCol: String, idCol: String,
      ngram: Int = 3, numHashes: Int = 16, bands: Int = 4): PreparedCorpus = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val (banded, sh) =
      bandedXx(corpus, textCol, idCol, ngram, numHashes, bands,
        "corpus", eager = true)
    PreparedCorpus(
      corpus.select(md5(col(textCol)).as("__fp")).distinct()
        .localCheckpoint(true),
      banded.localCheckpoint(true),
      sh, ngram, numHashes, bands)
  }

  /** Persist a [[PreparedCorpus]] as a parquet model artifact — the
    * text-dedup twin of [[Ann.saveCentroids]]: the corpus-side state
    * (fingerprints, banded signatures, shingle sets) that
    * [[prepareCorpus]] computes once per corpus survives the session,
    * so a restarted streaming ingest (or a different cluster) probes
    * the SAME index without re-scanning the historical corpus — the
    * operational requirement of a long-running dedup service at 100 TB
    * (re-preparing there means re-reading the corpus). Band parameters
    * ride along in a one-row frame and are validated on load.
    *
    * CRASH-ATOMIC via [[graft.model.IndexStore]] (ADVICE r17/r19): the
    * three frames are multi-file parquet writes, so a naive
    * overwrite-in-place save that dies midway would leave a torn
    * artifact that rehydrates with MIXED-generation frames
    * (fingerprints gen N over banded gen N−1 — silently wrong screen
    * semantics). Each save lands in a fresh `g<gen>/` directory whose
    * one-row `params` table is written LAST as the IN-DIRECTORY commit
    * marker, so nothing about any prior generation is touched mid-save
    * and [[loadCorpusIndex]] walks back to the newest COMPLETE
    * generation (the stale-but-consistent index, the documented
    * ≤ save-cadence exposure). A genuinely absent artifact throws
    * `AnalysisException` — the loud fall-back-to-seed signal. Callers
    * holding lazy scans over a previously-loaded artifact must
    * checkpoint before saving over it (the
    * [[graft.streaming.EventStreams.curationIngest]] rehydrate does). */
  def saveCorpusIndex(prepared: PreparedCorpus, path: String): Unit = {
    val spark = prepared.banded.sparkSession
    import spark.implicits._
    graft.model.IndexStore.save(path,
      Seq("fingerprints" -> prepared.fingerprints,
        "banded" -> prepared.banded,
        "shingles" -> prepared.shingleSets),
      Seq((prepared.ngram, prepared.numHashes, prepared.bands))
        .toDF("ngram", "num_hashes", "bands"))
    ()
  }

  /** Load a [[saveCorpusIndex]] artifact. The frames come back as plain
    * parquet scans — serving probes read the index files, never the
    * original corpus — and [[incrementalDedupPrepared]] output is
    * bit-identical to the freshly-prepared index (spec-gated). Frame
    * resolution (newest complete generation, torn saves skipped, legacy
    * flat layout) is [[graft.model.IndexStore.load]]; a genuinely
    * absent artifact surfaces as `AnalysisException` — the loud
    * fall-back-to-seed signal, never a silently inconsistent index. */
  def loadCorpusIndex(spark: org.apache.spark.sql.SparkSession,
      path: String): PreparedCorpus = {
    val (p, frameDir) = graft.model.IndexStore.load(spark, path)
    def field(name: String): Int = {
      require(!p.isNullAt(p.fieldIndex(name)),
        s"loadCorpusIndex: params field '$name' at $path is NULL")
      p.getAs[Int](name)
    }
    val (ngram, numHashes, bands) =
      (field("ngram"), field("num_hashes"), field("bands"))
    require(ngram >= 1 && numHashes >= 1 && bands >= 1,
      s"loadCorpusIndex: params must be positive, got ngram=$ngram " +
        s"num_hashes=$numHashes bands=$bands")
    require(numHashes % bands == 0,
      s"loadCorpusIndex: bands ($bands) must divide num_hashes " +
        s"($numHashes) — artifact at $path is inconsistent")
    PreparedCorpus(
      spark.read.parquet(s"$frameDir/fingerprints"),
      spark.read.parquet(s"$frameDir/banded"),
      spark.read.parquet(s"$frameDir/shingles"),
      ngram, numHashes, bands)
  }

  /** Index MAINTENANCE — absorb a batch of (already deduplicated) docs
    * into a [[PreparedCorpus]] without re-preparing the history: the
    * batch's fingerprints/signatures/shingles compute batch-locally
    * and UNION onto the prepared frames — the text-dedup analog of
    * [[Ann.knnGraphMerge]], closing the ingest loop
    * (screen batch → keep novel → absorb novel → next batch probes
    * them). Result ≡ `prepareCorpus(corpus ∪ batch)` (spec-gated in
    * `StreamingDedupSpec`): every stage of the prepare pipeline is
    * per-doc, so union-after equals prepare-of-union exactly.
    * Cost ∝ batch; the returned frames are lazy unions of
    * already-materialized parents (checkpoint the result — or
    * [[saveCorpusIndex]] it — every few generations, the descent-loop
    * hygiene). */
  def updateCorpusIndex(prepared: PreparedCorpus, newDocs: DataFrame,
      textCol: String, idCol: String): PreparedCorpus = {
    val (banded, sh) = bandedXx(newDocs, textCol, idCol, prepared.ngram,
      prepared.numHashes, prepared.bands, "corpus", eager = false)
    // Fingerprint distinctness maintained INCREMENTALLY: the history
    // side is already distinct (the prepare/absorb invariant), so only
    // the batch needs a batch-scale distinct plus an anti-join screen
    // against history — never a history-scale re-distinct per absorb.
    // When the caller absorbs dedup SURVIVORS (the streaming-ingest
    // contract: exact dups were already screened out), the anti-join
    // matches nothing and the union is exactly distinct by
    // construction; the screen keeps the invariant for callers who
    // absorb unscreened docs.
    val newFps = newDocs.select(md5(col(textCol)).as("__fp")).distinct()
      .join(prepared.fingerprints, Seq("__fp"), "left_anti")
    PreparedCorpus(
      prepared.fingerprints.unionByName(newFps),
      prepared.banded.unionByName(banded),
      prepared.shingleSets.unionByName(sh),
      prepared.ngram, prepared.numHashes, prepared.bands)
  }

  /** Materialize an updated index's frames (localCheckpoint) — call
    * every few [[updateCorpusIndex]] generations so probe lineage
    * stays flat (the descent-loop checkpoint hygiene). */
  def checkpointCorpusIndex(prepared: PreparedCorpus): PreparedCorpus =
    PreparedCorpus(
      prepared.fingerprints.localCheckpoint(true),
      prepared.banded.localCheckpoint(true),
      prepared.shingleSets.localCheckpoint(true),
      prepared.ngram, prepared.numHashes, prepared.bands)

  /** Index maintenance — DELETE docs from a [[PreparedCorpus]] (the
    * takedown/right-to-forget path; [[Ann.knnGraphDelete]]'s text
    * twin): drop the ids' signature and shingle rows; fingerprints of
    * the deleted docs are dropped unless another surviving doc shares
    * the same text (the fingerprint frame is DISTINCT over texts, so
    * it must be recomputed from survivors' texts when available — here
    * the caller passes the surviving corpus for exactness, or `None`
    * to keep the fingerprint set unchanged, the conservative screen
    * that still rejects re-submissions of deleted text). */
  def deleteFromCorpusIndex(prepared: PreparedCorpus, ids: DataFrame,
      idCol: String, survivors: Option[(DataFrame, String)] = None)
      : PreparedCorpus = {
    val del = ids.select(col(idCol).as("__del_id"))
    val fps = survivors match {
      case Some((docs, textCol)) =>
        docs.select(md5(col(textCol)).as("__fp")).distinct()
      case None => prepared.fingerprints
    }
    PreparedCorpus(
      fps,
      prepared.banded.join(del,
        prepared.banded("corpus_id") === del("__del_id"), "left_anti"),
      prepared.shingleSets.join(del,
        prepared.shingleSets("corpus_id") === del("__del_id"),
        "left_anti"),
      prepared.ngram, prepared.numHashes, prepared.bands)
  }

  /** [[incrementalDedup]] against a [[PreparedCorpus]]: identical output,
    * but the corpus-side pipeline never re-executes — each call computes
    * only the new batch's shingles/signatures and probes the prepared
    * frames. This is the per-micro-batch body of
    * [[graft.streaming.EventStreams.dedupedIngest]]. */
  def incrementalDedupPrepared(
      newDocs: DataFrame, prepared: PreparedCorpus,
      textCol: String, idCol: String,
      jaccardThreshold: Double = 0.8): DataFrame = {
    val (newBanded, newSh) =
      bandedXx(newDocs, textCol, idCol, prepared.ngram, prepared.numHashes,
        prepared.bands, "new", eager = false)
    val nearDupIds = newBanded
      .join(prepared.banded, Seq("band", "band_sig"))
      .select("new_id", "corpus_id").distinct()
      .join(newSh, Seq("new_id"))
      .join(prepared.shingleSets, Seq("corpus_id"))
      .select(col("new_id"),
        (size(array_intersect(col("sh_new"), col("sh_corpus"))).cast("double") /
          size(array_union(col("sh_new"), col("sh_corpus")))).as("jaccard"))
      .filter(col("jaccard") >= jaccardThreshold)
      .select(col("new_id").as(idCol)).distinct()
    val exactDups = newDocs.join(prepared.fingerprints,
      md5(col(textCol)) === col("__fp"), "left_semi")
    newDocs
      .join(exactDups.select(idCol), Seq(idCol), "left_anti")
      .join(nearDupIds, Seq(idCol), "left_anti")
  }

  /** Incremental exact + near dedup: keep only the new-batch rows that are
    * neither exact copies (fingerprint) nor near-duplicates (LSH join)
    * of the historical corpus. */
  def incrementalDedup(
      newDocs: DataFrame, corpus: DataFrame,
      textCol: String, idCol: String,
      jaccardThreshold: Double = 0.8): DataFrame = {
    val exactDups = newDocs.join(
      corpus.select(md5(col(textCol)).as("__fp")).distinct(),
      md5(col(textCol)) === col("__fp"), "left_semi")
    val nearDupIds = minhashLshJoin(newDocs, corpus, textCol, idCol,
        jaccardThreshold = jaccardThreshold)
      .select(col("new_id").as(idCol)).distinct()
    newDocs
      .join(exactDups.select(idCol), Seq(idCol), "left_anti")
      .join(nearDupIds, Seq(idCol), "left_anti")
  }

  /** MinHash + LSH over STRING shingles with md5-derived hash functions —
    * the engine-portable twin of [[minhashLsh]]. Same pipeline shape
    * (shingle → k-minhash → banding → bucket self-join → exact-Jaccard
    * verify), but every hash is md5-based so any engine with an md5
    * builtin (DuckDB, Trino, Postgres) reproduces the output bit-for-bit
    * — which is what lets the driver's DuckDB oracle verify the whole
    * sketch, not just row counts. [[minhashLsh]] (xxhash64, fixed-width
    * shingle hashes) remains the fast path: identical structure, cheaper
    * hashes, narrower shuffles.
    *
    * Hash function j is `md5("<j>:" || shingle)`; the signature entry is
    * the lexicographic min over the shingle set (md5 hex is lowercase
    * ASCII, so string ordering agrees across engines). Band signature is
    * `md5(sig[b*r] || "," || ... || sig[b*r+r-1])`. */
  def minhashLshPortable(
      docs: DataFrame, textCol: String, idCol: String,
      ngram: Int = 3, numHashes: Int = 8, bands: Int = 4,
      jaccardThreshold: Double = 0.5): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    // feeds candidate generation AND both verify joins → materialize once
    val sh0 = docs.select(col(idCol).as("doc"),
      shingles(col(textCol), ngram).as("gset")).localCheckpoint(false)
    minhashBandedPairs(sh0, numHashes, bands, jaccardThreshold)
  }

  /** The md5-portable banded pipeline over an ALREADY-BUILT
    * (doc, gset) frame — shared by [[minhashLshPortable]] (shingle
    * sets) and [[weightedJaccardJoin]] (tf-expanded multiset
    * encodings); `sets` should be materialized by the caller (it feeds
    * signatures AND both verify joins). */
  private def minhashBandedPairs(sets: DataFrame, numHashes: Int,
      bands: Int, jaccardThreshold: Double): DataFrame = {
    val rows = numHashes / bands
    // one batch kernel call per row (reused digest, raw-byte minima) —
    // byte-identical to array_min(transform(gset, g -> md5("<j>:"||g)))
    // per hash function, ~4× cheaper (see functions.MinHashKernel)
    val sig = sets.select(col("doc"),
      graft.functions.exprs.minhash_md5_sig(col("gset"), numHashes).as("sig"))
    // posexplode_outer: the plain generator would get an inferred
    // size(...)>0 filter whose pushdown re-inlines the whole minhash
    // signature construction per row (the array is never empty anyway)
    val banded = sig.select(col("doc"),
      posexplode_outer(array((0 until bands).map { b =>
        md5(concat_ws(",",
          (0 until rows).map(r => col("sig").getItem(b * rows + r)): _*))
      }: _*)).as(Seq("band", "band_sig")))
    val a = banded.select(col("band"), col("band_sig"), col("doc").as("id_a"))
    val b = banded.select(col("band"), col("band_sig"), col("doc").as("id_b"))
    val candidates = a.join(b, Seq("band", "band_sig"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()
    // verify over sorted xxhash64 images of the elements: one
    // duplicate-aware merge scan per pair (SetKernel) instead of the
    // generic array_intersect/array_union object-hash-set chain — on a
    // dup-dense corpus the candidate list is large and that chain
    // dominated the whole query (q178 r13: 6.3 of 7.2 s). Set-equal
    // barring 64-bit collisions (the hashed-shingle convention); the
    // oracles keep replaying string-set arithmetic, so the hash gate
    // re-verifies the equality every round.
    val hashed = sets.select(col("doc"),
      array_sort(transform(col("gset"), g => xxhash64(g))).as("hset"))
    val shA = hashed.select(col("doc").as("id_a"), col("hset").as("h_a"))
    val shB = hashed.select(col("doc").as("id_b"), col("hset").as("h_b"))
    candidates.join(shA, Seq("id_a")).join(shB, Seq("id_b"))
      .select(col("id_a"), col("id_b"),
        graft.functions.exprs.sorted_jaccard(col("h_a"), col("h_b"))
          .as("jaccard"))
      .filter(col("jaccard") >= jaccardThreshold)
  }

  /** Weighted-Jaccard near-dup join — term-FREQUENCY-aware resemblance
    * (J_w = Σ_t min(a_t, b_t) / Σ_t max(a_t, b_t), the weighted Jaccard
    * of Ioffe 2010's setting with integer weights): set Jaccard treats
    * "x y z" and "x x x x x x x x y z" as identical (same vocabulary),
    * weighted Jaccard sees the mass difference — and conversely scores
    * documents that share their HEAVY terms as near while set Jaccard
    * dilutes them with rare-tail mismatches. Realized by the classic
    * integer-expansion reduction: each term t with capped count c
    * becomes distinct elements t#1…t#c, whereupon SET Jaccard over the
    * expansions EQUALS weighted Jaccard over the capped counts —
    * so the entire md5-portable banded pipeline (signatures, banding,
    * bucket join, exact verify) is reused verbatim and the q178 oracle
    * replays it with the same expansion. `cap` bounds the expansion
    * blow-up (and the weight of any one term) — the tf saturation
    * every weighted scheme needs anyway.
    *
    * Scale shape: one MAP-ONLY per-row expansion (a codegen kernel,
    * [[graft.functions.ShingleKernel.tfExpand]]; bounded at
    * ≤ cap·|terms| elements) + the [[minhashLshPortable]] plan —
    * banded candidates, never all-pairs, and ZERO exchanges before
    * the signature projection (the r13 explode → groupBy(doc,t) →
    * explode → groupBy(doc) chain paid two corpus-wide shuffles for
    * the same elements; guarded in `PlanQualitySpec`). */
  def weightedJaccardJoin(docs: DataFrame, textCol: String, idCol: String,
      cap: Int = 5, numHashes: Int = 8, bands: Int = 4,
      jaccardThreshold: Double = 0.5): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val expanded = weightedExpansion(docs, textCol, idCol, cap)
      .localCheckpoint(false)
    minhashBandedPairs(expanded, numHashes, bands, jaccardThreshold)
  }

  /** The map-only (doc, gset) expansion stage of [[weightedJaccardJoin]]:
    * one narrow projection (kernel tf_expand) + the blank-doc filter
    * (a doc with no non-empty tokens had no rows under the old
    * aggregation chain, so it must stay absent here too). Public so the
    * plan guard can assert the stage is exchange-free. */
  def weightedExpansion(docs: DataFrame, textCol: String, idCol: String,
      cap: Int): DataFrame = {
    require(cap >= 1, "cap must be >= 1")
    docs.select(col(idCol).as("doc"),
        graft.functions.exprs.tf_expand(col(textCol), cap).as("gset"))
      .filter(size(col("gset")) > 0)
  }

  /** Exact n-gram CONTAINMENT join — the DIRECTED companion of
    * [[ngramJaccardJoin]]: C(A→B) = |A∩B| / |A| over distinct shingle
    * sets, the "is A mostly inside B" measure (Broder 1997's
    * containment, the resemblance/containment pair). Jaccard misses
    * subset relationships by construction — a tweet quoted inside an
    * article has tiny Jaccard but containment ≈ 1 — and
    * subset-shaped duplication (quotes, boilerplate wrappers, chunk
    * re-expansions, training-set leakage of short items into long
    * pages) is exactly what a curation pass needs to see. Both
    * directions of every co-occurring pair are evaluated from ONE
    * posting aggregation (c, |A|, |B| ride the same row).
    *
    * Scale shape: identical to [[ngramJaccardJoin]] — inverted-index
    * posting self-join (|A∩B| = the pair's co-occurrence count,
    * sizes window-counted per doc), `maxDf` cap for viral shingles,
    * same quadratic-posting honesty note: this is the exact tool;
    * MinHash-LSH remains the sweep.
    *
    * UNLIKE [[ngramJaccardJoin]], the cap here DEFAULTS ON
    * ([[DefaultContainmentMaxDf]]) — containment's home turf is
    * boilerplate-shaped duplication (quotes, wrappers, templates),
    * exactly the corpora where a ubiquitous shingle turns the posting
    * self-join quadratic, so the sharp edge must not be reachable by
    * omission (ADVICE r12). With any cap, containment is EXACT OVER
    * THE RETAINED SHINGLE SPACE (shingles with df ≤ cap; per-doc
    * sizes re-counted after the cap — the [[lshFidelity]] contract):
    * a doc made entirely of viral shingles simply drops out. Pass
    * `maxDf = None` to opt INTO the uncapped full-space join when the
    * corpus is known boilerplate-free.
    *
    * @return DIRECTED rows (id_a, id_b, containment): shingles of
    *         id_a are contained in id_b at ≥ `threshold`; a mutual
    *         near-identical pair yields both rows */
  def containmentJoin(
      docs: DataFrame, textCol: String, idCol: String,
      ngram: Int = 3, threshold: Double = 0.9,
      maxDf: Option[Int] = Some(DefaultContainmentMaxDf)): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val sh = shingleHashSet(docs, textCol, idCol, ngram)
      .localCheckpoint(false)
    val posting0 = sh.select(col("doc"), explode_outer(col("sh")).as("g"))
    val posting = maxDf match {
      case Some(cap) =>
        val keep = posting0.groupBy(col("g"))
          .agg(count(lit(1)).as("__df"))
          .filter(col("__df") <= cap).select(col("g"))
        posting0.join(keep, Seq("g"), "left_semi")
      case None => posting0
    }
    val sized = posting.withColumn("n",
      count(lit(1)).over(Window.partitionBy(col("doc"))))
    val pairs = sized
      .select(col("g"), col("doc").as("id_a"), col("n").as("n_a"))
      .join(sized.select(col("g"), col("doc").as("id_b"),
        col("n").as("n_b")), Seq("g"))
      .filter(col("id_a") < col("id_b"))
      .groupBy("id_a", "id_b")
      .agg(count(lit(1)).as("c"), first("n_a").as("n_a"),
        first("n_b").as("n_b"))
    pairs.select(col("id_a"), col("id_b"),
        (col("c").cast("double") / col("n_a")).as("containment"))
      .unionByName(pairs.select(col("id_b").as("id_a"),
        col("id_a").as("id_b"),
        (col("c").cast("double") / col("n_b")).as("containment")))
      .filter(col("containment") >= threshold)
  }

  /** Sketch-fidelity audit of the md5-MinHash-LSH candidate generator —
    * "measure, don't guess" applied to the sketch itself: compare the
    * PRE-VERIFY banded candidates of [[minhashLshPortable]] against the
    * exact ground truth (every pair with true shingle-set Jaccard ≥
    * `jaccardThreshold`) and report precision (what fraction of bucket
    * candidates are real — wasted verify work when low) and recall
    * (what fraction of true near-dup pairs the banding surfaces —
    * SILENTLY LOST DUPLICATES when below 1.0). Run this on a sampled
    * slice before committing (numHashes, bands) for a 100 TB sweep: the
    * S-curve P(candidate) = 1−(1−J^r)^b is theory; this is the measured
    * answer on YOUR corpus.
    *
    * Ground truth is exact and complete without an all-pairs join: a
    * pair with J ≥ t > 0 shares ≥ 1 shingle, so the inverted-index
    * self-join reaches every gold pair, and Jaccard comes from POSTING
    * COUNTS (|A∩B| = co-occurring distinct shingles = the pair's join
    * count, |A∪B| = n_a + n_b − c — the [[ngramJaccardJoin]]
    * arithmetic), so no shingle array is ever joined onto a pair.
    * Ubiquitous shingles grow the self-join quadratically; `maxDf`
    * caps the posting lists (per-doc sizes re-counted after the cap,
    * so capped gold is exact Jaccard over the RETAINED shingle space —
    * [[ngramJaccardJoin]]'s contract; document the cap with the
    * result). Everything is md5-portable — the q144 DuckDB twin
    * replays candidates, gold, and both ratios bit-for-bit.
    *
    * Scale shape: ONE shingle materialization feeds signatures, the
    * posting join, and both verify sides; counts are partial-aggregated
    * scalars; the only output is ONE row — (n_candidates, n_gold,
    * n_covered, precision, recall), ratios 0.0 when their denominator
    * is empty (the [[graft.operators.Linkage.evaluateBlocking]]
    * convention). */
  def lshFidelity(
      docs: DataFrame, textCol: String, idCol: String,
      ngram: Int = 3, numHashes: Int = 8, bands: Int = 4,
      jaccardThreshold: Double = 0.5, maxDf: Option[Int] = None): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val rows = numHashes / bands
    // one shingle frame feeds candidate banding, the gold posting join,
    // and the gold verify — materialize once
    val sh0 = docs.select(col(idCol).as("doc"),
      shingles(col(textCol), ngram).as("gset")).localCheckpoint(false)
    val sig = sh0.select(col("doc"),
      graft.functions.exprs.minhash_md5_sig(col("gset"), numHashes).as("sig"))
    val banded = sig.select(col("doc"),
      posexplode_outer(array((0 until bands).map { b =>
        md5(concat_ws(",",
          (0 until rows).map(r => col("sig").getItem(b * rows + r)): _*))
      }: _*)).as(Seq("band", "band_sig")))
    // counted once and semi-joined once → materialize
    val candidates = banded
      .select(col("band"), col("band_sig"), col("doc").as("id_a"))
      .join(banded.select(col("band"), col("band_sig"),
        col("doc").as("id_b")), Seq("band", "band_sig"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct().localCheckpoint(false)
    val posting0 = sh0.select(col("doc"), explode_outer(col("gset")).as("g"))
    val posting = maxDf match {
      case Some(cap) =>
        // keep-list semi-join (the ngramJaccardJoin maxDf shape): per-
        // shingle df is map-side combined, viral shingles never land as
        // one window partition
        val keep = posting0.groupBy(col("g"))
          .agg(count(lit(1)).as("__df"))
          .filter(col("__df") <= cap).select(col("g"))
        posting0.join(keep, Seq("g"), "left_semi")
      case None => posting0
    }
    // per-doc sizes AFTER the cap (retained-space Jaccard), then the
    // posting-count arithmetic — no array ever joins onto a pair
    val sized = posting.withColumn("n", count(lit(1)).over(
      org.apache.spark.sql.expressions.Window.partitionBy(col("doc"))))
    val gold = sized
      .select(col("g"), col("doc").as("id_a"), col("n").as("n_a"))
      .join(sized.select(col("g"), col("doc").as("id_b"),
        col("n").as("n_b")), Seq("g"))
      .filter(col("id_a") < col("id_b"))
      .groupBy("id_a", "id_b")
      .agg(count(lit(1)).as("c"), first("n_a").as("n_a"),
        first("n_b").as("n_b"))
      .filter((col("c").cast("double") /
        (col("n_a") + col("n_b") - col("c"))) >= jaccardThreshold)
      .select("id_a", "id_b").localCheckpoint(false)
    val covered = gold.join(candidates, Seq("id_a", "id_b"), "left_semi")
    candidates.agg(count(lit(1)).as("n_candidates"))
      .crossJoin(broadcast(gold.agg(count(lit(1)).as("n_gold"))))
      .crossJoin(broadcast(covered.agg(count(lit(1)).as("n_covered"))))
      .select(col("n_candidates"), col("n_gold"), col("n_covered"),
        when(col("n_candidates") > 0, col("n_covered").cast("double") /
          col("n_candidates").cast("double")).otherwise(lit(0.0))
          .as("precision"),
        when(col("n_gold") > 0, col("n_covered").cast("double") /
          col("n_gold").cast("double")).otherwise(lit(0.0))
          .as("recall"))
  }

  /** Cross-corpus MinHash-LSH join with md5-derived hashes — the
    * engine-portable twin of [[minhashLshJoin]] (same structure as
    * [[minhashLshPortable]] but two-sided): a new batch probes a
    * historical corpus through the (band, band_sig) equi-join, and every
    * hash is md5-based so an external engine replicates candidate
    * generation AND the exact-Jaccard verify bit-for-bit. This is what
    * lets the driver's DuckDB oracle verify the whole incremental-dedup
    * decision, not just row counts. */
  def minhashLshJoinPortable(
      newDocs: DataFrame, corpus: DataFrame,
      textCol: String, idCol: String,
      ngram: Int = 3, numHashes: Int = 8, bands: Int = 4,
      jaccardThreshold: Double = 0.5): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val rows = numHashes / bands
    def banded(docs: DataFrame, side: String): (DataFrame, DataFrame) = {
      // the shingle frame feeds banding AND the verify join → materialize
      val sh = docs.select(col(idCol).as(s"${side}_id"),
        shingles(col(textCol), ngram).as("gset")).localCheckpoint(false)
      val sig = sh.select(col(s"${side}_id"),
        graft.functions.exprs.minhash_md5_sig(col("gset"), numHashes).as("sig"))
      (sig.select(col(s"${side}_id"),
        posexplode_outer(array((0 until bands).map { b =>
          md5(concat_ws(",",
            (0 until rows).map(r => col("sig").getItem(b * rows + r)): _*))
        }: _*)).as(Seq("band", "band_sig"))),
        sh.select(col(s"${side}_id"), col("gset").as(s"g_$side")))
    }
    val (newBanded, newSh) = banded(newDocs, "new")
    val (corpusBanded, corpusSh) = banded(corpus, "corpus")
    val candidates = newBanded.join(corpusBanded, Seq("band", "band_sig"))
      .select("new_id", "corpus_id").distinct()
    candidates
      .join(newSh, Seq("new_id"))
      .join(corpusSh, Seq("corpus_id"))
      .select(col("new_id"), col("corpus_id"),
        (size(array_intersect(col("g_new"), col("g_corpus"))).cast("double") /
          size(array_union(col("g_new"), col("g_corpus")))).as("jaccard"))
      .filter(col("jaccard") >= jaccardThreshold)
  }

  /** Incremental exact + near dedup on the engine-portable kernels (md5
    * fingerprint + [[minhashLshJoinPortable]]) — same decision procedure
    * as [[incrementalDedup]], fully replicable by an external oracle. */
  def incrementalDedupPortable(
      newDocs: DataFrame, corpus: DataFrame,
      textCol: String, idCol: String,
      ngram: Int = 3, numHashes: Int = 8, bands: Int = 4,
      jaccardThreshold: Double = 0.5): DataFrame = {
    val exactDups = newDocs.join(
      corpus.select(md5(col(textCol)).as("__fp")).distinct(),
      md5(col(textCol)) === col("__fp"), "left_semi")
    val nearDupIds = minhashLshJoinPortable(newDocs, corpus, textCol, idCol,
        ngram, numHashes, bands, jaccardThreshold)
      .select(col("new_id").as(idCol)).distinct()
    newDocs
      .join(exactDups.select(idCol), Seq(idCol), "left_anti")
      .join(nearDupIds, Seq(idCol), "left_anti")
  }

  /** Engine-portable 60-bit SimHash fingerprint per document: token hash =
    * first 60 bits of md5 (via `conv`), bit i of the fingerprint set when
    * the majority of token hashes have bit i set (ties → 0). Entirely
    * per-row (no shuffle) — the bit-majority loop runs as a single
    * `aggregate` over `sequence(0,59)`. The production near-dup join is
    * [[simhashNearDup]] (codegen'd xxhash-based kernel); this variant
    * exists so the sketch itself is verifiable in any md5-capable engine.
    * Returns (doc_id, simhash). */
  def simhashPortable(docs: DataFrame, textCol: String, idCol: String): DataFrame =
    // one codegen kernel call per doc (r21): the old expression ran a
    // 60-iteration interpreted aggregate that allocated a filtered
    // token-hash array PER BIT per doc; the kernel is one primitive
    // majority loop, bit-identical (spec-pinned vs the expression form)
    docs.select(col(idCol).as("doc_id"),
      graft.functions.exprs.simhash_md5_60(
        split(trim(col(textCol)), "\\s+")).as("simhash"))

  /** SimHash near-dup: 64-bit simhash over tokens (custom codegen'd
    * expression), banded into 16-bit chunks for LSH bucketing; candidates
    * sharing a chunk are verified by Hamming distance. */
  def simhashNearDup(
      docs: DataFrame, textCol: String, idCol: String,
      maxHamming: Int = 8, materialize: Boolean = true): DataFrame = {
    import graft.functions.exprs
    val hRaw = docs.select(col(idCol).as("doc"),
      exprs.simhash64(split(trim(col(textCol)), "\\s+")).as("sim"))
    // both sides of the band self-join re-derive the fingerprint otherwise
    val h = if (materialize) hRaw.localCheckpoint(false) else hRaw
    hammingNearDup(h, "sim", "doc", maxHamming)
  }

  /** The bit-position partition of a 64-bit fingerprint into `chunks`
    * contiguous chunks: the first `64 % chunks` chunks carry one extra
    * bit. LSB-first, so chunk b of the default 4 is exactly
    * `(fp >>> 16b) & 0xffff` — the partition the q31/q181 oracles
    * replay as substrings of an LSB-first bit string. */
  private def hammingChunks(fp: Column, chunks: Int): Seq[Column] = {
    val base = 64 / chunks
    val rem = 64 % chunks
    (0 until chunks).map { b =>
      val len = if (b < rem) base + 1 else base
      val start =
        if (b < rem) b * (base + 1) else rem * (base + 1) + (b - rem) * base
      val mask = if (len == 64) -1L else (1L << len) - 1
      shiftrightunsigned(fp, start).bitwiseAND(lit(mask))
    }
  }

  /** Hamming near-dup over an ARBITRARY 64-bit fingerprint column — the
    * banding/verify half of [[simhashNearDup]], factored out so every
    * 64-bit perceptual sketch (SimHash over tokens, aHash/dHash over
    * bitmaps — [[graft.functions.PhashKernel]]) shares one candidate
    * pipeline: `chunks` bit-chunks bucket the self-join, then exact
    * `bit_count(xor)` verifies each candidate pair once.
    *
    * RECALL CONTRACT (pigeonhole): a pair within Hamming h is
    * GUARANTEED to share a chunk only when `chunks > h` — each flipped
    * bit pollutes at most one chunk. The default 4×16 layout is exact
    * for h ≤ 3; at the shipped h = 6 (q181) / h = 12 (q31) recall
    * beyond 3 flips depends on where the flips land and must be
    * MEASURED, not assumed — that is [[hammingFidelity]] (q186). Raise
    * `chunks` to ≥ h+1 when the audit's measured recall is too low;
    * the cost is proportionally more (and exponentially coarser)
    * buckets, so at production scale pair a high-h exact screen with a
    * sampled corpus. Caller materializes `fps` if it is expensive
    * (both join sides scan it). */
  def hammingNearDup(fps: DataFrame, fpCol: String, idCol: String,
      maxHamming: Int = 8, chunks: Int = 4): DataFrame = {
    require(chunks >= 1 && chunks <= 64, "chunks must be in [1, 64]")
    val banded = fps.select(col(idCol).as("__doc"), col(fpCol).as("__fp"),
      posexplode(array(hammingChunks(col(fpCol), chunks): _*))
        .as(Seq("band", "chunk")))
    val a = banded.select(col("band"), col("chunk"),
      col("__doc").as("id_a"), col("__fp").as("fp_a"))
    val b = banded.select(col("band"), col("chunk"),
      col("__doc").as("id_b"), col("__fp").as("fp_b"))
    a.join(b, Seq("band", "chunk"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        bit_count(col("fp_a").bitwiseXOR(col("fp_b"))).as("hamming"))
      .groupBy("id_a", "id_b").agg(min("hamming").as("hamming"))
      .filter(col("hamming") <= maxHamming)
  }

  /** Batch-vs-corpus Hamming SCREEN — the incremental form of
    * [[hammingNearDup]] (the [[incrementalDedupPortable]] shape for
    * 64-bit fingerprints): keep only the `batch` rows whose `fpCol`
    * has NO corpus fingerprint within `maxHamming`. Candidates come
    * from the same chunk banding (recall contract as
    * [[hammingNearDup]]; audit with [[hammingFidelity]]), verified by
    * exact `bit_count`, then one anti-join. Batch-proportional: the
    * batch side of the chunk join broadcasts; the corpus fingerprint
    * table is scanned, never shuffled wide — the streaming phash gate
    * ([[graft.streaming.EventStreams.phashGateIngest]]) runs this per
    * micro-batch. */
  /** Banded view of 64-bit fingerprints under an EXPLICIT disjoint
    * (offset, width) band layout — one row per (doc, band) with the
    * band's extracted value. The q31 pigeonhole machinery, factored out
    * so the soak harness measures the same join the query ships. */
  def pigeonholeBands(fps: DataFrame, fpCol: String, idCol: String,
      bandLayout: Seq[(Int, Int)]): DataFrame = {
    val bandStructs = bandLayout.zipWithIndex.map {
      case ((off, wd), bi) =>
        struct(lit(bi).as("band"),
          shiftright(col(fpCol), off)
            .bitwiseAND(lit((1L << wd) - 1)).as("bv"))
    }
    fps.select(col(idCol).as("doc_id"), col(fpCol).as("__fp"),
        explode(array(bandStructs: _*)).as("__b"))
      .select(col("doc_id"), col("__fp"),
        col("__b.band").as("band"), col("__b.bv").as("bv"))
  }

  /** Pigeonhole-banded Hamming near-dup pairs over precomputed 64-bit
    * fingerprints: candidates = the per-(band, value) self-join of
    * [[pigeonholeBands]], verified with bit_count(xor) ≤ maxHamming.
    * EXACT recall when `bandLayout.size ≥ maxHamming + 1` and the bands
    * are disjoint (pigeonhole: ≤ maxHamming flipped bits cannot touch
    * every band). The Hamming gate runs BEFORE the distinct — band
    * values over a shared vocabulary are heavily skewed, so the
    * candidate join emits its mass into a map-side codegen filter, and
    * only survivors (× ≤ bands multiplicity) reach the distinct shuffle
    * (the r17 lesson: distinct-first cost 20 s where this shape costs
    * 1.3 s). Output: (id_a, id_b, hamming) with id_a < id_b. */
  def pigeonholeHammingPairs(fps: DataFrame, fpCol: String, idCol: String,
      bandLayout: Seq[(Int, Int)], maxHamming: Int): DataFrame = {
    val banded = pigeonholeBands(fps, fpCol, idCol, bandLayout)
    val a = banded.select(col("doc_id").as("id_a"),
      col("__fp").as("__ha"), col("band"), col("bv"))
    val b = banded.select(col("doc_id").as("id_b"),
      col("__fp").as("__hb"), col("band"), col("bv"))
    a.join(b, Seq("band", "bv"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        bit_count(col("__ha").bitwiseXOR(col("__hb")))
          .cast("long").as("hamming"))
      .filter(col("hamming") <= maxHamming)
      .distinct()
  }

  def hammingScreen(batch: DataFrame, corpusFps: DataFrame,
      fpCol: String, idCol: String, maxHamming: Int,
      chunks: Int = 4): DataFrame = {
    def banded(df: DataFrame, id: String, fp: String): DataFrame = df
      .filter(col(fpCol).isNotNull)
      .select(col(idCol).as(id), col(fpCol).as(fp),
        posexplode(array(hammingChunks(col(fpCol), chunks): _*))
          .as(Seq("band", "chunk")))
    val hits = broadcast(banded(batch, "__bid", "__bfp"))
      .join(banded(corpusFps, "__cid", "__cfp"), Seq("band", "chunk"))
      .filter(bit_count(col("__bfp").bitwiseXOR(col("__cfp")))
        <= maxHamming)
      .select(col("__bid").as(idCol)).distinct()
    batch.join(hits, Seq(idCol), "left_anti")
  }

  /** Hamming-banding fidelity audit — [[lshFidelity]]'s "measure,
    * don't guess" applied to the 64-bit Hamming family (VERDICT r14
    * item 4): compare the production banding's PRE-VERIFY candidates
    * against EXACT ground truth and report precision (fraction of
    * bucket candidates that are true ≤ `maxHamming` pairs — wasted
    * verify work when low) and recall (fraction of true pairs the
    * banding surfaces — SILENTLY LOST near-dups below 1.0).
    *
    * Ground truth is exact and complete WITHOUT an all-pairs join:
    * banding with `maxHamming + 1` chunks reaches every true pair by
    * pigeonhole (≤ maxHamming flipped bits cannot pollute all
    * maxHamming+1 chunks), then the exact `bit_count` filter keeps
    * precisely the ≤ maxHamming pairs. The narrow chunks make gold
    * buckets coarse (64/(h+1) bits each), so audit a SAMPLED slice at
    * scale — the production banding being audited is unaffected.
    *
    * Output: ONE row — (n_candidates, n_gold, n_covered, precision,
    * recall), ratios 0.0 on empty denominators (the [[lshFidelity]]
    * convention). */
  def hammingFidelity(fps: DataFrame, fpCol: String, idCol: String,
      maxHamming: Int, chunks: Int = 4): DataFrame = {
    val f = fps.select(col(idCol).as("__doc"), col(fpCol).as("__fp"))
      .localCheckpoint(false)
    // a pair's hamming is band-INDEPENDENT (bit_count of the full-fp
    // xor), so the old per-pair groupBy+min was just a dedup: both
    // passes are distinct() now, with everything the distinct doesn't
    // need dropped BEFORE its exchange (r21, guide §2.3) — the
    // candidate join carries ids only (no fingerprints at all), and
    // the gold pass applies the exact ≤ maxHamming filter map-side, so
    // only TRUE pairs reach the dedup shuffle instead of every
    // co-bucket pair of the (maxHamming+1)-chunk banding
    def pairs(c: Int, keepFps: Boolean): DataFrame = {
      val banded = f.select(col("__doc"), col("__fp"),
        posexplode(array(hammingChunks(col("__fp"), c): _*))
          .as(Seq("band", "chunk")))
      def side(id: String, fp: String) = {
        val s = banded.select(col("band"), col("chunk"),
          col("__doc").as(id), col("__fp").as(fp))
        if (keepFps) s else s.drop(fp)
      }
      val joined = side("id_a", "fp_a").join(side("id_b", "fp_b"),
          Seq("band", "chunk"))
        .filter(col("id_a") < col("id_b"))
      (if (keepFps)
        joined.filter(bit_count(col("fp_a").bitwiseXOR(col("fp_b")))
          <= maxHamming)
      else joined)
        .select("id_a", "id_b").distinct()
    }
    // production candidates: pre-verify (the banding's raw output)
    val candidates = pairs(chunks, keepFps = false)
      .localCheckpoint(false)
    val gold = pairs(maxHamming + 1, keepFps = true)
      .localCheckpoint(false)
    val covered = gold.join(candidates, Seq("id_a", "id_b"), "left_semi")
    candidates.agg(count(lit(1)).as("n_candidates"))
      .crossJoin(broadcast(gold.agg(count(lit(1)).as("n_gold"))))
      .crossJoin(broadcast(covered.agg(count(lit(1)).as("n_covered"))))
      .select(col("n_candidates"), col("n_gold"), col("n_covered"),
        when(col("n_candidates") > 0, col("n_covered").cast("double") /
          col("n_candidates").cast("double")).otherwise(lit(0.0))
          .as("precision"),
        when(col("n_gold") > 0, col("n_covered").cast("double") /
          col("n_gold").cast("double")).otherwise(lit(0.0))
          .as("recall"))
  }

  /** Embedding-cosine near-duplicate pairs via brute force within LSH
    * buckets — see [[Ann.cosine]] for the kernel and [[Ann]] for the
    * hyperplane bucketing. */
  def embeddingNearDup(
      embs: DataFrame, vecCol: String, idCol: String,
      cosineThreshold: Double = 0.95, planes: Int = 8,
      seed: Long = 42L): DataFrame = {
    val dim = Ann.dimOf(embs, vecCol)
    val sigExpr = Ann.hyperplaneSignature(col(vecCol), dim, planes, seed)
    // materialized once: both band-join sides reuse the signature frame
    val sig = embs.select(col(idCol).as("vid"),
      transform(col(vecCol), _.cast("double")).as("v"), sigExpr.as("bucket"))
      .localCheckpoint(false)
    // candidate generation shuffles only (bucket, id); vectors are joined
    // back and cosine computed once per DISTINCT candidate pair
    val a = sig.select(col("bucket"), col("vid").as("id_a"))
    val b = sig.select(col("bucket"), col("vid").as("id_b"))
    val candidates = a.join(b, Seq("bucket"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()
    // join back to a signature-FREE projection — re-evaluating the
    // hyperplane dot products for the verify joins would triple that work
    val vecs = embs.select(col(idCol).as("vid"),
      transform(col(vecCol), _.cast("double")).as("v"))
    candidates
      .join(vecs.select(col("vid").as("id_a"), col("v").as("v_a")), Seq("id_a"))
      .join(vecs.select(col("vid").as("id_b"), col("v").as("v_b")), Seq("id_b"))
      .select(col("id_a"), col("id_b"),
        Ann.cosine(col("v_a"), col("v_b")).as("cosine"))
      .filter(col("cosine") >= cosineThreshold)
  }

  /** Benchmark decontamination screen: for every corpus document, count
    * the distinct word n-grams it shares with a held-out benchmark set
    * (the standard training-data hygiene pass — GPT-3 appendix C /
    * Brown et al. 2020 screen train docs for 13-gram collisions with
    * eval sets; n is a parameter here because the right value depends on
    * tokenizer granularity).
    *
    * Scale shape: the benchmark gram set is tiny next to a 100 TB corpus
    * (benchmarks are thousands of documents, the corpus billions), so it
    * is explicitly `broadcast()` — the screen is then a map-side
    * broadcast-hash semi-probe fused with the corpus scan + one narrow
    * groupBy on doc id: no corpus-sized shuffle anywhere. (At extreme
    * benchmark sizes, drop the hint and let AQE pick a shuffle join; the
    * logic is unchanged.) Returns one row per corpus doc:
    * (doc_id, n_hit_grams, contaminated). */
  def decontaminate(
      corpus: DataFrame, benchmark: DataFrame,
      textCol: String, idCol: String, ngram: Int): DataFrame = {
    val benchGrams = benchmark
      .select(explode_outer(shingles(col(textCol), ngram)).as("g"))
      .distinct()
    val hits = corpus
      .select(col(idCol).as("doc_id"),
        explode_outer(shingles(col(textCol), ngram)).as("g"))
      // shingle sets are distinct per doc, so plain count == distinct count
      .join(broadcast(benchGrams), Seq("g"))
      .groupBy(col("doc_id")).agg(count(lit(1)).as("n_hit_grams"))
    corpus.select(col(idCol).as("doc_id"))
      .join(hits, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_hit_grams"), lit(0L)).as("n_hit_grams"),
        (coalesce(col("n_hit_grams"), lit(0L)) > 0).as("contaminated"))
  }

  /** Bloom-gated decontamination — [[decontaminate]]'s result computed
    * through a Bloom PREFILTER (the "BFF" pattern production curation
    * pipelines use when the blocklist outgrows a broadcast hash
    * relation; cf. Soldaini et al. 2024, Dolma, §appendix dedup
    * tooling): the benchmark gram set is folded into a
    * `BloomFilter` by Spark's own distributed sketch aggregate
    * (`stat.bloomFilter` — partial filters merged, ~10 bits/element at
    * 1% fpp vs 8+ bytes/entry in a hash relation), the corpus gram
    * stream is screened by a codegen'd
    * [[graft.functions.BloomMightContain]] probe fused into the scan,
    * and only SURVIVORS (true hits + the fpp sliver) reach the exact
    * confirm join. Bloom filters have no false negatives and the
    * confirm join removes every false positive, so the output is
    * row-identical to [[decontaminate]] BY CONSTRUCTION — the q159
    * oracle is the exact semantics, the q69-salted adjudication.
    *
    * Scale shape: the confirm join is deliberately NOT broadcast —
    * the point of the Bloom is that the benchmark no longer has to fit
    * the broadcast threshold; what shuffles is the post-filter gram
    * stream, |hits| + fpp·|corpus grams| instead of |corpus grams|
    * (at fpp=1% that is a ~100× exchange cut on a clean corpus). The
    * filter itself is bounded driver/executor state: sized by
    * `expectedItems`, independent of corpus size. Use plain
    * [[decontaminate]] when the benchmark comfortably broadcasts —
    * same output, one fewer pass over the benchmark. */
  def bloomDecontaminate(
      corpus: DataFrame, benchmark: DataFrame,
      textCol: String, idCol: String, ngram: Int,
      expectedItems: Long = 1000000L, fpp: Double = 0.01): DataFrame = {
    val benchGrams = benchmark
      .select(explode_outer(shingles(col(textCol), ngram)).as("g"))
      .distinct()
    val bloom = benchGrams.stat.bloomFilter("g", expectedItems, fpp)
    val hits = corpus
      .select(col(idCol).as("doc_id"),
        explode_outer(shingles(col(textCol), ngram)).as("g"))
      .filter(graft.functions.exprs.bloom_might_contain(col("g"), bloom))
      .join(benchGrams, Seq("g"))
      .groupBy(col("doc_id")).agg(count(lit(1)).as("n_hit_grams"))
    corpus.select(col(idCol).as("doc_id"))
      .join(hits, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_hit_grams"), lit(0L)).as("n_hit_grams"),
        (coalesce(col("n_hit_grams"), lit(0L)) > 0).as("contaminated"))
  }

  /** Cross-source contamination matrix: for every pair of corpus
    * sources, the number of distinct word n-grams they share and the
    * directed containment fractions — the curation report that exposes
    * mirror sites, syndicated feeds, and pipeline double-ingestion
    * BEFORE they skew a training mix (the per-source view of what
    * [[decontaminate]] checks doc-by-doc).
    *
    * Scale shape: grams reduce to one distinct (source, md5) pass — the
    * shuffle carries 16-byte digests, never text (the q76 convention) —
    * and the pair join is an equi-join on the digest whose fan-out is
    * bounded by the SOURCE count per gram (≤ |sources|, a catalog-sized
    * number, not a corpus-sized one), so the candidate stream is at
    * most C(|sources|, 2) per gram and the result is |sources|²-bounded.
    * No all-pairs-of-documents shape anywhere. */
  def sourceOverlapMatrix(
      docs: DataFrame, textCol: String, groupCol: String,
      ngram: Int): DataFrame = {
    val grams = docs
      .select(col(groupCol).as("src"),
        explode_outer(shingles(col(textCol), ngram)).as("g"))
      .select(col("src"), md5(col("g")).as("gh"))
      .distinct()
    val totals = grams.groupBy(col("src")).agg(count(lit(1)).as("n_grams"))
    grams.select(col("src").as("source_a"), col("gh"))
      .join(grams.select(col("src").as("source_b"), col("gh")), Seq("gh"))
      .filter(col("source_a") < col("source_b"))
      .groupBy(col("source_a"), col("source_b"))
      .agg(count(lit(1)).as("n_shared"))
      .join(totals.select(col("src").as("source_a"),
        col("n_grams").as("n_grams_a")), Seq("source_a"))
      .join(totals.select(col("src").as("source_b"),
        col("n_grams").as("n_grams_b")), Seq("source_b"))
      .select(col("source_a"), col("source_b"), col("n_shared"),
        col("n_grams_a"), col("n_grams_b"),
        (col("n_shared").cast("double") / col("n_grams_a").cast("double"))
          .as("containment_a"),
        (col("n_shared").cast("double") / col("n_grams_b").cast("double"))
          .as("containment_b"))
  }

  /** Span-level dedup (C4-style): segment every document into
    * non-overlapping `spanWords`-word spans, keep only the globally FIRST
    * occurrence of each distinct span (first = smallest (doc, position)),
    * and reassemble each document from its surviving spans in original
    * order (Raffel et al. 2020 §2.2 discard repeated three-sentence
    * spans; word spans here because span boundaries are tokenizer policy,
    * not operator semantics).
    *
    * Scale shape: spans are keyed by md5 so the first-occurrence
    * aggregation shuffles 16-byte digests + one long, never text; the
    * keep-decision joins back on the same digest; reassembly is one
    * groupBy(doc) over the surviving spans (collect_list of (pos, span) —
    * bounded by document length, the same per-group bound every
    * doc-reassembly carries). Three narrow shuffles total, no windows, no
    * driver state. The global "first" is a total order over
    * (doc, position), so the result is deterministic under any
    * parallelism. The (doc, position) order is encoded as
    * `doc_id * 100000 + pos` (one primitive long, partial-aggregated
    * min) — valid while documents stay under 100k tokens; for longer
    * documents switch the encoding factor or min over a struct.
    * Returns (doc_id, text, n_spans, n_dropped). */
  def spanDedup(
      docs: DataFrame, textCol: String, idCol: String,
      spanWords: Int): DataFrame = {
    require(spanWords >= 1, "spanWords must be >= 1")
    val toks = col("__toks")
    val spans = docs
      .select(col(idCol).as("doc_id"), split(trim(col(textCol)), "\\s+").as("__toks"))
      .select(col("doc_id"), toks,
        explode_outer(sequence(lit(1), greatest(size(toks), lit(1)),
          lit(spanWords))).as("__i"))
      .select(col("doc_id"), col("__i").as("pos"),
        concat_ws(" ", slice(toks, col("__i"), lit(spanWords))).as("span"))
    // the encoded order is only total while pos < 100000; a longer doc
    // must fail fast, not silently misorder first-occurrence decisions
    // (folded into the evaluated pos column so it cannot be pruned away)
    val guardedPos = when(col("pos") < 100000L, col("pos"))
      .otherwise(raise_error(lit(
        "spanDedup: document exceeds 100000 tokens; switch the " +
          "(doc, pos) encoding factor or min over a struct")).cast("long"))
    val keyed = spans.select(col("doc_id"), guardedPos.as("pos"),
      col("span"), md5(col("span")).as("__k"))
    // globally-first occurrence per distinct span: one narrow aggregation
    // over (digest, encoded (doc,pos)) — the encoding is a single long so
    // the min is a partial-aggregated primitive, not a struct compare
    val firsts = keyed
      .groupBy(col("__k"))
      .agg(min(col("doc_id") * 100000L + col("pos")).as("__keep"))
    val kept = keyed.join(firsts, Seq("__k"))
      .filter(col("doc_id") * 100000L + col("pos") === col("__keep"))
    val rebuilt = kept
      .groupBy(col("doc_id"))
      .agg(
        concat_ws(" ", transform(
          array_sort(collect_list(struct(col("pos"), col("span")))),
          s => s.getField("span"))).as("text"),
        count(lit(1)).as("n_kept"))
    docs
      .select(col(idCol).as("doc_id"),
        // same degenerate-doc contract as the explode branch: an
        // empty/null text still contributes one (empty) span
        ceil(greatest(size(split(trim(col(textCol)), "\\s+")), lit(1))
          .cast("double") / spanWords).cast("long").as("n_spans"))
      .join(rebuilt, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("text"), lit("")).as("text"),
        col("n_spans"),
        (col("n_spans") - coalesce(col("n_kept"), lit(0L))).as("n_dropped"))
  }

  /** Exact-substring duplication join (strided character windows): doc
    * pairs sharing at least one identical `window`-char substring sampled
    * every `stride` characters, with the count of distinct shared
    * windows. The cheap relational cousin of suffix-array exact-substring
    * dedup (Lee et al. 2021 "Deduplicating Training Data Makes Language
    * Models Better" §4.1 EXACTSUBSTR): windows are md5'd so the self-join
    * shuffles 16-byte keys, never text, and each doc contributes
    * ≤ len/stride rows.
    *
    * Symmetric striding (this form) detects offset-ALIGNED duplication —
    * shared prefixes, whole-document copies, and any clone whose copy
    * starts at the same position mod `stride`. For the general guarantee
    * (any shared substring of length ≥ window+stride−1) use
    * [[exactSubstringDupJoinGeneral]]; full EXACTSUBSTR needs the
    * suffix-array pass, which is not a relational operator. Docs shorter
    * than `window` cannot contain a window and are excluded. */
  def exactSubstringDupJoin(
      docs: DataFrame, textCol: String, idCol: String,
      window: Int = 40, stride: Int = 10,
      materialize: Boolean = true): DataFrame = {
    require(window >= 1 && stride >= 1, "window and stride must be >= 1")
    val txt = col("__text")
    val winsRaw = docs
      // text materialized ONCE: the substr below references it per window,
      // and an inlined expression would re-normalize per reference
      .select(col(idCol).as("doc_id"), col(textCol).as("__text"))
      .filter(length(txt) >= window)
      .select(col("doc_id"), txt,
        explode_outer(sequence(lit(1), length(txt) - (window - 1),
          lit(stride))).as("__i"))
      .select(col("doc_id"),
        md5(txt.substr(col("__i"), lit(window))).as("wh"))
      .distinct()
    // both self-join sides reuse the window frame → materialize once
    val wins = if (materialize) winsRaw.localCheckpoint(false) else winsRaw
    val a = wins.select(col("wh"), col("doc_id").as("id_a"))
    val b = wins.select(col("wh"), col("doc_id").as("id_b"))
    a.join(b, Seq("wh"))
      .filter(col("id_a") < col("id_b"))
      .groupBy(col("id_a"), col("id_b"))
      .agg(count(lit(1)).as("n_shared"))
  }

  /** Alignment-FREE exact-substring dup join — the "general guarantee"
    * variant [[exactSubstringDupJoin]]'s scaladoc prescribes: one side
    * samples windows at EVERY character offset (stride 1), the other
    * every `stride` chars, so ANY pair sharing a substring of length
    * ≥ `window + stride - 1` is detected regardless of where the copy
    * starts in either document — a strided window of one doc must land
    * fully inside the shared span, and the dense side of the other doc
    * contains that exact window at whatever offset it occurs.
    *
    * Pairs are normalized (`id_a < id_b`); `n_shared` counts DISTINCT
    * shared window hashes (a pair can match through both side
    * orientations). Cost: the dense side emits ~len windows per doc
    * versus len/stride — the price of dropping the alignment assumption;
    * both sides still shuffle only (md5, id), never text, and the
    * candidate join remains an equi-join on the 16-byte hash. */
  def exactSubstringDupJoinGeneral(
      docs: DataFrame, textCol: String, idCol: String,
      window: Int = 40, stride: Int = 10): DataFrame = {
    require(window >= 1 && stride >= 1, "window and stride must be >= 1")
    def wins(strideN: Int, outId: String): DataFrame = {
      val txt = col("__text")
      docs
        // text materialized ONCE (q76 argument: the substr below is
        // referenced per window)
        .select(col(idCol).as(outId), col(textCol).as("__text"))
        .filter(length(txt) >= window)
        .select(col(outId), txt,
          explode_outer(sequence(lit(1), length(txt) - (window - 1),
            lit(strideN))).as("__i"))
        .select(col(outId),
          md5(txt.substr(col("__i"), lit(window))).as("wh"))
        .distinct()
    }
    wins(1, "id_d").join(wins(stride, "id_s"), Seq("wh"))
      .filter(col("id_d") =!= col("id_s"))
      .select(least(col("id_d"), col("id_s")).as("id_a"),
        greatest(col("id_d"), col("id_s")).as("id_b"), col("wh"))
      .groupBy(col("id_a"), col("id_b"))
      .agg(countDistinct(col("wh")).as("n_shared"))
  }

  /** SemDeDup-style semantic dedup (Abbas et al. 2023, arXiv:2303.09540):
    * cluster embeddings with a coarse quantizer, compare pairs ONLY
    * within a cluster, and drop every member whose cosine to a lower-id
    * member reaches `cosineThreshold` (keep-min-id policy). Returns the
    * dropped rows as (dup_id, keeper_id, cluster) where `keeper_id` is
    * the smallest qualifying in-cluster neighbor.
    *
    * Keeper contract (non-transitive): cosine similarity is not
    * transitive, so a returned `keeper_id` may ITSELF appear as a
    * `dup_id` (chains a<b<c where sim(a,b) and sim(b,c) qualify but
    * sim(a,c) does not). Chains always point strictly downward
    * (keeper_id < dup_id — no cycles), so a consumer that wants every
    * keeper to survive must resolve chains to their roots first
    * (e.g. via [[Components.connectedComponents]] over the
    * (dup_id, keeper_id) edges); an anti-join on dup_id alone keeps
    * exactly the non-dropped rows, which is the SemDeDup paper's policy.
    *
    * Engine-portable by construction: the default quantizer is
    * [[Ann.portableCentroids]] (md5-hash-sampled, exact integer squared
    * L2 over floor-quantized coordinates) and the pair cosine is the
    * same integer-dot / shape-identical-double chain as
    * [[Ann.ivfTopKPortable]], so an external engine reproduces cluster
    * membership AND the threshold comparison bit-for-bit.
    *
    * Scale: the in-cluster self-join is Σ|cluster|² — SemDeDup's
    * published trade-off. `nlist` must grow with the corpus (the paper
    * uses ~10⁴–10⁵ clusters at web scale) so cluster sizes stay bounded;
    * pairs straddling cluster boundaries are missed by design. At
    * production scale pass `centroids` explicitly — a Lloyd-refined
    * quantizer from [[Ann.kmeansCentroids]] (quantized via
    * [[Ann.quantizeCentroids]]) balances cluster populations far better
    * than the hash sample. One shuffle on the cluster id; per-vector
    * norms are computed ONCE in the assignment projection (one integer
    * dot per pair in the join, not three); only
    * (cluster, id, quantized vec, norm) rows move. */
  def semanticDedup(
      embs: DataFrame, vecCol: String, idCol: String,
      cosineThreshold: Double, nlist: Int = 8,
      scale: Int = 1000,
      centroids: Option[Seq[Seq[Long]]] = None): DataFrame = {
    val cents = centroids.getOrElse(
      Ann.portableCentroids(embs, vecCol, idCol, nlist, scale))
    // quantize + assign + norm once; both self-join sides reuse the
    // frame (assignment picks literal vs broadcast-table path by nlist)
    val assigned = Ann.withNearestCentroidL(
        embs.select(col(idCol).as("vid"),
          Ann.quantizeVec(col(vecCol), scale).as("qv")),
        cents, col("qv"), "cluster")
      .withColumn("nrm", Ann.idot(col("qv"), col("qv")))
      .localCheckpoint(false)
    val a = assigned.select(col("cluster"), col("vid").as("dup_id"),
      col("qv").as("qa"), col("nrm").as("na"))
    val b = assigned.select(col("cluster"), col("vid").as("keep_id"),
      col("qv").as("qb"), col("nrm").as("nb"))
    a.join(b, Seq("cluster"))
      .filter(col("keep_id") < col("dup_id"))
      // integer dot + precomputed integer norms; one multiply+sqrt+divide
      // of exact integers on both engines → bit-identical threshold
      // comparison (q68 argument)
      .withColumn("cosine",
        Ann.idot(col("qa"), col("qb")).cast("double") /
          sqrt(col("na").cast("double") * col("nb").cast("double")))
      .filter(col("cosine") >= cosineThreshold)
      // cluster is functionally dependent on dup_id (one cluster per id),
      // so grouping on both keeps the plan a plain partial-agg min
      .groupBy(col("dup_id"), col("cluster"))
      .agg(min(col("keep_id")).as("keeper_id"))
      .select(col("dup_id"), col("keeper_id"),
        col("cluster").cast("long").as("cluster"))
  }

  /** Corpus-side state for repeated / streaming semantic-dedup probes:
    * the quantized centroid matrix plus the corpus's
    * (cluster, corpus_id, qv, nrm) assignment frame, computed and eagerly
    * materialized ONCE — the embedding twin of [[PreparedCorpus]]. */
  final case class PreparedEmbeddings(
      centroids: Seq[Seq[Long]],
      assigned: DataFrame, // (cluster, corpus_id, qv, nrm)
      scale: Int)

  /** Build [[PreparedEmbeddings]]: quantize, cluster-assign, and norm the
    * historical corpus once (same integer kernels as [[semanticDedup]]).
    * Pass `centroids` to reuse a Lloyd-refined quantizer
    * ([[Ann.kmeansCentroidsPortable]] or quantized [[Ann.kmeansCentroids]]);
    * the default is the md5 hash-sample. */
  def prepareEmbeddings(
      corpus: DataFrame, vecCol: String, idCol: String,
      nlist: Int = 8, scale: Int = 1000,
      centroids: Option[Seq[Seq[Long]]] = None): PreparedEmbeddings = {
    val cents = centroids.getOrElse(
      Ann.portableCentroids(corpus, vecCol, idCol, nlist, scale))
    val assigned = Ann.withNearestCentroidL(
        corpus.select(col(idCol).as("corpus_id"),
          Ann.quantizeVec(col(vecCol), scale).as("qv")),
        cents, col("qv"), "cluster")
      .withColumn("nrm", Ann.idot(col("qv"), col("qv")))
      .localCheckpoint(true)
    PreparedEmbeddings(cents, assigned, scale)
  }

  /** Persist a [[PreparedEmbeddings]] — the embedding twin of
    * [[saveCorpusIndex]], on the same [[graft.model.IndexStore]]
    * crash-atomic generation protocol: centroids (the
    * [[Ann.saveCentroids]] frame shape), the assignment frame, and a
    * one-row params table land in `g<gen>/` with the params marker
    * written last. All BIGINT → bit-exact round trip. */
  def saveEmbeddingIndex(prepared: PreparedEmbeddings, root: String)(
      implicit spark: org.apache.spark.sql.SparkSession): Unit = {
    import spark.implicits._
    graft.model.IndexStore.save(root,
      Seq(
        "centroids" -> prepared.centroids.zipWithIndex
          .map { case (c, i) => (i, c) }.toDF("list_id", "centroid")
          .coalesce(1),
        "assigned" -> prepared.assigned),
      Seq(prepared.scale).toDF("scale"))
    ()
  }

  /** Bit-exact inverse of [[saveEmbeddingIndex]] (newest complete
    * generation, via [[graft.model.IndexStore.load]]). */
  def loadEmbeddingIndex(root: String)(
      implicit spark: org.apache.spark.sql.SparkSession)
      : PreparedEmbeddings = {
    val (p, dir) = graft.model.IndexStore.load(spark, root)
    val scale = p.getAs[Int]("scale")
    require(scale >= 1, s"loadEmbeddingIndex: bad scale $scale")
    PreparedEmbeddings(
      Ann.loadCentroids(s"$dir/centroids"),
      spark.read.parquet(s"$dir/assigned"),
      scale)
  }

  /** Index MAINTENANCE — absorb a batch of (already screened) vectors
    * into a [[PreparedEmbeddings]]: the batch assigns to the EXISTING
    * quantizer (centroids are the frozen model; periodic re-training
    * is a separate offline decision) and unions onto the assignment
    * frame — ≡ `prepareEmbeddings(corpus ∪ batch, centroids = same)`
    * (spec-gated). Cost ∝ batch. */
  def updateEmbeddingIndex(prepared: PreparedEmbeddings,
      newEmb: DataFrame, vecCol: String, idCol: String)
      : PreparedEmbeddings = {
    val assigned = Ann.withNearestCentroidL(
        newEmb.select(col(idCol).as("corpus_id"),
          Ann.quantizeVec(col(vecCol), prepared.scale).as("qv")),
        prepared.centroids, col("qv"), "cluster")
      .withColumn("nrm", Ann.idot(col("qv"), col("qv")))
    PreparedEmbeddings(prepared.centroids,
      prepared.assigned.unionByName(assigned), prepared.scale)
  }

  /** Index maintenance — DELETE vectors from a [[PreparedEmbeddings]]
    * (the [[deleteFromCorpusIndex]] twin): their assignment rows drop;
    * the quantizer is unchanged. */
  def deleteFromEmbeddingIndex(prepared: PreparedEmbeddings,
      ids: DataFrame, idCol: String): PreparedEmbeddings =
    PreparedEmbeddings(prepared.centroids,
      prepared.assigned.join(
        ids.select(col(idCol).as("__del_id")),
        prepared.assigned("corpus_id") === col("__del_id"), "left_anti"),
      prepared.scale)

  /** Batch-vs-corpus semantic screen against [[PreparedEmbeddings]]:
    * drops every batch row whose embedding has a corpus neighbor at
    * cosine ≥ `cosineThreshold` inside its cluster and returns the
    * survivors (the SemDeDup keep policy applied incrementally — batch
    * rows are screened against HISTORY only, not each other; run
    * [[semanticDedup]] inside the batch first if intra-batch dups
    * matter). The probe is an equi-join on the cluster id against the
    * prepared frame, so per-call cost is proportional to the batch times
    * its probed cluster populations — never the corpus. This is the
    * per-micro-batch body of
    * [[graft.streaming.EventStreams.semanticDedupedIngest]]. */
  def semanticDedupIncremental(
      batch: DataFrame, prepared: PreparedEmbeddings,
      vecCol: String, idCol: String,
      cosineThreshold: Double): DataFrame = {
    val b = Ann.withNearestCentroidL(
        batch.select(col(idCol).as("__bid"),
          Ann.quantizeVec(col(vecCol), prepared.scale).as("__bq")),
        prepared.centroids, col("__bq"), "cluster")
      .withColumn("__bn", Ann.idot(col("__bq"), col("__bq")))
    val dupIds = b.join(prepared.assigned, Seq("cluster"))
      .withColumn("cosine",
        Ann.idot(col("__bq"), col("qv")).cast("double") /
          sqrt(col("__bn").cast("double") * col("nrm").cast("double")))
      .filter(col("cosine") >= cosineThreshold)
      .select(col("__bid").as(idCol)).distinct()
    batch.join(dupIds, Seq(idCol), "left_anti")
  }
}
