package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for training-data curation: token counting,
  * quality scoring, language identification, and document fingerprinting.
  * Everything is a codegen'd column expression (no UDFs) so the scoring
  * pass fuses into a single whole-stage-codegen scan of the corpus —
  * the shape you want when the corpus is 100 TB and this is a map-only job.
  */
object TextAnalysis {

  /** Whitespace token count. */
  def tokenCount(text: Column): Column =
    size(split(trim(text), "\\s+"))

  /** BPE-ish subword count: tokens further split on letter/digit/punct
    * boundaries (a cheap deterministic proxy for a real tokenizer's piece
    * count). */
  def subwordCount(text: Column): Column =
    size(regexp_extract_all(text,
      lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"), lit(0)))

  /** Ratio of non-alphanumeric, non-whitespace chars to total length. */
  def punctRatio(text: Column): Column =
    when(length(text) === 0, 0.0).otherwise(
      (length(text) - length(regexp_replace(text, "[^A-Za-z0-9\\s]", "")))
        .cast("double") / length(text))

  /** Ratio of digit chars to total length. */
  def digitRatio(text: Column): Column =
    when(length(text) === 0, 0.0).otherwise(
      (length(text) - length(regexp_replace(text, "[0-9]", "")))
        .cast("double") / length(text))

  /** Mean whitespace-token length. */
  def meanTokenLength(text: Column): Column = {
    val toks = split(trim(text), "\\s+")
    when(size(toks) === 0, 0.0).otherwise(
      aggregate(toks, lit(0L), (acc, t) => acc + length(t)).cast("double") /
        size(toks))
  }

  private val EnStopwords = Seq(
    "the", "a", "an", "of", "and", "to", "in", "is", "it", "for", "on",
    "with", "as", "at", "by", "or", "be", "this", "that", "from")

  /** English-stopword hit ratio: fraction of tokens that are common English
    * stopwords — the classic cheap quality / language signal. */
  def stopwordRatio(text: Column): Column = {
    val pattern = "(?i)\\b(" + EnStopwords.mkString("|") + ")\\b"
    val hits = size(regexp_extract_all(text, lit(pattern), lit(0)))
    val toks = tokenCount(text)
    when(toks === 0, 0.0).otherwise(hits.cast("double") / toks)
  }

  /** Composite quality score in [0,1]: rewards stopword presence and
    * reasonable token lengths, penalizes punctuation/digit noise. Weights
    * are engine policy (the reference has no equivalent; this is the
    * standard C4/Gopher-style rule family). */
  def qualityScore(text: Column): Column = {
    val lenOk = when(length(text).between(50, 20000), 1.0).otherwise(0.5)
    val mtl = meanTokenLength(text)
    val mtlOk = when(mtl.between(3.0, 12.0), 1.0).otherwise(0.5)
    val noise = punctRatio(text) + digitRatio(text)
    round(
      greatest(lit(0.0), least(lit(1.0),
        lit(0.25) * lenOk + lit(0.25) * mtlOk +
          lit(0.3) * least(lit(1.0), stopwordRatio(text) * 4) +
          lit(0.2) * greatest(lit(0.0), lit(1.0) - noise * 4))), 6)
  }

  /** N-gram-heuristic language ID over a small per-language function-word
    * inventory. Returns the argmax language code, or 'und' when no
    * function words hit. Deterministic tie-break: language code ascending. */
  val LangMarkers: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "and", "of", "to", "in", "is", "that", "for", "with", "it"),
    "es" -> Seq("el", "la", "de", "que", "los", "las", "una", "por", "como", "para"),
    "fr" -> Seq("le", "les", "des", "une", "est", "dans", "pour", "qui", "avec", "sur"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "ein", "mit", "auf", "für"),
    "zh" -> Seq("的", "是", "在", "了", "我", "有", "和", "不", "人", "这"))

  def langId(text: Column): Column = {
    val scored = LangMarkers.toSeq.sortBy(_._1).map { case (lang, words) =>
      val pattern = "(?i)\\b(" + words.mkString("|") + ")\\b"
      struct(size(regexp_extract_all(text, lit(pattern), lit(0))).as("hits"),
        lit(lang).as("lang"))
    }
    // argmax by hits; ties broken by language code descending (deterministic)
    val best = array_max(array(scored: _*))
    when(best.getField("hits") > 0, best.getField("lang")).otherwise(lit("und"))
  }

  /** Content-defined fingerprint: md5 of the whitespace/case-normalized
    * text (exact-dedup key), plus [[winnowFingerprint]] for near-dup use. */
  def fingerprint(text: Column): Column =
    md5(lower(regexp_replace(trim(text), "\\s+", " ")))

  /** 64-bit rolling fingerprint: simhash over word 3-grams — robust to
    * small edits, used as the compact near-dup sketch. */
  def winnowFingerprint(text: Column, ngram: Int = 3): Column =
    graft.functions.exprs.simhash64(Dedup.shingles(text, ngram))

  /** Term → (document frequency, total term frequency) corpus statistics:
    * the building block for TF-IDF / BM25 and vocabulary pruning. Pure
    * integer aggregation (explode → two-level count). */
  def termStats(docs: DataFrame, textCol: String, idCol: String): DataFrame = {
    val toks = split(trim(lower(col(textCol))), "\\s+")
    docs.select(col(idCol).as("doc"), explode_outer(toks).as("term"))
      .groupBy(col("term"))
      .agg(countDistinct(col("doc")).as("df"),
        count(lit(1)).as("tf_total"))
  }

  /** TF-IDF scores per (doc, term): tf · ln(N / df). Log arithmetic stays
    * Scala/Spark-side (libm ln is not bit-identical across engines, so
    * this is spec-verified rather than DuckDB-oracled — the integer stats
    * underneath are oracled via [[termStats]]). */
  def tfIdf(docs: DataFrame, textCol: String, idCol: String): DataFrame = {
    val n = docs.count().toDouble
    val toks = split(trim(lower(col(textCol))), "\\s+")
    val tf = docs.select(col(idCol).as("doc"), explode_outer(toks).as("term"))
      .groupBy(col("doc"), col("term")).agg(count(lit(1)).as("tf"))
    val df = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    tf.join(df, Seq("term"))
      .withColumn("tfidf", col("tf") * log(lit(n) / col("df")))
      .select("doc", "term", "tf", "df", "tfidf")
  }

  /** Word-repetition statistics per document — the Gopher-style
    * repetitious-content signal family (Rae et al. 2021 §A1.1 measure
    * "fraction of characters in the most common n-gram / in duplicated
    * n-grams", here at n=1 over whitespace words; the n>1 variants are
    * [[Dedup.shingles]] + the same two aggregations):
    *
    *   - `top_word_frac`: occurrences of the most frequent word / total
    *     words (argmax tie-break: lexicographically smallest word);
    *   - `dup_char_frac`: word-chars inside words occurring more than
    *     once / total word-chars.
    *
    * Scale shape: two aggregations, (doc,word) → (doc), both map-side
    * partial-combined, no windows. The first is a pure HashAggregate;
    * the second plans as a partial+final SortAggregate because the
    * argmax carries the word STRING through the buffer (Spark cannot
    * hash-aggregate variable-length buffer fields) — the sort key is
    * just `doc`, the partial combine still runs before the exchange, so
    * the shuffle carries one row per doc per task; a window or
    * join-back formulation would sort the same frame plus extra
    * shuffles, so this is the cheapest argmax-with-string shape. */
  def repetitionStats(docs: DataFrame, textCol: String, idCol: String): DataFrame =
    repetitionFrom(
      docs.select(col(idCol).as("doc_id"),
        // explode_outer: the plain generator's inferred size()>0 filter
        // would re-inline the split per row (same trap as the sketches)
        explode_outer(split(trim(col(textCol)), "\\s+")).as("u")),
      nTotal = "n_words", topUnit = "top_word", topFrac = "top_word_frac")

  /** Word n-gram repetition statistics — the n>1 members of the Gopher
    * family ("fraction of characters in the most common 2/3/4-gram",
    * "…in duplicated 5..10-grams"). Unlike [[Dedup.shingles]] these
    * n-grams are NOT de-duplicated (every occurrence counts) and docs
    * shorter than n words are excluded. Same two-aggregation scale shape
    * as [[repetitionStats]]. */
  def ngramRepetitionStats(
      docs: DataFrame, textCol: String, idCol: String, n: Int): DataFrame = {
    require(n >= 2, "use repetitionStats for n = 1")
    val toks = split(trim(col(textCol)), "\\s+")
    // Materialize the token array ONCE and explode a start-index sequence,
    // forming each gram by slicing the materialized column. Building the
    // gram array inside a `transform` lambda instead inlines the split
    // expression into the lambda body, re-tokenizing the document per gram
    // — O(words²) splits per doc, measured 8× slower at sf0.1.
    val occ = docs
      .select(col(idCol).as("doc_id"), toks.as("__toks"))
      .filter(size(col("__toks")) >= n)
      .select(col("doc_id"), col("__toks"),
        explode_outer(sequence(lit(1), size(col("__toks")) - (n - 1)))
          .as("__i"))
      .select(col("doc_id"),
        concat_ws(" ", slice(col("__toks"), col("__i"), lit(n))).as("u"))
    repetitionFrom(occ,
      nTotal = "n_ngrams", topUnit = "top_ngram", topFrac = "top_ngram_frac")
  }

  /** Shared repetition aggregation over occurrence rows `(doc_id, u)`. */
  private def repetitionFrom(
      occ: DataFrame, nTotal: String, topUnit: String,
      topFrac: String): DataFrame = {
    val counts = occ.groupBy(col("doc_id"), col("u"))
      .agg(count(lit(1)).as("cnt"))
    counts.groupBy(col("doc_id")).agg(
        sum(col("cnt")).as(nTotal),
        count(lit(1)).as("n_distinct"),
        max(col("cnt")).as("top_cnt"),
        // min over (-cnt, u) = argmax by cnt, ties to the smallest unit
        min_by(col("u"), struct((-col("cnt")).as("nc"), col("u")))
          .as(topUnit),
        sum(col("cnt") * length(col("u"))).as("__chars"),
        sum(when(col("cnt") > 1, col("cnt") * length(col("u")))
          .otherwise(0L)).as("__dup_chars"))
      .select(col("doc_id"), col(nTotal), col("n_distinct"),
        col(topUnit), col("top_cnt"),
        (col("top_cnt").cast("double") / col(nTotal)).as(topFrac),
        // a whitespace-only doc has one empty-string unit -> __chars = 0;
        // 0/0 is NULL in Spark but NaN in DuckDB, so pin both engines to
        // NULL via nullif (oracle side uses NULLIF(.., 0) to match).
        (col("__dup_chars").cast("double") / nullif(col("__chars"), lit(0L)))
          .as("dup_char_frac"))
  }

  /** The COMPLETE Gopher repetition table (Rae et al. 2021 §A1.1 Table
    * A1) as one wide per-document report — the 13 repetition filters a
    * real curation run applies together, previously covered only at
    * n = 1 by [[repetitionStats]]:
    *
    *   - duplicate LINE / PARAGRAPH fraction: units = non-empty
    *     `\n` / `\n\n` splits; fraction of unit occurrences beyond the
    *     first of their (within-doc) distinct string — and the same as
    *     a CHARACTER fraction (unit string lengths, separators
    *     excluded from both numerator and denominator).
    *   - top-{2,3,4}-gram character fraction: chars of the most
    *     frequent word n-gram (count × gram char length, ties broken
    *     to the longer gram — the gram string itself never needs to
    *     survive the aggregation) over the single-space-joined doc
    *     chars. Like the published filter, overlapping occurrences are
    *     not collapsed, so pathological one-token docs can exceed 1 —
    *     the gate only ever asks "> threshold".
    *   - duplicate-{5..10}-gram character fraction: chars covered by
    *     ANY occurrence of a within-doc duplicated n-gram, as a true
    *     POSITION UNION (merged token intervals — overlapping
    *     occurrences counted once; the reference implementations
    *     approximate this with a sequential skip-scan, which is not
    *     order-free — divergence documented here), over the same
    *     denominator.
    *
    * `repetition_pass` applies the published thresholds (a doc FAILS if
    * any fraction exceeds its bound): dup line/para 0.30/0.30, dup
    * line/para chars 0.20/0.20, top-2/3/4 0.20/0.18/0.16, dup-5..10
    * 0.15/0.14/0.13/0.12/0.11/0.10.
    *
    * Scale shape: everything is (doc, unit) hash aggregation or a
    * PER-DOC window (the interval merge partitions by doc_id — never
    * corpus-scale); the gram explodes cost Σn × tokens rows. The final
    * assembly is per-doc-row joins on doc_id. All fractions are one
    * IEEE divide of exact integers — engine-portable. */
  def gopherRepetitionReport(docs: DataFrame, textCol: String,
      idCol: String,
      topNs: Seq[Int] = Seq(2, 3, 4),
      dupNs: Seq[Int] = Seq(5, 6, 7, 8, 9, 10),
      topThresholds: Seq[Double] = Seq(0.20, 0.18, 0.16),
      dupThresholds: Seq[Double] =
        Seq(0.15, 0.14, 0.13, 0.12, 0.11, 0.10),
      dupLineMax: Double = 0.30, dupParaMax: Double = 0.30,
      dupLineCharMax: Double = 0.20, dupParaCharMax: Double = 0.20)
      : DataFrame = {
    require(topNs.length == topThresholds.length &&
      dupNs.length == dupThresholds.length,
      "one threshold per n")
    val tokf = docs
      .select(col(idCol).as("doc_id"), col(textCol).as("__text"),
        split(trim(col(textCol)), "\\s+").as("__toks"))
      .select(col("doc_id"), col("__text"), col("__toks"),
        length(concat_ws(" ", col("__toks"))).cast("long").as("__tc"))
      .localCheckpoint(false)

    // duplicate line / paragraph fractions (occurrences beyond the
    // first per distinct unit string, within the doc)
    def unitDup(sep: String, prefix: String): DataFrame =
      tokf.select(col("doc_id"),
          explode(filter(split(col("__text"), sep), u => u =!= ""))
            .as("u"))
        .groupBy(col("doc_id"), col("u"))
        .agg(count(lit(1)).as("cnt"))
        .groupBy(col("doc_id"))
        .agg(sum(col("cnt")).as("__n"),
          sum(col("cnt") - 1).as("__d"),
          sum(col("cnt") * length(col("u"))).as("__ch"),
          sum((col("cnt") - 1) * length(col("u"))).as("__dch"))
        .select(col("doc_id"),
          (col("__d").cast("double") / col("__n"))
            .as(s"dup_${prefix}_frac"),
          (col("__dch").cast("double") / nullif(col("__ch"), lit(0L)))
            .as(s"dup_${prefix}_char_frac"))

    // word n-gram occurrences with start position (1-based)
    def grams(n: Int): DataFrame = tokf
      .filter(size(col("__toks")) >= n)
      .select(col("doc_id"), col("__toks"),
        explode(sequence(lit(1), size(col("__toks")) - (n - 1)))
          .as("__i"))
      .select(col("doc_id"), col("__i"),
        concat_ws(" ", slice(col("__toks"), col("__i"), lit(n)))
          .as("u"))

    def topFrac(n: Int): DataFrame = grams(n)
      .groupBy(col("doc_id"), col("u"))
      .agg(count(lit(1)).as("cnt"))
      .groupBy(col("doc_id"))
      // argmax by (count, gram char length) — the fraction needs only
      // those two numbers, so the struct max carries no strings
      .agg(max(struct(col("cnt"), length(col("u")).cast("long").as("l")))
        .as("__m"))
      .select(col("doc_id"),
        (col("__m.cnt") * col("__m.l")).as(s"__topchars_$n"))

    def dupFrac(n: Int): DataFrame = {
      val occ = grams(n)
      val dupStarts = occ.join(
          occ.groupBy(col("doc_id"), col("u"))
            .agg(count(lit(1)).as("cnt"))
            .filter(col("cnt") >= 2)
            .select(col("doc_id"), col("u")),
          Seq("doc_id", "u"))
        .select(col("doc_id"), col("__i").cast("long").as("s"),
          (col("__i") + (n - 1)).cast("long").as("e"))
      // per-doc interval union (gaps-and-islands; doc-scale windows)
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("doc_id")).orderBy(col("s"))
      val merged = dupStarts
        .withColumn("__pm", max(col("e")).over(w.rowsBetween(
          org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)))
        // TOUCHING intervals (s == prev_max + 1) stay in one island:
        // the covered-position set is contiguous across the boundary,
        // so the joining space between them is duplicated mass — the
        // reference and the oracle both count a space for every
        // adjacent covered pair. Splitting at s == pm+1 dropped it.
        .withColumn("__new",
          when(col("__pm").isNull || col("s") > col("__pm") + 1L, 1L)
            .otherwise(0L))
        .withColumn("__isl", sum(col("__new")).over(w.rowsBetween(
          org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)))
        .groupBy(col("doc_id"), col("__isl"))
        .agg(min(col("s")).as("s"), max(col("e")).as("e"))
      merged.join(tokf.select(col("doc_id"), col("__toks")), Seq("doc_id"))
        .select(col("doc_id"),
          length(concat_ws(" ",
            slice(col("__toks"), col("s").cast("int"),
              (col("e") - col("s") + 1).cast("int")))).cast("long")
            .as("__len"))
        .groupBy(col("doc_id"))
        .agg(sum(col("__len")).as(s"__dupchars_$n"))
    }

    val withUnits = tokf.select(col("doc_id"), col("__tc"))
      .join(unitDup("\n", "line"), Seq("doc_id"), "left")
      .join(unitDup("\n\n", "para"), Seq("doc_id"), "left")
    val withTop = topNs.foldLeft(withUnits) { (acc, n) =>
      acc.join(topFrac(n), Seq("doc_id"), "left") }
    val joined = dupNs.foldLeft(withTop) { (acc, n) =>
      acc.join(dupFrac(n), Seq("doc_id"), "left") }

    // nullif: an all-whitespace doc has zero joined chars — NULL (then
    // coalesce to 0.0) in both engines, never a 0/0 NaN-vs-NULL split
    def fr(c: Column): Column =
      c.cast("double") / nullif(col("__tc"), lit(0L))
    val topCols = topNs.map(n =>
      coalesce(fr(col(s"__topchars_$n")), lit(0.0))
        .as(s"top_${n}_gram_char_frac"))
    val dupCols = dupNs.map(n =>
      coalesce(fr(col(s"__dupchars_$n")), lit(0.0))
        .as(s"dup_${n}_gram_char_frac"))
    val unitCols = Seq(
      coalesce(col("dup_line_frac"), lit(0.0)).as("dup_line_frac"),
      coalesce(col("dup_line_char_frac"), lit(0.0))
        .as("dup_line_char_frac"),
      coalesce(col("dup_para_frac"), lit(0.0)).as("dup_para_frac"),
      coalesce(col("dup_para_char_frac"), lit(0.0))
        .as("dup_para_char_frac"))
    val out = joined.select(
      (col("doc_id") +: (unitCols ++ topCols ++ dupCols)): _*)
    val passCond = Seq(
      col("dup_line_frac") <= dupLineMax,
      col("dup_line_char_frac") <= dupLineCharMax,
      col("dup_para_frac") <= dupParaMax,
      col("dup_para_char_frac") <= dupParaCharMax) ++
      topNs.zip(topThresholds).map { case (n, t) =>
        col(s"top_${n}_gram_char_frac") <= t } ++
      dupNs.zip(dupThresholds).map { case (n, t) =>
        col(s"dup_${n}_gram_char_frac") <= t }
    out.withColumn("repetition_pass", passCond.reduce(_ && _))
  }

  /** Gopher-style document quality gate (Rae et al. 2021 §A1.1): word
    * count bounds, mean word length bounds, and a minimum number of
    * distinct probe stopwords present — the published rule is "≥ 2 of
    * {the, be, to, of, and, that, have, with}"; the probe list here is
    * parameterizable with a compact default. Single codegen'd scan, NO
    * shuffle: every metric is a column expression, so at 100 TB this is
    * a map-only pass fused with the parquet read. All metrics are
    * integer-derived (counts and exact int/int division), which is what
    * keeps the verdict engine-portable. */
  def gopherQuality(
      docs: DataFrame, textCol: String, idCol: String,
      minWords: Long = 40L, maxWords: Long = 100000L,
      minMeanLen: Double = 3.0, maxMeanLen: Double = 10.0,
      probeWords: Seq[String] = Seq("the", "a", "of", "and", "to"),
      minStopwords: Int = 2): DataFrame = {
    val t = col(textCol)
    val nWords = size(split(trim(t), "\\s+")).cast("long")
    val wordChars = length(translate(t, " ", "")).cast("long")
    val meanLen = wordChars.cast("double") / nWords
    // distinct probe words PRESENT (not hit counts): space-padded
    // containment, exact on whitespace-tokenized text
    val stopwordsPresent = probeWords
      .map(w => when(concat(lit(" "), t, lit(" ")).contains(s" $w "), 1L)
        .otherwise(0L))
      .reduce(_ + _)
    docs.select(
      col(idCol).as("doc_id"),
      nWords.as("n_words"),
      wordChars.as("word_chars"),
      meanLen.as("mean_word_len"),
      stopwordsPresent.as("stopwords_present"),
      (nWords.between(minWords, maxWords) &&
        meanLen.between(minMeanLen, maxMeanLen) &&
        stopwordsPresent >= minStopwords).as("keep"))
  }

  /** RAG-style overlapping character chunking: fixed `width` windows
    * every `stride` chars (stride < width ⇒ overlap of width−stride), one
    * chunk for docs shorter than `width`, with 1-based char offsets so a
    * retriever can map hits back into the source. Map-only: an
    * index-explode over `sequence(0, nChunks-1)` plus `substr` — no
    * shuffle, fuses into the scan, and at 100 TB parallelism is the scan
    * partitioning (a doc's chunks stay in its partition). Chunk-count
    * arithmetic is explicit floor-of-division so an external engine
    * reproduces the window layout bit-for-bit. */
  def chunkDocuments(docs: DataFrame, idCol: String, textCol: String,
      width: Int, stride: Int): DataFrame = {
    require(width > 0 && stride > 0, "width and stride must be positive")
    val len = length(col(textCol))
    // ceil((len-width)/stride) extra chunks after the first, floored at 0
    val lastIdx = greatest(lit(0),
      floor((len - lit(width) + lit(stride - 1)).cast("double") / stride)
        .cast("int"))
    docs.select(col(idCol), col(textCol), lastIdx.as("__last"))
      .select(col(idCol), col(textCol),
        explode(sequence(lit(0), col("__last"))).as("chunk_idx"))
      .select(
        col(idCol),
        col("chunk_idx").cast("long").as("chunk_idx"),
        (col("chunk_idx") * stride + 1).cast("long").as("chunk_start"),
        col(textCol).substr(col("chunk_idx") * stride + 1, lit(width))
          .as("chunk"))
      .withColumn("chunk_chars", length(col("chunk")).cast("long"))
  }

  /** Domain/source-level curation stats (the RefinedWeb-style "judge the
    * site, not just the page" pass): per domain, document count, distinct
    * content count (md5 of the text — exact dedup's digest), mean doc
    * length, and a `passed` gate on (unique fraction, mean length).
    * One narrow shuffle on the domain key; the per-domain state is a few
    * counters, so a 100 TB corpus with millions of domains aggregates
    * with map-side partials and no skew concern beyond AQE's reach.
    * `avg_chars`/`unique_frac` are single divisions of exact integer
    * aggregates — bit-identical across engines. */
  def domainStats(docs: DataFrame, domainCol: String, textCol: String,
      minUniqueFrac: Double, minAvgChars: Double): DataFrame =
    docs.groupBy(col(domainCol).as("domain"))
      .agg(
        count(lit(1)).as("n_docs"),
        countDistinct(md5(col(textCol))).as("n_unique"),
        sum(length(col(textCol)).cast("long")).as("total_chars"))
      .select(col("domain"), col("n_docs"), col("n_unique"),
        (col("total_chars").cast("double") / col("n_docs").cast("double"))
          .as("avg_chars"),
        (col("n_unique").cast("double") / col("n_docs").cast("double"))
          .as("unique_frac"))
      .withColumn("passed",
        col("unique_frac") >= minUniqueFrac &&
          col("avg_chars") >= minAvgChars)

  /** One-pass corpus profile: all metrics as columns. */
  def profile(docs: DataFrame, textCol: String): DataFrame = {
    val t = col(textCol)
    docs.withColumn("n_tokens", tokenCount(t))
      .withColumn("n_subwords", subwordCount(t))
      .withColumn("punct_ratio", round(punctRatio(t), 6))
      .withColumn("digit_ratio", round(digitRatio(t), 6))
      .withColumn("mean_token_len", round(meanTokenLength(t), 6))
      .withColumn("stopword_ratio", round(stopwordRatio(t), 6))
      .withColumn("quality", qualityScore(t))
      .withColumn("lang_id", langId(t))
      .withColumn("fingerprint", fingerprint(t))
  }

  /** Character-frequency concentration stats per document — a
    * repetitiveness/quality signal (CCNet-style char-distribution
    * screen) computed in EXACT integer arithmetic so an external engine
    * reproduces it bit-for-bit (no log-based entropy — libm `log` is
    * not guaranteed correctly rounded across engines; the Simpson index
    * Σ(cntᵢ/n)² carries the same signal as one integer ratio):
    *
    *   - `n_letters` / `n_distinct_chars` over `[a-z]` of the lowercased
    *     text (ASCII-restricted so char segmentation is engine-agnostic);
    *   - `top_char`/`top_cnt`: modal letter (ties to the smallest);
    *   - `sum_sq` = Σ cntᵢ² and `simpson` = sum_sq / n² — 1/26 ≈ 0.038
    *     for uniform text, → 1 for single-letter spam.
    *
    * Docs with no `[a-z]` letters are excluded (documented contract —
    * keeps the group-by oracle shape identical). Same two-aggregation
    * scale shape as [[repetitionStats]]: (doc,char) → (doc), both
    * map-side partial-combined, no windows. */
  def charDiversity(docs: DataFrame, textCol: String, idCol: String): DataFrame = {
    val cleaned = regexp_replace(lower(col(textCol)), "[^a-z]", "")
    val occ = docs
      .select(col(idCol).as("doc_id"), cleaned.as("__s"))
      .filter(length(col("__s")) > 0)
      // explode_outer: the plain generator's inferred size()>0 filter
      // would re-inline the regexp per row (the sketch trap)
      .select(col("doc_id"),
        explode_outer(filter(split(col("__s"), ""),
          c => length(c) > 0)).as("ch"))
    val counts = occ.groupBy(col("doc_id"), col("ch"))
      .agg(count(lit(1)).as("cnt"))
    counts.groupBy(col("doc_id")).agg(
        sum(col("cnt")).as("n_letters"),
        count(lit(1)).as("n_distinct_chars"),
        max(col("cnt")).as("top_cnt"),
        min_by(col("ch"), struct((-col("cnt")).as("nc"), col("ch")))
          .as("top_char"),
        sum(col("cnt") * col("cnt")).as("sum_sq"))
      .select(col("doc_id"), col("n_letters"), col("n_distinct_chars"),
        col("top_char"), col("top_cnt"), col("sum_sq"),
        // single division of exact integer aggregates — bit-identical
        (col("sum_sq").cast("double") /
          (col("n_letters") * col("n_letters")).cast("double"))
          .as("simpson"))
  }

  /** Model-based quality filtering: a linear classifier over hashed
    * unigram+bigram features — the relational shape of fastText-style
    * corpus filters (Joulin et al. 2016, arXiv:1607.01759; the
    * CCNet / GPT-3 "looks like the seed corpus?" gate, Wenzek et al.
    * 2019, arXiv:1911.00359). A trained model is a weight-per-bucket
    * vector; here the weights are DERIVED from the bucket id through a
    * second md5 hash (uniform in [-weightRange, weightRange]) so the
    * entire decision — tokenize, feature-hash, dot-product, threshold —
    * is engine-reproducible integer arithmetic with no artifact to ship.
    * The weight is a multiplicative (Knuth) integer hash of the bucket
    * id — one weight per bucket (the linear-model contract), pure BIGINT
    * arithmetic any engine replays, and free next to the per-feature
    * bucket md5 (a second per-feature md5 doubled the hot-path hash
    * cost; a broadcast (bucket, weight) table was measured ~0.8 s of
    * fixed exchange overhead per run at bench scale). Swapping in
    * TRAINED weights = calling [[linearScoreWithWeights]] with a real
    * (bucket, weight) frame, which broadcast-joins it.
    *
    * Scale shape: this is the best case — features never materialize as
    * a (doc, bucket, count) frame; the per-feature weight is computed in
    * the projection and summed straight into one partial-aggregated
    * groupBy(doc). One map + one hash-agg over the corpus, no joins,
    * no windows, no driver state.
    *
    * Output: (doc_id, n_feats, score, keep) with `score` the exact
    * BIGINT Σ w(bucket(f)) and `keep` = score > 0. Docs with zero
    * tokens contribute no features and are absent (same contract as
    * [[Selection.targetAffinity]]). */
  def hashedLinearScore(
      docs: DataFrame, textCol: String, idCol: String,
      nBuckets: Int = 4096, weightRange: Int = 1000,
      seed: Int = 7): DataFrame = {
    require(nBuckets >= 1 && weightRange >= 1)
    val bucket =
      graft.functions.PortableHash.md5Long60(col("__f")) % nBuckets
    // one weight per bucket via a multiplicative hash — nonneg inputs,
    // so `%` agrees across engines; (bucket + seed) keeps the weight
    // vector seedable without a second per-feature md5
    val weight = (((col("__b") + seed) * KnuthMul)
      % (2L * weightRange + 1L)) - weightRange
    linearScore(docs, textCol, idCol, bucket, Right(weight))
  }

  /** Knuth's multiplicative-hash constant (2^32 / φ). */
  private val KnuthMul = 2654435761L

  /** The trained-model form: score against a real `(bucket, weight)`
    * table — the artifact a fastText-style filter actually ships —
    * broadcast to every task (a model of millions of buckets is a few
    * MB). Same feature pipeline, tokenization, and output contract as
    * [[hashedLinearScore]]; features hashing to a bucket absent from
    * `weights` contribute weight 0 (inner join semantics would silently
    * shrink `n_feats`, so missing buckets are zero-filled instead). */
  def linearScoreWithWeights(
      docs: DataFrame, textCol: String, idCol: String,
      weights: DataFrame, nBuckets: Int = 4096): DataFrame = {
    require(nBuckets >= 1)
    val bucket =
      graft.functions.PortableHash.md5Long60(col("__f")) % nBuckets
    val table = weights.select(col("bucket").as("__b"),
      col("weight").cast("long").as("__w"))
    linearScore(docs, textCol, idCol, bucket, Left(table))
  }

  /** xxhash64 fast path of [[hashedLinearScore]] — same feature pipeline
    * and decision shape, ~an order of magnitude cheaper per feature (the
    * per-feature md5 becomes an xxhash64), for the sweep-the-whole-corpus
    * pass where no external oracle needs to replay the weights. `pmod`
    * because xxhash64 spans the full long range. */
  def hashedLinearScoreFast(
      docs: DataFrame, textCol: String, idCol: String,
      nBuckets: Int = 4096, weightRange: Int = 1000,
      seed: Int = 7): DataFrame = {
    require(nBuckets >= 1 && weightRange >= 1)
    val bucket = pmod(xxhash64(col("__f")), lit(nBuckets.toLong))
    val weight = pmod(xxhash64(col("__b"), lit(seed)),
      lit(2L * weightRange + 1L)) - weightRange
    linearScore(docs, textCol, idCol, bucket, Right(weight))
  }

  /** Shared classifier core: tokenize → unigram+bigram features →
    * per-feature weight → one partial-aggregated sum. `bucket` sees each
    * feature as `__f`. The weight is either a broadcast (`__b`, `__w`)
    * table (Left — the trained-model shape, zero-filled on misses) or an
    * expression over the bucket as `__b` (Right — the derived-weight
    * paths, where computing beats joining). */
  private def linearScore(
      docs: DataFrame, textCol: String, idCol: String,
      bucket: Column, weight: Either[DataFrame, Column]): DataFrame = {
    val norm = trim(regexp_replace(col(textCol), "[ \\t\\n\\x0B\\f\\r]+", " "))
    val toks = filter(split(norm, " "), w => w =!= "")
    val bigrams = when(size(col("__t")) >= 2,
      transform(sequence(lit(0), size(col("__t")) - 2),
        i => concat_ws(" ", element_at(col("__t"), i + 1),
          element_at(col("__t"), i + 2))))
      .otherwise(array().cast("array<string>"))
    val bucketed = docs.select(col(idCol).as("doc_id"), toks.as("__t"))
      .select(col("doc_id"),
        explode(concat(col("__t"), bigrams)).as("__f"))
      .select(col("doc_id"), bucket.as("__b"))
    val weighted = weight match {
      case Left(w) => bucketed.join(broadcast(w), Seq("__b"), "left")
        .select(col("doc_id"), coalesce(col("__w"), lit(0L)).as("__w"))
      case Right(e) => bucketed.select(col("doc_id"), e.as("__w"))
    }
    weighted
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_feats"), sum(col("__w")).as("score"))
      .select(col("doc_id"), col("n_feats"), col("score"),
        (col("score") > 0).as("keep"))
  }

  /** Collocation extraction — bigrams ranked by pointwise-mutual-
    * information LIFT: lift(a,b) = P(a,b) / (P(a)·P(b)) with bigram
    * probability over the bigram total and unigram probabilities over
    * the token total, i.e. (n_ab · N_uni²) / (n_a · n_b · N_bi). PMI is
    * log(lift) and log is monotone, so ranking by lift IS ranking by
    * PMI. Every count is widened to double BEFORE the multiplies, in
    * the same left-assoc order as the SQL twin: BIGINT products would
    * silently WRAP in non-ANSI Spark while DuckDB widens to HUGEINT
    * (divergence past N_uni ≈ 7·10⁷ at n_ab ≤ 2000, since
    * n_ab·N_uni² < 2^63 is the binding bound); double multiplies are
    * correctly rounded and identical on both engines at any scale —
    * exact below 2^53 per factor product, identically-rounded above
    * (the repo's no-libm oracle rule without giving up PMI semantics).
    *
    * Scale shape: one token explode feeds both count tables (unigrams;
    * adjacent pairs via the q39 sequence transform), each a map-side
    * partial hash-agg; the unigram joins are key equi-joins on single
    * words; totals are a 1-row broadcast. The `minPairCount` filter cuts
    * the pair table BEFORE the unigram joins (the long tail of
    * hapax bigrams never joins). No overflow cliff: the double-domain
    * factors can't wrap, so the operator is safe at any corpus size. */
  def collocations(docs: DataFrame, textCol: String,
      minPairCount: Long = 5L): DataFrame = {
    val toks = split(trim(lower(col(textCol))), "\\s+")
    val base = docs.select(toks.as("__t"))
    val uni = base.select(explode(col("__t")).as("w"))
      .groupBy("w").agg(count(lit(1)).as("n_w"))
    val bigrams = when(size(col("__t")) >= 2,
      transform(sequence(lit(0), size(col("__t")) - 2),
        i => struct(element_at(col("__t"), i + 1).as("w1"),
          element_at(col("__t"), i + 2).as("w2"))))
      .otherwise(array().cast("array<struct<w1:string,w2:string>>"))
    val pairsAll = base.select(explode(bigrams).as("p"))
      .select(col("p.w1"), col("p.w2"))
    val pairCounts = pairsAll.groupBy("w1", "w2")
      .agg(count(lit(1)).as("n_ab"))
    // both totals fall out of ONE pass over the token arrays: N_bi is
    // Σ max(len−1, 0) and N_uni is Σ len — no second scan, and only one
    // 1-row broadcast attach in the final plan (guarded)
    val totals = base.agg(
      sum(greatest(size(col("__t")) - 1, lit(0)).cast("long")).as("n_bi"),
      sum(size(col("__t")).cast("long")).as("n_uni"))
    pairCounts.filter(col("n_ab") >= minPairCount)
      .join(uni.select(col("w").as("w1"), col("n_w").as("n_a")), Seq("w1"))
      .join(uni.select(col("w").as("w2"), col("n_w").as("n_b")), Seq("w2"))
      .crossJoin(broadcast(totals))
      .select(col("w1"), col("w2"), col("n_ab"), col("n_a"), col("n_b"),
        ((col("n_ab").cast("double") * col("n_uni").cast("double")
            * col("n_uni").cast("double")) /
          (col("n_a").cast("double") * col("n_b").cast("double")
            * col("n_bi").cast("double"))).as("lift"))
  }

  /** Bigram-familiarity quality score — the no-libm LM-fluency proxy
    * (the CCNet/Wenzek et al. 2020 idea of ranking documents by a
    * reference language model's judgment, with the n-gram LM made
    * engine-exact instead of perplexity's log-domain):
    *
    *   - TRAIN on a reference corpus: bigram counts c(w₁w₂) and prefix
    *     totals c(w₁·) = Σ_w c(w₁w) — the MLE conditional
    *     P(w₂|w₁) = c(w₁w₂)/c(w₁·) as an exact BIGINT rational;
    *   - SCORE each document by its mean fixed-point conditional:
    *     fam(bigram) = (quant·c(w₁w₂)) DIV c(w₁·) ∈ [0, quant] (0 for
    *     bigrams the reference never saw), and
    *     familiarity = Σfam / (n_bigrams·quant) — one double division
    *     of exact BIGINTs, so both the per-bigram scores and the doc
    *     score replay bit-for-bit in an external engine (q127).
    *
    * High familiarity = the document's word transitions are common in
    * the reference (fluent, in-domain); gibberish, wrong-language, and
    * boilerplate-free-noise documents score near 0. A training
    * pipeline uses it exactly like CCNet's LM filter: score against a
    * trusted reference, keep the head/middle of the distribution.
    *
    * Scale shape: training is one map-side-combined hash agg over
    * exploded reference bigrams plus a prefix re-agg and ONE join at
    * train time; scoring is one equi-join of exploded document bigrams
    * against the (w₁, w₂, cab, ca) table — shuffle hash join on the
    * bigram key, no broadcast assumption (a 100 TB reference's bigram
    * table is itself large) — and one partial-agg per doc. Documents
    * with < 2 tokens have no bigrams and are absent from the output
    * (by construction, documented). Overflow: quant·c(w₁w₂) < 2⁶³
    * caps the most frequent reference bigram at ~9·10¹² occurrences
    * at the default quant 10⁶ — ~500× above a 100 TB corpus's "of
    * the". */
  def bigramFamiliarity(docs: DataFrame, reference: DataFrame,
      textCol: String, idCol: String,
      quant: Long = 1000000L): DataFrame = {
    require(quant > 0, "quant must be positive")
    val toks = split(trim(lower(col(textCol))), "\\s+")
    val bigramArr = when(size(col("__t")) >= 2,
      transform(sequence(lit(0), size(col("__t")) - 2),
        i => struct(element_at(col("__t"), i + 1).as("w1"),
          element_at(col("__t"), i + 2).as("w2"))))
      .otherwise(array().cast("array<struct<w1:string,w2:string>>"))
    def bigramsOf(df: DataFrame, keep: Seq[Column],
        keptNames: Seq[String]): DataFrame = {
      val kept = keptNames.map(col)
      df.select(keep :+ toks.as("__t"): _*)
        .select(kept :+ explode(bigramArr).as("__p"): _*)
        .select(kept ++ Seq(col("__p.w1"), col("__p.w2")): _*)
    }
    val refBg = bigramsOf(reference, Seq.empty, Seq.empty)
      .groupBy("w1", "w2").agg(count(lit(1)).as("cab"))
    val refTbl = refBg.join(
      refBg.groupBy("w1").agg(sum(col("cab")).as("ca")), Seq("w1"))
    bigramsOf(docs, Seq(col(idCol).as("__doc")), Seq("__doc"))
      .join(refTbl, Seq("w1", "w2"), "left")
      .select(col("__doc"),
        coalesce(expr(s"(${quant}L * cab) DIV ca"), lit(0L)).as("__fam"))
      .groupBy(col("__doc"))
      .agg(count(lit(1)).as("n_bigrams"), sum(col("__fam")).as("fam_sum"))
      .select(col("__doc").as(idCol), col("n_bigrams"), col("fam_sum"),
        (col("fam_sum").cast("double") /
          (col("n_bigrams") * lit(quant)).cast("double"))
          .as("familiarity"))
  }

  /** CCNet-style paragraph-level LM gate (Wenzek et al. 2020, LREC,
    * "CCNet: Extracting high quality monolingual datasets from web crawl
    * data"): documents are segmented into fixed `spanWords`-word spans
    * (the paragraph surrogate of the q77/q85 span convention — the
    * corpus carries no line breaks), every span is scored by the
    * [[bigramFamiliarity]] reference model in the SAME exact fixed-point
    * arithmetic, and each document gets (a) its overall familiarity,
    * (b) its WORST span — CCNet's actual lever: one garbage paragraph
    * flags a doc whose mean still looks fine — and (c) a
    * head/middle/tail bucket from an exact `ntile` over
    * (doc score DESC, id ASC), the keep-the-head/middle decision CCNet
    * applies per perplexity tercile.
    *
    * Every ordering key is exact BIGINT (per-span and per-doc scores are
    * floor-divided fixed-point rationals), so bucketing replays
    * bit-for-bit in an external engine (q160). Spans with < 2 tokens
    * carry no bigram and drop out; documents with no scorable span are
    * absent (the q127 contract).
    *
    * Scale shape: training and scoring inherit [[bigramFamiliarity]]'s
    * plan (hash join on the bigram key, partial aggs); the only new
    * stage is one (doc, span) pre-aggregation — same key cardinality as
    * the span explode, map-side combined. The bucket ntile is a global
    * sort of ONE ROW PER DOCUMENT (not corpus tokens); at extreme doc
    * counts swap the exact ntile for thresholds off a quantile sketch —
    * the scores are engine-exact either way. */
  def paragraphFamiliarityGate(docs: DataFrame, reference: DataFrame,
      textCol: String, idCol: String, spanWords: Int,
      quant: Long = 1000000L, nBuckets: Int = 3): DataFrame = {
    require(spanWords >= 2, "a span needs at least 2 words to hold a bigram")
    require(nBuckets >= 2, "need at least head/tail")
    val toks = split(trim(lower(col(textCol))), "\\s+")
    // reference model: bigram counts + prefix totals (bigramFamiliarity's)
    val refBase = reference.select(toks.as("__t"))
    val refBg = refBase.select(explode(when(size(col("__t")) >= 2,
        transform(sequence(lit(0), size(col("__t")) - 2),
          i => struct(element_at(col("__t"), i + 1).as("w1"),
            element_at(col("__t"), i + 2).as("w2"))))
        .otherwise(array().cast("array<struct<w1:string,w2:string>>")))
        .as("__p"))
      .select(col("__p.w1"), col("__p.w2"))
      .groupBy("w1", "w2").agg(count(lit(1)).as("cab"))
    val refTbl = refBg.join(
      refBg.groupBy("w1").agg(sum(col("cab")).as("ca")), Seq("w1"))
    // spans: non-overlapping word windows, then bigrams INSIDE each span
    val nSpans = floor((size(col("__t")) + (spanWords - 1))
      .cast("double") / spanWords).cast("int")
    val spans = docs.select(col(idCol).as("__doc"), toks.as("__t"))
      .select(col("__doc"), posexplode(
        transform(sequence(lit(0), greatest(nSpans, lit(1)) - 1),
          s => slice(col("__t"), s * spanWords + 1, lit(spanWords)))))
      .withColumnRenamed("pos", "__para").withColumnRenamed("col", "__s")
    val spanBg = spans.select(col("__doc"), col("__para"),
        explode(when(size(col("__s")) >= 2,
          transform(sequence(lit(0), size(col("__s")) - 2),
            i => struct(element_at(col("__s"), i + 1).as("w1"),
              element_at(col("__s"), i + 2).as("w2"))))
          .otherwise(array().cast("array<struct<w1:string,w2:string>>")))
          .as("__p"))
      .select(col("__doc"), col("__para"), col("__p.w1"), col("__p.w2"))
    val paraScores = spanBg
      .join(refTbl, Seq("w1", "w2"), "left")
      .select(col("__doc"), col("__para"),
        coalesce(expr(s"(${quant}L * cab) DIV ca"), lit(0L)).as("__fam"))
      .groupBy(col("__doc"), col("__para"))
      .agg(count(lit(1)).as("__n_bg"), sum(col("__fam")).as("__fam_sum"))
      .withColumn("__para_fp", expr("__fam_sum DIV __n_bg"))
    val docScores = paraScores.groupBy(col("__doc"))
      .agg(count(lit(1)).as("n_paras"),
        sum(col("__n_bg")).as("n_bigrams"),
        sum(col("__fam_sum")).as("__fam_total"),
        min(col("__para_fp")).as("min_para_fp"))
      .withColumn("fam_fp", expr("__fam_total DIV n_bigrams"))
    // exact global-ntile semantics via Layout.rangeBuckets (distributed
    // global row number + integer bucket arithmetic) — the old
    // ntile().over(Window.orderBy(...)) collapsed every doc score into
    // ONE task (r21 sweep finding; the q89/q149 fix applied here).
    // DESC is expressed as the negated key (fam_fp is BIGINT ≥ 0, so
    // -fam_fp ASC ≡ fam_fp DESC exactly); (fam_fp desc, doc asc) is
    // total, so buckets — and the hash — are bit-identical to the
    // window form's.
    Layout.rangeBuckets(docScores,
        Seq(-col("fam_fp"), col("__doc")), nBuckets, "__tile")
      .select(col("__doc").as(idCol), col("n_paras"), col("n_bigrams"),
        col("fam_fp"), col("min_para_fp"),
        when(col("__tile") === 1, lit("head"))
          .when(col("__tile") === nBuckets, lit("tail"))
          .otherwise(lit("middle")).as("bucket"))
  }

  /** The trained [[knTrigramGate]] model: five exact-count tables +
    * the 1-row (BT, V) totals. Callers that serve repeatedly (the
    * streaming twin) materialize each member once and reuse. */
  final case class KnTrigramModel(rTri: DataFrame, rCtx3: DataFrame,
      rMid: DataFrame, rMctx: DataFrame, rUni: DataFrame,
      btv: DataFrame) {
    /** localCheckpoint every table so per-batch scoring replays scans,
      * not the training lineage. */
    def materialized: KnTrigramModel = KnTrigramModel(
      rTri.localCheckpoint(false), rCtx3.localCheckpoint(false),
      rMid.localCheckpoint(false), rMctx.localCheckpoint(false),
      rUni.localCheckpoint(false), btv.localCheckpoint(false))
  }

  private def knTriOf(df: DataFrame, textCol: String, keep: Seq[Column],
      keptNames: Seq[String]): DataFrame = {
    val toks = split(trim(lower(col(textCol))), "\\s+")
    val kept = keptNames.map(col)
    val triArr = when(size(col("__t")) >= 3,
      transform(sequence(lit(0), size(col("__t")) - 3),
        i => struct(element_at(col("__t"), i + 1).as("w1"),
          element_at(col("__t"), i + 2).as("w2"),
          element_at(col("__t"), i + 3).as("w3"))))
      .otherwise(array().cast(
        "array<struct<w1:string,w2:string,w3:string>>"))
    df.select(keep :+ toks.as("__t"): _*)
      .select(kept :+ explode(triArr).as("__p"): _*)
      .select(kept ++ Seq(col("__p.w1"), col("__p.w2"),
        col("__p.w3")): _*)
  }

  /** Persist a trained [[KnTrigramModel]] — six frames on the
    * [[graft.model.IndexStore]] crash-atomic generation protocol
    * (r19: a torn six-table overwrite-in-place save could rehydrate
    * MIXED-generation count tables — silently wrong perplexities).
    * Bit-exact: every column is BIGINT or STRING. */
  def saveKnModel(model: KnTrigramModel, root: String): Unit = {
    val spark = model.rTri.sparkSession
    import spark.implicits._
    graft.model.IndexStore.save(root,
      Seq("rtri" -> model.rTri, "rctx3" -> model.rCtx3,
        "rmid" -> model.rMid, "rmctx" -> model.rMctx,
        "runi" -> model.rUni, "btv" -> model.btv),
      Seq("kn_trigram").toDF("kind"))
    ()
  }

  /** Bit-exact inverse of [[saveKnModel]] (newest complete
    * generation). A pre-r19 flat artifact carries no params marker, so
    * it loads as "absent" and trainOrLoad retrains once — the safe
    * direction. */
  def loadKnModel(root: String)(
      implicit spark: org.apache.spark.sql.SparkSession)
      : KnTrigramModel = {
    val (_, dir) = graft.model.IndexStore.load(spark, root)
    KnTrigramModel(
      spark.read.parquet(s"$dir/rtri"),
      spark.read.parquet(s"$dir/rctx3"),
      spark.read.parquet(s"$dir/rmid"),
      spark.read.parquet(s"$dir/rmctx"),
      spark.read.parquet(s"$dir/runi"),
      spark.read.parquet(s"$dir/btv"))
  }

  /** Train-once-reuse for the KN model: load from `root` if present,
    * else train via `build`, persist, and serve from the PERSISTED
    * copy (scoring lineage = parquet scans, never the training
    * aggregations — the streaming gate's natural across-session
    * artifact). */
  def trainOrLoadKnModel(root: String)(build: => KnTrigramModel)(
      implicit spark: org.apache.spark.sql.SparkSession)
      : KnTrigramModel =
    try {
      val m = loadKnModel(root)
      m.rTri.queryExecution.analyzed
      m
    } catch { case _: org.apache.spark.sql.AnalysisException =>
      saveKnModel(build, root); loadKnModel(root) }

  /** TRAIN the [[knTrigramGate]] count tables on a reference corpus —
    * see the gate's scaladoc for the model structure. */
  def knTrigramModel(reference: DataFrame, textCol: String)
      : KnTrigramModel = {
    val toks = split(trim(lower(col(textCol))), "\\s+")
    val refBase = reference.select(toks.as("__t"))
    val rTri = knTriOf(reference, textCol, Seq.empty, Seq.empty)
      .groupBy("w1", "w2", "w3").agg(count(lit(1)).as("c3"))
    val rCtx3 = rTri.groupBy("w1", "w2")
      .agg(sum(col("c3")).as("ctx3"), count(lit(1)).as("n3"))
    // rTri rows are distinct (w1,w2,w3), so a row count per (w2,w3)
    // IS the distinct-w1 continuation count
    val rMid = rTri.groupBy("w2", "w3").agg(count(lit(1)).as("cc2"))
    val rMctx = rMid.groupBy("w2")
      .agg(sum(col("cc2")).as("ctxc2"), count(lit(1)).as("nm"))
    val rBg = refBase.select(explode(when(size(col("__t")) >= 2,
        transform(sequence(lit(0), size(col("__t")) - 2),
          i => struct(element_at(col("__t"), i + 1).as("w1"),
            element_at(col("__t"), i + 2).as("w2"))))
        .otherwise(array().cast("array<struct<w1:string,w2:string>>")))
        .as("__p"))
      .select(col("__p.w1"), col("__p.w2"))
      .distinct()
    val rUni = rBg.groupBy("w2").agg(count(lit(1)).as("cc1"))
      .select(col("w2").as("w3"), col("cc1"))
    val btv = rBg.agg(count(lit(1)).as("bt")).crossJoin(
      refBase.select(explode(col("__t")).as("w")).distinct()
        .agg(count(lit(1)).as("v")))
    KnTrigramModel(rTri, rCtx3, rMid, rMctx, rUni, btv)
  }

  /** SCORE documents against a trained [[KnTrigramModel]] — per doc
    * (id, n_trigrams, kn_sum, kn_mean), no corpus-relative tercile (a
    * batch [[knTrigramGate]] adds it; the streaming twin applies a
    * fixed threshold instead, CCNet's production deployment shape). */
  def knTrigramScore(docs: DataFrame, model: KnTrigramModel,
      textCol: String, idCol: String,
      quant: Long = 1000000L): DataFrame = {
    require(quant > 0, "quant must be positive")
    val dTri = knTriOf(docs, textCol, Seq(col(idCol).as("__doc")),
      Seq("__doc"))
    val joined = dTri
      .join(model.rTri, Seq("w1", "w2", "w3"), "left")
      .join(model.rCtx3, Seq("w1", "w2"), "left")
      .join(model.rMid, Seq("w2", "w3"), "left")
      .join(model.rMctx, Seq("w2"), "left")
      .join(model.rUni, Seq("w3"), "left")
      .crossJoin(broadcast(model.btv))
      .select(col("__doc"),
        coalesce(col("c3"), lit(0L)).as("c3"),
        coalesce(col("ctx3"), lit(0L)).as("ctx3"),
        coalesce(col("n3"), lit(0L)).as("n3"),
        coalesce(col("cc2"), lit(0L)).as("cc2"),
        coalesce(col("ctxc2"), lit(0L)).as("ctxc2"),
        coalesce(col("nm"), lit(0L)).as("nm"),
        coalesce(col("cc1"), lit(0L)).as("cc1"),
        col("bt"), col("v"))
    val p1 = (col("cc1").cast("double") + lit(1.0d)) /
      (col("bt") + col("v") + lit(1L)).cast("double")
    val p2 = when(col("ctxc2") > 0,
      (greatest(col("cc2").cast("double") - lit(0.75d), lit(0.0d)) +
        lit(0.75d) * col("nm").cast("double") * p1) /
        col("ctxc2").cast("double")).otherwise(p1)
    val p3 = when(col("ctx3") > 0,
      (greatest(col("c3").cast("double") - lit(0.75d), lit(0.0d)) +
        lit(0.75d) * col("n3").cast("double") * p2) /
        col("ctx3").cast("double")).otherwise(p2)
    joined
      .select(col("__doc"),
        floor(lit(quant).cast("double") * p3).cast("long").as("__s"))
      .groupBy(col("__doc"))
      .agg(count(lit(1)).as("n_trigrams"), sum(col("__s")).as("kn_sum"))
      .withColumn("kn_mean", col("kn_sum").cast("double") /
        (col("n_trigrams") * lit(quant)).cast("double"))
      .withColumnRenamed("__doc", idCol)
  }

  /** Interpolated Kneser–Ney trigram gate — the CCNet LM-quality
    * filter (Wenzek et al. 2020) upgraded from the
    * [[bigramFamiliarity]] MLE proxy to a real SMOOTHED language model
    * (Kneser & Ney 1995; the interpolated form of Chen & Goodman
    * 1999 §2.7), still in the q127 no-libm discipline so every score
    * replays bit-for-bit in an external engine.
    *
    * TRAIN on a reference corpus:
    *   - trigram counts c₃(w₁w₂w₃), context totals ctx₃(w₁w₂) = Σ_w c₃,
    *     continuation fan-outs N₃(w₁w₂) = distinct w₃ seen after w₁w₂;
    *   - bigram-level CONTINUATION counts cc₂(w₂w₃) = distinct w₁ with
    *     c₃(w₁w₂w₃) > 0 — KN's insight: a word's lower-order weight is
    *     how many distinct contexts it completes, not how often it
    *     occurs ("Francisco" is frequent but only ever follows "San",
    *     so it deserves almost no unseen-context mass) — with
    *     ctxc₂(w₂) = Σ cc₂ and Nm(w₂) = distinct continuations;
    *   - base continuation unigrams cc₁(w₃) = distinct w₂ with bigram
    *     (w₂w₃) seen, over BT total bigram types and vocabulary V,
    *     add-one smoothed so out-of-vocabulary words keep nonzero mass.
    *
    * SCORE each document trigram with absolute discount D = 3/4:
    * {{{
    *   P₁ = (cc₁+1) / (BT+V+1)
    *   P₂ = (max(cc₂−D, 0) + D·Nm·P₁) / ctxc₂    (P₁ if w₂ unseen)
    *   P₃ = (max(c₃−D, 0) + D·N₃·P₂) / ctx₃      (P₂ if w₁w₂ unseen)
    * }}}
    * quantized as floor(quant·P₃) — an unseen trigram in a seen
    * context falls through the discount to the backoff mass instead of
    * the q127 hard zero.
    *
    * Exactness: every count is an exact BIGINT, and the double math
    * above uses ONLY IEEE-754 correctly-rounded operations (+, −, ×,
    * ÷, int→double, greatest) over those counts in a fixed expression
    * tree, so Spark and any IEEE engine produce bit-identical doubles
    * and identical floors. No ln/exp anywhere — transcendentals are
    * the libm calls that differ across engines, which is why q127
    * avoided log-domain perplexity; the arithmetic mean of P₃ orders
    * documents for gating just as CCNet's geometric mean does. The
    * q188 oracle replays counts, tree shape, and floors exactly.
    *
    * Per doc: n_trigrams, kn_sum = Σ floor(quant·P₃), kn_mean, and the
    * CCNet head/middle/tail tercile over (kn_mean DESC, id) — the
    * keep-the-head/middle decision lever. Docs with < 3 tokens carry
    * no trigram and are absent (the q127 contract).
    *
    * Scale shape: training is chained hash aggs over exploded
    * reference trigrams (map-side combined) plus one bigram-type
    * distinct; scoring joins exploded document trigrams against the
    * five model tables on their natural keys — shuffle hash joins, NO
    * broadcast assumption (a 100 TB reference's trigram table is
    * itself large); the one 1-row (BT, V) frame attaches via a guarded
    * broadcast. The tercile is a global sort of one row per DOCUMENT
    * (swap for quantile-sketch thresholds at extreme doc counts; the
    * scores stay engine-exact either way). */
  /** The at-scale form of the CCNet bucket step that the q160/q188
    * scaladocs promise: instead of the exact global-sort `ntile`
    * (one row per doc, but still a global sort), compute approximate
    * tercile thresholds ONCE from Spark's quantile sketch
    * (Greenwald–Khanna via `approx_percentile`) and bucket by
    * comparison — a MAP-ONLY gate afterward, and the thresholds are a
    * tiny reusable artifact (ship them to a streaming gate exactly
    * like the q188 twin's fixed cutoff). Buckets near the tercile
    * boundaries may differ from the exact ntile by the sketch's rank
    * error (spec floor: ≥ 90% agreement at accuracy 10000); the
    * far-from-boundary head/tail decisions — the ones curation acts
    * on — are stable. */
  def tercileThresholds(scored: DataFrame, scoreCol: String,
      accuracy: Int = 10000): (Double, Double) = {
    val r = scored.agg(percentile_approx(col(scoreCol),
      array(lit(1.0 / 3), lit(2.0 / 3)), lit(accuracy)).as("q"))
      .head.getSeq[Double](0)
    (r(0), r(1))
  }

  /** Map-only head/middle/tail bucketing under fixed thresholds (from
    * [[tercileThresholds]] or an offline reference run). Matches the
    * exact-ntile convention's orientation: HIGH scores are "head". */
  def bucketByThresholds(scored: DataFrame, scoreCol: String,
      lo: Double, hi: Double): DataFrame =
    scored.withColumn("bucket",
      when(col(scoreCol) >= hi, lit("head"))
        .when(col(scoreCol) < lo, lit("tail"))
        .otherwise(lit("middle")))

  def knTrigramGate(docs: DataFrame, reference: DataFrame,
      textCol: String, idCol: String, quant: Long = 1000000L,
      nBuckets: Int = 3): DataFrame = {
    require(nBuckets >= 2, "need at least head/tail")
    val perDoc = knTrigramScore(docs,
      knTrigramModel(reference, textCol), textCol, idCol, quant)
    // exact global-ntile semantics via Layout.rangeBuckets — the old
    // ntile().over(Window.orderBy(...)) collapsed every doc score into
    // ONE task (r21 sweep finding; the q89/q149 fix). DESC as the
    // negated key: kn_mean is a non-NaN double ≥ 0, so -kn_mean ASC ≡
    // kn_mean DESC exactly (a 0.0 → -0.0 flip compares equal and the
    // id tie-break keeps the order total); buckets — and the hash —
    // are bit-identical to the window form's.
    Layout.rangeBuckets(perDoc,
        Seq(-col("kn_mean"), col(idCol)), nBuckets, "__tile")
      .select(col(idCol), col("n_trigrams"), col("kn_sum"),
        col("kn_mean"),
        when(col("__tile") === 1, lit("head"))
          .when(col("__tile") === nBuckets, lit("tail"))
          .otherwise(lit("middle")).as("bucket"))
  }

  /** Blocklist gate — the C4-style banned-phrase screen (Raffel et al.
    * 2020 §2.2 drop pages containing any "List of Dirty, Naughty …"
    * word): every document scanned ONCE by an Aho–Corasick automaton
    * over the whole pattern list ([[graft.functions.AhoCorasick]]),
    * counting total occurrences (overlaps included — substring
    * semantics, so phrase patterns work unchanged) and distinct
    * patterns hit. Per doc: (n_matches, n_patterns, blocked).
    *
    * Scale shape: map-only, fused with the scan inside whole-stage
    * codegen — cost O(text + matches) per document INDEPENDENT of
    * blocklist size (the automaton is driver-built once and shipped
    * per stage), where a per-pattern scan or alternation regex scales
    * with the list. No shuffle, no join. */
  def blocklistGate(docs: DataFrame, textCol: String, idCol: String,
      patterns: Seq[String]): DataFrame = docs
    .select(col(idCol).as("doc_id"),
      graft.functions.exprs.blocklist_stats(col(textCol), patterns).as("__s"))
    .select(col("doc_id"),
      col("__s.n_matches").as("n_matches"),
      col("__s.n_patterns").cast("long").as("n_patterns"),
      (col("__s.n_matches") > 0).as("blocked"))

  /** Distinctive terms per group — the "dataset card" keyword report:
    * for every (group, term), the RATE RATIO of the term's in-group
    * frequency to its corpus-wide frequency, in exact fixed point
    * (quant·tf_grp·T_all DIV tf_all·T_grp — > quant means
    * over-represented), top-k per group by (ratio DESC, term ASC). The
    * integer rate ratio is the engine-portable stand-in for log-odds /
    * TF-IDF keyword scoring (monotone in the same quantity per term;
    * the log is a display transform).
    *
    * Scale shape: one token explode + a (group, term) hash agg (map-side
    * combined) is the only corpus-sized stage; term totals re-aggregate
    * FROM that table (never a second corpus pass) and join back on the
    * term key — a shuffle join, because a 100 TB vocabulary is itself
    * large; group totals and the grand total are catalog-sized
    * broadcasts. Top-k per group is the bounded BottomK heap; the
    * term's stats rejoin on (group, term) afterwards, so the heap
    * carries one string per entry. Overflow: quant·tf_grp·T_all < 2⁶³
    * caps tf_grp·T_all at ~9·10¹² at quant 10⁶ — beyond that, lower
    * quant or pre-bucket terms. */
  def distinctiveTerms(docs: DataFrame, textCol: String, groupCol: String,
      k: Int, quant: Long = 1000000L, minCount: Long = 5L): DataFrame = {
    require(k > 0 && quant > 0, "bad k/quant")
    val toks = docs.select(col(groupCol).as("source"),
        explode(split(trim(lower(col(textCol))), "\\s+")).as("term"))
      // split of an empty string yields [''] — drop the phantom token
      // (ADVICE r13; the weightedJaccardJoin hygiene convention)
      .filter(col("term") =!= "")
    val g = toks.groupBy(col("source"), col("term"))
      .agg(count(lit(1)).as("tf_grp"))
    val termAll = g.groupBy(col("term")).agg(sum(col("tf_grp")).as("tf_all"))
    val grpTot = g.groupBy(col("source")).agg(sum(col("tf_grp")).as("t_grp"))
    val allTot = grpTot.agg(sum(col("t_grp")).as("t_all"))
    val scored = g.filter(col("tf_grp") >= minCount)
      .join(termAll, Seq("term"))
      .join(broadcast(grpTot), Seq("source"))
      .crossJoin(broadcast(allTot))
      .withColumn("ratio_fp",
        expr(s"(${quant}L * tf_grp * t_all) DIV (tf_all * t_grp)"))
    val top = scored
      .groupBy(col("source"))
      .agg(graft.functions.BottomK.bottom_k(-col("ratio_fp"),
        col("term"), k).as("top"))
      .select(col("source"), posexplode(col("top")))
      .select(col("source"), (col("pos") + 1).cast("long").as("rank"),
        col("col.value").as("term"))
    top.join(scored.select(col("source"), col("term"),
        col("tf_grp"), col("ratio_fp")), Seq("source", "term"))
      .select(col("source"), col("rank"), col("term"), col("tf_grp"),
        col("ratio_fp"))
  }

  // ---------------------------------------------------------------------
  // BM25 ranked retrieval
  // ---------------------------------------------------------------------

  /** Shared BM25 statistics core: one (query_id, doc, tf, dl, df, n, l)
    * row per (query, document, matching term).
    *
    * Scale shape — the corpus-sized stage is a single map + broadcast
    * prune: tokens explode, a broadcast semi-join against the (tiny)
    * query-term set drops every non-query term BEFORE anything shuffles,
    * and `dl` rides in the grouping key (constant per doc) so no join
    * back to a per-doc length table is ever needed. The only
    * corpus-proportional shuffle is the (doc, dl, term) tf aggregation;
    * document frequencies and the 1-row (N, ΣL) stats are tiny
    * aggregates broadcast back onto it. Tokenization mirrors
    * [[termStats]] / the q38 oracle (`split(trim(lower(text)), "\\s+")`)
    * so corpus statistics agree across the text-analysis family. */
  private def bm25Core(docs: DataFrame, textCol: String, idCol: String,
      queries: DataFrame): DataFrame = {
    val toks = split(trim(lower(col(textCol))), "\\s+")
    // defensive distinct: a duplicated (query_id, term) row would
    // otherwise double that term's contribution in the score sum
    val q = queries.select(col("query_id"), col("term")).distinct()
    val terms = q.select(col("term")).distinct()
    val base = docs.select(col(idCol).as("doc"), toks.as("__t"))
    val stats = base.agg(count(lit(1)).cast("long").as("n"),
      sum(size(col("__t")).cast("long")).as("l"))
    val tf = base
      .select(col("doc"), size(col("__t")).cast("long").as("dl"),
        explode(col("__t")).as("term"))
      .join(broadcast(terms), Seq("term"))
      .groupBy(col("doc"), col("dl"), col("term"))
      .agg(count(lit(1)).as("tf"))
    // df from tf (already one row per (doc, term)) — |query terms| rows
    val df = tf.groupBy(col("term")).agg(count(lit(1)).cast("long").as("df"))
    tf.join(broadcast(df), Seq("term"))
      .join(broadcast(q), Seq("term"))
      .crossJoin(broadcast(stats))
  }

  /** A BM25 inverted-index snapshot — the serving-time artifact the
    * batch scorers derive per run: `postings` one row per (term, doc)
    * with the doc's length riding along (`term, doc, dl, tf`),
    * `termDf` per-term document frequencies, `stats` the 1-row
    * (N, ΣL) corpus totals. All BIGINT/STRING → parquet round-trips
    * bit-exactly, so index-served scores equal recomputed scores
    * integer for integer (spec'd in `Bm25Spec`). */
  final case class Bm25Index(postings: DataFrame, termDf: DataFrame,
      stats: DataFrame)

  /** Build the [[Bm25Index]] over a corpus — the index-time pass: one
    * corpus scan → full postings aggregation (term-doc scale, the
    * inverted index), plus the two tiny derived tables. Tokenization
    * mirrors [[bm25Core]]/[[termStats]] exactly. */
  def bm25Index(docs: DataFrame, textCol: String, idCol: String)
      : Bm25Index = {
    val toks = split(trim(lower(col(textCol))), "\\s+")
    val base = docs.select(col(idCol).as("doc"), toks.as("__t"))
    val stats = base.agg(count(lit(1)).cast("long").as("n"),
      sum(size(col("__t")).cast("long")).as("l"))
    val postings = base
      .select(col("doc"), size(col("__t")).cast("long").as("dl"),
        explode(col("__t")).as("term"))
      .groupBy(col("doc"), col("dl"), col("term"))
      .agg(count(lit(1)).as("tf"))
    val termDf = postings.groupBy(col("term"))
      .agg(count(lit(1)).cast("long").as("df"))
    Bm25Index(postings, termDf, stats)
  }

  /** [[bm25Core]] served from a snapshot instead of the corpus: the
    * postings scan pruned by a broadcast of the (tiny) query term set
    * — identical columns, identical integers, zero corpus passes. */
  private def bm25CoreFromIndex(index: Bm25Index, queries: DataFrame)
      : DataFrame = {
    val q = queries.select(col("query_id"), col("term")).distinct()
    val terms = q.select(col("term")).distinct()
    index.postings.join(broadcast(terms), Seq("term"))
      .join(broadcast(index.termDf.join(broadcast(terms), Seq("term"))),
        Seq("term"))
      .join(broadcast(q), Seq("term"))
      .crossJoin(broadcast(index.stats))
  }

  /** The integer scoring tail shared by [[bm25FixedPointTopK]] and
    * [[bm25FixedPointTopKFromIndex]]. */
  private def bm25FixedPointTail(core: DataFrame,
      idType: org.apache.spark.sql.types.DataType, k: Int, s1: Long,
      s2: Long): DataFrame = {
    val idfQ = expr(s"($s1 * (2*n - 2*df + 1)) DIV (2*df + 1)")
    val satQ = expr(s"($s2 * 22 * l * tf) DIV (10*l*tf + 3*l + 9*dl*n)")
    core
      .select(col("query_id"), col("doc"), (idfQ * satQ).as("__s"))
      .groupBy(col("query_id"), col("doc"))
      .agg(sum(col("__s")).as("score_q"))
      .groupBy(col("query_id"))
      .agg(graft.functions.BottomK.bottom_k(-col("score_q"),
        col("doc").cast("string"), k).as("top"))
      .select(col("query_id"), explode(col("top")).as("e"))
      .select(col("query_id"),
        col("e.value").cast(idType).as("doc_id"),
        (-col("e.key")).as("score_q"))
  }

  /** [[bm25FixedPointTopK]] served from a persisted/memoized
    * [[Bm25Index]] — same integers, but the per-run cost is a pruned
    * postings join, not a corpus tokenization pass (the q191 serving
    * path). */
  def bm25FixedPointTopKFromIndex(index: Bm25Index, queries: DataFrame,
      k: Int, s1: Long = 10000L, s2: Long = 1000000L): DataFrame =
    bm25FixedPointTail(bm25CoreFromIndex(index, queries),
      index.postings.select(col("doc")).schema.head.dataType, k, s1, s2)

  /** Persist a [[Bm25Index]] — three frames on the
    * [[graft.model.IndexStore]] crash-atomic generation protocol
    * (r19: postings of generation N over stats of N−1 would skew every
    * idf silently). */
  def saveBm25Index(index: Bm25Index, root: String): Unit = {
    val spark = index.postings.sparkSession
    import spark.implicits._
    graft.model.IndexStore.save(root,
      Seq("postings" -> index.postings, "termdf" -> index.termDf,
        "stats" -> index.stats),
      Seq("bm25").toDF("kind"))
    ()
  }

  /** Bit-exact inverse of [[saveBm25Index]] (newest complete
    * generation). A pre-r19 flat artifact carries no params marker, so
    * it loads as "absent" and trainOrLoad rebuilds once — the safe
    * direction. */
  def loadBm25Index(root: String)(
      implicit spark: org.apache.spark.sql.SparkSession): Bm25Index = {
    val (_, dir) = graft.model.IndexStore.load(spark, root)
    Bm25Index(
      spark.read.parquet(s"$dir/postings"),
      spark.read.parquet(s"$dir/termdf"),
      spark.read.parquet(s"$dir/stats"))
  }

  /** Train-once-reuse for BM25 indexes: load `root` if present, else
    * build + persist, and serve from the PERSISTED copy — scoring
    * lineage is three parquet scans, never the corpus aggregation. */
  def trainOrLoadBm25Index(root: String)(build: => Bm25Index)(
      implicit spark: org.apache.spark.sql.SparkSession): Bm25Index =
    try {
      val ix = loadBm25Index(root)
      ix.postings.queryExecution.analyzed
      ix
    } catch { case _: org.apache.spark.sql.AnalysisException =>
      saveBm25Index(build, root); loadBm25Index(root) }

  /** BM25 scores per (query, document) for a small set of keyword
    * queries — the ranked-retrieval primitive of a curation pipeline
    * (pull the most on-topic documents for a seed term set, score corpus
    * slices against benchmark queries). `queries` is a tiny
    * (query_id, term) table; see [[bm25Core]] for the plan shape.
    *
    * Lucene-form BM25:
    *   idf(t)     = ln(1 + (N − df + 0.5)/(df + 0.5))
    *   score(d,q) = Σ_{t∈q} idf(t) · tf·(k1+1)/(tf + k1·(1−b+b·dl/avgdl))
    *
    * Doubles + `ln`: libm is not bit-identical across engines (the
    * [[tfIdf]] precedent), so this form is spec-verified (`Bm25Spec`)
    * and the DuckDB-oracled gate runs the exact-integer twin
    * [[bm25FixedPointTopK]] over the same tf/df/dl/N/L statistics. */
  def bm25Scores(docs: DataFrame, textCol: String, idCol: String,
      queries: DataFrame, k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val core = bm25Core(docs, textCol, idCol, queries)
    val idf = log(lit(1.0) +
      (col("n") - col("df") + lit(0.5)) / (col("df") + lit(0.5)))
    val sat = (col("tf") * lit(k1 + 1.0)) /
      (col("tf") + lit(k1) * (lit(1.0 - b) +
        lit(b) * col("dl").cast("double") * col("n") / col("l")))
    core.select(col("query_id"), col("doc"), (idf * sat).as("__s"))
      .groupBy(col("query_id"), col("doc"))
      .agg(sum(col("__s")).as("score"))
      .select(col("query_id"), col("doc").as("doc_id"), col("score"))
  }

  /** Top-k of [[bm25Scores]] per query via the bounded-heap
    * [[graft.functions.BottomK]] (the q100 argument: constant state per
    * query, map-side partial reduction — no global sort and no window
    * over every scored document). The heap key is the score in 2^-40
    * fixed point (scores are O(ln N · terms), so the key stays far under
    * 2^63); ties resolve on the id's raw STRING form — the id is carried
    * through the heap unmodified (an earlier lpad-to-12 carry silently
    * TRUNCATED ids past 12 digits and nulled non-numeric ids on the way
    * out; round-10 advice) and cast back to the id column's own type on
    * output, which is lossless for any id type. Output score_fx is the
    * quantized key — rank-faithful to the double score within one part
    * in 2^40. */
  def bm25TopK(docs: DataFrame, textCol: String, idCol: String,
      queries: DataFrame, k: Int, k1: Double = 1.2,
      b: Double = 0.75): DataFrame = {
    val idType = docs.select(col(idCol)).schema.head.dataType
    val scaled = (col("score") * lit(math.pow(2, 40))).cast("long")
    bm25Scores(docs, textCol, idCol, queries, k1, b)
      .groupBy(col("query_id"))
      .agg(graft.functions.BottomK.bottom_k(-scaled,
        col("doc_id").cast("string"), k).as("top"))
      .select(col("query_id"), explode(col("top")).as("e"))
      .select(col("query_id"),
        col("e.value").cast(idType).as("doc_id"),
        (-col("e.key")).as("score_fx"))
  }

  /** Stateless per-row BM25 scoring — the SERVING shape: corpus
    * statistics (per-term df, N, L) come from an index-time snapshot
    * (e.g. [[termStats]] materialized at ingest), are resolved
    * driver-side, and fold into the projection as literals. Scoring a
    * document is then a pure map — zero shuffles, zero state — so the
    * SAME code scores a batch backfill or a `readStream` of incoming
    * documents (`StreamingSpec` drives both). tf comes from the row's
    * own token array.
    *
    * Semantics match [[bm25Scores]] exactly, except the per-doc score
    * sums its terms in fixed query order — bit-determinism the
    * shuffle-based groupBy cannot promise (parity is spec'd to 1e-12).
    * Terms missing from the snapshot score 0 (out-of-vocabulary);
    * (query, doc) rows with no matching term are dropped, mirroring
    * [[bm25Scores]]'s inner-join semantics. */
  def bm25ScorePerRow(docs: DataFrame, textCol: String, idCol: String,
      queries: Seq[(Long, Seq[String])], dfSnapshot: Map[String, Long],
      n: Long, l: Long, k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(n > 0 && l > 0, "snapshot totals must be positive")
    val base = docs.select(col(idCol).as("doc_id"),
      split(trim(lower(col(textCol))), "\\s+").as("__t"))
    val dl = size(col("__t")).cast("long")
    def tf(t: String): Column =
      size(filter(col("__t"), w => w === lit(t))).cast("long")
    def termScore(t: String): Column = dfSnapshot.get(t).filter(_ > 0) match {
      case Some(df) =>
        // identical arithmetic shape to bm25Scores, idf folded driver-side
        val idf = math.log(1.0 + (n - df + 0.5) / (df + 0.5))
        val sat = (tf(t) * lit(k1 + 1.0)) /
          (tf(t) + lit(k1) * (lit(1.0 - b) +
            lit(b) * dl.cast("double") * lit(n) / lit(l)))
        when(tf(t) > 0, lit(idf) * sat).otherwise(lit(0.0))
      case None => lit(0.0)
    }
    val perQuery = queries.map { case (qid, ts) =>
      struct(lit(qid).as("query_id"),
        ts.map(termScore).reduce(_ + _).as("score"))
    }
    base.select(col("doc_id"), explode(array(perQuery: _*)).as("q"))
      .select(col("q.query_id").as("query_id"), col("doc_id"),
        col("q.score").as("score"))
      .filter(col("score") > 0.0)
  }

  /** Exact-integer fixed-point twin of [[bm25TopK]] — the oracle-able
    * form. k1 = 6/5 and b = 3/4 fold into integer constants
    * (multiply the saturation term through by 10·L):
    *
    *   sat  = tf·(k1+1)/(tf + k1·(1−b+b·dl·N/L))
    *        = 22·L·tf / (10·L·tf + 3·L + 9·dl·N)
    *   idf* = (N − df + ½)/(df + ½) = (2N−2df+1)/(2df+1)
    *
    * idf* is the Robertson ratio without the ln — a monotone-in-df
    * surrogate that keeps every factor a ratio of integers. Each factor
    * is floored at scale s1 / s2 by integer division, so
    *
    *   score(d,q) = Σ_t (s1·(2N−2df+1) DIV (2df+1))
    *                   · (s2·22·L·tf DIV (10·L·tf + 3·L + 9·dl·N))
    *
    * is BIGINT-exact and engine-portable: Spark `DIV` truncates toward
    * zero, DuckDB `//` floors — identical on these all-nonnegative
    * operands. Overflow headroom: needs s2·22·L·tf < 2^63, i.e. corpus
    * token count L ≲ 4·10^14/tf_max at s2=10^6 — beyond that drop s2 or
    * lift the arithmetic to DECIMAL(38,0); the production scorer is the
    * double-typed [[bm25Scores]], where magnitude is a non-issue. */
  def bm25FixedPointTopK(docs: DataFrame, textCol: String, idCol: String,
      queries: DataFrame, k: Int, s1: Long = 10000L,
      s2: Long = 1000000L): DataFrame =
    bm25FixedPointTail(bm25Core(docs, textCol, idCol, queries),
      docs.select(col(idCol)).schema.head.dataType, k, s1, s2)

  /** Reciprocal rank fusion (Cormack, Clarke & Büttcher 2009,
    * "Reciprocal rank fusion outperforms Condorcet and individual rank
    * learning methods") — combine SEVERAL rankings of the same items
    * into one: fused(i) = Σ_sources 1/(K + rank_s(i)), items absent
    * from a source contribute nothing from it. The rank-aggregation
    * step of hybrid retrieval (BM25 ⊕ ANN) and of multi-signal
    * curation (length prior ⊕ quality prior ⊕ familiarity): RRF only
    * consumes RANKS, so signals with incomparable score scales compose
    * without calibration.
    *
    * Exact-integer contract: each contribution is `2⁴⁰ DIV (K + rank)`
    * — floor division of exact BIGINTs — so the fused score is an
    * order-independent BIGINT sum (partition-layout-proof, and q134's
    * DuckDB twin replays it bit-for-bit; the repo's fixed-point
    * convention). 2⁴⁰/(K+1) ≈ 1.6·10¹⁰ per source caps the source
    * count in the hundreds of millions before BIGINT overflow — not a
    * real bound. Final order: fused score DESC, then item ASC (a total
    * order).
    *
    * Scale shape: one union (no shuffle) + one hash aggregation on
    * (group, item) + one per-group rank limited to `topN` (window over
    * the group hash partitioning — rankings are already per-group
    * top-lists, so group cardinality ≪ corpus). The input rankings'
    * cost is the caller's; fusion itself never touches raw documents.
    *
    * @param rankings frames of (groupCol, itemCol, rankCol) — rank
    *                 1-based within the group
    * @return (group, item, rrf_q, fused_rank), fused_rank ≤ topN */
  def reciprocalRankFusion(rankings: Seq[DataFrame], groupCol: String,
      itemCol: String, rankCol: String, kParam: Int = 60,
      topN: Int = 100): DataFrame = {
    require(rankings.nonEmpty, "need at least one ranking")
    require(kParam >= 0 && topN >= 1)
    val contrib = rankings.map(_.select(col(groupCol).as("grp"),
        col(itemCol).as("item"),
        expr(s"${1L << 40} DIV (CAST($kParam AS BIGINT) + $rankCol)")
          .as("__c")))
      .reduce(_.unionByName(_))
    val fused = contrib.groupBy(col("grp"), col("item"))
      .agg(sum(col("__c")).as("rrf_q"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("grp"))
      .orderBy(col("rrf_q").desc, col("item").asc)
    fused.withColumn("fused_rank", row_number().over(w).cast("long"))
      .filter(col("fused_rank") <= topN)
      .select(col("grp").as(groupCol), col("item").as(itemCol),
        col("rrf_q"), col("fused_rank"))
  }

  // ------------------------------------------------------------------ BPE

  /** Subword token stream under a fixed BPE merge table
    * ([[graft.functions.BpeKernel]]): one row per token occurrence,
    * preserving the source row's id — the REAL token counter behind
    * the [[subwordCount]] heuristic, feeding packing token budgets
    * and mixture planning with exact counts. Segmentation is one
    * codegen'd kernel call per row ([[graft.functions.BpeSegment]],
    * merge table shipped once per stage); the explode is the only
    * fan-out. Texts should be whitespace-normalized first (merges
    * never cross the space-delimited word units). */
  def bpeTokens(docs: DataFrame, textCol: String, idCol: String,
      merges: Seq[(String, String)]): DataFrame = docs
    .select(col(idCol).as("id"),
      graft.functions.exprs.bpe_segment(col(textCol), merges).as("__seg"))
    .select(col("id"), explode(split(col("__seg"), " ")).as("token"))
    .filter(col("token") =!= "")

  /** Learn a BPE merge table from a corpus — Sennrich et al. 2016
    * TRAINING order: `numMerges` rounds, each taking the single most
    * frequent adjacent symbol pair under the merges learned so far
    * (ties broken (count DESC, left ASC, right ASC) — a total order,
    * so training is deterministic and engine-independent).
    *
    * Scale shape: each round is ONE corpus pass — segment with the
    * current table (codegen kernel), emit adjacent in-word symbol
    * pairs (an index-zip transform, no self-join), and hash-aggregate
    * pair counts partially; only the winning pair (one row) reaches
    * the driver per round, the [[graft.operators.Ann
    * .kmeansCentroidsPortable]] bounded-model-state convention. Cost
    * is numMerges passes by construction — BPE training is inherently
    * sequential in the merge order (each round's pair statistics
    * depend on the previous merge). Train on a SAMPLE at 100 TB (any
    * [[graft.operators.Sampling]] portable sample); apply the learned
    * table everywhere via [[bpeTokens]]. */
  /** Frequency-ranked subword vocabulary for [[wordpieceSegment]]:
    * every substring of corpus tokens up to `maxPiece` chars, counted
    * over token OCCURRENCES, top `vocabSize` by the VALUE score
    * freq·(len−1) — the characters a piece saves over spelling it out,
    * the same quantity a WordPiece merge's likelihood gain prices —
    * so high-frequency LONG pieces win the budget while single chars
    * (score 0) ride along unconditionally for coverage: any word ≤
    * the length cap is segmentable. One explode + one hash agg + one
    * bounded top-k. */
  def wordpieceVocab(docs: DataFrame, textCol: String,
      vocabSize: Int = 64, maxPiece: Int = 8): DataFrame = {
    require(vocabSize >= 1 && maxPiece >= 1)
    val words = docs
      .select(explode(split(trim(lower(col(textCol))), "\\s+"))
        .as("__w"))
      .filter(col("__w") =!= "")
    val subs = words.select(explode(flatten(transform(
        sequence(lit(1), least(length(col("__w")), lit(maxPiece))),
        l => transform(sequence(lit(1), length(col("__w")) - l + 1),
          s => substring(col("__w"), s, l))))).as("piece"))
      .groupBy(col("piece")).agg(count(lit(1)).as("freq"))
    // global top-vocabSize WITHOUT a global window: the old
    // row_number().over(Window.orderBy(...)) collapsed the ENTIRE
    // substring-frequency table into one task (r21 sweep finding —
    // this was an unbounded single-task sort, the q195 scale cliff);
    // orderBy+limit plans TakeOrderedAndProject — per-partition
    // top-vocabSize heaps and a driver merge bounded by the vocab
    // size, the model-state budget class. The order is total (piece
    // is unique after the groupBy), so the selected set — and the
    // hash — are identical.
    val top = subs
      .orderBy((col("freq") * (length(col("piece")) - 1)).desc,
        col("piece").asc)
      .limit(vocabSize)
      .select(col("piece"), col("freq"))
    // chars ride along with their true frequency (dedup vs top)
    top.unionByName(
        subs.filter(length(col("piece")) === 1)
          .join(top.select(col("piece")), Seq("piece"), "left_anti"))
      .select(col("piece"), col("freq"))
  }

  /** WordPiece-style subword segmentation as an EXACT integer dynamic
    * program — the tokenizer-family member BPE's greedy merges can't
    * express: per word the DP minimizes (piece count, then −Σ piece
    * frequency, then shortest-last-piece) — fewest pieces first, the
    * longest-match flavor of WordPiece/MaxMatch (Song et al. 2021's
    * "Fast WordPiece" objective), with corpus frequency as the
    * tie-break instead of unigram-LM probabilities so EVERYTHING stays
    * BIGINT (no libm, no float products) and the q195 oracle replays
    * the whole table cut for cut. The encoded cost is
    * `pieces·2⁵⁰ − Σfreq` (freq sums are far below 2⁵⁰), and at every
    * position the (cost ASC, piece-length ASC) argmin is unique, so
    * the segmentation is deterministic by induction.
    *
    * The DP runs over DISTINCT words (types, not occurrences) with
    * `maxWord` unrolled steps — word-type-scale frames joined against
    * the broadcast-sized vocabulary, nothing corpus-shaped after the
    * distinct. Words longer than `maxWord` pass through unsegmented
    * with `covered = false` (count them; a real corpus sets the cap
    * comfortably above its P99 word length).
    *
    * @return one row per distinct word: (word, n_pieces, pieces —
    *         '|'-joined — , covered) */
  def wordpieceSegment(docs: DataFrame, textCol: String,
      vocab: DataFrame, maxPiece: Int = 8,
      maxWord: Int = 16): DataFrame = {
    require(maxPiece >= 1 && maxWord >= 1)
    val spark = docs.sparkSession
    val words = docs
      .select(explode(split(trim(lower(col(textCol))), "\\s+"))
        .as("word"))
      .filter(col("word") =!= "")
      .distinct()
      .localCheckpoint(false)
    val v = vocab.select(col("piece"), col("freq").cast("long")
      .as("freq")).localCheckpoint(false)
    val inRange = words.filter(length(col("word")) <= maxWord)
    val big = lit(1L << 50)
    // the loop length is the LONGEST in-range word, not the cap — the
    // rounds past it would only ever see empty candidate sets, and the
    // per-round scheduling floor is this operator's whole cost at
    // word-type scale
    val maxLen = inRange.agg(max(length(col("word")))).head match {
      case r if r.isNullAt(0) => 0
      case r => r.getInt(0)
    }
    // DP state: (word, pos, cost, n, pieces) — best segmentation of
    // the first `pos` chars; base pos = 0. `n` counts pieces IN the
    // state (re-splitting the '|'-joined string would over-count for
    // words containing a literal '|'). Each round's NEW rows are
    // checkpointed once; the accumulated state is a lazy union of
    // already-materialized frames (never re-checkpointed).
    var frames = Seq(inRange.select(col("word"), lit(0).as("pos"),
      lit(0L).as("cost"), lit(0L).as("n"), lit("").as("pieces"))
      .localCheckpoint(false))
    (1 to maxLen).foreach { i =>
      val best = frames.reduce(_.unionByName(_))
      val cands = best
        .filter(col("pos") < length(col("word")))
        .filter(col("pos") >= i - maxPiece && col("pos") <= i - 1)
        .filter(length(col("word")) >= i)
        .withColumn("__piece",
          expr(s"substring(word, pos + 1, $i - pos)"))
        .join(v.select(col("piece").as("__piece"), col("freq")),
          Seq("__piece"))
        .select(col("word"), lit(i).as("__i"),
          (col("cost") + big - col("freq")).as("cost"),
          (col("n") + 1L).as("n"),
          (lit(i) - col("pos")).as("__l"),
          concat(col("pieces"),
            when(col("pieces") === "", col("__piece"))
              .otherwise(concat(lit("|"), col("__piece"))))
            .as("pieces"))
      val stepBest = cands
        .withColumn("__rn", row_number().over(
          org.apache.spark.sql.expressions.Window
            .partitionBy(col("word"))
            .orderBy(col("cost").asc, col("__l").asc)))
        .filter(col("__rn") === 1)
        .select(col("word"), col("__i").as("pos"), col("cost"),
          col("n"), col("pieces"))
      frames = frames :+ stepBest.localCheckpoint(false)
    }
    val segmented = frames.reduce(_.unionByName(_))
      .filter(col("pos") === length(col("word")))
      .select(col("word"), col("n").as("n_pieces"),
        col("pieces"), lit(true).as("covered"))
    // in-range words the vocab cannot fully cover (e.g. a char absent
    // from a cross-corpus vocab) reach no pos==length state; they must
    // still appear — one row per distinct word is the contract — so
    // they pass through like the >maxWord branch
    val uncovered = inRange
      .join(segmented.select(col("word")), Seq("word"), "left_anti")
      .select(col("word"), lit(1L).as("n_pieces"),
        col("word").as("pieces"), lit(false).as("covered"))
    segmented.unionByName(uncovered).unionByName(
      words.filter(length(col("word")) > maxWord)
        .select(col("word"), lit(1L).as("n_pieces"),
          col("word").as("pieces"), lit(false).as("covered")))
  }

  /** Shared Viterbi subword DP over word TYPES — the q195 unrolled
    * integer dynamic program generalized to any (piece, score) table:
    * per word the DP minimizes (piece count, then −Σ score, then
    * shortest-last-piece), encoded as `pieces·2⁵⁰ − Σscore` with the
    * (cost ASC, piece-length ASC) argmin unique at every position, so
    * the segmentation is deterministic by induction and an external
    * engine replays it cut for cut. Carries the piece multiset as an
    * ARRAY (the E-step needs multiplicities; '|'-splitting would
    * miscount words containing a literal '|').
    *
    * SINGLE-PASS shape (r20): the per-position DP runs INSIDE one
    * `aggregate` higher-order expression over each word's scored-edge
    * list — one substring explode, one model join (vocab is
    * broadcast-sized model state), one per-word collect, one map-only
    * projection. The previous form looped maxWord Spark JOBS (a join +
    * a word-window + a checkpoint per character position): ~24 global
    * stage barriers to segment a vocabulary whose per-word DP is ≤
    * maxWord·maxPiece cells — pure scheduling overhead at ANY scale
    * (it was ~5 s on a 1,199-type frame and dominated the q217 model
    * build). The runtime `aggregate` evaluates the same recurrence
    * per row with zero barriers; `array_min` over (cost, last-piece
    * length) is the same argmin, and ties beyond that prefix are
    * byte-identical candidates (predecessor per (end, length) is
    * unique), so the output is bit-equal to the loop form.
    *
    * @param types one row per distinct in-range word: (word)
    * @return (word, n_pieces, parr) for words the vocab covers */
  private def viterbiSegmentArr(types: DataFrame, vocab: DataFrame,
      maxPiece: Int): DataFrame = {
    val big = 1L << 50
    val v = vocab.select(col("piece"), col("score").cast("long")
      .as("score")).localCheckpoint(false)
    // every (pos, end] substring of length <= maxPiece, scored by the
    // model — edges the DP may traverse; words with NO scored edge
    // (or no full path below) are simply absent, the uncovered lane.
    // Empty words are excluded up front: sequence(1, 0) auto-steps
    // DOWN to [1, 0] (ADVICE r20), so a zero-length word would feed
    // the DP a descending position walk instead of dropping cleanly.
    val inRange = types.filter(length(col("word")) >= 1)
    val cand = inRange.select(col("word"),
        explode(expr(
          s"""flatten(transform(sequence(1, length(word)), endp ->
             |  transform(sequence(1, least($maxPiece, endp)), l ->
             |    named_struct(
             |      'pos', endp - l,
             |      'endp', endp,
             |      'piece', substring(word, endp - l + 1, l)))))"""
            .stripMargin)).as("e"))
      .select(col("word"), col("e.pos").as("pos"),
        col("e.endp").as("endp"), col("e.piece").as("piece"))
    val byWord = cand.join(v, Seq("piece"))
      .groupBy(col("word"))
      .agg(collect_list(struct(col("pos"), col("endp"), col("piece"),
        col("score"))).as("__es"))
    byWord
      .withColumn("__best", expr(
        s"""aggregate(
           |  sequence(1, length(word)),
           |  array(named_struct('cost', CAST(0 AS BIGINT), 'l', 0,
           |    'n', CAST(0 AS BIGINT),
           |    'parr', CAST(array() AS array<string>))),
           |  (acc, i) -> concat(acc, array(
           |    array_min(transform(
           |      filter(__es, e -> e.endp = i
           |        AND isnotnull(element_at(acc, e.pos + 1))),
           |      e -> named_struct(
           |        'cost', element_at(acc, e.pos + 1).cost
           |          + CAST($big AS BIGINT) - e.score,
           |        'l', i - e.pos,
           |        'n', element_at(acc, e.pos + 1).n + CAST(1 AS BIGINT),
           |        'parr', concat(element_at(acc, e.pos + 1).parr,
           |          array(e.piece))))))),
           |  acc -> element_at(acc, length(word) + 1))""".stripMargin))
      .filter(col("__best").isNotNull)
      .select(col("word"), col("__best.n").as("n_pieces"),
        col("__best.parr").as("parr"))
  }

  /** Unigram-LM (SentencePiece-style) tokenizer TRAINER — Kudo 2018's
    * EM over a bounded candidate-piece inventory, in exact fixed point
    * so the whole training run hash-verifies cross-engine (the q126
    * quantized-EM convention):
    *
    *   - candidates: every substring of length ≤ `maxPiece` of the
    *     in-range word types, occurrence-weighted, thresholded at
    *     `minFreq` — plus ALL single characters (kept through every
    *     round, SentencePiece's coverage guarantee);
    *   - E-step: Viterbi-segment the word types under the current
    *     piece scores `q = floor(quant · c / Σc)` — one IEEE divide of
    *     exact integers then floor, bit-identical in any engine — with
    *     the [[viterbiSegmentArr]] lexicographic objective (fewest
    *     pieces, then highest Σq, then shortest-last): the log-product
    *     Viterbi objective is replaced by this integer total order for
    *     cross-engine exactness (the q195 no-libm argument; libm logs
    *     are not correctly-rounded, so floor(quant·log p) can differ
    *     in the last bit across engines);
    *   - M-step: re-estimate c as the occurrence-weighted piece counts
    *     along the best segmentations; non-character pieces the E-step
    *     never used PRUNE to zero and leave the vocabulary (Kudo's
    *     shrink step, deterministic form).
    *
    * `iters` EM rounds, then final scores from the last counts. Words
    * longer than `maxWord` are excluded from training (they'd
    * byte-fall-back in a real tokenizer; [[unigramLmSegment]] reports
    * them uncovered). Piece inventory is bounded (≤ types·maxPiece²
    * candidates), so every vocab frame is broadcast-sized model state.
    *
    * @return (piece, c, q) — the model artifact; q non-zero only for
    *         pieces the final E-step used (chars ride at their final
    *         counts, possibly 0) */
  def unigramLmTrain(docs: DataFrame, textCol: String, iters: Int = 2,
      quant: Long = 1000000L, maxPiece: Int = 4, maxWord: Int = 8,
      minFreq: Long = 2L): DataFrame = {
    require(iters >= 1 && quant >= 1 && maxPiece >= 1 && maxWord >= 1)
    val wcnt = docs
      .select(explode(split(trim(lower(col(textCol))), "\\s+"))
        .as("word"))
      .filter(col("word") =!= "")
      .filter(length(col("word")) <= maxWord)
      .groupBy(col("word")).agg(count(lit(1)).as("cnt"))
      .localCheckpoint(false)
    // occurrence-weighted substring candidates (+ all chars, always)
    val subs = wcnt
      .select(col("cnt"), explode(flatten(transform(
        sequence(lit(1), least(length(col("word")), lit(maxPiece))),
        l => transform(sequence(lit(1), length(col("word")) - l + 1),
          s => substring(col("word"), s, l))))).as("piece"))
      .groupBy(col("piece")).agg(sum(col("cnt")).as("c"))
    val chars = subs.filter(length(col("piece")) === 1)
    var counts = subs.filter(col("c") >= minFreq)
      .unionByName(chars.join(
        subs.filter(col("c") >= minFreq).select(col("piece")),
        Seq("piece"), "left_anti"))
      .localCheckpoint(true)
    val charSet = chars.select(col("piece")).localCheckpoint(true)
    val types = wcnt.select(col("word")).localCheckpoint(false)
    def scoresOf(c: DataFrame): DataFrame = {
      val t = c.agg(sum(col("c")).as("__T"))
      c.crossJoin(broadcast(t))
        .select(col("piece"), col("c"),
          floor(lit(quant) * (col("c").cast("double") /
            col("__T").cast("double"))).cast("long").as("q"))
    }
    (1 to iters).foreach { _ =>
      val seg = viterbiSegmentArr(types,
        scoresOf(counts).select(col("piece"), col("q").as("score")),
        maxPiece)
      val used = seg.select(col("word"), explode(col("parr")).as("piece"))
        .join(wcnt, Seq("word"))
        .groupBy(col("piece")).agg(sum(col("cnt")).as("c"))
      // prune unused non-char pieces; chars always survive (count 0)
      counts = used.unionByName(
          charSet.join(used.select(col("piece")), Seq("piece"),
              "left_anti")
            .select(col("piece"), lit(0L).as("c")))
        .localCheckpoint(true)
    }
    scoresOf(counts).select(col("piece"), col("c"), col("q"))
  }

  /** Persist a [[unigramLmTrain]] model — one STRING + two BIGINT
    * columns, bit-exact round trip (the tokenizer-artifact convention:
    * BPE merge tables, WordPiece vocabularies). */
  def saveUnigramModel(model: DataFrame, path: String): Unit =
    model.select(col("piece").cast("string"), col("c").cast("long"),
      col("q").cast("long"))
      .write.mode("overwrite").parquet(path)

  /** Bit-exact inverse of [[saveUnigramModel]]. */
  def loadUnigramModel(path: String)(
      implicit spark: org.apache.spark.sql.SparkSession): DataFrame =
    spark.read.parquet(path).select(col("piece"), col("c"), col("q"))

  /** Train-once-reuse for the unigram-LM model (the
    * `trainOrLoadBpeMerges` convention): load if present, else train,
    * persist, serve from the PERSISTED copy. */
  def trainOrLoadUnigramModel(path: String)(build: => DataFrame)(
      implicit spark: org.apache.spark.sql.SparkSession): DataFrame =
    try { val m = loadUnigramModel(path); m.queryExecution.analyzed; m }
    catch { case _: org.apache.spark.sql.AnalysisException =>
      saveUnigramModel(build, path); loadUnigramModel(path) }

  /** Viterbi segmentation under a trained [[unigramLmTrain]] table —
    * the [[wordpieceSegment]] output contract (word, n_pieces,
    * '|'-joined pieces, covered), so [[tokenizerFertility]] wires
    * directly. Words longer than `maxWord`, and in-range words the
    * model cannot cover, pass through unsegmented with
    * `covered = false`. */
  def unigramLmSegment(docs: DataFrame, textCol: String,
      model: DataFrame, maxPiece: Int = 4,
      maxWord: Int = 8): DataFrame = {
    val words = docs
      .select(explode(split(trim(lower(col(textCol))), "\\s+"))
        .as("word"))
      .filter(col("word") =!= "")
      .distinct()
      .localCheckpoint(false)
    val inRange = words.filter(length(col("word")) <= maxWord)
    val seg = viterbiSegmentArr(inRange,
        model.select(col("piece"), col("q").as("score")), maxPiece)
      .select(col("word"), col("n_pieces"),
        array_join(col("parr"), "|").as("pieces"),
        lit(true).as("covered"))
    val uncovered = inRange
      .join(seg.select(col("word")), Seq("word"), "left_anti")
      .select(col("word"), lit(1L).as("n_pieces"),
        col("word").as("pieces"), lit(false).as("covered"))
    seg.unionByName(uncovered).unionByName(
      words.filter(length(col("word")) > maxWord)
        .select(col("word"), lit(1L).as("n_pieces"),
          col("word").as("pieces"), lit(false).as("covered")))
  }

  /** BYTE-FALLBACK lane over any word-type segmentation frame (the
    * [[wordpieceSegment]]/[[unigramLmSegment]] output contract):
    * SentencePiece's coverage completion — the 256 byte pieces are
    * implicitly always in vocabulary, so rows the model could NOT
    * cover (over-long words and in-range words with out-of-vocabulary
    * characters) re-segment as their UTF-8 BYTES: n_pieces = the
    * word's byte count, pieces rendered as `<0xHH>` tokens. EVERY word
    * now segments — coverage is 1.0 by construction — and the new
    * `fallback` column records which lane fired. Map-only (one
    * projection); reconstruction is exact (the hex bytes decode back
    * to the original word, spec-gated). */
  def byteFallbackSegment(seg: DataFrame): DataFrame = {
    val hexStr = upper(hex(encode(col("word"), "UTF-8")))
    val bytePieces = array_join(
      transform(sequence(lit(1), octet_length(col("word"))),
        i => concat(lit("<0x"), hexStr.substr(i * 2 - 1, lit(2)),
          lit(">"))),
      "|")
    seg.select(col("word"),
      when(col("covered"), col("n_pieces"))
        .otherwise(octet_length(col("word")).cast("long"))
        .as("n_pieces"),
      when(col("covered"), col("pieces")).otherwise(bytePieces)
        .as("pieces"),
      lit(true).as("covered"),
      (!col("covered")).as("fallback"))
  }

  /** [[tokenizerFertility]] over a [[byteFallbackSegment]] frame: the
    * same occurrence-weighted report plus the fallback accounting —
    * coverage is 1.0 by construction (`covered_q` = quant, the column
    * proves it) and `n_fallback_occ`/`fallback_q` report how often the
    * byte lane fired (the real coverage signal once fallback exists).
    * seg contract: (word, n_pieces, covered, fallback). */
  def tokenizerFertilityFallback(docs: DataFrame, textCol: String,
      groupCol: String, seg: DataFrame,
      quant: Long = 1000000L): DataFrame = {
    require(quant > 0, "quant must be positive")
    val lw = docs
      .select(col(groupCol),
        explode(split(trim(lower(col(textCol))), "\\s+")).as("word"))
      .filter(col("word") =!= "")
      .groupBy(col(groupCol), col("word"))
      .agg(count(lit(1)).as("tf"))
    lw.join(seg.select(col("word"), col("n_pieces"), col("covered"),
        col("fallback")), Seq("word"))
      .groupBy(col(groupCol))
      .agg(sum(col("tf")).as("n_occ"),
        sum(col("tf") * col("n_pieces")).as("pieces_total"),
        sum(when(col("covered"), col("tf")).otherwise(0L))
          .as("covered_occ"),
        sum(when(col("fallback"), col("tf")).otherwise(0L))
          .as("n_fallback_occ"))
      .select(col(groupCol), col("n_occ"), col("pieces_total"),
        col("covered_occ"), col("n_fallback_occ"),
        expr(s"(${quant}L * pieces_total) div n_occ").as("fertility_q"),
        expr(s"(${quant}L * covered_occ) div n_occ").as("covered_q"),
        expr(s"(${quant}L * n_fallback_occ) div n_occ")
          .as("fallback_q"))
  }

  /** Per-document TOKENIZER token counts under a trained
    * [[unigramLmTrain]] model — the number the packer should budget
    * by (whitespace word counts under-count what the trainer actually
    * sees): per doc Σ over its words of tf · n_pieces, from a
    * [[unigramLmSegment]] run over the input's word TYPES (uncovered
    * words count 1 piece, the q202 byte-fallback convention). Docs
    * with no words emit no row (they carry zero tokens).
    *
    * Scale shape: one corpus tokenize + (id, word) hash-agg, one join
    * against the word-TYPE-scale segmentation, one per-doc agg — the
    * fertility pipeline re-keyed by document. */
  def unigramTokenCounts(docs: DataFrame, textCol: String,
      idCol: String, model: DataFrame, maxPiece: Int = 4,
      maxWord: Int = 8): DataFrame = {
    val seg = unigramLmSegment(docs, textCol, model, maxPiece, maxWord)
    docs
      .select(col(idCol),
        explode(split(trim(lower(col(textCol))), "\\s+")).as("word"))
      .filter(col("word") =!= "")
      .groupBy(col(idCol), col("word"))
      .agg(count(lit(1)).as("tf"))
      .join(seg.select(col("word"), col("n_pieces")), Seq("word"))
      .groupBy(col(idCol))
      .agg(sum(col("tf") * col("n_pieces")).as("n_tokens"))
  }

  /** Tokenizer fertility evaluation: join a [[wordpieceSegment]]
    * frame (one row per word TYPE) back to per-(group, occurrence)
    * counts and report, per group (typically language), the
    * occurrence-weighted pieces-per-word (fertility, the standard
    * multilingual-tokenizer quality number — Ács' and the XLM-R
    * line's metric) and vocabulary coverage, in exact BIGINT fixed
    * point (floor(quant·ratio)). A fertility gap between languages is
    * the canonical evidence a shared vocabulary under-serves one of
    * them.
    *
    * Scale shape: one corpus tokenize + (group, word) hash-agg
    * (map-side combined), one join against the word-TYPE-scale
    * segmentation frame, one tiny per-group agg. Uncovered words
    * count 1 piece (they'd byte-fall-back in a real tokenizer); the
    * coverage column reports how often that happened.
    *
    * @return (group, n_occ, pieces_total, covered_occ, fertility_q,
    *         covered_q) */
  def tokenizerFertility(docs: DataFrame, textCol: String,
      groupCol: String, seg: DataFrame,
      quant: Long = 1000000L): DataFrame = {
    require(quant > 0, "quant must be positive")
    val lw = docs
      .select(col(groupCol),
        explode(split(trim(lower(col(textCol))), "\\s+")).as("word"))
      .filter(col("word") =!= "")
      .groupBy(col(groupCol), col("word"))
      .agg(count(lit(1)).as("tf"))
    lw.join(seg.select(col("word"), col("n_pieces"), col("covered")),
        Seq("word"))
      .groupBy(col(groupCol))
      .agg(sum(col("tf")).as("n_occ"),
        sum(col("tf") * col("n_pieces")).as("pieces_total"),
        sum(when(col("covered"), col("tf")).otherwise(0L))
          .as("covered_occ"))
      .select(col(groupCol), col("n_occ"), col("pieces_total"),
        col("covered_occ"),
        expr(s"(${quant}L * pieces_total) div n_occ")
          .as("fertility_q"),
        expr(s"(${quant}L * covered_occ) div n_occ")
          .as("covered_q"))
  }

  def learnBpeMerges(docs: DataFrame, textCol: String,
      numMerges: Int): Seq[(String, String)] =
    learnBpeMergesBatched(docs, textCol, numMerges, batch = 1)

  /** [[learnBpeMerges]] with up to `batch` merges accepted per corpus
    * pass — CERTIFIED-sequential batching, so a 32k-merge vocab is far
    * fewer than 32k Spark jobs while producing the EXACT Sennrich
    * merge order (`batch = 1` trivially is; any batch provably equals
    * it — asserted for the whole sweep in `BpeSpec`).
    *
    * Per round the pair counts are ranked once under the sequential
    * total order ((count DESC, left ASC, right ASC)), the top
    * `K = max(64, 8·batch)` rows collected, and accepted top-down
    * while the sequential argmax at each step is PROVABLE from
    * invariant counts:
    *
    *   - a pair symbol-disjoint from every accepted merge has an
    *     unchanged count (merging (a,b) only touches pairs sharing a
    *     or b), so its rank among surviving pairs is exact;
    *   - a pair SHARING a symbol can only have lost occurrences — if
    *     it ranks above the next candidate its true updated rank is
    *     unknowable from this pass, so acceptance STOPS there;
    *   - a pair CREATED by accepted merge (a,b) — (x,ab) or (ab,y) —
    *     has count ≤ min(c(a,b), c(x,a) | c(b,y)): every occurrence
    *     contains the x·a·b (a·b·y) trigram. Acceptance carries the
    *     running max of these bounds (collected neighbors, else the
    *     K-th count bounds the unseen) and STOPS once the next
    *     candidate's count no longer STRICTLY exceeds it;
    *   - a PRE-EXISTING pair whose symbol string equals accepted merge
    *     (a,b)'s concatenation via a different merge path (both 'a'+'bc'
    *     and 'ab'+'c' make 'abc') shares no symbol with (a,b) yet can
    *     GROW by the same trigram bound — its stale count PLUS that
    *     bound joins the running max (preexistence is exact: a
    *     multi-char symbol exists iff some prior merge concatenates
    *     to it).
    *
    * Unseen pairs (beyond top-K) rank after every collected row by
    * the total order, so they never outrank an accepted candidate.
    * Worst case (tight counts, chained symbols) accepts 1 pair per
    * pass — never a wrong one; typical corpora accept several. */
  def learnBpeMergesBatched(docs: DataFrame, textCol: String,
      numMerges: Int, batch: Int): Seq[(String, String)] =
    learnBpeMergesBatchedCounted(docs, textCol, numMerges, batch)._1

  /** [[learnBpeMergesBatched]] + the number of corpus PASSES taken —
    * the quantity the batching exists to shrink (soak-instrumented in
    * `graft.Soak bpe`). */
  private[graft] def learnBpeMergesBatchedCounted(docs: DataFrame,
      textCol: String, numMerges: Int, batch: Int,
      onPass: (Int, Int) => Unit = (_, _) => ())
      : (Seq[(String, String)], Int) = {
    require(numMerges >= 0, "numMerges must be >= 0")
    require(batch >= 1, "batch must be >= 1")
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var passes = 0
    var exhausted = false
    while (merges.length < numMerges && !exhausted) {
      passes += 1
      onPass(passes, merges.length)
      // words FIRST, then segment each word: pair statistics must never
      // cross a word boundary, and the segmented full text flattens it
      val words = docs
        .select(explode(split(col(textCol), " ")).as("__w"))
        .filter(col("__w") =!= "")
      val want = math.min(batch, numMerges - merges.length)
      val topK = math.max(64, 8 * want)
      val ranked = words
        .select(split(graft.functions.exprs.bpe_segment(col("__w"),
          merges.toSeq), " ").as("__syms"))
        .filter(size(col("__syms")) >= 2)
        .select(explode(transform(
          sequence(lit(0), size(col("__syms")) - 2),
          i => struct(element_at(col("__syms"), i + 1).as("l"),
            element_at(col("__syms"), i + 2).as("r")))).as("__p"))
        .groupBy(col("__p.l").as("l"), col("__p.r").as("r"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("l").asc, col("r").asc)
        .limit(topK)
        .collect()
        .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      if (ranked.isEmpty) exhausted = true
      else {
        // count bound for any pair NOT in the collected top-K
        val unseenCap = if (ranked.length < topK) 0L else ranked.last._3
        val used = scala.collection.mutable.Set.empty[String]
        var createdBound = -1L // > this is provably above any created pair
        var accepted = 0
        var stop = false
        val it = ranked.iterator
        while (!stop && accepted < want && it.hasNext) {
          val (l, r, c) = it.next()
          if (c <= createdBound) stop = true          // created could outrank
          else if (used(l) || used(r)) stop = true    // stale count above us
          else {
            // created pairs of (l,r): (x,lr) needs a neighbor (x,l);
            // (lr,y) needs (r,y) — max collected neighbor count, or the
            // unseen cap, itself capped by c
            val nb = ranked.iterator
              .filter { case (pl, pr, _) =>
                (pr == l || pl == r) && !(pl == l && pr == r) }
              .map(_._3).foldLeft(unseenCap)(math.max)
            // string-collision GROWTH: if the concatenation l+r already
            // exists as a symbol via a DIFFERENT merge path (e.g. both
            // 'a'+'bc' and 'ab'+'c' make 'abc'), pre-existing pairs
            // containing that symbol share nothing with (l,r) — the
            // used-symbol stop never fires — yet they GAIN up to
            // min(c, nb) occurrences (each new one needs the same
            // x·l·r trigram), on top of their stale count. Bound them
            // by maxStale + min(c, nb); symbols only ever exist as a
            // prior merge's concatenation, so preexistence is exact.
            val cat = l + r
            val preexists = merges.exists { case (a, b) => a + b == cat }
            val grownOld =
              if (!preexists) -1L
              else ranked.iterator
                .filter { case (pl, pr, _) => pl == cat || pr == cat }
                .map(_._3).foldLeft(unseenCap)(math.max)
            merges += ((l, r)); used += l; used += r; accepted += 1
            val bound =
              if (preexists) math.max(grownOld, 0L) + math.min(c, nb)
              else math.min(c, nb)
            createdBound = math.max(createdBound, bound)
          }
        }
        if (accepted == 0) exhausted = true // cannot certify further: done
      }
    }
    (merges.toSeq, passes)
  }

  /** Persist a learned BPE merge table — rank-ordered (the ORDER is
    * the model: application replays merges in learned order), two
    * STRING columns + a BIGINT rank, bit-exact round trip (the
    * centroid/codebook parquet-model convention applied to the
    * tokenizer family). */
  def saveBpeMerges(merges: Seq[(String, String)], path: String)(
      implicit spark: org.apache.spark.sql.SparkSession): Unit = {
    import spark.implicits._
    merges.zipWithIndex.map { case ((l, r), i) => (i.toLong, l, r) }
      .toDF("rank", "l", "r")
      .coalesce(1)
      .write.mode("overwrite").parquet(path)
  }

  /** Bit-exact inverse of [[saveBpeMerges]], in learned order. */
  def loadBpeMerges(path: String)(
      implicit spark: org.apache.spark.sql.SparkSession)
      : Seq[(String, String)] =
    spark.read.parquet(path)
      .select(col("rank"), col("l"), col("r"))
      .orderBy(col("rank"))
      .collect()
      .map(r => (r.getString(1), r.getString(2))).toIndexedSeq

  /** Train-once-reuse for BPE merge tables (the
    * [[graft.operators.Ann.trainOrLoadCentroids]] contract): load the
    * table at `path` if present, else train via `train` and persist —
    * serving then replays `numMerges` string merges, never the
    * per-round corpus passes. */
  def trainOrLoadBpeMerges(path: String)(train: => Seq[(String, String)])(
      implicit spark: org.apache.spark.sql.SparkSession)
      : Seq[(String, String)] =
    try loadBpeMerges(path)
    catch { case _: org.apache.spark.sql.AnalysisException =>
      saveBpeMerges(train, path); loadBpeMerges(path) }

  /** Persist a [[wordpieceVocab]] table — (piece STRING, freq BIGINT),
    * bit-exact round trip. */
  def saveWordpieceVocab(vocab: DataFrame, path: String): Unit =
    vocab.select(col("piece"), col("freq").cast("long").as("freq"))
      .coalesce(1)
      .write.mode("overwrite").parquet(path)

  /** Bit-exact inverse of [[saveWordpieceVocab]]. */
  def loadWordpieceVocab(path: String)(
      implicit spark: org.apache.spark.sql.SparkSession): DataFrame =
    spark.read.parquet(path).select(col("piece"), col("freq"))

  /** Train-once-reuse for WordPiece vocabularies: load `path` if
    * present, else build + persist, and SERVE FROM THE PERSISTED COPY
    * — segmentation lineage is a parquet scan, never the substring
    * aggregation (the [[graft.operators.Classifier.trainOrLoadWeights]]
    * shape). */
  def trainOrLoadWordpieceVocab(path: String)(build: => DataFrame)(
      implicit spark: org.apache.spark.sql.SparkSession): DataFrame =
    try { val v = loadWordpieceVocab(path); v.queryExecution.analyzed; v }
    catch { case _: org.apache.spark.sql.AnalysisException =>
      saveWordpieceVocab(build, path); loadWordpieceVocab(path) }
}
