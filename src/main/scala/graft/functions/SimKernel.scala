package graft.functions

import org.apache.spark.unsafe.types.UTF8String

/** String-similarity kernels re-implementing the semantics the reference
  * pipeline gets from rapidfuzz/fuzzywuzzy (see SURVEY.md §2.8):
  *
  *   - Indel ratio: `100 * (1 - dist / (|a| + |b|))` where `dist` is the
  *     insert/delete-only edit distance (no substitutions). Equivalent to
  *     `rapidfuzz.fuzz.ratio` (reference use:
  *     /root/reference/transform/data_cleaning.py:50-52).
  *   - Token-sort ratio: whitespace-tokenize, sort tokens, rejoin, then
  *     Indel ratio — `rapidfuzz.fuzz.token_sort_ratio` (reference use:
  *     /root/reference/transform/entity_matching.py:151-153).
  *
  * NOTE: Indel distance is NOT Levenshtein (`substitution = cost 2` here,
  * not 1), so Spark's builtin `levenshtein` is intentionally not used.
  *
  * Methods are plain static functions so generated code (doGenCode in
  * [[SimExpressions]]) can call them directly — keeping the fuzzy-join
  * scoring inside whole-stage codegen.
  */
object SimKernel {

  /** Insert/delete-only edit distance = |a| + |b| - 2 * LCS(a, b).
    * O(|a|*|b|) time, O(min) space — fine for short name strings. */
  def indelDistance(a: String, b: String): Int = {
    if (a.isEmpty) return b.length
    if (b.isEmpty) return a.length
    // ensure the DP row is over the shorter string
    val (s, t) = if (a.length <= b.length) (a, b) else (b, a)
    val n = s.length
    val prev = new Array[Int](n + 1)
    val cur = new Array[Int](n + 1)
    var j = 0
    var i = 0
    while (i < t.length) {
      val tc = t.charAt(i)
      j = 0
      while (j < n) {
        cur(j + 1) =
          if (s.charAt(j) == tc) prev(j) + 1
          else math.max(prev(j + 1), cur(j))
        j += 1
      }
      System.arraycopy(cur, 0, prev, 0, n + 1)
      i += 1
    }
    val lcs = prev(n)
    a.length + b.length - 2 * lcs
  }

  /** rapidfuzz `fuzz.ratio` semantics, scale 0..100. Both-empty => 100. */
  def indelRatio(a: String, b: String): Double = {
    val total = a.length + b.length
    if (total == 0) 100.0
    else 100.0 * (1.0 - indelDistance(a, b).toDouble / total)
  }

  /** Classic Levenshtein distance (unit-cost substitutions) over UTF-16
    * chars — semantically the builtin `levenshtein`, reimplemented on
    * char arrays because Spark's `UTF8String.levenshteinDistance` decodes
    * UTF-8 bytes per cell and measures ~4× slower in the blocked fuzzy
    * join's hot loop. (Astral-plane codepoints count as 2 here vs 1
    * there; identical on BMP text, which is all the pipeline handles.) */
  def levenshteinDistance(a: String, b: String): Int = {
    if (a.isEmpty) return b.length
    if (b.isEmpty) return a.length
    // DP row over the shorter string
    val (s, t) = if (a.length <= b.length) (a, b) else (b, a)
    val n = s.length
    val prev = new Array[Int](n + 1)
    val cur = new Array[Int](n + 1)
    var j = 0
    while (j <= n) { prev(j) = j; j += 1 }
    var i = 0
    while (i < t.length) {
      cur(0) = i + 1
      val tc = t.charAt(i)
      j = 0
      while (j < n) {
        val sub = if (s.charAt(j) == tc) prev(j) else prev(j) + 1
        val other = math.min(prev(j + 1), cur(j)) + 1
        cur(j + 1) = math.min(sub, other)
        j += 1
      }
      System.arraycopy(cur, 0, prev, 0, n + 1)
      i += 1
    }
    prev(n)
  }

  /** Normalized Levenshtein similarity `100·(1 − dist/max(|a|,|b|))` — the
    * engine-portable fuzzy score of the match cascade's oracled shell
    * (both-empty ⇒ NaN, mirroring the 0/0 of the composed-builtin form so
    * the DuckDB twin stays bit-identical). */
  def levenshteinRatio(a: String, b: String): Double = {
    val m = math.max(a.length, b.length)
    if (m == 0) Double.NaN
    else 100.0 * (1.0 - levenshteinDistance(a, b).toDouble / m)
  }

  /** Whitespace-tokenize, lexicographically sort, single-space rejoin.
    * Matches rapidfuzz's token_sort normalization (which does not lowercase
    * unless a processor is supplied — the reference supplies none; SURVEY.md
    * §2.4 J4 fine print). */
  def tokenSortNormalize(s: String): String = {
    val trimmed = s.trim
    if (trimmed.isEmpty) ""
    else {
      val toks = trimmed.split("\\s+")
      java.util.Arrays.sort(toks.asInstanceOf[Array[AnyRef]])
      toks.mkString(" ")
    }
  }

  def tokenSortRatio(a: String, b: String): Double =
    indelRatio(tokenSortNormalize(a), tokenSortNormalize(b))

  // UTF8String entry points for generated code --------------------------
  def indelRatioUTF8(a: UTF8String, b: UTF8String): Double =
    indelRatio(a.toString, b.toString)

  def tokenSortRatioUTF8(a: UTF8String, b: UTF8String): Double =
    tokenSortRatio(a.toString, b.toString)

  def levenshteinRatioUTF8(a: UTF8String, b: UTF8String): Double =
    levenshteinRatio(a.toString, b.toString)
}
