package graft.functions

import org.apache.spark.sql.catalyst.expressions.XXH64
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass distinct word n-gram shingle kernel — the batch form of
  * [[graft.operators.Dedup.shingles]]'s builtin chain
  * (`array_distinct(transform(sequence(...), i -> concat_ws(" ",
  * slice(split(trim(text), "\\s+"), i, n))))`), which Catalyst evaluates
  * as nested higher-order functions with per-element array allocations.
  * One scan, one reused StringBuilder, insertion-ordered dedup — same
  * output SET (order matches first-occurrence, like `array_distinct`),
  * byte-identical elements, so the md5-portable sketch pipelines
  * (q49/q56/q67) keep their DuckDB twins while the shingle stage drops
  * out of the profile.
  *
  * Tokenization parity: tokens are maximal runs of non-whitespace where
  * whitespace is Java regex `\s` = `[ \t\n\x0B\f\r]` (what
  * `split(trim(text), "\\s+")` matches); fewer than n tokens degrade to
  * the single all-tokens shingle, and an empty/blank text yields the
  * single empty shingle — both exactly as the builtin chain behaves.
  */
object ShingleKernel {

  private def isWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' || c == '\r'

  /** Distinct word n-grams of `text`, first-occurrence order.
    * Tokenization is EXACTLY `split(trim(text), "\\s+")` in Spark:
    * `trim` strips ASCII spaces only, and Spark's split uses limit=-1
    * Java-split semantics — a leading separator contributes one empty
    * first field and a trailing separator one empty last field (only
    * reachable when the text starts/ends with non-space whitespace;
    * asserted equal to the builtin chain in `KernelPropertySpec`). */
  def wordNgrams(text: String, n: Int): Array[String] = {
    // Spark trim(): ASCII spaces only
    var lo = 0
    var hi = text.length
    while (lo < hi && text.charAt(lo) == ' ') lo += 1
    while (hi > lo && text.charAt(hi - 1) == ' ') hi -= 1
    val toks = new java.util.ArrayList[String](64)
    if (lo == hi) toks.add("") // split("", "\s+") == [""]
    else {
      if (isWs(text.charAt(lo))) toks.add("") // leading empty field
      var i = lo
      while (i < hi) {
        while (i < hi && isWs(text.charAt(i))) i += 1
        if (i < hi) {
          val start = i
          while (i < hi && !isWs(text.charAt(i))) i += 1
          toks.add(text.substring(start, i))
        }
      }
      if (isWs(text.charAt(hi - 1))) toks.add("") // trailing empty field
    }
    val m = toks.size()
    val sb = new java.lang.StringBuilder(64)
    if (m < n) {
      // fewer than n tokens → one shingle of all tokens ("" when blank:
      // split(trim(""), "\s+") yields [""] and concat_ws gives "")
      var j = 0
      while (j < m) {
        if (j > 0) sb.append(' ')
        sb.append(toks.get(j))
        j += 1
      }
      return Array(sb.toString)
    }
    val seen = new java.util.LinkedHashSet[String](m * 2)
    var s = 0
    while (s + n <= m) {
      sb.setLength(0)
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(toks.get(s + j))
        j += 1
      }
      seen.add(sb.toString)
      s += 1
    }
    val out = new Array[String](seen.size)
    val it = seen.iterator()
    var k = 0
    while (it.hasNext) { out(k) = it.next(); k += 1 }
    out
  }

  /** UTF8String entry point for generated code: array<string> result. */
  def wordNgramsUTF8(text: UTF8String, n: Int): ArrayData = {
    val grams = wordNgrams(text.toString, n)
    val arr = new Array[Any](grams.length)
    var i = 0
    while (i < grams.length) {
      arr(i) = UTF8String.fromString(grams(i))
      i += 1
    }
    new GenericArrayData(arr)
  }

  // ------------------------- hashed fast path (xxhash64-parity, 1 pass)

  /** Distinct xxhash64'd word n-grams — the fused form of
    * [[graft.operators.Dedup.shingleHashSet]]'s two-projection builtin
    * chain, BIT-IDENTICAL to it: token hash = `xxhash64(token)`
    * (`XXH64.hashUTF8String`, seed 42), n-gram hash = `xxhash64(h_1 ..
    * h_n)` (seed-chained `XXH64.hashLong`), and fewer than n tokens
    * degrade to the chained hash of all token hashes, exactly like
    * `xxhash64(token_hash_array)`. Property-asserted equal in
    * `KernelPropertySpec`. Tokenization as [[wordNgrams]] (trim spaces,
    * split limit=-1). Runs directly over the UTF8String's bytes — the
    * whitespace class is pure ASCII, so a byte scan is UTF-8 safe and
    * tokens are hashed in place without materializing substrings. */
  def wordNgramHashesUTF8(text: UTF8String, n: Int): ArrayData = {
    val SEED = 42L
    val numBytes = text.numBytes()
    // Spark trim(): ASCII spaces only
    var lo = 0
    var hi = numBytes
    while (lo < hi && text.getByte(lo) == ' '.toByte) lo += 1
    while (hi > lo && text.getByte(hi - 1) == ' '.toByte) hi -= 1
    def isWsB(b: Byte): Boolean =
      b == ' '.toByte || b == '\t'.toByte || b == '\n'.toByte ||
        b == 0x0b.toByte || b == '\f'.toByte || b == '\r'.toByte
    // token hashes (limit=-1 split semantics: leading/trailing empty
    // fields when the trimmed text starts/ends with non-space whitespace).
    // Tokens hash via hashUnsafeBytes over the in-place byte range —
    // identical to xxhash64(token) (hashUTF8String hashes the same byte
    // sequence; value-parity is property-asserted).
    val base = text.getBaseObject
    val off = text.getBaseOffset
    val emptyHash = XXH64.hashUnsafeBytes(base, off, 0, SEED)
    val hashes = new java.util.ArrayList[java.lang.Long](64)
    if (lo == hi) hashes.add(emptyHash)
    else {
      if (isWsB(text.getByte(lo))) hashes.add(emptyHash)
      var i = lo
      while (i < hi) {
        while (i < hi && isWsB(text.getByte(i))) i += 1
        if (i < hi) {
          val start = i
          while (i < hi && !isWsB(text.getByte(i))) i += 1
          hashes.add(XXH64.hashUnsafeBytes(base, off + start, i - start, SEED))
        }
      }
      if (isWsB(text.getByte(hi - 1))) hashes.add(emptyHash)
    }
    val m = hashes.size()
    if (m < n) {
      // xxhash64(array<bigint>) seed-chains the elements
      var h = SEED
      var j = 0
      while (j < m) { h = XXH64.hashLong(hashes.get(j), h); j += 1 }
      return new GenericArrayData(Array[Any](h))
    }
    val seen = new java.util.LinkedHashSet[java.lang.Long](m * 2)
    var s = 0
    while (s + n <= m) {
      var h = SEED
      var j = 0
      while (j < n) { h = XXH64.hashLong(hashes.get(s + j), h); j += 1 }
      seen.add(h)
      s += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var k = 0
    while (it.hasNext) { out(k) = it.next().longValue(); k += 1 }
    new GenericArrayData(out)
  }

  // ------------------- capped-tf multiset expansion (weighted Jaccard)

  /** Capped term-frequency integer expansion — each distinct token t
    * with count c (saturated at `cap`) becomes elements t#1…t#c, the
    * Broder integer-expansion encoding under which SET Jaccard of the
    * expansions equals weighted Jaccard of the capped counts (see
    * [[graft.operators.Dedup.weightedJaccardJoin]]). One per-row pass
    * replacing the explode → groupBy(doc,t) → explode → groupBy(doc)
    * chain — same elements, zero pre-sketch exchanges (VERDICT r13
    * item 1). Tokenization is EXACTLY `split(trim(text), "\\s+")` with
    * empty tokens dropped (the chain's `t <> ''` filter): leading /
    * trailing empty split fields are '' and were filtered, so a plain
    * maximal-run scan is equivalent. First-occurrence term order,
    * t#1…t#c contiguous — order never matters downstream (min-hash and
    * intersect/union sizes are set ops) but determinism is free.
    * A blank/whitespace-only text yields an EMPTY array (the chain
    * yielded no rows for it — callers filter size > 0 to match). */
  def tfExpand(text: String, cap: Int): Array[String] = {
    // Spark trim(): ASCII spaces only
    var lo = 0
    var hi = text.length
    while (lo < hi && text.charAt(lo) == ' ') lo += 1
    while (hi > lo && text.charAt(hi - 1) == ' ') hi -= 1
    val counts = new java.util.LinkedHashMap[String, Integer](64)
    var total = 0
    var i = lo
    while (i < hi) {
      while (i < hi && isWs(text.charAt(i))) i += 1
      if (i < hi) {
        val start = i
        while (i < hi && !isWs(text.charAt(i))) i += 1
        val t = text.substring(start, i)
        val c = counts.get(t)
        if (c == null) { counts.put(t, 1); total += 1 }
        else if (c < cap) { counts.put(t, c + 1); total += 1 }
      }
    }
    val out = new Array[String](total)
    val it = counts.entrySet().iterator()
    var k = 0
    while (it.hasNext) {
      val e = it.next()
      val c = e.getValue.intValue()
      var j = 1
      while (j <= c) { out(k) = e.getKey + "#" + j; k += 1; j += 1 }
    }
    out
  }

  /** UTF8String entry point for generated code: array<string> result. */
  def tfExpandUTF8(text: UTF8String, cap: Int): ArrayData = {
    val g = tfExpand(text.toString, cap)
    val arr = new Array[Any](g.length)
    var i = 0
    while (i < g.length) { arr(i) = UTF8String.fromString(g(i)); i += 1 }
    new GenericArrayData(arr)
  }
}
