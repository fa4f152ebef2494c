package graft.functions

import org.apache.spark.sql.catalyst.util.ArrayData

/** Merge-scan set arithmetic over SORTED long arrays — the verify-stage
  * kernel behind the banded near-dup joins
  * ([[graft.operators.Dedup.minhashLshPortable]] /
  * [[graft.operators.Dedup.weightedJaccardJoin]]). The generic
  * `size(array_intersect(a,b)) / size(array_union(a,b))` chain builds two
  * object hash sets PER PAIR over string elements; on a dup-dense corpus
  * the banded candidate list is large (q178 at sf0.1: 370k pairs) and
  * that chain dominated the whole query (VERDICT r13 perf audit). Here
  * each doc's element set is hashed once (xxhash64) and sorted once,
  * and each pair costs one duplicate-aware merge scan over primitive longs —
  * no allocation, O(|a|+|b|), codegen-friendly.
  *
  * Set-equality to the string-set arithmetic holds barring 64-bit
  * collisions — the established hashed-shingle convention
  * ([[ShingleKernel.wordNgramHashesUTF8]], audited in
  * `KernelPropertySpec` "no collisions at corpus scale"); the DuckDB
  * oracles keep replaying the STRING-set arithmetic, so the gate itself
  * re-verifies the equality every round. */
object SetKernel {

  /** Jaccard |A∩B| / |A∪B| of two sorted long arrays, duplicate-aware
    * (equal runs count once on each side — distinct-set semantics, so a
    * rare within-doc hash collision degrades gracefully instead of
    * corrupting counts). Either side empty → 0.0 (callers filter empty
    * sets; the generic chain's 0/0 NaN is unreachable there). */
  def sortedJaccard(a: ArrayData, b: ArrayData): Double = {
    val la = a.numElements()
    val lb = b.numElements()
    var i = 0
    var j = 0
    var na = 0
    var nb = 0
    var c = 0
    while (i < la && j < lb) {
      val x = a.getLong(i)
      val y = b.getLong(j)
      if (x == y) {
        c += 1; na += 1; nb += 1
        i += 1; while (i < la && a.getLong(i) == x) i += 1
        j += 1; while (j < lb && b.getLong(j) == y) j += 1
      } else if (x < y) {
        na += 1
        i += 1; while (i < la && a.getLong(i) == x) i += 1
      } else {
        nb += 1
        j += 1; while (j < lb && b.getLong(j) == y) j += 1
      }
    }
    while (i < la) {
      val x = a.getLong(i)
      na += 1
      i += 1; while (i < la && a.getLong(i) == x) i += 1
    }
    while (j < lb) {
      val y = b.getLong(j)
      nb += 1
      j += 1; while (j < lb && b.getLong(j) == y) j += 1
    }
    val union = na + nb - c
    if (union == 0) 0.0 else c.toDouble / union
  }
}
