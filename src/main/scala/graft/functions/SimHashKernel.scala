package graft.functions

import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.unsafe.types.UTF8String

/** 64-bit SimHash over a token array (Charikar 2002, "Similarity estimation
  * techniques from rounding algorithms"): hash each token to 64 bits; for
  * each bit position accumulate +1/-1 by bit value; the sign vector is the
  * fingerprint. Near-duplicate texts differ in few bits (small Hamming
  * distance).
  *
  * Token hash is FNV-1a 64 over the token's UTF-8 bytes — stable across
  * JVMs/executors (no Object.hashCode anywhere).
  */
object SimHashKernel {
  private final val FnvOffset = 0xcbf29ce484222325L
  private final val FnvPrime = 0x100000001b3L

  def fnv1a64(bytes: Array[Byte]): Long = {
    var h = FnvOffset
    var i = 0
    while (i < bytes.length) {
      h ^= (bytes(i) & 0xffL)
      h *= FnvPrime
      i += 1
    }
    h
  }

  /** PORTABLE 60-bit SimHash over md5 token hashes (r21) — the kernel
    * form of the q50/q186 `simhashPortable` expression: per token
    * h = md5Long60(token), bit i of the fingerprint set iff
    * 2·|{tokens: bit i of h = 1}| > n (strict-majority of 1-bits, the
    * exact arithmetic of the old
    * `aggregate(sequence(0,59), ... 2*size(filter(...)) > size(...))`
    * expression, which allocated a filtered array per bit per doc and
    * ran 60·n interpreted lambda steps). NULL tokens count toward n
    * with zero bits — exactly as the old form's size(__hs) did (split
    * never yields nulls in practice). Bit-identical, spec-pinned. */
  def simhashMd5_60(tokens: ArrayData): Long = {
    val n = tokens.numElements()
    val counts = new Array[Int](60)
    var i = 0
    while (i < n) {
      if (!tokens.isNullAt(i)) {
        val h = PortableHashKernel.md5Long60(tokens.getUTF8String(i))
        var b = 0
        while (b < 60) {
          if (((h >>> b) & 1L) == 1L) counts(b) += 1
          b += 1
        }
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 60) {
      if (2 * counts(b) > n) out |= (1L << b)
      b += 1
    }
    out
  }

  /** Entry point for both interpreted eval and generated code. */
  def simhash64(tokens: ArrayData): Long = {
    val n = tokens.numElements()
    val counts = new Array[Int](64)
    var i = 0
    while (i < n) {
      if (!tokens.isNullAt(i)) {
        val t = tokens.getUTF8String(i)
        val h = fnv1a64(t.getBytes)
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
          b += 1
        }
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) {
      if (counts(b) > 0) out |= (1L << b)
      b += 1
    }
    out
  }
}
