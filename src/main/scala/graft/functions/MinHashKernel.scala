package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.unsafe.types.UTF8String

/** Batch md5-MinHash signature kernel behind
  * [[MinHashMd5Sig]] — computes, for each hash function j in 0..k-1,
  * `min over shingles g of md5Hex("<j>:" || g)`, byte-identical to the
  * composed `array_min(transform(gset, g -> md5(concat("<j>:", g))))`
  * builtins (and to the DuckDB oracle's `list_min(list_transform(...))`),
  * but ~4× cheaper in the hot loop:
  *
  *   - ONE `MessageDigest` instance per thread (the builtin `md5` goes
  *     through DigestUtils, constructing a fresh digest per call);
  *   - mins are tracked over the RAW 16-byte digests (unsigned byte-wise
  *     compare ≡ lexicographic compare of the lowercase-hex encodings,
  *     since the per-byte hex mapping is order-preserving) — only the k
  *     winning digests are hex-encoded, instead of one 32-char string
  *     allocation per (j, shingle) pair.
  */
object MinHashKernel {

  private val digests = ThreadLocal.withInitial[MessageDigest](() =>
    MessageDigest.getInstance("MD5"))

  private val hex = "0123456789abcdef".toCharArray

  private def toHexUTF8(d: Array[Byte]): UTF8String = {
    val out = new Array[Byte](32)
    var i = 0
    while (i < 16) {
      out(2 * i) = hex((d(i) >> 4) & 0xf).toByte
      out(2 * i + 1) = hex(d(i) & 0xf).toByte
      i += 1
    }
    UTF8String.fromBytes(out)
  }

  /** a < b, unsigned byte-wise (both length 16). */
  private def lessThan(a: Array[Byte], b: Array[Byte]): Boolean = {
    var i = 0
    while (i < 16) {
      val x = a(i) & 0xff
      val y = b(i) & 0xff
      if (x != y) return x < y
      i += 1
    }
    false
  }

  /** Signature of a shingle set: array of k lowercase-hex md5 minima.
    * Empty input yields an empty array (shingle sets are non-empty by
    * construction — [[graft.operators.Dedup.shingles]] falls back to a
    * one-element set). */
  def md5SigUTF8(gset: ArrayData, k: Int): GenericArrayData = {
    val n = gset.numElements()
    if (n == 0) return new GenericArrayData(new Array[Any](0))
    val md = digests.get()
    val mins = new Array[Array[Byte]](k)
    val prefixes = new Array[Array[Byte]](k)
    var j = 0
    while (j < k) {
      prefixes(j) = s"$j:".getBytes("UTF-8")
      j += 1
    }
    var i = 0
    while (i < n) {
      val g = gset.getUTF8String(i).getBytes
      j = 0
      while (j < k) {
        md.reset()
        md.update(prefixes(j))
        md.update(g)
        val d = md.digest()
        if (mins(j) == null || lessThan(d, mins(j))) mins(j) = d
        j += 1
      }
      i += 1
    }
    val out = new Array[Any](k)
    j = 0
    while (j < k) {
      out(j) = toHexUTF8(mins(j))
      j += 1
    }
    new GenericArrayData(out)
  }
}
