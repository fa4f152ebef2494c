package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The engine-portable hash primitive every oracle-replicable operator
  * composes: the first 60 bits (15 hex chars — keeps the value positive
  * and inside a BIGINT) of an md5, as a long. Any md5-capable engine
  * reproduces it; in DuckDB:
  * {{{('0x' || substr(md5(x), 1, 15))::BIGINT}}}
  *
  * One definition instead of six inline copies (sampling keys, feature
  * buckets, classifier weights, MinHash seeds, IVF init) so the bit
  * width and hex slice can never drift apart between an operator and
  * its oracle twin. `xxhash64` remains the fast non-portable default
  * where no oracle needs to replay the value.
  */
object PortableHash {

  /** First 60 bits of `md5(input)` as a non-negative long.
    *
    * r21: one codegen kernel call ([[PortableHashKernel.md5Long60]])
    * instead of the md5 → substring → conv builtin chain — the chain
    * constructs a fresh digest per call, hex-encodes all 32 chars,
    * substrings, then re-parses the hex through conv's string path;
    * the kernel reuses a thread-local digest and reads the 60 bits
    * straight off the raw digest bytes. Value is bit-identical
    * (spec-pinned against the builtin chain in VecKernelSpec), so
    * every oracle replay — `('0x' || substr(md5(x), 1, 15))::BIGINT`
    * in DuckDB — is unchanged. */
  def md5Long60(input: Column): Column =
    graft.functions.exprs.md5_long60(input)

  /** The pre-r21 builtin-chain form, kept as the spec's reference. */
  private[graft] def md5Long60Builtins(input: Column): Column =
    conv(substring(md5(input), 1, 15), 16, 10).cast("long")
}

/** JVM kernel behind [[PortableHash.md5Long60]]: first 60 bits of the
  * md5 digest — the first 15 hex chars of the lowercase hex encoding,
  * read directly off the raw bytes (big-endian long of bytes 0..7,
  * shifted right 4). Thread-local digest (the [[MinHashKernel]]
  * convention). */
object PortableHashKernel {
  private val digests = ThreadLocal.withInitial[java.security.MessageDigest](
    () => java.security.MessageDigest.getInstance("MD5"))

  def md5Long60(s: org.apache.spark.unsafe.types.UTF8String): Long = {
    val md = digests.get()
    md.reset()
    val d = md.digest(s.getBytes)
    val top =
      ((d(0) & 0xffL) << 56) | ((d(1) & 0xffL) << 48) |
      ((d(2) & 0xffL) << 40) | ((d(3) & 0xffL) << 32) |
      ((d(4) & 0xffL) << 24) | ((d(5) & 0xffL) << 16) |
      ((d(6) & 0xffL) << 8) | (d(7) & 0xffL)
    top >>> 4
  }
}
