package graft.functions

import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization (java.text.Normalizer — the JDK's
  * implementation of UAX #15 canonical composition): the hygiene pass
  * that makes exact dedup and fingerprinting see through encoding
  * variants — 'é' as U+00E9 and as 'e'+U+0301 are byte-different,
  * md5-different, shingle-different, yet the same text; real crawls
  * contain both. Normalize BEFORE any hash-keyed stage. */
object UnicodeKernel {
  def nfcUTF8(s: UTF8String): UTF8String = {
    val str = s.toString
    // fast path: Normalizer.isNormalized is a cheap scan and true for
    // virtually all real text (pure-ASCII short-circuits immediately)
    if (java.text.Normalizer.isNormalized(str,
        java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(java.text.Normalizer.normalize(str,
      java.text.Normalizer.Form.NFC))
  }
}
