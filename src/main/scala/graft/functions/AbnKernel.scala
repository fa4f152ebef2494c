package graft.functions

import org.apache.spark.unsafe.types.UTF8String

/** Australian Business Number (ABN) checksum, re-implementing the official
  * mod-89 algorithm the reference uses as an extraction filter
  * (/root/reference/extract/commoncrawl_scraper.py:40-48):
  * strip spaces/hyphens, require exactly 11 digits, subtract 1 from the
  * first digit, dot-product with weights [10,1,3,5,7,9,11,13,15,17,19],
  * valid iff total % 89 == 0.
  */
object AbnKernel {
  private val Weights: Array[Int] =
    Array(10, 1, 3, 5, 7, 9, 11, 13, 15, 17, 19)

  def isValid(raw: String): Boolean = {
    // strip spaces and hyphens without regex (hot path)
    val sb = new java.lang.StringBuilder(raw.length)
    var i = 0
    while (i < raw.length) {
      val c = raw.charAt(i)
      if (c != ' ' && c != '-') sb.append(c)
      i += 1
    }
    if (sb.length != 11) return false
    var total = 0
    i = 0
    while (i < 11) {
      val c = sb.charAt(i)
      if (c < '0' || c > '9') return false
      val d = c - '0'
      total += (if (i == 0) d - 1 else d) * Weights(i)
      i += 1
    }
    total % 89 == 0
  }

  def isValidUTF8(s: UTF8String): Boolean = isValid(s.toString)

  /** Strip spaces/hyphens; keep iff exactly 11 chars, else null — the
    * reference's `clean_abn` (/root/reference/transform/data_cleaning.py:71-75).
    * (Length gate only; checksum is the extraction-time filter.) */
  def clean(raw: String): String = {
    val stripped = raw.replaceAll("[\\s-]", "")
    if (stripped.length == 11) stripped else null
  }
}
