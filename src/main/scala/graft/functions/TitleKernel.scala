package graft.functions

import org.apache.spark.unsafe.types.UTF8String

/** Python `str.title()` semantics (used by the reference's
  * clean_company_name, /root/reference/transform/data_cleaning.py:61):
  * every cased character following a non-cased character (or the string
  * start) is uppercased (titlecased); every other cased character is
  * lowercased. Differs from Spark's `initcap` on digit/apostrophe
  * boundaries: "o'brien" → "O'Brien" (initcap: "O'brien"),
  * "3d" → "3D" (initcap: "3d").
  */
object TitleKernel {

  def title(s: String): String = {
    val sb = new java.lang.StringBuilder(s.length)
    var prevCased = false
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      val cased = Character.isLetter(cp)
      val out =
        if (cased && !prevCased) Character.toTitleCase(cp)
        else if (cased) Character.toLowerCase(cp)
        else cp
      sb.appendCodePoint(out)
      prevCased = cased
      i += Character.charCount(cp)
    }
    sb.toString
  }

  def titleUTF8(s: UTF8String): UTF8String =
    UTF8String.fromString(title(s.toString))
}
