package graft.functions

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.unsafe.types.UTF8String

/** Greedy byte-pair-encoding APPLICATION over a fixed, ordered merge
  * table — the real subword tokenizer the `subwordCount` heuristic in
  * [[graft.operators.TextAnalysis]] approximates. Token budgets drive
  * sequence packing (q78/q97/q104) and mixture planning (q146), so
  * exact counts matter to the pipeline's headline contract.
  *
  * Semantics are Sennrich et al. 2016 (ACL, "Neural machine
  * translation of rare words with subword units") APPLY order: a word
  * starts as its codepoint symbols; each merge (l, r), in table
  * order, rewrites every adjacent (l, r) symbol pair left-to-right
  * with skip — the leftmost-greedy non-overlapping scan, which for a
  * self-merge (l == r) pairs a run from its left edge: "aaaa" →
  * [aa, aa], "aaaaa" → [aa, aa, a]. Merges never cross word
  * boundaries (words are the space-delimited units of the already
  * whitespace-normalized text).
  *
  * The scan is O(symbols) per merge, O(merges · chars) per text —
  * no regex, no allocation beyond the symbol buffers — so the
  * expression stays cheap enough for whole-stage codegen row loops.
  */
object BpeKernel {

  /** Apply the ordered merges to one word; returns the symbol list. */
  def encodeWord(word: String, merges: Array[Array[String]]): ArrayBuffer[String] = {
    var syms = new ArrayBuffer[String](word.length)
    var i = 0
    while (i < word.length) {
      val cp = word.codePointAt(i)
      val n = Character.charCount(cp)
      syms += word.substring(i, i + n)
      i += n
    }
    var m = 0
    while (m < merges.length && syms.length > 1) {
      val l = merges(m)(0)
      val r = merges(m)(1)
      val out = new ArrayBuffer[String](syms.length)
      var j = 0
      while (j < syms.length) {
        if (j + 1 < syms.length && syms(j) == l && syms(j + 1) == r) {
          out += l + r
          j += 2
        } else {
          out += syms(j)
          j += 1
        }
      }
      syms = out
      m += 1
    }
    syms
  }

  /** Segment a whole (whitespace-normalized) text: every word encoded
    * independently, all resulting symbols joined by single spaces —
    * `split(_, " ")` downstream recovers the token stream. Empty input
    * yields the empty string. */
  def segment(text: String, merges: Array[Array[String]]): String = {
    val sb = new java.lang.StringBuilder(text.length * 2)
    var start = 0
    var first = true
    while (start <= text.length) {
      val end = {
        val sp = text.indexOf(' ', start)
        if (sp < 0) text.length else sp
      }
      if (end > start) {
        val syms = encodeWord(text.substring(start, end), merges)
        var k = 0
        while (k < syms.length) {
          if (!first) sb.append(' ')
          sb.append(syms(k))
          first = false
          k += 1
        }
      }
      start = end + 1
    }
    sb.toString
  }

  def segmentUTF8(text: UTF8String, merges: Array[Array[String]]): UTF8String =
    UTF8String.fromString(segment(text.toString, merges))
}
