package graft.functions

import scala.collection.mutable

import org.apache.spark.unsafe.types.UTF8String

/** Aho–Corasick multi-pattern matcher (Aho & Corasick 1975, CACM,
  * "Efficient string matching: an aid to bibliographic search") — the
  * blocklist kernel behind
  * [[graft.operators.TextAnalysis.blocklistGate]]: ONE left-to-right
  * pass over the text reports every occurrence of every pattern
  * (overlapping included), regardless of how many patterns the list
  * holds — the C4-style banned-word screen at list sizes where
  * per-pattern scans (or an alternation regex) stop being viable.
  *
  * The automaton (goto trie + BFS failure links + output counts) is
  * built once driver-side from the pattern list and shipped per codegen
  * stage via `addReferenceObj`, like the BPE merge table. Matching is
  * O(text + matches) with zero per-row allocation beyond the counters.
  *
  * Matching is over Unicode code points (surrogate pairs follow their
  * lead unit through the char-keyed trie unchanged, since patterns and
  * text share the encoding).
  */
final class AhoCorasick(patterns: Seq[String]) extends Serializable {
  require(patterns.nonEmpty, "empty blocklist")
  require(patterns.forall(_.nonEmpty), "empty pattern in blocklist")

  // trie over chars: goto, one pattern id per terminal node (patterns
  // are distinct), failure links, and output chains
  private val gotoMaps = mutable.ArrayBuffer(mutable.Map[Char, Int]())
  private val patId = mutable.ArrayBuffer(-1)
  private val distinct = patterns.distinct.toIndexedSeq
  distinct.zipWithIndex.foreach { case (p, id) =>
    var s = 0
    p.foreach { ch =>
      s = gotoMaps(s).getOrElseUpdate(ch, {
        gotoMaps += mutable.Map[Char, Int]()
        patId += -1
        gotoMaps.size - 1
      })
    }
    patId(s) = id
  }
  private val n = gotoMaps.size
  private val fail = new Array[Int](n)
  // out(s): ids of all patterns ending at s (via failure chain), frozen
  private val out: Array[Array[Int]] = {
    val tmp = Array.fill(n)(List.empty[Int])
    (0 until n).foreach(s => if (patId(s) >= 0) tmp(s) = List(patId(s)))
    val queue = mutable.Queue[Int]()
    gotoMaps(0).values.foreach { s => fail(s) = 0; queue += s }
    while (queue.nonEmpty) {
      val s = queue.dequeue()
      gotoMaps(s).foreach { case (ch, t) =>
        var f = fail(s)
        while (f != 0 && !gotoMaps(f).contains(ch)) f = fail(f)
        fail(t) = if (gotoMaps(f).contains(ch) && gotoMaps(f)(ch) != t)
          gotoMaps(f)(ch) else 0
        tmp(t) = tmp(t) ++ tmp(fail(t))
        queue += t
      }
    }
    tmp.map(_.toArray)
  }
  // dense transition closure would be alphabet-sized; keep sparse maps +
  // failure walk (amortized O(1) per char over the scan)
  private val gotoArr: Array[Map[Char, Int]] = gotoMaps.map(_.toMap).toArray

  def nPatterns: Int = distinct.size

  /** (total match count over all patterns incl. overlaps,
    * number of DISTINCT patterns that occurred). */
  def countMatches(text: String): (Long, Int) = {
    var s = 0
    var total = 0L
    var seen: java.util.BitSet = null
    var i = 0
    while (i < text.length) {
      val ch = text.charAt(i)
      while (s != 0 && !gotoArr(s).contains(ch)) s = fail(s)
      s = gotoArr(s).getOrElse(ch, 0)
      val hits = out(s)
      if (hits.length > 0) {
        total += hits.length
        if (seen == null) seen = new java.util.BitSet(distinct.size)
        var j = 0
        while (j < hits.length) { seen.set(hits(j)); j += 1 }
      }
      i += 1
    }
    (total, if (seen == null) 0 else seen.cardinality())
  }

  def totalMatchesUTF8(text: UTF8String): Long =
    countMatches(text.toString)._1

  def distinctPatternsUTF8(text: UTF8String): Int =
    countMatches(text.toString)._2

  /** Both counters as one InternalRow — the single-scan form the
    * [[graft.functions.BlocklistStats]] expression returns. */
  def matchStatsUTF8(text: UTF8String): org.apache.spark.sql.catalyst.InternalRow = {
    val (total, distinctHits) = countMatches(text.toString)
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](total, distinctHits))
  }
}
