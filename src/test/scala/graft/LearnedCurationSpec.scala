package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Learned-filter curation (q193): decision-table invariants — the
  * keep decision is exactly the gate conjunction, shards exist iff
  * kept, the pack respects the token budget, and every gate actually
  * fires on the sf0.01 slice (a decision table where a gate is dead
  * code is not a composition). */
class LearnedCurationSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.session

  test("decision-table invariants + all gates live") {
    val out = SparkEntry.queries("q193_learned_curation")(spark,
        "/root/testdata/sf0.01")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getBoolean(3), r.getBoolean(4), r.getBoolean(5),
        r.getBoolean(6), if (r.isNullAt(7)) None else Some(r.getLong(7))))
    assert(out.nonEmpty)
    out.foreach { case (id, _, _, pred, blocked, dup, kept, shard) =>
      assert(kept == (pred && !blocked && !dup),
        s"doc $id: kept disagrees with the gate conjunction")
      assert(shard.isDefined == kept,
        s"doc $id: shard presence disagrees with kept")
    }
    assert(out.exists(_._7), "no doc kept")
    assert(out.exists(r => r._5), "blocklist gate never fired")
    assert(out.exists(r => r._6), "dup gate never fired")
    // the learned gate's rejection side lives in q190's eval (junk
    // twins score negative); here every decision-table doc is real
    // text, so predicted=true across the board is the EXPECTED verdict
    assert(out.forall(_._4),
      "the trained filter rejected real corpus text")
    // pack budget: no shard exceeds budget + one doc's tokens
    val budget = SketchParams.q193.budget
    out.filter(_._8.isDefined).groupBy(_._8.get).foreach {
      case (sid, rows) =>
        val total = rows.map(_._2).sum
        val biggest = rows.map(_._2).max
        assert(total <= budget + biggest,
          s"shard $sid holds $total tokens > budget+doc")
    }
  }

  test("q196 curation→pack composition: pieces cover each kept doc " +
      "exactly, every non-final sequence fills to exactly seqLen, and " +
      "only kept docs are packed") {
    val dir = "/root/testdata/sf0.01"
    val dec = SparkEntry.queries("q193_learned_curation")(spark, dir)
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(6))).toMap
    val packed = SparkEntry.queries("q196_curation_pack")(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(packed.nonEmpty)
    val keptIds = dec.filter { case (_, (n, kept)) => kept && n > 0 }
      .keySet
    assert(packed.map(_._1).toSet == keptIds,
      "packed doc set != kept doc set")
    // per-doc: pieces are contiguous within the doc and sum to n_tokens
    packed.groupBy(_._1).foreach { case (id, rows) =>
      val n = dec(id)._1
      assert(rows.map(_._4).sum == n, s"doc $id pieces don't cover it")
      val sorted = rows.sortBy(_._2).toSeq
      assert(sorted.head._3 == 0L, s"doc $id first piece offset != 0")
      sorted.zip(sorted.tail).foreach {
        case ((_, s1, o1, t1), (_, s2, o2, _)) =>
          assert(s2 == s1 + 1 && o2 == o1 + t1,
            s"doc $id pieces not contiguous")
      }
    }
    // per-sequence: exact fill
    val L = SketchParams.q194.seqLen
    val bySeq = packed.groupBy(_._2)
    val lastSeq = bySeq.keys.max
    bySeq.foreach { case (sid, rows) =>
      val tot = rows.map(_._4).sum
      if (sid != lastSeq)
        assert(tot == L, s"sequence $sid holds $tot != $L tokens")
      else assert(tot <= L)
    }
  }
}
