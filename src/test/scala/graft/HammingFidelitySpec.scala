package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Dedup

/** Hamming-banding fidelity (q186): the audit's ground truth really is
  * exact, recall is monotone in the chunk count, and the pigeonhole
  * guarantee (chunks > maxHamming ⇒ recall 1.0) holds — on fingerprints
  * engineered so the 4-chunk banding demonstrably loses pairs. */
class HammingFidelitySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.session
  import spark.implicits._

  // 40 base fingerprints spread by a 64-bit LCG, each with a partner at
  // exactly Hamming 8: four flips in each of two different 16-bit
  // chunks for even ids (chunk-local damage -> the other two chunks
  // still match -> 4x16 banding FINDS these), four flips in EVERY
  // chunk for odd ids (every 16-bit chunk polluted -> 4x16 banding
  // CANNOT find these; only narrower chunks can)
  private def lcg(i: Long): Long =
    i * 6364136223846793005L + 1442695040888963407L
  private lazy val fps = (0 until 40).flatMap { i =>
    val base = lcg(i.toLong)
    val flips =
      if (i % 2 == 0) Seq(0, 3, 7, 11, 16, 20, 24, 29) // chunks 0,1 only
      else Seq(1, 17, 33, 49, 5, 21, 37, 53) // one flip in all 4 chunks x2
    val twin = flips.foldLeft(base)((h, b) => h ^ (1L << b))
    Seq((i.toLong * 2, base), (i.toLong * 2 + 1, twin))
  }.toDF("id", "fp")

  private def audit(chunks: Int, h: Int = 8) =
    Dedup.hammingFidelity(fps, "fp", "id", h, chunks).head()

  test("ground truth is exact: gold pair count equals brute force at " +
      "maxHamming, regardless of the production chunk count") {
    val rows = fps.collect().map(r => (r.getLong(0), r.getLong(1)))
    val brute = (for {
      (ia, fa) <- rows; (ib, fb) <- rows if ia < ib
      if java.lang.Long.bitCount(fa ^ fb) <= 8
    } yield (ia, ib)).size
    assert(brute >= 40, s"fixture degenerate: $brute gold pairs")
    Seq(2, 4, 8).foreach { c =>
      val r = audit(c)
      assert(r.getLong(1) == brute.toLong,
        s"gold ${r.getLong(1)} != brute $brute at chunks=$c")
    }
  }

  test("recall is monotone in the chunk count and reaches 1.0 at " +
      "chunks > maxHamming (pigeonhole)") {
    val recalls = Seq(2, 4, 6, 9).map(c => c -> audit(c).getDouble(4))
    recalls.sliding(2).foreach { case Seq((c1, r1), (c2, r2)) =>
      assert(r2 >= r1, s"recall fell $c1->$c2: $recalls")
    }
    val r9 = recalls.last._2
    assert(r9 == 1.0, s"chunks=9 > h=8 must be complete, got $r9")
    val r4 = recalls(1)._2
    // the odd-id twins pollute every 16-bit chunk: 4x16 must miss them
    assert(r4 < 1.0, s"4-chunk recall $r4 — fixture should defeat it")
    // ...but the even-id twins (chunk-local damage) keep it well off 0
    assert(r4 > 0.3, s"4-chunk recall $r4 — even-id twins lost?")
  }

  test("hammingNearDup with chunks > maxHamming returns exactly the " +
      "brute-force pair set (the exact-screen configuration)") {
    val got = Dedup.hammingNearDup(fps, "fp", "id", maxHamming = 8,
        chunks = 9)
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val rows = fps.collect().map(r => (r.getLong(0), r.getLong(1)))
    val brute = (for {
      (ia, fa) <- rows; (ib, fb) <- rows if ia < ib
      if java.lang.Long.bitCount(fa ^ fb) <= 8
    } yield (ia, ib)).toSet
    assert(got == brute)
  }
}
