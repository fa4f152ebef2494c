package graft

import org.apache.spark.sql.functions.{col, row_number}
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Linkage

/** Fellegi–Sunter linkage against hand-computed rationals.
  *
  * Hand corpus (id, color, size): 1=(red,S) 2=(red,S) 3=(red,M)
  * 4=(blue,M); N=4, gold={(1,2)}.
  *   u_color = (3²+1²+1)/(16+2) = 11/18   u_size = (2²+2²+1)/18 = 9/18
  *   m_color = m_size = (1+1)/(1+2) = 2/3
  *   w_color: agree (2/3)/(11/18) = 12/11, disagree (1/3)/(7/18) = 6/7
  *   w_size:  agree (2/3)/(9/18)  = 4/3,   disagree (1/3)/(9/18) = 2/3
  */
class LinkageSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.session

  private def records = {
    import spark.implicits._
    Seq((1L, "red", "S"), (2L, "red", "S"), (3L, "red", "M"),
      (4L, "blue", "M")).toDF("id", "color", "size")
  }
  private def gold = {
    import spark.implicits._
    Seq((1L, 2L)).toDF("id_a", "id_b")
  }
  private val fields = Seq("color", "size")

  test("estimateWeights reproduces the hand-computed m/u rationals") {
    val w = Linkage.estimateWeights(records, "id", fields, gold)
      .map(fw => fw.field -> fw).toMap
    assert(w("color") == Linkage.FieldWeight("color", 2, 3, 11, 18))
    assert(w("size") == Linkage.FieldWeight("size", 2, 3, 9, 18))
    // the derived doubles use the documented op shape — exact equality
    assert(w("color").agreeWeight == (2.0 / 3.0) / (11.0 / 18.0))
    assert(w("color").disagreeWeight == (1.0 / 3.0) / (7.0 / 18.0))
  }

  test("scorePairs: hand-computed odds products and threshold decision") {
    import spark.implicits._
    val cands = Seq((1L, 2L), (1L, 3L), (3L, 4L)).toDF("id_a", "id_b")
    val w = Linkage.estimateWeights(records, "id", fields, gold)
    val got = Linkage.scorePairs(records, "id", fields, cands, w,
        threshold = 1.0)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getDouble(3), r.getBoolean(4)))).toMap
    val wc = w.find(_.field == "color").get
    val ws = w.find(_.field == "size").get
    // exact doubles: same multiply order as the operator (field order)
    assert(got((1L, 2L)) ==
      ((2L, wc.agreeWeight * ws.agreeWeight, true)))
    assert(got((1L, 3L)) ==
      ((1L, wc.agreeWeight * ws.disagreeWeight, false)))
    assert(got((3L, 4L)) ==
      ((1L, wc.disagreeWeight * ws.agreeWeight, true)))
  }

  test("null fields never agree and are excluded from the u histogram") {
    import spark.implicits._
    val recs = Seq((1L, Some("red"), "S"), (2L, None, "S"),
      (3L, Some("red"), "M"), (4L, None, "M"))
      .toDF("id", "color", "size")
    val w = Linkage.estimateWeights(recs, "id", fields,
      Seq((1L, 3L)).toDF("id_a", "id_b"))
      .map(fw => fw.field -> fw).toMap
    // u_color counts only the two non-null reds: (2²+1)/(16+2) = 5/18
    assert(w("color") == Linkage.FieldWeight("color", 2, 3, 5, 18))
    // a null on either side scores as disagreement
    val scored = Linkage.scorePairs(recs, "id", fields,
        Seq((1L, 2L)).toDF("id_a", "id_b"), w.values.toSeq,
        threshold = 1000.0)
      .collect()(0)
    assert(scored.getLong(2) == 1L) // size agrees, null color does not
    assert(!scored.getBoolean(4))
  }

  test("evaluateBlocking: hand-computed metrics, orientation/duplicate " +
      "normalization") {
    import spark.implicits._
    // N=4 → 6 total pairs. Candidates {(1,2),(3,1)} normalize to
    // {(1,2),(1,3)}; gold {(2,1),(1,2),(2,3)} to {(1,2),(2,3)};
    // covered = {(1,2)}.
    val cands = Seq((1L, 2L), (3L, 1L)).toDF("id_a", "id_b")
    val gold = Seq((2L, 1L), (1L, 2L), (2L, 3L)).toDF("id_a", "id_b")
    val r = Linkage.evaluateBlocking(records, "id", cands, gold)
      .collect()(0)
    assert(r.getLong(0) == 2L && r.getLong(1) == 2L && r.getLong(2) == 1L)
    assert(r.getDouble(3) == 4.0 / 6.0) // reduction ratio
    assert(r.getDouble(4) == 1.0 / 2.0) // pair completeness
    assert(r.getDouble(5) == 1.0 / 2.0) // pairs quality
  }

  test("evaluateBlocking: empty candidate and gold sets yield zero " +
      "metrics, not division errors") {
    import spark.implicits._
    val empty = Seq.empty[(Long, Long)].toDF("id_a", "id_b")
    val r = Linkage.evaluateBlocking(records, "id", empty, empty)
      .collect()(0)
    assert(r.getLong(0) == 0L && r.getLong(1) == 0L && r.getLong(2) == 0L)
    assert(r.getDouble(3) == 1.0) // nothing generated: maximal reduction
    assert(r.getDouble(4) == 0.0 && r.getDouble(5) == 0.0)
  }

  test("estimateWeightsEM matches a plain-Scala quantized-EM reference " +
      "EXACTLY (same arithmetic over collected flags)") {
    import spark.implicits._
    // planted structure: ids 1..40; "match" pairs (2k, 2k+1) agree on
    // both fields; "noise" pairs (2k+1, 2k+2) agree on neither
    val recs = (1L to 40L).map { i =>
      val g = (i - 1) / 2 // twins share a group
      if (i % 2 == 1) (i, s"c$g", s"s$g") else (i, s"c$g", s"s$g")
    }.toDF("id", "color", "size")
    val cands = ((1L to 39L by 2).map(i => (i, i + 1)) ++
      (2L to 38L by 2).map(i => (i, i + 1))).toDF("id_a", "id_b")
    val iters = 3
    val got = Linkage.estimateWeightsEM(recs, "id", fields, cands, iters)
    // reference: identical quantized EM over the same agreement vectors
    val Q = 1L << 30
    val flags = cands.as[(Long, Long)].collect().map { case (x, y) =>
      val m = recs.as[(Long, String, String)].collect()
        .map(r => r._1 -> (r._2, r._3)).toMap
      (m(x)._1 == m(y)._1, m(x)._2 == m(y)._2)
    }
    val n = flags.length.toLong
    var pi = 0.2
    var mC = 0.9; var mS = 0.9; var uC = 0.1; var uS = 0.1
    (1 to iters).foreach { _ =>
      var sw = 0L; var swfC = 0L; var swfS = 0L; var sgfC = 0L
      var sgfS = 0L
      flags.foreach { case (gc, gs) =>
        val pm = ((pi) * (if (gc) mC else 1.0 - mC)) *
          (if (gs) mS else 1.0 - mS)
        val pu = ((1.0 - pi) * (if (gc) uC else 1.0 - uC)) *
          (if (gs) uS else 1.0 - uS)
        val w = math.min(math.max(
          math.floor((pm / (pm + pu)) * Q.toDouble).toLong, 1L), Q - 1L)
        sw += w
        if (gc) { swfC += w; sgfC += Q - w }
        if (gs) { swfS += w; sgfS += Q - w }
      }
      pi = sw.toDouble / (n * Q).toDouble
      mC = swfC.toDouble / sw.toDouble
      mS = swfS.toDouble / sw.toDouble
      uC = sgfC.toDouble / (n * Q - sw).toDouble
      uS = sgfS.toDouble / (n * Q - sw).toDouble
    }
    assert(got.pi == pi)
    assert(got.m("color") == mC && got.m("size") == mS)
    assert(got.u("color") == uC && got.u("size") == uS)
    // and the planted structure was recovered: ~half the pairs are the
    // all-agree class, whose m estimates sit far above the u's
    assert(got.pi > 0.4 && got.pi < 0.6, got.pi)
    assert(got.m("color") > 0.9 && got.u("color") < 0.2)
    // EM weights drive scoring through the raw-weight entry point
    val scored = Linkage.scorePairsRaw(recs, "id", fields, cands,
      got.toWeights, threshold = 1.0)
    assert(scored.filter(col("is_match")).count() == 20) // the twins
  }

  test("empty gold set is rejected (weights would be meaningless)") {
    import spark.implicits._
    val err = intercept[IllegalArgumentException] {
      Linkage.estimateWeights(records, "id", fields,
        Seq.empty[(Long, Long)].toDF("id_a", "id_b"))
    }
    assert(err.getMessage.contains("gold"))
  }

  test("emPosteriors: per-pair quantized posterior equals one more " +
      "E-step at the calibrated parameters, exactly") {
    import spark.implicits._
    // same planted structure as the EM reference test: twins (2k-1, 2k)
    // agree on both fields, straddle pairs (2k, 2k+1) on neither
    val recs = (1L to 40L).map { i =>
      val g = (i - 1) / 2
      (i, s"c$g", s"s$g")
    }.toDF("id", "color", "size")
    val cands = ((1L to 39L by 2).map(i => (i, i + 1)) ++
      (2L to 38L by 2).map(i => (i, i + 1))).toDF("id_a", "id_b")
    val iters = 3
    val params = Linkage.estimateWeightsEM(recs, "id", fields, cands, iters)
    val post = Linkage.emPosteriors(recs, "id", fields, cands, iters)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2))
      .toMap
    assert(post.size == 39)
    // reference: one E-step at the calibrated params, same quantization
    val Q = 1L << 30
    val byId = recs.as[(Long, String, String)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    cands.as[(Long, Long)].collect().foreach { case (x, y) =>
      val gc = byId(x)._1 == byId(y)._1
      val gs = byId(x)._2 == byId(y)._2
      val pm = (params.pi *
        (if (gc) params.m("color") else 1.0 - params.m("color"))) *
        (if (gs) params.m("size") else 1.0 - params.m("size"))
      val pu = ((1.0 - params.pi) *
        (if (gc) params.u("color") else 1.0 - params.u("color"))) *
        (if (gs) params.u("size") else 1.0 - params.u("size"))
      val w = math.min(math.max(
        math.floor((pm / (pm + pu)) * Q.toDouble).toLong, 1L), Q - 1L)
      assert(post((x, y)) == w, s"posterior mismatch for ($x, $y)")
    }
    // and the posteriors separate the planted classes: twins near 1.0,
    // straddle pairs near 0.0
    val twins = (1L to 39L by 2).map(i => post((i, i + 1)))
    val noise = (2L to 38L by 2).map(i => post((i, i + 1)))
    assert(twins.forall(_ > (Q * 0.9).toLong))
    assert(noise.forall(_ < (Q * 0.1).toLong))
  }

  test("mutualBestAssignment: hand case — chain broken at the weak link") {
    import spark.implicits._
    // 1's best is 2 (0.9) and vice versa → (1,2) survives. 3's best
    // stays 2 (0.8 > 0.7) even though 2 pairs with 1 — mutual-best is
    // ORDER-FREE, not iterative greedy — so (2,3), (3,4) and (4,5) all
    // fail the mutuality check ((3,4): 4 prefers 3 but 3 prefers 2).
    val pairs = Seq(
      (1L, 2L, 0.9), (2L, 3L, 0.8), (3L, 4L, 0.7), (4L, 5L, 0.6))
      .toDF("id_a", "id_b", "score")
    val got = Linkage.mutualBestAssignment(pairs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got == Set((1L, 2L, 0.9)))
  }

  test("mutualBestAssignment: tie on score breaks to smallest partner") {
    import spark.implicits._
    // node 2 sees 1 and 3 at the same score: tie-break picks partner 1,
    // so (1,2) is mutual and (2,3) is not; 3 still prefers 2 over 4
    // (0.5 > 0.4), so (3,4) fails mutuality too.
    val pairs = Seq((1L, 2L, 0.5), (2L, 3L, 0.5), (3L, 4L, 0.4))
      .toDF("id_a", "id_b", "score")
    val got = Linkage.mutualBestAssignment(pairs).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((1L, 2L)))
  }

  test("mutualBestAssignment: string ids work (generic-id contract)") {
    import spark.implicits._
    // same chain + tie shapes as the numeric tests, lexicographic ids —
    // r10 ADVICE: the previous tie-break negated the partner id and
    // failed analysis on non-numeric ids
    val pairs = Seq(
      ("a", "b", 0.9), ("b", "c", 0.8), ("c", "d", 0.5), ("c", "e", 0.5))
      .toDF("id_a", "id_b", "score")
    val got = Linkage.mutualBestAssignment(pairs).collect()
      .map(r => (r.getString(0), r.getString(1), r.getDouble(2))).toSet
    // a↔b mutual at 0.9; c's best is b (0.8) so (c,d)/(c,e) fail
    // mutuality; d and e each best-prefer c but c doesn't reciprocate
    assert(got == Set(("a", "b", 0.9)))
    // tie-break on string partner: z sees x and y at equal score →
    // picks x (smallest lexicographically), so (x,z) is mutual
    val tied = Seq(("x", "z", 0.5), ("y", "z", 0.5))
      .toDF("id_a", "id_b", "score")
    val got2 = Linkage.mutualBestAssignment(tied).collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(got2 == Set(("x", "z")))
  }

  test("mutualBestAssignment output is one-to-one on a blocked score set") {
    import spark.implicits._
    // every node in one block, all pairs scored by a deterministic hash
    // surrogate — the adversarial many-to-many shape
    val n = 40L
    val pairs = (1L to n).flatMap(a => (a + 1 to n).map(b =>
      (a, b, ((a * 7919 + b * 104729) % 1000).toDouble / 1000.0)))
      .toDF("id_a", "id_b", "score")
    val rows = Linkage.mutualBestAssignment(pairs).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val ids = rows.flatMap(p => Seq(p._1, p._2))
    assert(ids.distinct.length == ids.length, "an id appeared twice")
    assert(rows.nonEmpty)
    // brute-force the mutual-best definition
    val score = pairs.collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    def bestOf(x: Long): Long = (1L to n).filter(_ != x)
      .maxBy(y => (score.getOrElse((x min y, x max y), -1.0), -y))
    val expected = (1L to n).flatMap { a =>
      val b = bestOf(a)
      if (a < b && bestOf(b) == a) Some((a, b)) else None
    }.toSet
    assert(rows.toSet == expected)
  }

  // ------------------------------------------------- sorted neighborhood

  test("sortedNeighborhood emits exactly the rank-window pairs, " +
      "ties broken by id, NULL keys dropped") {
    import spark.implicits._
    // sorted (key, id) order: (a,1) (a,3) (b,4) (c,2); id 5's NULL key
    // blocks nothing
    val recs = Seq((3L, Some("a")), (1L, Some("a")), (4L, Some("b")),
      (2L, Some("c")), (5L, None)).toDF("id", "k")
    val w2 = Linkage.sortedNeighborhood(recs, "id", "k", window = 2)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(w2 == Set((1L, 3L), (3L, 4L), (4L, 2L)))
    val w3 = Linkage.sortedNeighborhood(recs, "id", "k", window = 3)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(w3 == Set((1L, 3L), (3L, 4L), (4L, 2L), (1L, 4L), (3L, 2L)))
    // keys ride along for downstream scoring
    val keyed = Linkage.sortedNeighborhood(recs, "id", "k", window = 2)
      .as[(Long, Long, String, String)].collect().toSet
    assert(keyed.contains((3L, 4L, "a", "b")))
    assertThrows[IllegalArgumentException] {
      Linkage.sortedNeighborhood(recs, "id", "k", window = 1)
    }
  }

  test("sortedNeighborhood rank is partitioning-independent: matches " +
      "the single-window reference on a shuffled corpus") {
    import spark.implicits._
    val rng = new scala.util.Random(7)
    val recs = (1L to 120L).map(i =>
      (i, s"${('a' + rng.nextInt(4)).toChar}${rng.nextInt(3)}"))
      .toDF("id", "k")
    val w = 4
    val got = Linkage.sortedNeighborhood(recs.repartition(13), "id", "k", w)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    // reference: one global row_number (fine at spec size)
    val win = org.apache.spark.sql.expressions.Window
      .orderBy(col("k"), col("id"))
    val rk = recs.withColumn("rn", row_number().over(win))
      .select("id", "rn").as[(Long, Int)].collect()
    val byRank = rk.map { case (id, rn) => rn -> id }.toMap
    val expected = (for {
      (id, rn) <- rk; d <- 1 until w; if byRank.contains(rn + d)
    } yield (id, byRank(rn + d))).toSet
    assert(got == expected)
    assert(got.size == (w - 1) * 120 - (w - 1) * w / 2)
  }
}
