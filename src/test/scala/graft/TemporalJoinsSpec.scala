package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.TemporalJoins

class TemporalJoinsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.session

  test("as-of backward join picks the latest earlier (or equal) right row") {
    import spark.implicits._
    val trades = Seq(
      ("A", 10L, "t1"), ("A", 20L, "t2"), ("A", 5L, "t0"), ("B", 15L, "t3"))
      .toDF("sym", "ts", "trade")
    val quotes = Seq(
      ("A", 8L, 1.0), ("A", 10L, 2.0), ("A", 19L, 3.0), ("B", 99L, 9.0))
      .toDF("sym", "qts", "px")
    val got = TemporalJoins.asofJoinBackward(trades, quotes, "sym", "ts", "qts")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2),
        Option(r.get(4)).map(_.asInstanceOf[Double]))).toSet
    assert(got == Set(
      ("A", 10L, "t1", Some(2.0)),  // equal-time quote matches
      ("A", 20L, "t2", Some(3.0)),
      ("A", 5L, "t0", None),        // no earlier quote
      ("B", 15L, "t3", None)))      // B's only quote is later
  }

  test("as-of forward join picks the earliest later (or equal) right row") {
    import spark.implicits._
    val trades = Seq(
      ("A", 10L, "t1"), ("A", 20L, "t2"), ("A", 99L, "t9"), ("B", 15L, "t3"))
      .toDF("sym", "ts", "trade")
    val quotes = Seq(
      ("A", 8L, 1.0), ("A", 10L, 2.0), ("A", 19L, 3.0), ("B", 5L, 9.0))
      .toDF("sym", "qts", "px")
    val got = TemporalJoins.asofJoinForward(trades, quotes, "sym", "ts", "qts")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2),
        Option(r.get(4)).map(_.asInstanceOf[Double]))).toSet
    assert(got == Set(
      ("A", 10L, "t1", Some(2.0)),  // equal-time quote matches
      ("A", 20L, "t2", None),       // latest quote is 19 < 20
      ("A", 99L, "t9", None),
      ("B", 15L, "t3", None)))      // B's only quote is earlier
  }

  test("as-of forward join matches brute force on random data (with tolerance)") {
    import spark.implicits._
    val rng = new scala.util.Random(13)
    val lefts = (0 until 200).map(i =>
      ("k" + rng.nextInt(5), rng.nextInt(1000).toLong, i.toLong))
      .toDF("k", "lt", "lid")
    val rights = (0 until 150).map(i =>
      ("k" + rng.nextInt(5), rng.nextInt(1000).toLong, i.toLong))
      .toDF("k", "rt", "rid")
    val got = TemporalJoins.asofJoinForward(lefts, rights, "k", "lt", "rt",
        tolerance = Some(100L))
      .collect().map(r => r.getAs[Long]("lid") ->
        Option(r.get(4)).map(_ => r.getAs[Long]("rt"))).toMap
    val rightRows = rights.collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    lefts.collect().foreach { l =>
      val (k, lt, lid) = (l.getString(0), l.getLong(1), l.getLong(2))
      val want = rightRows.filter(r => r._1 == k && r._2 >= lt && r._2 <= lt + 100)
        .map(_._2).sorted.headOption
      assert(got(lid) == want, s"lid=$lid k=$k lt=$lt")
    }
  }

  test("as-of join respects tolerance") {
    import spark.implicits._
    val l = Seq(("A", 100L, "x")).toDF("k", "ts", "v")
    val r = Seq(("A", 10L, 1.0)).toDF("k", "rts", "px")
    val strict = TemporalJoins.asofJoinBackward(l, r, "k", "ts", "rts",
      tolerance = Some(50L)).collect().head
    assert(strict.isNullAt(4)) // 90 units stale > 50 tolerance
    val loose = TemporalJoins.asofJoinBackward(l, r, "k", "ts", "rts",
      tolerance = Some(200L)).collect().head
    assert(loose.getDouble(4) == 1.0)
  }

  test("as-of join matches a brute-force reference on random data") {
    import spark.implicits._
    val rng = new scala.util.Random(42)
    val lefts = Seq.fill(200)((s"k${rng.nextInt(5)}", rng.nextInt(1000).toLong))
    val rights = Seq.fill(100)((s"k${rng.nextInt(5)}", rng.nextInt(1000).toLong,
      rng.nextDouble()))
    val lDf = lefts.zipWithIndex.map { case ((k, t), i) => (k, t, i.toLong) }
      .toDF("k", "ts", "lid")
    val rDf = rights.toDF("k", "rts", "px")
    val got = TemporalJoins.asofJoinBackward(lDf, rDf, "k", "ts", "rts")
      .collect().map(r => r.getLong(2) ->
        Option(r.get(4)).map(_.asInstanceOf[Double])).toMap
    lefts.zipWithIndex.foreach { case ((k, t), i) =>
      val want = rights.filter(r => r._1 == k && r._2 <= t)
        .sortBy(r => (r._2, r._3)).lastOption.map(_._3)
      assert(got(i.toLong) == want, s"left $i ($k, $t)")
    }
  }

  test("range join equals the naive theta join") {
    import spark.implicits._
    val rng = new scala.util.Random(7)
    val points = (0 until 300).map(i => (i.toLong, rng.nextInt(10000).toLong))
      .toDF("pid", "p")
    val ranges = (0 until 50).map { i =>
      val s = rng.nextInt(9000).toLong
      (i.toLong, s, s + rng.nextInt(800).toLong)
    }.toDF("rid", "s", "e")
    val got = TemporalJoins.rangeJoinPoints(points, "p", ranges, "s", "e", 500L)
      .select("pid", "rid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val want = points.crossJoin(ranges)
      .filter(col("p") >= col("s") && col("p") <= col("e"))
      .select("pid", "rid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == want)
    assert(want.nonEmpty)
  }

  test("interval-overlap join equals the naive theta join, no duplicate pairs") {
    import spark.implicits._
    val rng = new scala.util.Random(11)
    def intervals(n: Int, pre: String) = (0 until n).map { i =>
      val s = rng.nextInt(9000).toLong
      (i.toLong, s, s + rng.nextInt(1200).toLong)
    }.toDF(s"${pre}id", s"${pre}s", s"${pre}e")
    val a = intervals(80, "a")
    val b = intervals(60, "b")
    val rows = TemporalJoins.rangeJoinIntervals(a, "as", "ae", b, "bs", "be", 500L)
      .select("aid", "bid").collect().map(r => (r.getLong(0), r.getLong(1)))
    // no duplicate emissions despite multi-bin overlaps
    assert(rows.length == rows.toSet.size, "pair emitted more than once")
    val want = a.crossJoin(b)
      .filter(col("as") <= col("be") && col("bs") <= col("ae"))
      .select("aid", "bid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(rows.toSet == want)
    assert(want.nonEmpty)
  }

  test("range join silently drops null-bounded ranges, still fails fast on wide ones") {
    import spark.implicits._
    val points = Seq((1L, 100L)).toDF("pid", "p")
    val ranges = Seq(
      (1L, Some(50L), Some(150L)),     // matches
      (2L, None, Some(150L)),          // null start -> dropped, NOT an abort
      (3L, Some(50L), None))           // null end -> dropped
      .toDF("rid", "s", "e")
    val got = TemporalJoins.rangeJoinPoints(points, "p", ranges, "s", "e", 10L)
      .select("rid").collect().map(_.getLong(0)).toSet
    assert(got == Set(1L))
    // a non-null range spanning too many bins still raises the tuning error
    val wide = Seq((9L, Some(0L), Some(1000000L))).toDF("rid", "s", "e")
    val ex = intercept[Exception] {
      TemporalJoins.rangeJoinPoints(points, "p", wide, "s", "e", 1L,
        maxBinsPerRange = 10).count()
    }
    assert(ex.getMessage.contains("rangeJoinPoints"))
  }
}
