package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Ranks

/** The global rank machinery (q142/q222's engine): exact equality with
  * driver-side sorts under a shuffle-partition sweep — the regression
  * pin for the r18 bug where the two plan branches could execute the
  * range exchange under DIFFERENT sampled bounds and corrupt ranks as
  * a function of spark.sql.shuffle.partitions. */
class RanksSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.session
  import spark.implicits._

  // duplicate-heavy keys (dense rank must group them) over enough rows
  // to span many partitions
  private def frame = (1 to 500).map { i =>
    (i.toLong, s"k${i % 37}")
  }.toDF("id", "key")

  test("globalRowNumber == a driver-side sort at every partition count") {
    val rows = frame.collect().map(r => (r.getLong(0), r.getString(1)))
    val want = rows.sortBy { case (id, k) => (k, id) }.zipWithIndex
      .map { case ((id, _), i) => id -> (i + 1).toLong }.toMap
    val before = spark.conf.get("spark.sql.shuffle.partitions")
    try Seq(1, 3, 17, 64).foreach { parts =>
      spark.conf.set("spark.sql.shuffle.partitions", parts.toString)
      val got = Ranks.globalRowNumber(frame,
          Seq(col("key"), col("id")), out = "r")
        .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
      assert(got == want, s"globalRowNumber diverged at parts=$parts")
    } finally spark.conf.set("spark.sql.shuffle.partitions", before)
  }

  test("globalDenseRank == a driver-side dense rank at every partition " +
      "count (equal keys always share a rank)") {
    val rows = frame.collect().map(r => (r.getLong(0), r.getString(1)))
    val keyRank = rows.map(_._2).distinct.sorted.zipWithIndex
      .map { case (k, i) => k -> (i + 1).toLong }.toMap
    val want = rows.map { case (id, k) => id -> keyRank(k) }.toMap
    val before = spark.conf.get("spark.sql.shuffle.partitions")
    try Seq(1, 3, 17, 64).foreach { parts =>
      spark.conf.set("spark.sql.shuffle.partitions", parts.toString)
      val got = Ranks.globalDenseRank(frame, Seq(col("key")), out = "r")
        .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
      assert(got == want, s"globalDenseRank diverged at parts=$parts")
    } finally spark.conf.set("spark.sql.shuffle.partitions", before)
  }
}
