package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Dedup

/** Prefix-filtered set-similarity join: must equal the brute-force
  * all-pairs word-set Jaccard exactly (prefix filtering prunes
  * candidates, never results), and the prefix must actually prune. */
class PrefixJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.session
  private val dir = "/root/testdata/sf0.001"

  test("equals brute-force all-pairs Jaccard; prefix prunes candidates") {
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"),
        trim(regexp_replace(col("text"), "[ \\t\\n\\x0B\\f\\r]+", " "))
          .as("text"))
      .unionByName(Tables.documents(spark, dir)
        .select((col("doc_id") + 1000000L).as("doc_id"),
          trim(regexp_replace(regexp_replace(col("text"),
            "[ \\t\\n\\x0B\\f\\r]+", " "), " [^ ]+$", "")).as("text")))

    val got = Dedup.prefixFilterJoin(docs, "text", "doc_id",
        tNum = 1, tDen = 2)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2)))
      .toMap

    // brute force on the driver: the corpus is tiny at sf0.001
    val sets = docs.collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ")
        .filter(_.nonEmpty).toSet).toMap
    val ids = sets.keys.toSeq.sorted
    val want = (for {
      i <- ids.indices.iterator
      j <- (i + 1) until ids.length
      a = sets(ids(i)); b = sets(ids(j))
      inter = (a & b).size
      if inter * 2 >= (a.size + b.size - inter) // tNum/tDen = 1/2
    } yield ((ids(i), ids(j)), inter.toLong)).toMap
    assert(want.nonEmpty, "fixture must contain qualifying pairs")
    assert(got == want,
      s"missing=${(want.keySet -- got.keySet).take(3)} " +
        s"extra=${(got.keySet -- want.keySet).take(3)}")
  }

  test("fraction threshold avoids the IEEE ceil trap (t=3/5 on n=5)") {
    import spark.implicits._
    // two 5-token sets sharing exactly 4 tokens: J = 4/6 = 0.667 >= 0.6
    val docs = Seq(
      (1L, "a b c d e"),
      (2L, "a b c d f")
    ).toDF("doc_id", "text")
    val out = Dedup.prefixFilterJoin(docs, "text", "doc_id",
      tNum = 3, tDen = 5).collect()
    assert(out.length == 1 && out.head.getLong(2) == 4L,
      out.mkString(","))
  }
}
