package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Skew

/** Skew salting correctness + bucketed-table co-located joins. */
class SkewAndBucketSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.session

  test("salted inner join equals the plain join on skewed data") {
    import spark.implicits._
    // 90% of rows share one hot key
    val skewed = ((1 to 9000).map(i => (1L, s"hot$i")) ++
      (1 to 1000).map(i => ((i % 50 + 2).toLong, s"cold$i")))
      .toDF("k", "payload")
    val small = (1 to 60).map(i => (i.toLong, s"dim$i")).toDF("k", "dim")
    val plain = skewed.join(small, Seq("k"), "inner")
    val salted = Skew.saltedInnerJoin(skewed, small, "k", saltFactor = 8)
    assert(salted.count() == plain.count())
    val a = plain.select("k", "payload", "dim").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).sorted
    val b = salted.select("k", "payload", "dim").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).sorted
    assert(a.toSeq == b.toSeq)
  }

  test("two-phase aggregation equals single-phase on skewed keys") {
    import spark.implicits._
    val df = ((1 to 5000).map(_ => (1L, 1.0)) ++
      (1 to 500).map(i => ((i % 20 + 2).toLong, 2.0)))
      .toDF("k", "v")
    val single = df.groupBy("k").agg(sum("v").as("v")).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val two = Skew.twoPhaseAgg(df, "k", 8,
        partial = Map("v" -> (c => sum(c))),
        combine = Map("v" -> (c => sum(c))))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(two == single)
  }

  test("salted fuzzyMatch equals the unsalted cascade stage") {
    import spark.implicits._
    val left = (1 to 500).map(i => (i.toLong, s"name variant $i", (i % 3).toLong))
      .toDF("lid", "lname", "blk")
    val right = (1 to 40).map(i => (i.toLong, s"name variant ${i * 10}", (i % 3).toLong))
      .toDF("rid", "rname", "blk")
    val score = graft.functions.exprs.token_sort_ratio(col("lname"), col("rname"))
    def run(salt: Int) = graft.operators.Cascade.fuzzyMatch(
        left, right, "blk", score, "lid", Seq("rid"),
        graft.operators.Cascade.MatchConfig(60.0, 80.0), saltBlocks = salt)
      .select("lid", "rid", "match_score")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).sorted
    assert(run(1).toSeq == run(6).toSeq)
    assert(run(1).nonEmpty)
  }

  test("bucketed tables join without an exchange (co-located join)") {
    import spark.implicits._
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val a = (1 to 1000).map(i => (i.toLong, s"a$i")).toDF("k", "va")
      val b = (1 to 1000).map(i => (i.toLong, s"b$i")).toDF("k", "vb")
      a.write.mode("overwrite").bucketBy(8, "k").sortBy("k")
        .saveAsTable("bucketed_a")
      b.write.mode("overwrite").bucketBy(8, "k").sortBy("k")
        .saveAsTable("bucketed_b")
      val joined = spark.table("bucketed_a")
        .join(spark.table("bucketed_b"), Seq("k"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"bucketed join should not shuffle:\n$plan")
      assert(joined.count() == 1000)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
      spark.sql("DROP TABLE IF EXISTS bucketed_a")
      spark.sql("DROP TABLE IF EXISTS bucketed_b")
    }
  }
}
