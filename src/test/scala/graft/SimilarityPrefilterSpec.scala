package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.exprs

/** The SimilarityPrefilter optimizer rule: adds an exact length-difference
  * guard before expensive similarity kernels, without changing results. */
class SimilarityPrefilterSpec extends AnyFunSuite {

  private def withExtSession[T](f: SparkSession => T): T = {
    TestSpark.session
    val prevActive = SparkSession.getActiveSession
    val prevDefault = SparkSession.getDefaultSession
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try f(SparkSession.builder().master("local[2]")
      .withExtensions(new GraftExtensions).getOrCreate())
    finally {
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
      prevDefault.foreach(SparkSession.setDefaultSession)
      prevActive.foreach(SparkSession.setActiveSession)
    }
  }

  test("guard appears in the optimized plan and preserves results") {
    withExtSession { spark =>
      // parquet-backed so ConvertToLocalRelation can't fold the plan away
      val c = Tables.customer(spark, "/root/testdata/sf0.001")
      val filtered = c.filter(
        exprs.token_sort_ratio(col("c_name"), lit("Customer#000000001")) >= 85.0)
      val optimized = filtered.queryExecution.optimizedPlan.toString
      assert(optimized.contains("abs("),
        s"length guard missing from plan:\n$optimized")
      assert(optimized.toLowerCase.contains("token_sort_ratio"))
      // results identical to the unoptimized kernel evaluation
      val expected = c.select(col("c_name")).collect().map(_.getString(0))
        .count(n => graft.functions.SimKernel.tokenSortRatio(
          n, "Customer#000000001") >= 85.0)
      assert(filtered.count() == expected)
    }
  }

  test("guard is exact: never rejects a pair the kernel would accept") {
    withExtSession { spark =>
      import spark.implicits._
      val rng = new scala.util.Random(42)
      val vocab = Vector("acme", "pty", "ltd", "group", "mining", "the", "co")
      val rows = Seq.fill(300) {
        def name() = Seq.fill(1 + rng.nextInt(5))(vocab(rng.nextInt(vocab.size))).mkString(" ")
        (name(), name())
      }
      val df = rows.toDF("a", "b")
      for (t <- Seq(50.0, 80.0, 92.0)) {
        val withRule = df.filter(exprs.token_sort_ratio(col("a"), col("b")) >= t).count()
        // reference: evaluate the kernel directly, no optimizer involved
        val expected = rows.count { case (a, b) =>
          graft.functions.SimKernel.tokenSortRatio(a, b) >= t }
        assert(withRule == expected, s"threshold $t")
      }
    }
  }

  test("rule is idempotent (no guard stacking across fixpoint iterations)") {
    withExtSession { spark =>
      val c = Tables.customer(spark, "/root/testdata/sf0.001")
      val df = c.filter(
        exprs.indel_ratio(col("c_name"), lit("Customer#000000042")) >= 90.0)
      val plan = df.queryExecution.optimizedPlan.toString
      val guards = "abs\\(".r.findAllIn(plan).size
      assert(guards == 1, s"expected exactly one guard, plan:\n$plan")
    }
  }
}
