package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Grouped top-k via the bounded-state BottomK aggregate (q100): must
  * produce exactly the window-sort answer, at any partition layout. */
class TopKAggSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.session
  private val dir = "/root/testdata/sf0.001"

  private def windowTop3 = {
    val cents = floor(col("p_retailprice") * 100).cast("long")
    Tables.part(spark, dir)
      .select(col("p_brand"), col("p_partkey"), cents.as("price_cents"))
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("p_brand"))
          .orderBy((-col("price_cents")).asc,
            lpad(col("p_partkey").cast("string"), 12, "0").asc)))
      .filter(col("rn") <= 3)
      .select(col("p_brand"), col("p_partkey"), col("price_cents"))
  }

  test("aggregate top-3 equals the window top-3 exactly") {
    val got = SparkEntry.queries("q100_topk_agg")(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .toSet
    val want = windowTop3.collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(want.nonEmpty)
    assert(got == want)
    // every group contributes at most k rows
    got.groupBy(_._1).foreach { case (b, rows) =>
      assert(rows.size <= 3, s"brand $b returned ${rows.size} rows")
    }
  }
}
