package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only ad-hoc timing harness (Test scope; never shipped). Usage:
  * sbt "Test/runMain graft.DevTiming <sfDir>" */
object DevTiming {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def tm[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[t] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val li = spark.read.parquet(s"$dir/lineitem.parquet")
    val or = spark.read.parquet(s"$dir/orders.parquet")
    val e0 = li.join(or, col("l_orderkey") === col("o_orderkey"))
      .select((col("l_suppkey") * 2L).as("a"),
        (col("o_custkey") * 2L + 1L).as("b"))
    val edges = e0.union(e0.select(col("b").as("a"), col("a").as("b")))
    tm("pagerank 3 iters")(println(
      graft.operators.PageRank.pageRankFixedPoint(edges, "a", "b", 3).count()))
    tm("pagerank again (warm)")(println(
      graft.operators.PageRank.pageRankFixedPoint(edges, "a", "b", 3).count()))
    spark.stop()
  }
}
