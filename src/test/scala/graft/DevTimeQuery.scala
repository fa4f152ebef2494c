package graft

import org.apache.spark.sql.SparkSession

/** Dev-only single-query timer (`Test/runMain graft.DevTimeQuery
  * <sfDir> <q1,q2,...>`): the Bench warm-up + best-of-2 protocol for a
  * handful of queries without paying the full 121-query sweep — the
  * tool for "did this change move q120" questions. */
object DevTimeQuery {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val names = if (args.length > 1) args(1).split(",").toSeq
      else Seq("q01_pricing_summary")
    val spark = SparkSession.builder().master("local[32]")
      .withExtensions(new GraftExtensions)
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // same warm-up as Bench: JIT/codegen/parquet-footer caches
    SparkEntry.queries("q01_pricing_summary")(spark, sfDir).count()
    names.foreach { n =>
      val fn = SparkEntry.queries(n)
      val times = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        fn(spark, sfDir).count()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[time] $n: best ${times.min}%.2f s (runs: " +
        times.map(t => f"$t%.2f").mkString(", ") + ")")
    }
    spark.stop()
  }
}
