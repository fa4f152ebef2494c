package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .withExtensions(new GraftExtensions)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warm JIT/codegen/parquet-footer caches so per-query timings measure
    // the plan, not first-run JVM compilation
    SparkEntry.queries.get("q01_pricing_summary")
      .foreach(fn => try fn(spark, sfDir).count() catch { case _: Throwable => })
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      // best-of-2 warm timing: first run may still pay per-plan codegen
      // JIT; the min is the stable per-query cost
      val times = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        try { fn(spark, sfDir).count(); (System.nanoTime() - t0) / 1e9 }
        catch {
          case e: Throwable =>
            System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
            -1.0 // failures surface as -1, never as a (fast) elapsed time
        }
      }
      name -> (if (times.contains(-1.0)) -1.0 else times.min)
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    // the long per-query line gets a distinct metric name so nothing that
    // filters/aggregates on metric=="total" can double-count it against the
    // short trailer below
    println(s"""{"metric":"total_per_query","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    // repeat the headline WITHOUT the per-query map: the full line above can
    // exceed a bounded log-tail window as the query count grows (r3's
    // recorded artifact was truncated mid-line and parsed as null), so a
    // short trailer guarantees the total always lands in the capture
    println(s"""{"metric":"total","value":$total,"unit":"sec","n_queries":${results.size},"sf":"$sfDir"}""")
    spark.stop()
  }
}
