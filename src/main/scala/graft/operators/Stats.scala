package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Column-profiling statistics for curation pipelines: distribution
  * summaries a pipeline consults before choosing thresholds (length
  * gates, balance targets, shard budgets).
  */
object Stats {

  /** Equi-depth histogram of an integral column: `nBuckets` buckets
    * holding ~equal row counts, with per-bucket count and value range.
    * The profiling primitive behind threshold choices ("where does the
    * p90 of document length sit?") and equi-depth binning for joins.
    *
    * Two passes, NO global sort: (1) one aggregation computes the
    * nBuckets−1 interior quantile boundaries; (2) the boundary vector —
    * driver-held, bounded by nBuckets (a model-state boundary of the
    * Packing-subtotal class) — folds into a literal bucket expression
    * (count of boundaries strictly below the value) and one partial
    * hash-agg produces the histogram. A `ntile` window would sort the
    * whole column in one partition — the canonical scale killer this
    * shape avoids.
    *
    * The gate path uses Spark's exact `percentile` (interpolation is a
    * single divide over exact integer operands — engine-portable, the
    * q102 precedent, so the DuckDB oracle reproduces the histogram
    * hash-exactly). At 100 TB the exact percentile pass itself is the
    * bottleneck (per-partition sorted state); swap
    * `approxBoundaries = true` to compute the boundaries with
    * `percentile_approx` (Greenwald–Khanna sketch, mergeable bounded
    * state — the q109 argument) — identical downstream shape, rank
    * error bounded by the sketch accuracy. Empty buckets (possible
    * under heavy value repetition) simply don't appear.
    */
  def equiDepthHistogram(df: DataFrame, valueCol: String, nBuckets: Int,
      approxBoundaries: Boolean = false,
      approxAccuracy: Int = 10000): DataFrame = {
    require(nBuckets >= 2, "need at least 2 buckets")
    val probs = (1 until nBuckets).map(i => i.toDouble / nBuckets)
    val probsSql = probs.mkString("array(", ",", ")")
    val fn = if (approxBoundaries) s"percentile_approx($valueCol, $probsSql, $approxAccuracy)"
      else s"percentile($valueCol, $probsSql)"
    val bnd: Seq[Double] = df.agg(expr(fn)).collect()(0)
      .getSeq[Any](0).map {
        case d: Double => d
        case l: Long => l.toDouble
        case i: Int => i.toDouble
      }
    val bucket = bnd.foldLeft(lit(0L)) { (acc, b) =>
      acc + when(col(valueCol) > lit(b), 1L).otherwise(0L)
    }
    df.groupBy(bucket.as("bucket"))
      .agg(count(lit(1)).as("n"),
        min(col(valueCol)).as("lo"),
        max(col(valueCol)).as("hi"))
  }
}
