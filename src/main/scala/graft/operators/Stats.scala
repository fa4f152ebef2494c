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
    *
    * Integral columns bucket with INTEGRAL boundaries: the percentile
    * aggregate emits doubles, and a long-vs-double comparison promotes
    * the column to double — values past 2^53 round during the promote
    * and land in the wrong bucket. Flooring the boundary to the
    * column's own type is semantics-preserving (for integer v and real
    * b, v > b ⟺ v > floor(b)) and keeps every comparison exact; the
    * boundary VALUE still carries the aggregate's double precision,
    * which both engines share (quantile_cont parity). An empty input —
    * or an all-null column — returns an empty histogram rather than
    * NPE'ing on the null boundary row. */
  def equiDepthHistogram(df: DataFrame, valueCol: String, nBuckets: Int,
      approxBoundaries: Boolean = false,
      approxAccuracy: Int = 10000): DataFrame = {
    require(nBuckets >= 2, "need at least 2 buckets")
    val vc = col(valueCol)
    val isIntegral = df.select(vc).schema.head.dataType match {
      case org.apache.spark.sql.types.LongType
         | org.apache.spark.sql.types.IntegerType
         | org.apache.spark.sql.types.ShortType
         | org.apache.spark.sql.types.ByteType => true
      case _ => false
    }
    val probs = typedlit((1 until nBuckets).map(_.toDouble / nBuckets))
    val boundariesAgg =
      if (approxBoundaries) percentile_approx(vc, probs, lit(approxAccuracy))
      else percentile(vc, probs)
    val row = df.agg(boundariesAgg).collect()(0)
    // null boundary row = zero non-null values: empty histogram, same
    // schema as the populated path (limit(0) + the empty fold below)
    val (frame, bnd) =
      if (row.isNullAt(0)) (df.limit(0), Seq.empty[Double])
      else (df, row.getSeq[Any](0).map {
        case d: Double => d
        case l: Long => l.toDouble
        case i: Int => i.toDouble
      })
    val bucket = bnd.foldLeft(lit(0L)) { (acc, b) =>
      val bLit = if (isIntegral) lit(math.floor(b).toLong) else lit(b)
      acc + when(vc > bLit, 1L).otherwise(0L)
    }
    frame.groupBy(bucket.as("bucket"))
      .agg(count(lit(1)).as("n"),
        min(vc).as("lo"),
        max(vc).as("hi"))
  }
}
