package graft

import java.nio.file.Files

import scala.jdk.CollectionConverters._

import org.apache.hadoop.conf.Configuration
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Layout

/** The z-order PRODUCTION write path (`Layout.scala` scaladoc):
  * `repartitionByRange(n, zkey)` + parquet, gated by reading back the
  * parquet row-group min/max statistics and asserting they prune scans
  * on BOTH source dimensions — the property the Morton key exists to
  * provide, which the oracled q89 (key math only) does not cover. */
class LayoutSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.session

  /** Per-row-group (min, max) of an int64 column across every parquet
    * part-file under `dir`, straight from the file footers — exactly the
    * statistics a min/max-pruning scan planner consults. */
  private def rowGroupStats(dir: String, colName: String): Seq[(Long, Long)] = {
    val conf = new Configuration()
    val files = new java.io.File(dir).listFiles()
      .filter(f => f.getName.endsWith(".parquet") && f.isFile)
    assert(files.nonEmpty, s"no parquet part-files under $dir")
    files.toIndexedSeq.flatMap { f =>
      val in = HadoopInputFile.fromPath(
        new org.apache.hadoop.fs.Path(f.getAbsolutePath), conf)
      val reader = ParquetFileReader.open(in)
      try {
        reader.getFooter.getBlocks.asScala.map { block =>
          val cc = block.getColumns.asScala
            .find(_.getPath.toDotString == colName)
            .getOrElse(fail(s"column $colName missing from footer"))
          val st = cc.getStatistics
          (st.genericGetMin.asInstanceOf[java.lang.Long].longValue(),
            st.genericGetMax.asInstanceOf[java.lang.Long].longValue())
        }.toIndexedSeq
      } finally reader.close()
    }
  }

  private def overlapping(stats: Seq[(Long, Long)], lo: Long, hi: Long): Int =
    stats.count { case (mn, mx) => mx >= lo && mn <= hi }

  test("repartitionByRange(zkey) parquet prunes row groups on BOTH dims") {
    import spark.implicits._
    // full 256x256 grid: a and b are perfectly independent, so no linear
    // ordering can cluster both — only the interleaved key can
    val grid = (0 until 65536).map(i => (i % 256L, i / 256L)).toDF("a", "b")
      .withColumn("zkey", Layout.zorderKey(col("a"), col("b"), 8))
    val dir = Files.createTempDirectory("graft_zorder").toFile.getAbsolutePath
    grid.repartitionByRange(16, col("zkey"))
      .write.mode("overwrite").parquet(dir)

    val aStats = rowGroupStats(dir, "a")
    val bStats = rowGroupStats(dir, "b")
    assert(aStats.size >= 16, s"expected >=16 row groups, got ${aStats.size}")
    // a narrow predicate on EITHER dimension must skip most row groups:
    // contiguous z-ranges cover ~64x64 tiles, so an 11-wide band touches
    // ~1 of 4 stripe positions (+ boundary slop from range sampling)
    val aHits = overlapping(aStats, 10L, 20L)
    val bHits = overlapping(bStats, 10L, 20L)
    assert(aHits <= aStats.size / 2,
      s"a-predicate pruned nothing: $aHits of ${aStats.size} row groups")
    assert(bHits <= bStats.size / 2,
      s"b-predicate pruned nothing: $bHits of ${bStats.size} row groups")

    // contrast: the same data range-laid-out on `a` alone prunes a but
    // can NEVER prune b (every a-stripe spans the full b range) — the
    // gap between bHits above and here is the z-order win
    val linDir = Files.createTempDirectory("graft_linear").toFile.getAbsolutePath
    grid.repartitionByRange(16, col("a"))
      .write.mode("overwrite").parquet(linDir)
    val linB = rowGroupStats(linDir, "b")
    assert(overlapping(linB, 10L, 20L) == linB.size,
      "linear layout unexpectedly pruned the secondary dimension")

    // the layout is lossless: reading back yields the identical grid
    assert(spark.read.parquet(dir).count() == 65536L)
    assert(spark.read.parquet(dir).select("a", "b").except(
      grid.select("a", "b")).count() == 0L)
  }

  // ---------------------------------------------------------- hilbert key

  test("hilbertKey: bijective on the full grid, and consecutive indices " +
      "are ALWAYS grid 4-neighbors (the property Z-order lacks)") {
    val bits = 4
    val n = 1 << bits
    val cells = (for (x <- 0 until n; y <- 0 until n) yield
      graft.functions.HilbertKernel.xy2d(bits, x, y) -> (x, y)).toMap
    assert(cells.size == n * n, "not a bijection")
    assert(cells.keys.min == 0L && cells.keys.max == (n * n - 1).toLong)
    def manhattan(a: (Int, Int), b: (Int, Int)): Int =
      math.abs(a._1 - b._1) + math.abs(a._2 - b._2)
    val hilbertTotal = (0L until (n * n - 1).toLong).map { d =>
      val step = manhattan(cells(d), cells(d + 1))
      assert(step == 1, s"Hilbert jump of $step at d=$d")
      step
    }.sum
    // Z-order on the same grid: sum of consecutive-cell distances is
    // strictly worse (the Z jumps) — the quantified locality claim
    val zcells = (for (x <- 0 until n; y <- 0 until n) yield {
      var z = 0L
      for (i <- 0 until bits)
        z += ((x >> i) & 1).toLong * (1L << (2 * i)) +
          ((y >> i) & 1).toLong * (1L << (2 * i + 1))
      z -> (x, y)
    }).toMap
    val zTotal = (0L until (n * n - 1).toLong)
      .map(d => manhattan(zcells(d), zcells(d + 1))).sum
    assert(hilbertTotal == (n * n - 1).toLong)
    assert(zTotal > hilbertTotal,
      s"z-order total $zTotal should exceed hilbert $hilbertTotal")
  }

  test("hilbert_key expression matches the kernel and masks high bits") {
    import spark.implicits._
    val bits = 6
    val df = (0L until 500L).map(i => (i, i * 37 % 97, i * 91 % 64))
      .toDF("id", "a", "b")
    val got = df.select(col("id"),
        graft.functions.exprs.hilbert_key(col("a"), col("b"), bits)
          .as("h"))
      .as[(Long, Long)].collect().toMap
    (0L until 500L).foreach { i =>
      val want = graft.functions.HilbertKernel.xy2d(bits, i * 37 % 97,
        i * 91 % 64)
      assert(got(i) == want, s"id $i")
    }
    // masking: adding 2^bits multiples to a dimension changes nothing
    assert(graft.functions.HilbertKernel.xy2d(bits, 5 + (1L << bits) * 3, 9) ==
      graft.functions.HilbertKernel.xy2d(bits, 5, 9))
  }

  test("rangeBuckets equals ntile bit-for-bit across N mod n shapes " +
      "(including N < n and n = 1), without a global window") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    // (N, nBuckets): exact division, remainder, N < n, single bucket,
    // n = N, and a prime N against a power-of-two n
    for ((n, buckets) <- Seq((48, 16), (50, 16), (5, 16), (50, 1),
        (16, 16), (97, 8))) {
      val df = (0 until n).map(i => (i.toLong, (i * 37 % 23).toLong))
        .toDF("id", "key")
      val want = df.withColumn("b",
          ntile(buckets).over(Window.orderBy(col("key"), col("id")))
            .cast("long"))
        .select(col("id"), col("b")).as[(Long, Long)].collect().toMap
      // BOTH rank paths of the size-adaptive form (r21): the packed
      // single-task array (threshold above N) and the distributed
      // globalRowNumber fallback (threshold 0) must be bit-identical
      // to ntile and to each other
      for (thr <- Seq(Long.MaxValue, 0L)) {
        val got = graft.operators.Layout.rangeBuckets(df,
            Seq(col("key"), col("id")), buckets, "b", thr)
          .select(col("id"), col("b")).as[(Long, Long)].collect().toMap
        assert(got == want, s"N=$n buckets=$buckets threshold=$thr")
      }
      // the plan never windows over an empty partition spec — that is
      // the single-task global sort rangeBuckets exists to avoid
      val plan = graft.operators.Layout.rangeBuckets(df,
          Seq(col("key"), col("id")), buckets, "b")
        .queryExecution.optimizedPlan
      val bad = plan.collect {
        case w: org.apache.spark.sql.catalyst.plans.logical.Window
            if w.partitionSpec.isEmpty => w
      }
      assert(bad.isEmpty, s"unpartitioned Window in plan: $bad")
    }
  }
}
