package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Components, PageRank}

/** Iteration operators must not accumulate checkpoint blocks: each
  * driver-controlled loop localCheckpoints per round (or per interval),
  * and before round 10's hygiene fix every superseded generation stayed
  * persisted until the session died — a repeated caller (the bench's
  * best-of-2, a notebook) leaked executor storage linearly in total
  * iterations (the r7 PageRank lesson: 22 s → 2.4 s warm-run gap).
  *
  * Each test runs an input shaped to need MANY rounds and asserts the
  * net growth of `sc.getPersistentRDDs` is a small constant — bounded
  * by the final generation the result frame reads, never by the round
  * count. Correctness of the output is asserted alongside, so a
  * wrongly-freed block (localCheckpoints are not recomputable) would
  * fail here as a job error, not ship as a perf win.
  */
class CheckpointHygieneSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.session

  private def persisted: Int =
    spark.sparkContext.getPersistentRDDs.size

  /** Path graph 0-1-2-…-(n-1): diameter n-1, the label-propagation and
    * peeling worst case — one checkpoint generation per round. */
  private def path(n: Int) = {
    import spark.implicits._
    (0L until (n - 1).toLong).map(i => (i, i + 1)).toDF("a", "b")
  }

  test("connectedComponents frees superseded rounds on a long chain") {
    val before = persisted
    val labels = Components.connectedComponents(path(14), "a", "b",
      maxIter = 20)
    val comps = labels.select(col("component")).distinct().collect()
    assert(comps.map(_.getLong(0)).toSeq == Seq(0L)) // one chain, root 0
    assert(labels.count() == 14)
    val growth = persisted - before
    // ~13 propagation rounds ran; only the final labels checkpoint may
    // remain (the edge copy is freed at loop exit)
    assert(growth <= 1, s"leaked checkpoint generations: growth=$growth")
  }

  test("connectedComponentsStar frees superseded rounds") {
    val before = persisted
    val labels = Components.connectedComponentsStar(path(14), "a", "b")
    assert(labels.select(col("component")).distinct()
      .collect().map(_.getLong(0)).toSeq == Seq(0L))
    val growth = persisted - before
    assert(growth <= 1, s"leaked checkpoint generations: growth=$growth")
  }

  test("kCore frees superseded peeling rounds") {
    val before = persisted
    // a path has no 2-core: ends peel one round at a time (~6 rounds),
    // then the empty fixpoint
    val core = Components.kCore(path(12), "a", "b", k = 2)
    assert(core.count() == 0)
    val growth = persisted - before
    assert(growth <= 1, s"leaked checkpoint generations: growth=$growth")
  }

  test("hitsFixedPoint frees superseded half-step checkpoints") {
    import spark.implicits._
    val edges = (0L until 40L).map(i => (i % 8, 100 + i % 5))
      .toDF("src", "dst")
    val before = persisted
    val hits = PageRank.hitsFixedPoint(edges, "src", "dst", iters = 6)
    val rows = hits.collect()
    assert(rows.nonEmpty)
    // top hub and top authority pin at exactly scale
    assert(rows.map(_.getLong(1)).max == 1000000L)
    assert(rows.map(_.getLong(2)).max == 1000000L)
    val growth = persisted - before
    // 6 iterations × 2 half-step checkpoints ran; live: the edge copy
    // plus the final (aRaw, hRaw) pair the result frame reads
    assert(growth <= 3, s"leaked checkpoint generations: growth=$growth")
  }

  test("deep pageRankFixedPoint frees superseded interval checkpoints") {
    val before = persisted
    // 20 iterations at interval 4 → 4 interval checkpoints, ≤ 1 live
    val pr = PageRank.pageRankFixedPoint(path(10), "a", "b",
      iters = 20, checkpointInterval = 4)
    assert(pr.count() == 10)
    val growth = persisted - before
    assert(growth <= 1, s"leaked checkpoint generations: growth=$growth")
  }

  test("concurrent loops on one context never free each other's blocks " +
      "(the Verify shape)") {
    // graft.Verify runs queries 4-at-a-time on one SparkContext; a
    // tracker that diffed the GLOBAL persistence map captured another
    // thread's fresh checkpoint and freed it from the wrong loop
    // (CHECKPOINT_RDD_BLOCK_ID_NOT_FOUND mid-query). Tracking off the
    // frame's own plan makes ownership exact; this pins it.
    import scala.concurrent.{Await, ExecutionContext, Future}
    val pool = java.util.concurrent.Executors.newFixedThreadPool(4)
    implicit val ec: ExecutionContext =
      ExecutionContext.fromExecutor(pool)
    try {
      val edges = path(14)
      val runs = (1 to 4).map { _ =>
        Future {
          Components.connectedComponents(edges, "a", "b", maxIter = 20)
            .count() +
            PageRank.hitsFixedPoint(edges, "a", "b", iters = 5).count()
        }
      }
      val res = Await.result(Future.sequence(runs),
        scala.concurrent.duration.Duration.Inf)
      assert(res.forall(_ == 28L)) // 14 labeled nodes + 14 HITS nodes
    } finally pool.shutdown()
  }

  test("deep personalizedPageRank frees superseded interval checkpoints") {
    import spark.implicits._
    val before = persisted
    val ppr = PageRank.personalizedPageRankFixedPoint(path(10), "a", "b",
      Seq(Tuple1(0L)).toDF("node"), "node",
      iters = 20, checkpointInterval = 4)
    assert(ppr.count() == 10)
    val growth = persisted - before
    assert(growth <= 1, s"leaked checkpoint generations: growth=$growth")
  }

  test("repeated invocations do not accumulate blocks (the bench shape)") {
    val edges = path(14)
    // warm once so any operator-independent session state settles
    Components.connectedComponents(edges, "a", "b", maxIter = 20).count()
    val before = persisted
    (1 to 3).foreach { _ =>
      Components.connectedComponents(edges, "a", "b", maxIter = 20).count()
      PageRank.hitsFixedPoint(edges, "a", "b", iters = 3).count()
    }
    val growth = persisted - before
    // per call the final generations stay referenced by the (dropped)
    // result frames until GC'd by the ContextCleaner, so allow the last
    // call's worth — but never 3 calls × rounds worth (~50+ pre-fix)
    assert(growth <= 8, s"blocks accumulate across calls: growth=$growth")
  }
}
