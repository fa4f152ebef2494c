package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Ann

/** kNN-backbone lifecycle (VERDICT r14 item 5): parquet persistence is
  * bit-exact and build-once, and DELETE maintenance repairs the
  * surviving graph to near-fresh-descent quality without re-descending
  * the corpus. */
class KnnMaintenanceSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.session
  private val dir = "/root/testdata/sf0.01"
  private val K = 4
  private val Scale = 1000

  private lazy val corpus = Tables.load(spark, dir, "embeddings")
    .filter(col("vec_id") < 150)
  private lazy val graph =
    Ann.nnDescentPortable(corpus, "embedding", "vec_id", K, 3, Scale)
      .cache()

  private def rows(df: DataFrame): Set[(Long, Long, Long, Long)] =
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
      r.getLong(3))).toSet

  test("saveKnnGraph/loadKnnGraph round-trips bit-exactly, and " +
      "trainOrLoadKnnGraph builds once then serves from the model") {
    implicit val s = spark
    val root = java.nio.file.Files.createTempDirectory("knn_model")
      .toString
    val path = s"$root/backbone"
    var builds = 0
    def build = { builds += 1; graph }
    val first = Ann.trainOrLoadKnnGraph(path)(build)
    assert(builds == 1)
    assert(rows(first) == rows(graph), "persisted graph diverged")
    val second = Ann.trainOrLoadKnnGraph(path)(build)
    assert(builds == 1, "second call re-built instead of loading")
    assert(rows(second) == rows(graph))
    // the serving plan is the parquet scan, not the descent lineage
    val plan = second.queryExecution.optimizedPlan.toString
    assert(plan.toLowerCase.contains("parquet") ||
      second.inputFiles.nonEmpty, s"load not backed by the model file")
  }

  test("knnGraphDelete: deleted ids vanish from both columns, " +
      "unaffected heaps pass through untouched, affected heaps refill") {
    val del = corpus.filter(col("vec_id") % 10 === 3).select("vec_id")
    val delIds = del.collect().map(_.getLong(0)).toSet
    val out = Ann.knnGraphDelete(graph, corpus, del, "embedding",
      "vec_id", K, Scale)
    val o = rows(out)
    assert(o.forall { case (id, nb, _, _) =>
      !delIds.contains(id) && !delIds.contains(nb) },
      "a deleted id survived")
    val before = rows(graph)
    val affected = before.collect {
      case (id, nb, _, _) if delIds.contains(nb) && !delIds.contains(id)
        => id
    }
    // unaffected nodes: rows identical, ranks intact
    val unaffBefore = before.filter { case (id, _, _, _) =>
      !delIds.contains(id) && !affected.contains(id) }
    assert(o.filter { case (id, _, _, _) => !affected.contains(id) }
      == unaffBefore, "an untouched heap changed")
    // affected nodes refill back to k (this corpus has dense 2-hop
    // neighborhoods; thin ones may legitimately stay short)
    val byNode = o.groupBy(_._1)
    affected.foreach { a =>
      assert(byNode.getOrElse(a, Set.empty).size == K,
        s"affected node $a not refilled to $K")
    }
  }

  test("repair quality: post-delete graph recall vs a FRESH descent on " +
      "the survivors stays within epsilon") {
    val del = corpus.filter(col("vec_id") % 10 === 3).select("vec_id")
    val survivors = corpus.join(del.withColumnRenamed("vec_id", "v"),
      col("vec_id") === col("v"), "left_anti")
    val repaired = rows(Ann.knnGraphDelete(graph, corpus, del,
      "embedding", "vec_id", K, Scale))
      .map { case (id, nb, _, _) => (id, nb) }
    val fresh = rows(Ann.nnDescentPortable(survivors, "embedding",
        "vec_id", K, 5, Scale))
      .map { case (id, nb, _, _) => (id, nb) }
    val overlap = repaired.intersect(fresh).size.toDouble / fresh.size
    // measured ~0.9 on this corpus; the floor leaves slack while
    // catching a broken backfill (dropping repair entirely gives far
    // less: affected heaps would be missing edges wholesale)
    assert(overlap >= 0.75,
      s"repaired graph agrees with fresh descent on only $overlap")
  }

  test("seedCap is the identity when buckets are under the cap") {
    val batch = Tables.load(spark, dir, "embeddings")
      .filter(col("vec_id") >= 150 && col("vec_id") < 170)
    val capped = rows(Ann.knnGraphProbePortable(graph, corpus, batch,
      "embedding", "vec_id", K, 1, Scale, seedCap = 256))
    val uncapped = rows(Ann.knnGraphProbePortable(graph, corpus, batch,
      "embedding", "vec_id", K, 1, Scale, seedCap = Int.MaxValue))
    assert(capped == uncapped,
      "an inactive seed cap changed the probe output")
  }

  test("fat bucket: seedCap keeps seeding batch-proportional (the r15 " +
      "soak OOM shape) — bounded budget, full heaps, deterministic") {
    import spark.implicits._
    // near-identical vectors: every hyperplane dot lands on the same
    // side for all of them, so ALL corpus mass piles into ONE bucket
    // per table — the uncapped worst case (seeds = |batch|·|corpus|)
    def vec(i: Int): Array[Float] =
      Array.tabulate(8)(j => if (j == 0) 100f + i * 0.001f else 50f)
    val fatCorpus = (0 until 60).map(i => (i.toLong, vec(i)))
      .toDF("vec_id", "embedding")
    val queries = (100 until 105).map(i => (i.toLong, vec(i)))
      .toDF("vec_id", "embedding")
    val fatGraph = Ann.nnDescentPortable(fatCorpus, "embedding",
      "vec_id", K, 2, Scale)
    val cap = 8
    val (out, budget) = Ann.beamSearchStats(fatGraph, fatCorpus, queries,
      "embedding", "vec_id", K, K, maxRounds = 0, scale = Scale,
      seedCap = cap)
    // seeds ≤ 2 tables · |queries| · cap even though the one fat bucket
    // holds the whole corpus; without the cap this would be 5·60 = 300
    assert(budget <= 2L * 5 * cap,
      s"seed budget $budget exceeds the 2·|q|·cap bound")
    val o = rows(out)
    assert(o.size == 5 * K, s"expected full $K-heaps, got $o")
    val again = rows(Ann.beamSearchStats(fatGraph, fatCorpus, queries,
      "embedding", "vec_id", K, K, maxRounds = 0, scale = Scale,
      seedCap = cap)._1)
    assert(o == again, "capped seeding is not deterministic")
  }
}
