package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Dedup, Sampling, TextAnalysis}

/** Corpus-curation operators added for the training-data pipeline:
  * SemDeDup semantic dedup, mixture sampling, KMV distinct sketch,
  * overlapping chunking, and the domain-level gate. */
class CurationSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.session
  import spark.implicits._

  // ----------------------------------------------------------- semanticDedup

  /** 40 well-separated base vectors (axis-aligned per cluster-ish blocks)
    * + 10 perturbed twins (cosine ≈ 1 to their source). */
  private lazy val vecs = {
    val rng = new scala.util.Random(7)
    val base = (0 until 40).map { i =>
      (i.toLong, Seq.fill(16)(rng.nextDouble() * 2 - 1))
    }
    val twins = (0 until 40 by 4).map { i =>
      (1000L + i, base(i)._2.map(_ + 0.0005))
    }
    (base ++ twins).toDF("vec_id", "embedding")
  }

  test("semanticDedup drops every perturbed twin onto its source") {
    val dropped = Dedup.semanticDedup(vecs, "embedding", "vec_id",
      cosineThreshold = 0.999, nlist = 4).collect()
    val byDup = dropped.map(r =>
      r.getAs[Long]("dup_id") -> r.getAs[Long]("keeper_id")).toMap
    // every twin is dropped, keeping its (lower-id) source or an even
    // closer lower-id neighbor — never another twin
    (0 until 40 by 4).foreach { i =>
      assert(byDup.contains(1000L + i), s"twin of $i not dropped")
      assert(byDup(1000L + i) < 1000L, s"twin of $i kept by another twin")
    }
    // chains point strictly downward: a keeper that was itself dropped
    // (non-transitive similarity) must have its own keeper below it —
    // no cycles, every chain terminates at a surviving root
    val droppedIds = byDup.keySet
    byDup.values.toSet.intersect(droppedIds).foreach { k =>
      assert(byDup(k) < k, s"dropped keeper $k chains upward")
    }
  }

  test("semanticDedup with an injected kmeans quantizer finds the twins") {
    import graft.operators.Ann
    val learned = Ann.quantizeCentroids(
      Ann.kmeansCentroids(vecs, "embedding", "vec_id", nlist = 4), 1000)
    val dropped = Dedup.semanticDedup(vecs, "embedding", "vec_id",
      cosineThreshold = 0.999, centroids = Some(learned)).collect()
    val byDup = dropped.map(r =>
      r.getAs[Long]("dup_id") -> r.getAs[Long]("keeper_id")).toMap
    // a twin and its source are near-identical vectors, so ANY quantizer
    // assigns them to the same cluster — every twin must still be dropped
    (0 until 40 by 4).foreach { i =>
      assert(byDup.contains(1000L + i), s"twin of $i not dropped")
      assert(byDup(1000L + i) < 1000L, s"twin of $i kept by another twin")
    }
  }

  test("component resolution maps every dropped vector to a surviving root") {
    import graft.operators.Components
    val dropped = Dedup.semanticDedup(vecs, "embedding", "vec_id",
      cosineThreshold = 0.999, nlist = 4)
    val resolved = Components.dedupAssignments(
        vecs, "vec_id", dropped, "dup_id", "keeper_id")
      .filter(col("id") =!= col("keep_id"))
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[Long]("keep_id"))
    assert(resolved.nonEmpty)
    // the q94 contract the raw keeper chain cannot give: no root is
    // itself remapped, so anti-join + remap always lands on a survivor
    val remapped = resolved.map(_._1).toSet
    assert(resolved.forall { case (_, root) => !remapped.contains(root) })
    assert(resolved.forall { case (id, root) => root < id })
  }

  test("semanticDedup at an unreachable threshold drops nothing") {
    val dropped = Dedup.semanticDedup(vecs, "embedding", "vec_id",
      cosineThreshold = 1.5, nlist = 4)
    assert(dropped.count() == 0)
  }

  // ---------------------------------------------------------- mixtureSample

  test("mixtureSample keeps ~rate per group, deterministically") {
    val docs = (0 until 3000).map(i =>
      (i.toLong, if (i % 3 == 0) "web" else if (i % 3 == 1) "books"
        else "code")).toDF("id", "grp")
    val rates = Map("web" -> 0.25, "books" -> 0.75, "code" -> 0.0)
    val kept = Sampling.mixtureSample(docs, "id", "grp", rates)
    val byGrp = kept.groupBy("grp").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byGrp.getOrElse("code", 0L) == 0L)
    assert(math.abs(byGrp("web") - 250L) < 60, s"web=${byGrp("web")}")
    assert(math.abs(byGrp("books") - 750L) < 60, s"books=${byGrp("books")}")
    // deterministic: a second run keeps the identical id set
    val again = Sampling.mixtureSample(docs, "id", "grp", rates)
    assert(kept.select("id").except(again.select("id")).count() == 0)
    assert(again.select("id").except(kept.select("id")).count() == 0)
  }

  test("mixtureSample rejects out-of-range rates") {
    val docs = Seq((1L, "a")).toDF("id", "grp")
    intercept[IllegalArgumentException] {
      Sampling.mixtureSample(docs, "id", "grp", Map("a" -> 1.5))
    }
  }

  // ----------------------------------------------------------- kmvDistinct

  test("kmvDistinct is exact below k and within KMV error above") {
    val rows = (0 until 5000).map { i =>
      val grp = if (i < 30) "small" else "big"
      // "small": 30 rows over 10 distinct values; "big": ~2500 distinct
      val v = if (i < 30) (i % 10).toLong else (i % 2500).toLong + 100L
      (grp, v)
    }.toDF("grp", "v")
    val est = Sampling.kmvDistinct(rows, "grp", "v", k = 64).collect()
      .map(r => r.getString(0) ->
        (r.getAs[Long]("exact_distinct"), r.getAs[Long]("sketch_size"),
          r.getAs[Double]("est_distinct"))).toMap
    val (smallExact, smallSize, smallEst) = est("small")
    assert(smallExact == 10 && smallSize == 10 && smallEst == 10.0)
    val (bigExact, bigSize, bigEst) = est("big")
    assert(bigExact == 2500 && bigSize == 64)
    // KMV relative error ~ 1/sqrt(k-2) ≈ 0.127; allow 3 sigma
    assert(math.abs(bigEst - bigExact) / bigExact < 0.4,
      s"est=$bigEst exact=$bigExact")
  }

  // -------------------------------------------------------- chunkDocuments

  test("chunkDocuments lays out overlapping windows that cover the text") {
    val docs = Seq(
      (1L, "a" * 250),   // 120-wide, stride 90 → chunks at 1, 91, 181
      (2L, "b" * 120),   // exactly one window
      (3L, "c" * 5),     // shorter than width → one short chunk
      (4L, "")           // empty → one empty chunk
    ).toDF("doc_id", "text")
    val chunks = TextAnalysis.chunkDocuments(docs, "doc_id", "text", 120, 90)
      .collect().map(r => (r.getAs[Long]("doc_id"),
        r.getAs[Long]("chunk_idx"), r.getAs[Long]("chunk_start"),
        r.getAs[String]("chunk"), r.getAs[Long]("chunk_chars")))
    val d1 = chunks.filter(_._1 == 1L).sortBy(_._2)
    assert(d1.map(c => (c._3, c._5)).toSeq ==
      Seq((1L, 120L), (91L, 120L), (181L, 70L)))
    // strided windows cover every char (width > stride ⇒ no gaps)
    assert(d1.flatMap(c => c._3 to (c._3 + c._5 - 1)).toSet ==
      (1L to 250L).toSet)
    assert(chunks.count(_._1 == 2L) == 1)
    val d3 = chunks.filter(_._1 == 3L)
    assert(d3.length == 1 && d3.head._4 == "ccccc" && d3.head._5 == 5L)
    val d4 = chunks.filter(_._1 == 4L)
    assert(d4.length == 1 && d4.head._4 == "" && d4.head._5 == 0L)
  }

  // ------------------------------------------------------------ domainStats

  test("domainStats gates on unique fraction and mean length") {
    val docs = (
      // clean domain: 10 long unique docs
      (0 until 10).map(i => ("clean", s"unique document $i " + "x" * 300)) ++
      // spammy domain: 10 docs, 8 of them identical short boilerplate
      (0 until 8).map(_ => ("spam", "buy now")) ++
      Seq(("spam", "one real page " + "y" * 300),
        ("spam", "another real page " + "z" * 300))
    ).toDF("source", "text")
    val stats = TextAnalysis.domainStats(docs, "source", "text",
        minUniqueFrac = 0.8, minAvgChars = 100.0)
      .collect().map(r => r.getAs[String]("domain") -> r).toMap
    val clean = stats("clean")
    assert(clean.getAs[Long]("n_docs") == 10 &&
      clean.getAs[Long]("n_unique") == 10 &&
      clean.getAs[Boolean]("passed"))
    val spam = stats("spam")
    assert(spam.getAs[Long]("n_unique") == 3)
    assert(!spam.getAs[Boolean]("passed"))
    assert(spam.getAs[Double]("unique_frac") == 0.3)
  }
}
