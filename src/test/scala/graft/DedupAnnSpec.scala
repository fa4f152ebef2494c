package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Ann, Dedup}

/** Dedup + ANN operators over seeded corpora with planted duplicates —
  * verifying the LSH candidate generators against ground truth / the
  * brute-force baseline. */
class DedupAnnSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.session
  import spark.implicits._

  private val rng = new scala.util.Random(42)
  private val vocab = Vector("spark", "data", "row", "group", "join",
    "filter", "sort", "merge", "hash", "scan", "query", "batch", "stream",
    "window", "table", "key", "value", "fast", "slow", "small")

  /** 60 base docs + 20 planted near-dups (one word changed) + 5 exact dups. */
  private lazy val docs = {
    val base = (0 until 60).map { i =>
      (i.toLong, Seq.fill(30)(vocab(rng.nextInt(vocab.size))).mkString(" "))
    }
    val nearDups = (0 until 20).map { i =>
      val (_, text) = base(i)
      val words = text.split(" ")
      words(rng.nextInt(words.length)) = "changed"
      (1000L + i, words.mkString(" "))
    }
    val exactDups = (0 until 5).map(i => (2000L + i, base(i)._2))
    (base ++ nearDups ++ exactDups).toDF("doc_id", "text")
  }

  test("exact dedup groups identical texts and keeps min id") {
    val d = Dedup.exact(docs, "text", "doc_id")
    assert(d.count() == 80) // 85 rows - 5 exact dups
    val dups = d.filter(col("n_copies") === 2).collect()
    assert(dups.length == 5)
    dups.foreach(r => assert(r.getAs[Long]("keep_id") < 5L)) // base kept
  }

  test("minhash LSH finds all planted near-dup pairs (and the exact dups)") {
    val pairs = Dedup.minhashLsh(docs, "text", "doc_id",
        ngram = 3, numHashes = 16, bands = 8, jaccardThreshold = 0.4)
      .collect()
      .map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"))).toSet
    (0 until 20).foreach { i =>
      assert(pairs.contains((i.toLong, 1000L + i)),
        s"missing planted near-dup pair ($i, ${1000 + i})")
    }
    (0 until 5).foreach { i =>
      assert(pairs.contains((i.toLong, 2000L + i)))
    }
  }

  test("simhash hamming distance is small for near-dups, large for random") {
    val pairs = Dedup.simhashNearDup(docs, "text", "doc_id", maxHamming = 16)
      .collect()
      .map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"))).toSet
    val planted = (0 until 20).count(i => pairs.contains((i.toLong, 1000L + i)))
    assert(planted >= 18, s"simhash found only $planted/20 planted pairs")
  }

  test("ngram jaccard join verifies exact similarity") {
    val pairs = Dedup.ngramJaccardJoin(docs, "text", "doc_id",
        ngram = 3, threshold = 0.9)
      .collect()
    // exact dups have jaccard 1.0
    val exact = pairs.filter(_.getAs[Double]("jaccard") == 1.0)
      .map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"))).toSet
    (0 until 5).foreach(i => assert(exact.contains((i.toLong, 2000L + i))))
  }

  test("ngram jaccard df-cap drops ubiquitous shingles, keeps exactness over the rest") {
    import spark.implicits._
    // every doc shares the ubiquitous "spam spam spam" prefix; the real
    // signal is the distinct tail. Uncapped, the prefix shingle posts to
    // every doc (quadratic candidates + inflated jaccard for unrelated
    // pairs); capped, jaccard is exact over the non-ubiquitous space.
    val docs = Seq(
      (1L, "spam spam spam alpha beta gamma delta"),
      (2L, "spam spam spam alpha beta gamma delta"),  // true dup of 1
      (3L, "spam spam spam zeta eta theta iota"))     // unrelated tail
      .toDF("doc_id", "text")
    val capped = Dedup.ngramJaccardJoin(docs, "text", "doc_id",
        ngram = 3, threshold = 0.9, maxDf = Some(2))
      .collect().map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"),
        r.getAs[Double]("jaccard")))
    // (1,2) survive with jaccard 1.0 over their retained shingles;
    // 3 pairs with nothing (its only shared shingles were df=3-capped)
    assert(capped.toSeq == Seq((1L, 2L, 1.0)))
    // sanity: uncapped, the ubiquitous prefix creates cross pairs too
    val uncapped = Dedup.ngramJaccardJoin(docs, "text", "doc_id",
        ngram = 3, threshold = 0.1)
      .collect().map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"))).toSet
    assert(uncapped.contains((1L, 3L)) && uncapped.contains((2L, 3L)))
  }

  test("portable minhash LSH finds exact dups with recall 1 and verifies jaccard") {
    val got = Dedup.minhashLshPortable(docs, "text", "doc_id",
        ngram = 3, numHashes = 8, bands = 4, jaccardThreshold = 0.4)
      .collect()
    val pairs = got.map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"))).toSet
    // identical shingle sets → identical signatures → every band collides
    (0 until 5).foreach(i => assert(pairs.contains((i.toLong, 2000L + i))))
    // planted one-word-changed near-dups: P(collision) ≈ 0.999 each at
    // j≈0.9 with 4 bands of 2 — deterministic hashes, so a fixed outcome
    val planted = (0 until 20).count(i => pairs.contains((i.toLong, 1000L + i)))
    assert(planted >= 17, s"portable minhash found only $planted/20 planted pairs")
    got.foreach(r => assert(r.getAs[Double]("jaccard") >= 0.4))
  }

  /** JVM reference of the portable 60-bit simhash (md5 via MessageDigest),
    * used to pin [[Dedup.simhashPortable]]'s conv/shift/majority plumbing
    * exactly. */
  private def simhashRef(text: String): Long = {
    def h60(s: String): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8"))
      java.lang.Long.parseLong(
        d.take(8).map(b => f"$b%02x").mkString.take(15), 16)
    }
    val hs = text.trim.split("\\s+").map(h60)
    (0 until 60).foldLeft(0L) { (acc, i) =>
      val ones = hs.count(h => ((h >> i) & 1L) == 1L)
      if (2 * ones > hs.length) acc | (1L << i) else acc
    }
  }

  test("portable simhash matches the JVM md5 reference bit-for-bit") {
    val got = Dedup.simhashPortable(docs, "text", "doc_id")
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("simhash"))
      .toMap
    val texts = docs.collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text")).toMap
    assert(got.size == texts.size)
    texts.foreach { case (id, text) =>
      assert(got(id) == simhashRef(text), s"simhash mismatch for doc $id")
    }
    // near-dups land close in hamming space; fingerprints are 60-bit
    got.values.foreach(v => assert(v >= 0L && v < (1L << 60)))
  }

  test("incremental dedup drops new rows duplicating the corpus") {
    import spark.implicits._
    val corpus = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again today"),
      (2L, "pack my box with five dozen liquor jugs for the party"))
      .toDF("doc_id", "text")
    val newBatch = Seq(
      (100L, "the quick brown fox jumps over the lazy dog again today"), // exact
      (101L, "the quick brown fox jumps over the lazy cat again today"), // near
      (102L, "a completely novel document about spark engines and joins"))
      .toDF("doc_id", "text")
    val kept = Dedup.incrementalDedup(newBatch, corpus, "text", "doc_id",
      jaccardThreshold = 0.5)
    assert(kept.collect().map(_.getLong(0)).toSeq == Seq(102L))
    val pairs = Dedup.minhashLshJoin(newBatch, corpus, "text", "doc_id",
      jaccardThreshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((100L, 1L)))
    assert(pairs.contains((101L, 1L)))
  }

  test("embedding near-dup finds identical vectors across LSH buckets") {
    val vecs = (0 until 50).map { i =>
      (i.toLong, Array.fill(16)(rng.nextGaussian().toFloat))
    }
    val planted = (0 until 10).map(i => (500L + i, vecs(i)._2))
    val df = (vecs ++ planted).toDF("vec_id", "embedding")
    val pairs = Dedup.embeddingNearDup(df, "embedding", "vec_id",
        cosineThreshold = 0.999)
      .collect().map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"))).toSet
    (0 until 10).foreach(i => assert(pairs.contains((i.toLong, 500L + i)),
      s"missing identical-vector pair ($i, ${500 + i})"))
  }

  test("LSH top-k achieves high recall@10 against brute force") {
    val vecs = (0 until 200).map { i =>
      (i.toLong, Array.fill(16)(rng.nextGaussian().toFloat))
    }.toDF("vec_id", "embedding")
    val queries = vecs.filter(col("vec_id") < 5)
    val exact = Ann.bruteForceTopK(vecs, queries, "embedding", "vec_id",
        "vec_id", k = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val approx = Ann.lshTopK(vecs, queries, "embedding", "vec_id",
        "vec_id", k = 10, planes = 4, tables = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact & approx).size.toDouble / exact.size
    assert(recall >= 0.5, s"LSH recall@10 = $recall")
  }

  test("brute-force top-k is exact: rank 1 neighbor has the max cosine") {
    val vecs = (0 until 40).map { i =>
      (i.toLong, Array.fill(8)(rng.nextGaussian().toFloat))
    }.toDF("vec_id", "embedding")
    val got = Ann.bruteForceTopK(vecs, vecs.filter(col("vec_id") === 0),
      "embedding", "vec_id", "vec_id", k = 40)
    val rows = got.orderBy("rank").collect()
    assert(rows.length == 39) // self excluded
    val cosines = rows.map(_.getAs[Double]("cosine"))
    assert(cosines.zip(cosines.tail).forall { case (a, b) => a >= b })
  }

  // ---------------------------------------------------- lshFidelity audit

  test("lshFidelity: gold matches the exact-Jaccard join, counts are " +
      "consistent, exact dups are always covered") {
    val t = 0.5
    val row = Dedup.lshFidelity(docs, "text", "doc_id",
      ngram = 3, numHashes = 16, bands = 8, jaccardThreshold = t)
      .collect()(0)
    val nCand = row.getAs[Long]("n_candidates")
    val nGold = row.getAs[Long]("n_gold")
    val nCov = row.getAs[Long]("n_covered")
    assert(nCov <= nGold && nCov <= nCand)
    assert(row.getAs[Double]("precision") == nCov.toDouble / nCand)
    assert(row.getAs[Double]("recall") == nCov.toDouble / nGold)
    // gold agrees with the independently-implemented exact join
    val exactPairs = Dedup.ngramJaccardJoin(docs, "text", "doc_id",
      ngram = 3, threshold = t).count()
    assert(nGold == exactPairs, s"gold $nGold vs exact join $exactPairs")
    // 16 hashes / 8 bands surfaces every planted pair at this spec size
    assert(row.getAs[Double]("recall") == 1.0)
  }

  test("lshFidelity: weaker banding can only lose candidates (recall " +
      "monotone in the band count at fixed rows-per-band ratio)") {
    def recallOf(numHashes: Int, bands: Int): Double =
      Dedup.lshFidelity(docs, "text", "doc_id", ngram = 3,
        numHashes = numHashes, bands = bands, jaccardThreshold = 0.5)
        .collect()(0).getAs[Double]("recall")
    val strong = recallOf(16, 8) // 2-row bands, 8 chances
    val weak = recallOf(8, 1)    // one 8-row band, 1 chance
    assert(strong >= weak, s"recall(16,8)=$strong < recall(8,1)=$weak")
  }

  // ------------------------------------------------------- banding solver

  test("optimalBanding: uses the budget, centers the S-curve near the " +
      "threshold, and moves with it (r13)") {
    val (b, r) = Dedup.optimalBanding(0.5, 16)
    assert(b * r <= 16 && b * r > 8, s"($b,$r) wastes the budget")
    // the S-curve's crossover (1/b)^(1/r) should land near the target
    val cross = math.pow(1.0 / b, 1.0 / r)
    assert(math.abs(cross - 0.5) < 0.25, s"crossover $cross for ($b,$r)")
    // monotone response: a higher threshold needs more rows per band
    // (sharper, right-shifted curve); a lower one needs fewer
    val (_, rHigh) = Dedup.optimalBanding(0.9, 16)
    val (_, rLow) = Dedup.optimalBanding(0.2, 16)
    assert(rHigh >= r && r >= rLow, s"rows not monotone: $rLow, $r, $rHigh")
    // weighting FNs higher can only push toward more-recall bandings
    // (same or lower crossover)
    val (b2, r2) = Dedup.optimalBanding(0.5, 16, fnWeight = 100.0)
    assert(math.pow(1.0 / b2, 1.0 / r2) <= cross + 1e-9)
  }

  test("optimalBanding closes the q144 tune->measure loop: solver-chosen " +
      "params at the SAME hash budget beat the deliberately-weak (2,4) " +
      "banding's measured recall (r13)") {
    val p = SketchParams.q144
    def fidelity(numHashes: Int, bands: Int): (Double, Double) = {
      val row = Dedup.lshFidelity(docs, "text", "doc_id", ngram = p.ngram,
        numHashes = numHashes, bands = bands,
        jaccardThreshold = p.jaccardThreshold).collect()(0)
      (row.getAs[Double]("precision"), row.getAs[Double]("recall"))
    }
    val (bS, rS) = Dedup.optimalBanding(p.jaccardThreshold, p.numHashes)
    assert(bS * rS <= p.numHashes, "solver exceeded the q144 budget")
    val (_, weakRecall) = fidelity(p.numHashes, p.bands)
    val (_, solvedRecall) = fidelity(bS * rS, bS)
    assert(solvedRecall >= weakRecall,
      s"solver ($bS,$rS) recall $solvedRecall < q144's (2,4) $weakRecall")
  }

  // ------------------------------------------------------ containment join

  test("containmentJoin: hand case — directed subset scores 1.0 one way, " +
      "|A∩B|/|B| the other; Jaccard would miss the subset") {
    import spark.implicits._
    // bigram shingles: A = {ab, bc, cd}; B = {ab, bc, cd, de, ef}
    val d = Seq((1L, "a b c d"), (2L, "a b c d e f")).toDF("doc_id", "text")
    val all = Dedup.containmentJoin(d, "text", "doc_id", ngram = 2,
        threshold = 0.0)
      .as[(Long, Long, Double)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    assert(all((1L, 2L)) == 1.0)
    assert(all((2L, 1L)) == 3.0 / 5.0)
    // thresholded: only the contained direction survives
    val t = Dedup.containmentJoin(d, "text", "doc_id", ngram = 2,
        threshold = 0.8)
      .as[(Long, Long, Double)].collect().map(r => (r._1, r._2)).toSet
    assert(t == Set((1L, 2L)))
    // Jaccard at the same corpus: 3/5 — below any near-dup threshold,
    // which is exactly why the directed measure exists
    val j = Dedup.ngramJaccardJoin(d, "text", "doc_id", ngram = 2,
      threshold = 0.7)
    assert(j.count() == 0L)
  }

  test("containmentJoin: maxDf cap drops boilerplate shingles — retained-" +
      "space containment on a template-heavy corpus (r13 default-safe)") {
    import spark.implicits._
    // every doc shares the same boilerplate wrapper (df = 4 for its
    // shingles); docs 1/2 also share a distinctive payload, doc 3's
    // payload is unique, doc 4 is boilerplate-ONLY
    val d = Seq(
      (1L, "terms apply see site for details alpha beta gamma"),
      (2L, "terms apply see site for details alpha beta gamma"),
      (3L, "terms apply see site for details delta epsilon zeta"),
      (4L, "terms apply see site for details")).toDF("doc_id", "text")
    // cap 3 excludes every df-4 boilerplate shingle; the retained space
    // is the payload shingles only, so 1↔2 are mutual exact dups and
    // NOTHING else pairs (uncapped, the shared wrapper would pull
    // 3 and 4 into partial-containment pairs)
    val capped = Dedup.containmentJoin(d, "text", "doc_id", ngram = 3,
        threshold = 0.9, maxDf = Some(3))
      .collect().map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b")))
      .toSet
    assert(capped == Set((1L, 2L), (2L, 1L)), s"capped pairs: $capped")
    // the uncapped opt-in sees the wrapper: boilerplate-only doc 4 is
    // fully contained in every other doc
    val uncapped = Dedup.containmentJoin(d, "text", "doc_id", ngram = 3,
        threshold = 0.9, maxDf = None)
      .collect().map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b")))
      .toSet
    assert(Set((4L, 1L), (4L, 2L), (4L, 3L)).subsetOf(uncapped), uncapped)
    // and the DEFAULT is capped (10k — non-binding here, but Some)
    assert(Dedup.containmentJoin(d, "text", "doc_id", ngram = 3,
      threshold = 0.9).collect().length == uncapped.size)
  }

  test("containmentJoin: exact dups contain each other both ways at 1.0") {
    val both = Dedup.containmentJoin(docs, "text", "doc_id", ngram = 3,
        threshold = 1.0)
      .collect().map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b")))
      .toSet
    (0 until 5).foreach { i =>
      assert(both.contains((i.toLong, 2000L + i)), s"dup $i missing ->")
      assert(both.contains((2000L + i, i.toLong)), s"dup $i missing <-")
    }
  }
}
