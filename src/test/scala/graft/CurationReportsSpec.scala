package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Dedup, TextAnalysis}

/** Source-pair contamination matrix (q164) and the BPE compression
  * report (q165) on hand corpora with known answers. */
class CurationReportsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.session
  import spark.implicits._

  test("q164 semantics: shared trigram counts and directed containment " +
      "on a hand corpus; mirror sources show containment 1.0") {
    val docs = Seq(
      // site_a and mirror carry the identical doc -> containment 1 both ways
      ("site_a", "alpha beta gamma delta epsilon"),
      ("mirror", "alpha beta gamma delta epsilon"),
      // feed shares a 3-token window with site_a plus its own tail
      ("feed", "alpha beta gamma zeta eta theta iota"),
      // clean shares nothing
      ("clean", "one two three four five")).toDF("source", "text")
    val out = Dedup.sourceOverlapMatrix(docs, "text", "source", 3)
      .collect().map(r => ((r.getString(0), r.getString(1)),
        (r.getLong(2), r.getLong(3), r.getLong(4),
          r.getDouble(5), r.getDouble(6)))).toMap
    // site_a: trigrams {abc, bcd, cde} (3); mirror identical
    val mirrorKey = if ("mirror" < "site_a") ("mirror", "site_a")
      else ("site_a", "mirror")
    val (nShared, na, nb, ca, cb) = out(mirrorKey)
    assert(nShared == 3 && na == 3 && nb == 3, s"mirror row: ${out(mirrorKey)}")
    assert(ca == 1.0 && cb == 1.0)
    // feed ∩ site_a = {alpha beta gamma} (1 of feed's 5, 1 of site_a's 3)
    val feedKey = if ("feed" < "site_a") ("feed", "site_a")
      else ("site_a", "feed")
    val (fs, fa, fb, fca, fcb) = out(feedKey)
    assert(fs == 1 && fa == 5 && fb == 3, s"feed row: ${out(feedKey)}")
    assert(math.abs(fca - 0.2) < 1e-12 && math.abs(fcb - 1.0 / 3) < 1e-12)
    // clean never pairs
    assert(!out.keys.exists(k => k._1 == "clean" || k._2 == "clean"))
  }

  test("q170 semantics: a source-exclusive term tops its source's list " +
      "with the exact rate ratio; shared vocabulary scores ~quant") {
    import graft.operators.TextAnalysis
    // two sources, 'zebra' exclusive to src_a (6 of src_a's 12 tokens);
    // filler shared evenly
    val docs = Seq(
      ("src_a", "zebra zebra zebra zebra zebra zebra fill fill fill fill fill fill"),
      ("src_b", "fill fill fill fill fill fill fill fill fill fill fill fill"))
      .toDF("source", "text")
    val out = TextAnalysis.distinctiveTerms(docs, "text", "source",
        k = 2, quant = 1000000L, minCount = 5L)
      .collect().map(r => ((r.getString(0), r.getLong(1)),
        (r.getString(2), r.getLong(3), r.getLong(4)))).toMap
    // zebra: tf_grp=6, tf_all=6, t_grp=12, t_all=24 -> ratio = 2.0·quant
    assert(out(("src_a", 1L)) == (("zebra", 6L, 2000000L)), out.toString)
    // fill in src_b: 12/18 vs 12/24 share -> (q·12·24)//(18·12) = 1333333
    assert(out(("src_b", 1L)) == (("fill", 12L, 1333333L)), out.toString)
  }

  test("q171 semantics: identical snapshots drift zero; a token swap " +
      "concentrates chi2 in the moved token's bucket") {
    import graft.operators.Stats
    val same = Seq((0L, "alpha beta gamma"), (1L, "alpha beta gamma"))
      .toDF("doc_id", "text")
    val zero = Stats.tokenDrift(same, "text", col("doc_id") % 2 === 0, 16)
      .collect()
    assert(zero.nonEmpty && zero.forall(_.getDouble(3) == 0.0),
      zero.map(_.toSeq).mkString(", "))
    // snapshot B replaces 'gamma' with 'delta' -> exactly the buckets of
    // gamma/delta carry the drift (unless they hash-collide)
    val moved = Seq((0L, "alpha beta gamma gamma"), (1L, "alpha beta delta delta"))
      .toDF("doc_id", "text")
    val rows = Stats.tokenDrift(moved, "text", col("doc_id") % 2 === 0, 64)
      .collect().map(r => (r.getLong(0), r.getDouble(3)))
    val drifted = rows.filter(_._2 > 0).map(_._1).toSet
    assert(drifted.size == 2, s"drift buckets: ${rows.mkString(", ")}")
    val calm = rows.filter(_._2 == 0.0)
    assert(calm.nonEmpty, "shared tokens must not drift")
  }

  test("q173 semantics: Poisson-bootstrap replicates resample ~N rows, " +
      "their means bracket the true mean, and the CI is nondegenerate") {
    import graft.operators.Sampling
    val docs = Tables.load(spark, "/root/testdata/sf0.01", "documents")
      .select(col("doc_id"), col("n_chars"))
    val truth = docs.agg(avg(col("n_chars"))).head().getDouble(0)
    val n = docs.count()
    val reps = Sampling.poissonBootstrap(docs, "n_chars", "doc_id", 32)
      .collect().map(r => (r.getLong(1), r.getDouble(3)))
    assert(reps.length == 32)
    val meanNeff = reps.map(_._1).sum.toDouble / reps.length
    assert(math.abs(meanNeff / n - 1.0) < 0.05,
      s"mean effective n $meanNeff vs corpus $n")
    val means = reps.map(_._2).sorted
    assert(means.head < truth && truth < means.last,
      s"replicate range [${means.head}, ${means.last}] misses truth $truth")
    assert(means.last - means.head > 0.0, "degenerate bootstrap spread")
    // per-row weights live in the CDF's 0..7 support: n_eff can never
    // exceed 7N
    assert(reps.forall(_._1 <= 7 * n))
  }

  test("q172 semantics: confusion-matrix fractions sum to 1 per true " +
      "class and counts sum to the corpus") {
    val rows = SparkEntry.queries("q172_langid_confusion")(
      spark, "/root/testdata/sf0.01")
      .collect().map(r => (r.getString(0), r.getLong(2), r.getDouble(3)))
    val byLang = rows.groupBy(_._1)
    byLang.foreach { case (lang, cells) =>
      assert(math.abs(cells.map(_._3).sum - 1.0) < 1e-9,
        s"$lang fractions: ${cells.map(_._3).sum}")
    }
    assert(rows.map(_._2).sum == 500L, s"total ${rows.map(_._2).sum}")
  }

  test("q174 semantics: the MAD gate flags exactly the planted giants " +
      "even at 20% contamination, where a mean±3σ gate has broken down") {
    import graft.operators.Stats
    // 40 regular docs around 100 chars + 10 giants at 5000 (20% mass)
    val docs = ((0 until 40).map(i => (i.toLong, "g", 95L + (i % 11))) ++
      (100 until 110).map(i => (i.toLong, "g", 5000L)))
      .toDF("doc_id", "lang", "n_chars")
    val out = Stats.madOutliers(docs, "n_chars", "doc_id", "lang", 3.0)
      .collect().map(r => r.getLong(0) -> r.getBoolean(5)).toMap
    assert((100L until 110L).forall(out(_)), "a giant escaped the MAD gate")
    assert((0L until 40L).forall(!out(_)), "a regular doc was flagged")
    // the comparison point: mean/σ absorb the contamination — the
    // classic z-gate flags NOTHING here (all z-scores < 3)
    val vals = docs.collect().map(_.getLong(2).toDouble)
    val mean = vals.sum / vals.length
    val sigma = math.sqrt(vals.map(v => (v - mean) * (v - mean)).sum / vals.length)
    assert(vals.forall(v => math.abs(v - mean) <= 3 * sigma),
      "expected the z-gate to break down on 20% contamination")
  }

  test("q175 semantics: every near-dup cluster lands in ONE fold and " +
      "folds partition the corpus") {
    val rows = SparkEntry.queries("q175_kfold_split")(
      spark, "/root/testdata/sf0.01")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.nonEmpty)
    rows.groupBy(_._2).foreach { case (cluster, members) =>
      assert(members.map(_._3).distinct.length == 1,
        s"cluster $cluster straddles folds")
    }
    val folds = rows.map(_._3).toSet
    assert(folds.subsetOf((0L until 5L).toSet) && folds.size >= 3,
      s"fold values $folds")
    assert(rows.map(_._1).distinct.length == rows.length, "duplicate docs")
    // real multi-member clusters exist (the guard is doing work)
    assert(rows.groupBy(_._2).values.exists(_.size >= 2))
  }

  test("q176 semantics: HRW movers only ever land on the NEW worker, " +
      "movement mass ~1/(n+1), and load stays balanced") {
    val rows = SparkEntry.queries("q176_rendezvous")(
      spark, "/root/testdata/sf0.01")
      .collect().map(r => (r.getString(1), r.getString(2), r.getBoolean(3)))
    val moved = rows.filter(_._3)
    assert(moved.nonEmpty && moved.forall(_._2 == "w5"),
      "a mover landed somewhere other than the added worker")
    val frac = moved.length.toDouble / rows.length
    assert(frac > 0.10 && frac < 0.24, s"movement fraction $frac vs ~1/6")
    // stayers keep their exact old assignment
    rows.filterNot(_._3).foreach { case (b, a, _) => assert(b == a) }
    // balance: no worker holds more than 2x the fair share after resize
    val byW = rows.groupBy(_._2).view.mapValues(_.size).toMap
    assert(byW.size == 6 && byW.values.max <= 2 * rows.length / 6,
      s"post-resize load: $byW")
  }

  test("q177 semantics: precomposed and decomposed variants collapse to " +
      "ONE fingerprint after NFC — exact dedup sees through encodings") {
    val rows = SparkEntry.queries("q177_nfc_normalize")(
      spark, "/root/testdata/sf0.01")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getBoolean(3), r.getString(4)))
    val (changed, kept) = rows.partition(_._4)
    assert(changed.length == 250 && kept.length == 250)
    // the decomposed half loses exactly one char (combining mark folds)
    changed.foreach { case (_, raw, nfc, _, _) => assert(raw == nfc + 1) }
    kept.foreach { case (_, raw, nfc, _, _) => assert(raw == nfc) }
    // cross-variant collapse: 500 rows, 250 distinct fingerprints, and
    // every fingerprint is shared by one changed + one unchanged row
    val byFp = rows.groupBy(_._5)
    assert(byFp.size == 250, s"${byFp.size} fingerprints")
    byFp.values.foreach { g =>
      assert(g.length == 2 && g.count(_._4) == 1,
        s"fingerprint group not a (variant, canonical) pair: $g")
    }
  }

  test("q178 semantics: weighted Jaccard diverges from set Jaccard in " +
      "BOTH directions — mass imbalance splits identical vocabularies, " +
      "shared heavy terms join different ones") {
    import graft.operators.Dedup
    val docs = Seq(
      (1L, "x x x x x x x x y z"),   // heavy x + y z
      (2L, "x y z"),                 // same SET as 1, different mass
      (3L, "x x x x x a b"),         // shares heavy x with 4
      (4L, "x x x x x c d"))         // rare tails differ
      .toDF("doc_id", "text")
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2)))
        .toMap
    val weighted = pairs(Dedup.weightedJaccardJoin(docs, "text", "doc_id",
      cap = 5, numHashes = 16, bands = 16, jaccardThreshold = 0.0))
    val plain = pairs(Dedup.minhashLshPortable(docs, "text", "doc_id",
      ngram = 1, numHashes = 16, bands = 16, jaccardThreshold = 0.0))
    // (1,2): same vocabulary -> set J = 1.0; capped mass 3/7 weighted
    assert(plain((1L, 2L)) == 1.0)
    assert(math.abs(weighted((1L, 2L)) - 3.0 / 7.0) < 1e-12,
      s"weighted(1,2) = ${weighted((1L, 2L))}")
    // (3,4): shared heavy term -> weighted 5/9 vs set 1/5
    // ({x,a,b} vs {x,c,d}: 1 shared of 5 distinct)
    assert(math.abs(weighted((3L, 4L)) - 5.0 / 9.0) < 1e-12,
      s"weighted=$weighted plain=$plain")
    assert(math.abs(plain((3L, 4L)) - 1.0 / 5.0) < 1e-12)
    // at threshold 0.5 the two screens make OPPOSITE keep decisions
    assert(weighted((1L, 2L)) < 0.5 && plain((1L, 2L)) >= 0.5)
    assert(weighted((3L, 4L)) >= 0.5 && plain((3L, 4L)) < 0.5)
  }

  test("q165 semantics: chars-per-token under a hand merge table; a " +
      "merge-covered language compresses better than an uncovered one") {
    val merges = Seq(("a", "b"), ("ab", "c"))
    val docs = Seq(
      (1L, "en", "web", "abc abc"),      // each word -> 1 token 'abc'
      (2L, "zz", "web", "xyz xyz")       // no merges apply -> 3 tokens each
    ).toDF("doc_id", "lang", "source", "text")
    val counts = TextAnalysis.bpeTokens(
        docs.select(col("doc_id"), col("text")), "text", "doc_id", merges)
      .groupBy("id").agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(counts(1L) == 2L, s"covered doc tokens: ${counts(1L)}")
    assert(counts(2L) == 6L, s"uncovered doc tokens: ${counts(2L)}")
    // the q165 grouping math: chars(norm) / tokens
    // "abc abc" = 7 chars / 2 tokens = 3.5; "xyz xyz" = 7 / 6
    assert(7.0 / counts(1L) > 7.0 / counts(2L))
  }
}
