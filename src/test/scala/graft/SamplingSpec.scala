package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.BottomK
import graft.operators.Sampling

/** BottomK TypedImperativeAggregate + the deterministic sampling built on
  * it: bounded per-group state, merge correctness across partitions,
  * reproducibility. */
class SamplingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.session

  test("bottom_k returns exactly the k smallest keys, sorted") {
    import spark.implicits._
    val df = (1 to 1000).map(i => (i.toLong, s"v$i")).toDF("key", "value")
      .repartition(8) // force partial buffers + merges
    val got = df.agg(BottomK.bottom_k(col("key"), col("value"), 5).as("s"))
      .select(explode(col("s")).as("e"))
      .select(col("e.key"), col("e.value"))
      .collect().map(r => (r.getLong(0), r.getString(1)))
    assert(got.toSeq == (1 to 5).map(i => (i.toLong, s"v$i")))
  }

  test("deterministic sample is reproducible and uniform-ish") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.01")
    val s1 = Sampling.deterministicSample(docs, "doc_id", 50)
      .collect().map(_.getLong(0)).sorted.toSeq
    val s2 = Sampling.deterministicSample(docs, "doc_id", 50)
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(s1 == s2)
    assert(s1.length == 50)
    // different seed → different sample
    val s3 = Sampling.deterministicSample(docs, "doc_id", 50, seed = 7)
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(s1 != s3)
    // uniform-ish: the sample spans the id range, not one corner
    assert(s1.head < 100 || s1.last > 400)
  }

  test("portable-key stratified sample matches a JVM md5 reference") {
    def keyRef(id: Long): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s"$id:42".getBytes("UTF-8"))
      java.lang.Long.parseLong(
        d.take(8).map(b => f"$b%02x").mkString.take(15), 16)
    }
    val docs = Tables.documents(spark, "/root/testdata/sf0.01")
    val got = Sampling.stratifiedSampleByKey(docs, "lang", "doc_id", 10,
        Sampling.portableKey(col("doc_id"), seed = 42))
      .collect().map(r => r.getString(0) -> r.getLong(1))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val want = docs.select("lang", "doc_id").collect()
      .map(r => r.getString(0) -> r.getLong(1))
      .groupBy(_._1).view.mapValues(
        _.map(_._2).sortBy(id => (keyRef(id), id)).take(10).toSet).toMap
    assert(got == want)
  }

  test("bottom_k resolves forced key collisions by value, for any partitioning") {
    import spark.implicits._
    // ALL keys collide: the pick is decided purely by the value's
    // lexicographic order — q47's oracle parity must not rest on the
    // 60-bit md5 key being collision-free (ADVICE r2 / VERDICT r3)
    val rows = scala.util.Random.shuffle((1 to 500).toList)
      .map(i => (7L, f"v$i%03d"))
    for (parts <- Seq(1, 3, 16)) {
      val got = rows.toDF("key", "value").repartition(parts)
        .agg(BottomK.bottom_k(col("key"), col("value"), 5).as("s"))
        .select(explode(col("s")).as("e"))
        .select(col("e.key"), col("e.value"))
        .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
      assert(got == (1 to 5).map(i => (7L, f"v$i%03d")), s"parts=$parts")
    }
    // partial collisions: keys from a 2-value domain, ties resolve by value
    // within the colliding key before the next key is considered
    val mixed = (1 to 100).map(i => ((i % 2).toLong, f"v$i%03d"))
    val got2 = mixed.toDF("key", "value").repartition(7)
      .agg(BottomK.bottom_k(col("key"), col("value"), 3).as("s"))
      .select(explode(col("s")).as("e"))
      .select(col("e.key"), col("e.value"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(got2 == mixed.sorted.take(3))
    // null values sort before real values under an equal key (can never be
    // displaced by a non-null tie)
    val withNull = Seq((1L, null: String), (1L, "a"), (1L, "b"), (0L, "z"))
    val got3 = withNull.toDF("key", "value").repartition(2)
      .agg(BottomK.bottom_k(col("key"), col("value"), 3).as("s"))
      .select(explode(col("s")).as("e"))
      .select(col("e.key"), col("e.value"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(got3 == Seq((0L, "z"), (1L, null), (1L, "a")))
  }

  test("stratified sample keeps k per group") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.01")
    val got = Sampling.stratifiedSample(docs, "lang", "doc_id", 10)
    val counts = got.groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts.values.forall(_ == 10), counts.toString)
    assert(counts.keySet == Set("en", "es", "de", "fr", "zh"))
  }

  test("leakage-safe split: cluster members share one split; singletons " +
      "hash on their own id; every doc is assigned") {
    import spark.implicits._
    val corpus = Seq(1L, 2L, 3L, 4L, 5L, 6L).toDF("doc_id")
    val pairs = Seq((1L, 2L), (2L, 3L), (5L, 6L)).toDF("id_a", "id_b")
    val got = Sampling.leakageSafeSplit(corpus, "doc_id",
        pairs, "id_a", "id_b", valPermille = 300, testPermille = 300)
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getString(2))).toMap
    assert(got.keySet == Set(1L, 2L, 3L, 4L, 5L, 6L))
    // clusters {1,2,3} and {5,6} are atomic: one (cluster, split) each
    assert(Set(got(1L), got(2L), got(3L)).size == 1 && got(1L)._1 == 1L)
    assert(got(5L) == got(6L) && got(5L)._1 == 5L)
    assert(got(4L)._1 == 4L)
    // the bucket matches the portable-key permille reference
    got.values.toSet[(Long, String)].foreach { case (cluster, split) =>
      val md5 = java.security.MessageDigest.getInstance("MD5")
        .digest(s"$cluster:17".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      val b = java.lang.Long.parseLong(md5.take(15), 16) % 1000
      val want = if (b < 300) "test" else if (b < 600) "val" else "train"
      assert(split == want, s"cluster $cluster bucket $b: $split != $want")
    }
  }

  test("leakage-safe split: NO minhash near-dup pair straddles a split " +
      "boundary on the synthetic near-dup corpus") {
    val p = SketchParams.q49
    val dir = "/root/testdata/sf0.001"
    val corpus = SparkEntry.nearDupCorpus(spark, dir)
      .filter(col("doc_id") % p.corpusMod === 0)
    val pairs = graft.operators.Dedup.minhashLshPortable(corpus, "text",
      "doc_id", ngram = p.ngram, numHashes = p.numHashes, bands = p.bands,
      jaccardThreshold = p.jaccardThreshold)
    val split = Sampling.leakageSafeSplit(corpus, "doc_id",
      pairs, "id_a", "id_b", maxIter = 25)
    val straddlers = pairs
      .join(split.select(col("doc_id").as("id_a"), col("split").as("sa")),
        Seq("id_a"))
      .join(split.select(col("doc_id").as("id_b"), col("split").as("sb")),
        Seq("id_b"))
      .filter(col("sa") =!= col("sb"))
    assert(pairs.count() > 0, "corpus must actually contain near-dup pairs")
    assert(straddlers.count() == 0, "near-dup pair crossed a split boundary")
    // the split partitions the corpus exactly (every doc assigned once)
    assert(split.count() == corpus.count())
  }

  test("leakage-safe split rejects thresholds exceeding 1000 permille") {
    import spark.implicits._
    val corpus = Seq(1L).toDF("doc_id")
    val pairs = Seq.empty[(Long, Long)].toDF("id_a", "id_b")
    intercept[IllegalArgumentException] {
      Sampling.leakageSafeSplit(corpus, "doc_id", pairs, "id_a", "id_b",
        valPermille = 600, testPermille = 600)
    }
  }
}
