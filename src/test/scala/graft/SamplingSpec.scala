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

  test("prioritySample: k rows, threshold rule, JVM md5 reference parity") {
    import spark.implicits._
    val n = 60
    val k = 10
    val seed = 7
    val df = (1L to n.toLong).map(i => (i, (i % 13 + 1).toDouble))
      .toDF("id", "w")
    val got = Sampling.prioritySample(df, "id", "w", k, seed).collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2), r.getDouble(3)))
      .sortBy(_._1)
    assert(got.length == k)
    // replay the priorities with a JVM md5 reference
    def key(id: Long): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(s"$id:$seed".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.substring(0, 15), 16)
    }
    val pri = (1L to n.toLong).map { i =>
      val w = (i % 13 + 1).toDouble
      (i, w, w / ((key(i) + 1L).toDouble / 1152921504606846976.0))
    }
    val ranked = pri.sortBy { case (id, _, p) => (-p, id) }
    val expectIds = ranked.take(k).map(_._1).toSet
    val tau = ranked(k)._3 // (k+1)-th priority
    assert(got.map(_._1).toSet == expectIds)
    got.foreach { case (id, w, p, est) =>
      val ref = pri.find(_._1 == id).get
      assert(p == ref._3, s"priority mismatch for $id")
      assert(est == math.max(w, tau), s"est_weight mismatch for $id")
    }
    // subset-sum sanity: Σ est_weight over the sample is within the
    // estimator's plausible band of the true total (deterministic run,
    // so this is a fixed-number check, not a statistical one)
    val total = pri.map(_._2).sum
    val estTotal = got.map(_._4).sum
    assert(estTotal > 0.3 * total && estTotal < 3.0 * total)
  }

  test("prioritySampleByGroup: each group's sample IS the global " +
      "operator run on that group alone") {
    import spark.implicits._
    // 3 groups of different sizes (8, 3, 25) around k = 5: a short
    // group (τ = 0), an exact-k+ group, and a long group
    val df = ((1L to 8L).map(i => ("a", i, (i % 5 + 1).toDouble)) ++
      (101L to 103L).map(i => ("b", i, 2.0)) ++
      (201L to 225L).map(i => ("c", i, (i % 7 + 1).toDouble)))
      .toDF("g", "id", "w")
    val k = 5
    val got = Sampling.prioritySampleByGroup(df, "g", "id", "w", k)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4)))
    assert(got.count(_._1 == "a") == k)
    assert(got.count(_._1 == "b") == 3) // short group: all rows
    assert(got.count(_._1 == "c") == k)
    for (g <- Seq("a", "b", "c")) {
      val perGroup = got.filter(_._1 == g)
        .map(t => (t._2, t._3, t._4, t._5)).toSet
      val global = Sampling
        .prioritySample(df.filter(col("g") === g), "id", "w", k)
        .collect()
        .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2),
          r.getDouble(3))).toSet
      assert(perGroup == global, s"group $g diverged from global form")
    }
    // short group's τ = 0 ⇒ est_weight degenerates to the true weight
    assert(got.filter(_._1 == "b").forall(t => t._5 == t._3))
  }

  test("prioritySample rejects NULL and non-positive weights up front") {
    import spark.implicits._
    // 3 valid rows, one zero, one negative, one NULL: with k = 3 every
    // valid row is sampled (τ = 0, no (k+1)-th) and the bad rows never
    // appear — previously a NULL weight could slip into a short sample
    // and a w ≤ 0 row could be drawn, biasing the estimator
    val df = Seq((1L, Some(2.0)), (2L, Some(3.0)), (3L, Some(4.0)),
      (4L, Some(0.0)), (5L, Some(-1.0)), (6L, None))
      .toDF("id", "w")
    val got = Sampling.prioritySample(df, "id", "w", 3).collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(3)))
    assert(got.map(_._1).toSet == Set(1L, 2L, 3L))
    // τ = 0 ⇒ est_weight degenerates to the true weight: exact total
    assert(got.map(_._3).sum == 9.0)
  }

  // ------------------------------------------------------- mixture plan

  test("mixturePlan reproduces the hand-computed plan: rates for " +
      "over-represented domains, epochs for under-represented ones") {
    import spark.implicits._
    // budget 1000: en target 500 of 1000 -> rate 0.5, 1 epoch;
    // de target 400 of 200 -> rate 1.0, 2 epochs; xx not in the recipe
    // -> explicit zero row; yy has zero inventory -> zero row
    val inv = Seq(("en", 1000L), ("de", 200L), ("xx", 50L), ("yy", 0L))
      .toDF("domain", "n_tokens")
    val plan = operators.Sampling.mixturePlan(inv, "domain", "n_tokens",
        Map("en" -> 500000L, "de" -> 400000L), budgetTokens = 1000L)
      .as[(String, Long, Long, Long, Double, Long)].collect()
      .map(r => r._1 -> r).toMap
    assert(plan("en") == (("en", 1000L, 500000L, 500L, 0.5, 1L)))
    assert(plan("de") == (("de", 200L, 400000L, 400L, 1.0, 2L)))
    assert(plan("xx") == (("xx", 50L, 0L, 0L, 0.0, 0L)))
    assert(plan("yy") == (("yy", 0L, 0L, 0L, 0.0, 0L)))
  }

  test("mixturePlan target stays exact past the naive-product overflow " +
      "range, and rejects non-mixtures") {
    import spark.implicits._
    // 1e13 * 999999 overflows BIGINT; the split floor must not
    val inv = Seq(("en", 1L)).toDF("domain", "n_tokens")
    val t = operators.Sampling.mixturePlan(inv, "domain", "n_tokens",
        Map("en" -> 999999L), budgetTokens = 10000000000000L)
      .select("target_tokens").as[Long].collect()(0)
    assert(t == 9999990000000L)
    assertThrows[IllegalArgumentException] {
      operators.Sampling.mixturePlan(inv, "domain", "n_tokens",
        Map("en" -> 600000L, "de" -> 600000L), budgetTokens = 10L)
    }
    assertThrows[IllegalArgumentException] {
      operators.Sampling.mixturePlan(inv, "domain", "n_tokens",
        Map("en" -> 1000001L), budgetTokens = 10L)
    }
  }

  test("mixturePlan composes with mixtureSample: executing the planned " +
      "rates lands each domain near its token target") {
    import spark.implicits._
    val docs = (0L until 4000L).map { i =>
      (i, if (i % 4 == 0L) "en" else "de", 10L) }
      .toDF("doc_id", "lang", "n_tokens")
    val inv = docs.groupBy(col("lang"))
      .agg(org.apache.spark.sql.functions.sum(col("n_tokens"))
        .as("n_tokens"))
    // en: 10k tokens, de: 30k tokens; budget 20k split evenly -> en is
    // up-sampled (rate 1, 1 epoch at this weight), de down-sampled
    val plan = operators.Sampling.mixturePlan(inv, "lang", "n_tokens",
        Map("en" -> 500000L, "de" -> 500000L), budgetTokens = 20000L)
      .collect().map(r => r.getAs[String]("lang") ->
        (r.getAs[Double]("sample_rate"), r.getAs[Long]("target_tokens")))
      .toMap
    assert(plan("en")._1 == 1.0)
    val rates = plan.map { case (g, (rate, _)) => g -> rate }
    val sampled = operators.Sampling.mixtureSample(docs, "doc_id",
        "lang", rates)
      .groupBy(col("lang"))
      .agg(org.apache.spark.sql.functions.sum(col("n_tokens")).as("got"))
      .collect().map(r => r.getAs[String]("lang") -> r.getAs[Long]("got"))
      .toMap
    assert(sampled("en") == 10000L) // rate 1.0 keeps everything
    val deTarget = plan("de")._2.toDouble
    assert(math.abs(sampled("de") - deTarget) / deTarget < 0.1,
      s"de realized ${sampled("de")} vs target $deTarget")
  }

  test("tokenBudgetAllocate: waterfilling takes small groups whole and " +
      "splits the surplus equally; kept docs are an md5-prefix within " +
      "their group's budget") {
    import spark.implicits._
    // groups: tiny (100), small (300), big (5000), huge (5000) tokens;
    // budget 2000 -> r1 share 500: tiny+small whole (400); r2 share
    // 800 over {big, huge}: both get 800
    val docs = (
      (1 to 2).map(i => (i.toLong, "tiny", 50L)) ++
      (11 to 13).map(i => (i.toLong, "small", 100L)) ++
      (21 to 70).map(i => (i.toLong, "big", 100L)) ++
      (81 to 130).map(i => (i.toLong, "huge", 100L))
    ).toDF("doc_id", "grp", "n_tokens")
    val out = Sampling.tokenBudgetAllocate(docs, "grp", "n_tokens",
        "doc_id", 2000L)
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getBoolean(5)))
    assert(out.length == docs.count())
    val budgets = out.map(r => r._2 -> r._4).toMap
    assert(budgets == Map("tiny" -> 100L, "small" -> 300L,
      "big" -> 800L, "huge" -> 800L), budgets.toString)
    // whole low-resource groups kept entirely
    assert(out.filter(r => r._2 == "tiny" || r._2 == "small")
      .forall(_._6))
    out.groupBy(_._2).foreach { case (g, rows) =>
      val kept = rows.filter(_._6)
      // never over budget
      assert(kept.map(_._3).sum <= budgets(g))
      // kept = a PREFIX of the md5 order: every kept offset precedes
      // every dropped offset
      val maxKept = if (kept.isEmpty) -1L else kept.map(_._5).max
      rows.filterNot(_._6).foreach { r =>
        assert(r._5 > maxKept, s"group $g: dropped doc before a kept one")
      }
      // greedy: the first dropped doc would not have fit
      rows.filterNot(_._6).sortBy(_._5).headOption.foreach { r =>
        assert(kept.map(_._3).sum + r._3 > budgets(g),
          s"group $g dropped a doc that fit")
      }
    }
    // budget >= corpus: everything kept, one round
    val all = Sampling.tokenBudgetAllocate(docs, "grp", "n_tokens",
      "doc_id", 100000L).collect()
    assert(all.forall(_.getBoolean(5)))
  }

  test("temperaturePlan: targets proportional to sqrt(n) (alpha=1/2), " +
      "flattening the mix; alpha=1/4 flattens harder; degenerate " +
      "cases exact") {
    import spark.implicits._
    // inventories 100 / 10000: sqrt ratio 1:10 (raw ratio 1:100)
    val inv = Seq(("lo", 100L), ("hi", 10000L)).toDF("lang", "n_tokens")
    val half = Sampling.temperaturePlan(inv, "lang", "n_tokens",
        budgetTokens = 1100L, alphaHalvings = 1, quant = 1000L)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getDouble(4), r.getLong(5))).sortBy(_._1).toSeq
    // s_q: floor(10*1000)=10000, floor(100*1000)=100000; S=110000
    // targets: 1100*10000/110000=100, 1100*100000/110000=1000
    assert(half == Seq(
      ("hi", 10000L, 100000L, 1000L, 0.1, 1L),
      ("lo", 100L, 10000L, 100L, 1.0, 1L)), half.toString)
    val quarter = Sampling.temperaturePlan(inv, "lang", "n_tokens",
        budgetTokens = 1100L, alphaHalvings = 2, quant = 1000L)
      .collect().map(r => (r.getString(0), r.getLong(3))).toMap
    // sqrt(sqrt) ratio 1:sqrt(10)≈3.16 — lo's share grows vs alpha=1/2
    assert(quarter("lo") > 100L && quarter("hi") < 1000L,
      s"alpha=1/4 must flatten harder: $quarter")
    assert(quarter("lo") + quarter("hi") <= 1100L)
    // zero inventory group and zero total budget
    val z = Sampling.temperaturePlan(
        Seq(("a", 0L)).toDF("lang", "n_tokens"), "lang", "n_tokens",
        1000L, 1, 1000L)
      .collect().map(r => (r.getLong(3), r.getDouble(4), r.getLong(5)))
    assert(z.toSeq == Seq((0L, 0.0, 0L)))
  }

  test("temperaturePlan invariants on a random-ish inventory: targets " +
      "never exceed the budget in sum, order follows inventory order, " +
      "and alpha=1/4 always flattens at least as hard as alpha=1/2") {
    import spark.implicits._
    val inv = (1 to 12).map(i => (s"g$i", (i.toLong * i * 997) % 50021))
      .toDF("lang", "n_tokens")
    def plan(k: Int) = Sampling.temperaturePlan(inv, "lang", "n_tokens",
        budgetTokens = 30000L, alphaHalvings = k)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(3)))
    val h = plan(1); val q = plan(2)
    assert(h.map(_._3).sum <= 30000L && q.map(_._3).sum <= 30000L,
      "integer shares must never overshoot the budget")
    Seq(h, q).foreach { p =>
      p.sortBy(_._2).sliding(2).foreach { w =>
        if (w.size == 2) assert(w(0)._3 <= w(1)._3,
          "a bigger inventory must never get a smaller target") }
    }
    // flattening: the smallest group's share of the allocated budget
    // is weakly larger under the flatter alpha
    def shareOfMin(p: Array[(String, Long, Long)]) = {
      val m = p.minBy(_._2)
      m._3.toDouble / p.map(_._3).sum.toDouble
    }
    assert(shareOfMin(q) >= shareOfMin(h) - 1e-12,
      s"alpha=1/4 must flatten at least as hard: ${shareOfMin(q)} vs " +
        s"${shareOfMin(h)}")
  }

  test("tokenBudgetAllocate: empty input returns an empty frame with " +
      "the output schema (no groups is not an error)") {
    import spark.implicits._
    val docs = Seq.empty[(Long, String, Long)]
      .toDF("doc_id", "grp", "n_tokens")
    val out = Sampling.tokenBudgetAllocate(docs, "grp", "n_tokens",
      "doc_id", 1000L)
    assert(out.columns.toSeq == Seq("doc_id", "grp", "n_tokens",
      "group_budget", "tok_offset", "kept"))
    assert(out.count() == 0L)
  }

  test("tokenBudgetAllocate: the one-scan grouped prefix matches a " +
      "per-group naive window at every partition count") {
    import spark.implicits._
    val docs = (1 to 200).map { i =>
      (i.toLong, s"g${i % 7}", (i % 13 + 1).toLong)
    }.toDF("doc_id", "grp", "n_tokens")
    // naive reference: per group, sort by (md5 key, id), running sum
    val rows = docs.select(col("doc_id"), col("grp"),
        col("n_tokens"),
        Sampling.portableKey(col("doc_id"), 13).as("__ord"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getLong(3)))
    // the one-scan rewrite's correctness hinges on the range-partition /
    // per-(pid, group) offset stitching being independent of the
    // partition count (ADVICE r17), so the equivalence is asserted UNDER
    // a sweep of spark.sql.shuffle.partitions — including 1 (everything
    // in one partition: offsets must still stitch) and 211 (more
    // partitions than rows: most partitions empty)
    val before = spark.conf.get("spark.sql.shuffle.partitions")
    try Seq(1, 3, 17, 211).foreach { parts =>
      spark.conf.set("spark.sql.shuffle.partitions", parts.toString)
      val got = Sampling.tokenBudgetAllocate(docs, "grp", "n_tokens",
          "doc_id", 500L)
        .collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
          r.getLong(3), r.getLong(4), r.getBoolean(5)))
        .sortBy(_._1)
      val budgets = got.map(r => r._2 -> r._4).toMap
      val expect = rows.groupBy(_._2).toSeq.flatMap { case (g, rs) =>
        var acc = 0L
        rs.sortBy(r => (r._4, r._1)).map { r =>
          val off = acc; acc += r._3
          (r._1, g, r._3, budgets(g), off, off + r._3 <= budgets(g))
        }
      }.sortBy(_._1)
      assert(got.toSeq == expect,
        s"one-scan output diverged at shuffle.partitions=$parts")
    } finally spark.conf.set("spark.sql.shuffle.partitions", before)
  }

  test("dedup-aware temperature plan (q236 semantics): a duplicated " +
      "source plans on its UNIQUE token mass, a clean source on its " +
      "full mass") {
    import spark.implicits._
    def seqText(from: Int, n: Int): String =
      (from until from + n).map(i => s"w$i").mkString(" ")
    // source A: two byte-identical 20-token docs (the second is one
    // duplicated span end to end); source B: two distinct 20-token docs
    val docs = Seq(
      (1L, "A", seqText(0, 20)),
      (2L, "A", seqText(0, 20)),
      (3L, "B", seqText(100, 20)),
      (4L, "B", seqText(200, 20)))
      .toDF("doc_id", "source", "text")
    val minSpan = 5
    val dd = graft.operators.SuffixArray.exactSubstrDedup(
      docs, "text", "doc_id", minSpan, rounds = 3, baseSpan = 4)
    val inv = dd
      .join(docs.select(col("doc_id"), col("source")), Seq("doc_id"))
      .groupBy(col("source"))
      .agg(sum(col("n_tokens")).as("raw_tokens"),
        sum(col("n_tokens") - col("n_dropped")).as("eff_tokens"))
    val rows = inv.collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    // A keeps doc 1 whole, doc 2 is one merged removed interval
    assert(rows("A") == ((40L, 20L)), rows("A").toString)
    assert(rows("B") == ((40L, 40L)), rows("B").toString)
    val plan = Sampling.temperaturePlan(
        inv.select(col("source"), col("eff_tokens")), "source",
        "eff_tokens", budgetTokens = 30L, alphaHalvings = 1)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(3)))).toMap
    // sqrt flattening over EFFECTIVE mass: s_A = sqrt(20), s_B =
    // sqrt(40) -> A's target strictly below B's, and both nonzero --
    // a raw-mass plan would have tied them at 15/15
    assert(plan("A")._1 == 20L && plan("B")._1 == 40L)
    assert(plan("A")._2 < plan("B")._2 && plan("A")._2 > 0,
      plan.toString)
  }
}
