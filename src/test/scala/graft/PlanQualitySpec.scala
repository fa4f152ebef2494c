package graft

import org.scalatest.funsuite.AnyFunSuite

/** Plan-quality regression guards: the properties that make these queries
  * scale (pruning, pushdown, broadcast dims, partial aggregation) asserted
  * against the optimized/executed plans so they cannot silently regress.
  */
class PlanQualitySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.session
  private val dir = "/root/testdata/sf0.001"

  private def executed(q: String): String = {
    val df = SparkEntry.queries(q)(spark, dir)
    df.count() // let AQE finalize
    df.queryExecution.executedPlan.toString
  }

  test("q01: column pruning reaches the lineitem scan") {
    val plan = executed("q01_pricing_summary")
    val scanLine = plan.split("\n").find(_.contains("ReadSchema")).get
    // only the 6 referenced columns, not the full 11-column schema
    assert(!scanLine.contains("l_orderkey"), scanLine)
    assert(!scanLine.contains("l_partkey"), scanLine)
    assert(scanLine.contains("l_quantity"))
  }

  test("q01: shipdate predicate is pushed into the parquet scan") {
    val plan = executed("q01_pricing_summary")
    assert(plan.contains("PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate"),
      plan.split("\n").find(_.contains("PushedFilters")).mkString)
  }

  test("q14: all three dimension joins broadcast (no sort-merge)") {
    val plan = executed("q14_region_monthly")
    assert("BroadcastHashJoin".r.findAllIn(plan).size >= 3, plan.take(2000))
    assert(!plan.contains("SortMergeJoin"), "dims must not sort-merge")
  }

  test("q01: aggregation is partial (map-side combine present)") {
    val plan = executed("q01_pricing_summary")
    assert("HashAggregate".r.findAllIn(plan).size >= 2,
      "expected partial + final HashAggregate")
  }

  test("q06: distinct executes as hash aggregate, not sort") {
    val plan = executed("q06_distinct")
    assert(plan.contains("HashAggregate"))
  }

  test("q08: fuzzy argmax is an aggregate, not a window sort") {
    val plan = executed("q08_match_cascade")
    assert(plan.contains("min_by") || plan.contains("HashAggregate"),
      "argmax should be min_by partial aggregation")
    assert(!plan.contains("RunningWindowFunction"), "no window in cascade")
  }

  test("q68: queries prune + broadcast; corpus never cartesians (r4)") {
    val plan = executed("q68_ivf_oracle")
    assert(plan.contains("LessThan(vec_id,8)"), "query filter must push down")
    assert(plan.contains("BroadcastHashJoin"), "probe join must broadcast")
    assert(!plan.contains("CartesianProduct"), "no cartesian in IVF probe")
  }

  test("q69: salt replication via Generate, argmax stays a partial aggregate (r4)") {
    val plan = executed("q69_salted_fuzzy")
    assert(plan.contains("Generate"), "salted right side replicates via explode")
    assert(plan.contains("min_by") || "HashAggregate".r.findAllIn(plan).size >= 2,
      "argmax should be min_by partial aggregation")
    assert(!plan.contains("CartesianProduct"))
  }

  test("q70: word stage hash-aggregates, doc stage keeps a map-side partial, no window (r4)") {
    val plan = executed("q70_repetition_stats")
    assert("HashAggregate".r.findAllIn(plan).size >= 2,
      "(doc,word) count stage must be partial+final HashAggregate")
    // the argmax carries the word string, so the doc stage is a
    // SortAggregate — what matters is the partial combine BEFORE the
    // exchange (shuffle carries one row per doc per task)
    assert(plan.contains("partial_min_by") || plan.contains("partial_min"),
      "doc stage must partial-aggregate map-side")
    assert(!plan.contains("Window"), "repetition stats must not use windows")
    assert(!plan.contains("CartesianProduct"))
  }

  test("q71: quality gate is a single map-only scan (zero exchanges) (r4)") {
    val plan = executed("q71_gopher_quality")
    assert(!plan.contains("Exchange"), s"must not shuffle:\n${plan.take(1500)}")
    // '*(n)' prefixes mark whole-stage-codegen'd operators
    assert(plan.contains("*(1)"), "metrics must stay in whole-stage codegen")
  }

  test("q56/q67: sketch pipelines never cartesian (r4)") {
    // the shingle stage itself is localCheckpoint-materialized, so the
    // final executed plans show the truncated lineage; the kernel's
    // presence is asserted on the stage plan below
    assert(!executed("q56_dedup_clusters").contains("CartesianProduct"))
    assert(!executed("q67_incremental_dedup").contains("CartesianProduct"))
  }

  test("shingle stages run the fused kernels, one projection, no generators (r4)") {
    import org.apache.spark.sql.functions._
    val docs = Tables.load(spark, dir, "documents")
    val portable = docs.select(
      graft.operators.Dedup.shingles(col("text"), 3).as("g"))
      .queryExecution.optimizedPlan.toString
    assert(portable.contains("word_ngrams"), portable.take(500))
    val hashed = graft.operators.Dedup
      .shingleHashSet(docs, "text", "doc_id", 3)
      .queryExecution.optimizedPlan.toString
    assert(hashed.contains("word_ngram_hashes"), hashed.take(500))
    // the fused form must not re-introduce the higher-order-function
    // chain (transform/slice) the kernels replaced
    assert(!hashed.contains("transform("), hashed.take(500))
  }

  test("q74: benchmark gram set broadcasts; screen never cartesians (r5)") {
    val plan = executed("q74_decontaminate")
    assert(plan.contains("BroadcastHashJoin"), plan.take(2000))
    assert(!plan.contains("CartesianProduct"))
    // the gram probe must not sort-merge — the benchmark side is tiny
    // by design and the hint pins it to a broadcast
    assert(!plan.contains("SortMergeJoin"), "gram probe must broadcast")
  }

  test("q75: redaction is a single map-only scan (zero exchanges) (r5)") {
    val plan = executed("q75_pii_redact")
    assert(!plan.contains("Exchange"), plan.take(1500))
  }

  test("q76: window self-join shuffles md5 keys, no cartesian (r5)") {
    val plan = executed("q76_substring_dup")
    assert(!plan.contains("CartesianProduct"))
    // the pair aggregation keeps a map-side partial
    assert(plan.contains("partial_count") || plan.contains("partial"),
      plan.take(2000))
  }

  test("q77: span dedup is windowless hash aggregation, no cartesian (r5)") {
    val plan = executed("q77_span_dedup")
    assert(!plan.contains("CartesianProduct"))
    assert(!plan.contains("Window"), "reassembly must be groupBy, not window")
    assert(plan.contains("partial_min") || plan.contains("partial"),
      plan.take(2000))
  }

  test("q78: packing window is partitioned by pinned pid, offsets broadcast (r5)") {
    val plan = executed("q78_shard_pack")
    assert(plan.contains("BroadcastHashJoin"), plan.take(2000))
    // the running-sum window must be partitioned (parallel), never the
    // naive empty-partition global window
    val winSpec = plan.split("\n").find(_.contains("windowspecdefinition"))
    assert(winSpec.exists(_.contains("__pid")),
      s"window not partitioned by __pid: ${winSpec.getOrElse("<none>")}")
  }

  test("q91/q92: probe sides broadcast; candidate joins never cartesian (r8)") {
    Seq("q91_lsh_multiprobe", "q92_ivf_kmeans").foreach { q =>
      val plan = executed(q)
      assert(plan.contains("BroadcastHashJoin"), s"$q: probe side must broadcast")
      assert(!plan.contains("CartesianProduct"), q)
      assert(!plan.contains("BroadcastNestedLoopJoin"), q)
    }
  }

  test("q93/q94: window/pair self-joins shuffle hash keys, no cartesian (r8)") {
    Seq("q93_substring_general", "q94_semantic_clusters").foreach { q =>
      val plan = executed(q)
      assert(!plan.contains("CartesianProduct"), q)
      assert(!plan.contains("BroadcastNestedLoopJoin"), q)
    }
  }

  test("q95: target profile broadcasts; scoring join never cartesians (r8)") {
    val plan = executed("q95_target_affinity")
    assert(plan.contains("BroadcastHashJoin"), "profile join must broadcast")
    assert(!plan.contains("CartesianProduct"))
    assert(!plan.contains("SortMergeJoin"), "nBuckets rows must not sort-merge")
  }

  test("q96: space-saving aggregates partially (map-side combine) (r8)") {
    val plan = executed("q96_heavy_sources")
    // TypedImperativeAggregate runs as ObjectHashAggregate: partial +
    // final pair around one exchange — constant-size buffers pre-reduce
    // on the map side like any other agg
    assert("ObjectHashAggregate".r.findAllIn(plan).size >= 2, plan.take(1500))
  }

  test("q97: shuffled packing window stays partitioned by pinned pid (r8)") {
    val plan = executed("q97_shuffled_pack")
    assert(plan.contains("BroadcastHashJoin"), plan.take(2000))
    // same guard as q78: the running sum must never collapse into the
    // naive single-partition global window under the hash order
    val winSpec = plan.split("\n").find(_.contains("windowspecdefinition"))
    assert(winSpec.exists(_.contains("__pid")),
      s"window not partitioned by __pid: ${winSpec.getOrElse("<none>")}")
  }

  test("q104: curriculum packing keeps the pinned-pid window + broadcasts (r8)") {
    val plan = executed("q104_curriculum_pack")
    assert(!plan.contains("SortMergeJoin"), "score+offset joins must broadcast")
    val winSpec = plan.split("\n").find(_.contains("windowspecdefinition"))
    assert(winSpec.exists(_.contains("__pid")),
      s"window not partitioned by __pid: ${winSpec.getOrElse("<none>")}")
  }

  test("q102/q105/q106: late-round queries never cartesian; aggs partial (r8)") {
    Seq("q102_grouped_quantiles", "q105_session_window",
        "q106_weighted_pagerank").foreach { q =>
      val plan = executed(q)
      assert(!plan.contains("CartesianProduct"), q)
      assert(!plan.contains("BroadcastNestedLoopJoin"), q)
    }
  }

  test("q108/q111: header parse is map-only — zero shuffles, zero joins (r9)") {
    Seq("q108_media_meta", "q111_wav_meta").foreach { q =>
      val plan = executed(q)
      assert(!plan.contains("Exchange"), s"$q must not shuffle")
      assert(!plan.contains("Join"), s"$q must not join")
    }
  }

  test("q110: gate shuffles only the fmt partial-aggregate, never payloads (r9)") {
    val plan = executed("q110_media_gate")
    // one partial+final agg pair over <=3 fmt groups; the binary content
    // column dies in the parse projection before the exchange
    assert("HashAggregate".r.findAllIn(plan).size >= 2,
      "expected partial + final HashAggregate")
    assert("Exchange hashpartitioning".r.findAllIn(plan).size == 1, plan.take(1500))
    val exchangeLine = plan.split("\n").find(_.contains("Exchange hashpartitioning"))
    assert(exchangeLine.exists(l => l.contains("fmt") && !l.contains("content")),
      s"shuffle must key on fmt without payload: ${exchangeLine.getOrElse("<none>")}")
  }

  test("q105: declarative session windows stay a SINGLE shuffle (r9)") {
    // the SCALE §10 decision table names session_window the batch default
    // BECAUSE it is one user_id shuffle + in-partition merge; if a Spark
    // upgrade or query edit ever makes it re-shuffle (e.g. a second
    // exchange for the projection), the 100x story breaks — pin it
    val plan = executed("q105_session_window")
    val shuffles = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(shuffles == 1, s"expected exactly 1 shuffle, got $shuffles:\n" +
      plan.split("\n").filter(_.contains("Exchange")).mkString("\n"))
    assert(!plan.contains("Join"), "sessionization must not join")
  }

  test("q112: bm25 prunes tokens via broadcast, heaps top-k — no window, " +
      "no cartesian beyond the 1-row stats (r9)") {
    val plan = executed("q112_bm25")
    // the query-term prune and the df/queries fan-out are broadcast joins;
    // the only nested-loop is the broadcast 1-row (N, L) stats attach
    assert("BroadcastHashJoin".r.findAllIn(plan).size >= 3, plan.take(2000))
    assert(!plan.contains("SortMergeJoin"),
      "tiny query/df tables must broadcast, not sort-merge")
    assert(!plan.contains("CartesianProduct"), "no real cartesian")
    assert(!plan.contains("Window"),
      "top-k per query must be the BottomK heap, not a window sort")
    assert(plan.contains("bottom_k") || plan.contains("BottomK"),
      "expected the bounded-heap aggregate in the plan")
  }

  test("q113: triangle joins are all equi-keyed — no cartesian, no " +
      "broadcast nested loop (r9)") {
    val plan = executed("q113_triangles")
    assert(!plan.contains("CartesianProduct"), "wedge join must be equi-keyed")
    assert(!plan.contains("BroadcastNestedLoopJoin"),
      "wedge/closure joins must hash on their equi keys")
  }

  test("q115/q118: graph family stays equi-keyed — no cartesian, no " +
      "nested loop (r9)") {
    Seq("q115_clustering_coeff", "q118_kcore").foreach { q =>
      val plan = executed(q)
      assert(!plan.contains("CartesianProduct"), s"$q must not cartesian")
      assert(!plan.contains("BroadcastNestedLoopJoin"),
        s"$q joins must hash on their equi keys")
    }
  }

  test("q116/q119: evaluation is one full-outer pair join + a partial " +
      "single-row reduce (r9)") {
    Seq("q116_match_eval", "q119_dedup_eval").foreach { q =>
      val plan = executed(q)
      assert(plan.contains("FullOuter"), s"$q needs the full-outer partition")
      assert(!plan.contains("CartesianProduct"), s"$q must not cartesian")
      // confusion counts partial-combine before the single final reducer
      assert("HashAggregate".r.findAllIn(plan).size >= 2,
        s"$q expected partial + final HashAggregate")
    }
  }

  test("q117: collocations never cartesian beyond the broadcast 1-row " +
      "totals; aggs partial (r9)") {
    val plan = executed("q117_collocations")
    assert(!plan.contains("CartesianProduct"), "no real cartesian")
    // the only nested loop is the broadcast single-row (n_bi, n_uni) attach
    assert("BroadcastNestedLoopJoin".r.findAllIn(plan).size <= 1,
      plan.split("\n").filter(_.contains("Join")).mkString("\n"))
    assert("HashAggregate".r.findAllIn(plan).size >= 2,
      "expected partial + final HashAggregate")
  }

  test("q103: first-event is a window on ONE user_id shuffle, no join (r8)") {
    val plan = executed("q103_retention_cohorts")
    assert(!plan.contains("Join"),
      "first_ts must ride the user_id window, not an agg-join (2 shuffles)")
    val winSpec = plan.split("\n").find(_.contains("windowspecdefinition"))
    assert(winSpec.exists(_.contains("user_id")),
      s"window not partitioned by user_id: ${winSpec.getOrElse("<none>")}")
  }

  test("q107: prefix join shuffles hash keys only, never cartesian (r8)") {
    val plan = executed("q107_prefix_join")
    assert(!plan.contains("CartesianProduct"), plan.take(1500))
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan.take(1500))
  }

  test("q98: classifier is one scan + one partial agg — no join anywhere (r8)") {
    val plan = executed("q98_quality_classifier")
    assert(!plan.contains("Join"), "weights are computed, never joined")
    assert(!plan.contains("Window"), plan.take(1500))
    assert("HashAggregate".r.findAllIn(plan).size >= 2,
      "expected partial + final HashAggregate")
  }

  test("q99: pagerank iterations hash-join on src, never cartesian (r8)") {
    val plan = executed("q99_pagerank")
    assert(!plan.contains("CartesianProduct"), plan.take(1500))
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan.take(1500))
    assert("HashAggregate".r.findAllIn(plan).size >= 2,
      "inbound-mass aggregation must partial-combine")
  }

  test("q100: grouped top-k is a bounded-state agg, not a window sort (r8)") {
    val plan = executed("q100_topk_agg")
    assert(!plan.contains("Window"), "top-k must not window-sort the group")
    // TypedImperativeAggregate: partial + final ObjectHashAggregate
    assert("ObjectHashAggregate".r.findAllIn(plan).size >= 2, plan.take(1500))
  }

  test("q101: scd2 merge joins the business key ONCE, single generate (r8)") {
    val plan = executed("q101_scd2_merge")
    assert(!plan.contains("CartesianProduct"), plan.take(1500))
    val joins = "SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin".r
      .findAllIn(plan).size
    assert(joins == 1, s"expected exactly one key join, saw $joins")
    assert(plan.contains("Generate"),
      "outcome classes must fan out of one generate, not filtered re-joins")
  }

  test("partitioned layout prunes partitions at the scan") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val p = java.nio.file.Files.createTempDirectory("prune").toString + "/t"
    Seq(("a", "rule_based_abn"), ("b", "fuzzy"), ("c", "LLM"))
      .toDF("domain", "match_method")
      .write.partitionBy("match_method").parquet(p)
    val pruned = spark.read.parquet(p)
      .filter(col("match_method") === "fuzzy")
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") &&
      plan.matches("(?s).*PartitionFilters: \\[[^\\]]*match_method[^\\]]*\\].*"),
      s"partition pruning missing:\n${plan.take(1200)}")
    assert(pruned.count() == 1)
  }

  test("nested struct access prunes to the referenced subfield") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val p = java.nio.file.Files.createTempDirectory("nested").toString + "/t"
    Seq((1L, ("a", 10, "drop-me"))).toDF("id", "payload")
      .select(col("id"), col("payload").cast(
        "struct<name:string,size:int,unused:string>").as("payload"))
      .write.parquet(p)
    val df = spark.read.parquet(p).select(col("payload.name"))
    val scan = df.queryExecution.executedPlan.toString
      .split("\n").find(_.contains("ReadSchema")).get
    assert(scan.contains("name") && !scan.contains("unused"),
      s"nested pruning missing: $scan")
  }

  test("centroid TABLE path: matrix rides a broadcast nested-loop (1 row), " +
      "never a cartesian, and the plan stays O(1) in nlist (r10)") {
    import org.apache.spark.sql.functions._
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val q = emb.select(col("vec_id"),
      operators.Ann.quantizeVec(col("embedding"), 1000).as("qv"))
    val cents = (0 until 300).map(i =>
      (0 until operators.Ann.dimOf(emb, "embedding"))
        .map(d => ((i * 31 + d * 17) % 101 - 50).toLong))
    val df = operators.Ann.withNearestCentroidL(q, cents, col("qv"), "c")
    df.count()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin"),
      "centroid row should attach via broadcast nested-loop")
    assert(!plan.contains("CartesianProduct"), "no cartesian")
    // O(1) plan nodes: the 300-centroid matrix must NOT appear as 300
    // literal fold chains (the literal path emits one aggregate per
    // centroid; the table path exactly one transform over the column)
    assert("aggregate\\(".r.findAllIn(plan.toLowerCase).size < 20,
      "plan size grows with nlist — literal chain leaked into table path")
  }

  test("q123 + serving probe: linkage blocking and scoring join on " +
      "keys, never cartesian (r10)") {
    // the q123 RESULT is a memoized checkpoint since r21 (the q128
    // sharing fix), so its plan is a scan — the join-shape guard moves
    // to the underlying builder, which is the plan the memo executes
    val built = SparkEntry.q123FellegiSunterBuild(spark,
      "/root/testdata/sf0.001")
    built.count()
    val plan = built.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), "q123 cartesians")
    assert(plan.contains("HashJoin") || plan.contains("SortMergeJoin"),
      "q123: expected key joins")
    // the serving probe (the EM/streaming scoring shape — q126's result
    // frame is a driver-built row, so its joins are guarded here)
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val ref = Seq((1L, 10L, "x", "y")).toDF("id", "blk", "f1", "f2")
    val probe = operators.Linkage.scoreAgainstReference(
      ref, ref, "id", "blk", Seq("f1", "f2"),
      Map("f1" -> (2.0, 0.5), "f2" -> (2.0, 0.5)), 1.0)
    probe.count()
    val pplan = probe.queryExecution.executedPlan.toString
    assert(!pplan.contains("CartesianProduct"), "probe cartesians")
    assert(pplan.contains("HashJoin") || pplan.contains("SortMergeJoin"),
      "probe: expected a blocking key join")
  }

  test("q130/q132: priority sampling — global form takes ordered limit " +
      "(no full sort), group form ONE exchange, no cartesian beyond " +
      "the 1-row tau broadcast (r11)") {
    val plan = executed("q130_priority_sample")
    // global top-(k+1) must run as TakeOrderedAndProject (per-partition
    // heads + driver merge), never a global Sort + CollectLimit
    assert(plan.contains("TakeOrderedAndProject"), plan.take(1500))
    // the only cross join is the broadcast of the 1-row tau frame
    assert(!plan.contains("CartesianProduct"), "q130 cartesians")
    val gplan = executed("q132_group_priority_sample")
    assert(!gplan.contains("CartesianProduct"), "q132 cartesians")
    // rank + tau + join all reuse the lang hash partitioning: exactly
    // ONE shuffle of the document rows
    assert("Exchange hashpartitioning".r.findAllIn(gplan).size <= 2,
      s"q132 re-shuffles what the window already partitioned:\n" +
        gplan.split("\n").filter(_.contains("Exchange")).mkString("\n"))
  }

  test("q131/q133: EM posteriors and label propagation stay equi-keyed " +
      "— no cartesian beyond 1-row parameter broadcasts (r11)") {
    val plan = executed("q131_em_posteriors")
    // the candidate⋈records joins are paid ONCE during calibration and
    // materialized; the posterior frame itself must be a pure map over
    // that checkpoint — zero joins, zero exchanges, zero cartesians
    assert(!plan.contains("CartesianProduct"), "q131 cartesians")
    assert(!plan.contains("Exchange"),
      "q131: the final E-step re-shuffled the materialized flags")
    assert(plan.contains("Scan ExistingRDD"),
      "q131: expected a map over the calibration checkpoint")
    // r12: the q133 labeling is shared by q133/q135/q140 via an eager
    // localCheckpoint memo, so the QUERY's plan must be a pure scan of
    // the materialized blocks — re-paying any round's join/agg here
    // would defeat the sharing (the r11-verdict scale-killer)
    val lplan = executed("q133_label_propagation")
    assert(!lplan.contains("CartesianProduct"), "q133 cartesians")
    assert(lplan.contains("Scan ExistingRDD"),
      "q133: expected a scan of the shared labeling checkpoint")
    assert(!lplan.contains("Exchange"),
      "q133: the shared labeling re-shuffled — sharing defeated:\n" + lplan)
    // the per-round argmax shape is asserted on the OPERATOR's own plan
    // (pre-checkpoint): min_by partial aggregation, never a window sort
    val edges = spark.range(0, 200).selectExpr("id AS a", "(id % 7) AS b")
    val oplan = operators.Components
      .labelPropagation(edges.toDF(), "a", "b", iters = 2)
      .queryExecution.executedPlan.toString
    assert(!oplan.contains("RunningWindowFunction") &&
      !oplan.contains("Window"),
      "labelPropagation: argmax must be an aggregate, not a window sort")
    assert(oplan.contains("min_by") || oplan.contains("HashAggregate"),
      "labelPropagation: expected min_by hash aggregation")
  }

  test("q134/q135: rank fusion and modularity stay equi-keyed; the only " +
      "cross join is the 1-row m broadcast (r11)") {
    val fplan = executed("q134_rank_fusion")
    assert(!fplan.contains("CartesianProduct"), "q134 cartesians")
    // fused agg is a hash aggregate (partial-friendly), not a window
    // over the union
    assert(fplan.contains("HashAggregate"), "q134: expected hash agg")
    val mplan = executed("q135_lpa_modularity")
    assert(!mplan.contains("CartesianProduct"),
      "q135: the m-frame must broadcast (BroadcastNestedLoopJoin), " +
        "never CartesianProduct")
    assert(mplan.contains("HashAggregate"), "q135: expected hash aggs")
  }

  test("q142: sorted-neighborhood rank never global-sorts records — " +
      "range exchange + pid-partitioned window, offsets broadcast (r12)") {
    val plan = executed("q142_sorted_neighborhood")
    assert(!plan.contains("CartesianProduct"), "q142 cartesians")
    // per-partition offsets ride a broadcast join back onto the records
    assert(plan.contains("BroadcastHashJoin"),
      "q142: offsets must broadcast")
    // candidate emission is explode + equi-join on the rank
    assert(plan.contains("Generate"), "q142: expected the window explode")
    // the record-sized rank is a range exchange + a pid-PARTITIONED
    // window, never a single-partition global sort — since r18 the
    // machinery executes inside Ranks' consistency checkpoint (the
    // executed q142 tail scans the checkpoint), so assert the shape on
    // the ranked-frame construction itself
    import org.apache.spark.sql.functions._
    val ranged = spark.range(50).select(col("id").as("k"))
      .repartitionByRange(col("k"))
      .withColumn("__pid", spark_partition_id())
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("__pid")).orderBy(col("k"))
    val local = ranged.withColumn("r", row_number().over(w))
    local.count()
    val rankedPlan = local.queryExecution.executedPlan.toString
    assert(rankedPlan.contains("Exchange rangepartitioning"),
      "expected the two-phase rank's range exchange:\n" + rankedPlan)
    assert(!rankedPlan.contains("Exchange SinglePartition"),
      "the global rank must never collapse to one partition:\n" +
        rankedPlan)
  }

  test("q143/q144/q145: r12 additions never cartesian; profiles and " +
      "query tokens broadcast; aggs stay partial (r12)") {
    val mplan = executed("q143_maxsim_topk")
    assert(!mplan.contains("CartesianProduct"),
      "q143: query tokens must broadcast (BroadcastNestedLoopJoin), " +
        "never CartesianProduct")
    assert(mplan.contains("bottom_k") && !mplan.contains("Window"),
      "q143: top-k must be the BottomK heap, not a window sort")
    val fplan = executed("q144_lsh_fidelity")
    assert(!fplan.contains("CartesianProduct"), "q144 cartesians")
    // q145 is memoized (shared with q205) — the query plan must be the
    // checkpoint scan; the BUILD plan carries the broadcast contract
    val iplan = executed("q145_importance_ratio")
    assert(iplan.contains("Scan ExistingRDD"),
      "q145: the memoized frame must serve from its checkpoint")
    import org.apache.spark.sql.functions._
    val irBuild = graft.operators.Selection.importanceRatio(
        Tables.load(spark, dir, "documents"), "text", "doc_id",
        isTarget = col("doc_id") % 7 === 0,
        isReference = lit(true), nBuckets = 4096, quant = 100000L)
    irBuild.count()
    val ibplan = irBuild.queryExecution.executedPlan.toString
    assert(!ibplan.contains("CartesianProduct"), "q145 cartesians")
    assert(ibplan.contains("BroadcastHashJoin"),
      "q145: the rho profile must broadcast onto candidates")
    assert(ibplan.contains("HashAggregate"), "q145: expected hash aggs")
    // q146: the recipe folds in as a CASE chain — one aggregation over
    // the corpus, then a pure map over domain rows; NO join anywhere
    val pplan = executed("q146_mixture_plan")
    assert(!pplan.contains("Join"), "q146: the plan must not join")
    assert(pplan.contains("HashAggregate"),
      "q146: inventory must be a partial hash aggregation")
    val dplan = executed("q147_dedup_report")
    assert(!dplan.contains("CartesianProduct"), "q147 cartesians")
    // q148/q150 share the memoized Borůvka forest (the q133 sharing
    // pattern): q148's own plan must be a pure scan of that checkpoint
    val splan = executed("q148_min_spanning_forest")
    assert(!splan.contains("CartesianProduct"), "q148 cartesians")
    assert(splan.contains("Scan ExistingRDD"),
      "q148: expected a scan of the shared forest checkpoint")
    assert(!splan.contains("Exchange"),
      "q148: the shared forest re-shuffled — sharing defeated")
    val cplan = executed("q150_dendrogram_cut")
    assert(!cplan.contains("CartesianProduct"), "q150 cartesians")
    assert(!cplan.contains("Window"),
      "q150: no window anywhere in the cut resolution")
    // q151: inverted-index posting join — hash keys only, no cartesian
    val jplan = executed("q151_containment_join")
    assert(!jplan.contains("CartesianProduct"), "q151 cartesians")
  }

  test("r13 shared subplans: the q113 co-order edges and the q49 sketch " +
      "pairs are memoized checkpoints — consumers scan, never recompute") {
    // q113/q115/q118 share the co-occurrence edge build: each consumer's
    // plan must read the edge list from the materialized blocks (the
    // downstream triangle/coefficient/peel work still shuffles — the
    // guard is that the EDGE BUILD's incidence joins are absent)
    for (q <- Seq("q113_triangles", "q115_clustering_coeff", "q118_kcore")) {
      val plan = executed(q)
      assert(plan.contains("Scan ExistingRDD"),
        s"$q: expected a scan of the shared co-order edge checkpoint")
      assert(!plan.contains("Scan parquet"),
        s"$q: re-read base tables — the edge build was recomputed")
    }
    // q49 itself must be a PURE scan of the shared pair checkpoint
    val p49 = executed("q49_minhash_oracle")
    assert(p49.contains("Scan ExistingRDD"),
      "q49: expected a scan of the shared sketch-pair checkpoint")
    assert(!p49.contains("Exchange"),
      "q49: the shared pair list re-shuffled — sharing defeated")
    // the other four sketch consumers scan the checkpoint too (their
    // own grading/clustering work remains, but no second sketch pass:
    // a recomputed sketch would show the banding explode stage)
    for (q <- Seq("q56_dedup_clusters", "q114_leakage_split",
        "q119_dedup_eval", "q147_dedup_report")) {
      val plan = executed(q)
      assert(plan.contains("Scan ExistingRDD"),
        s"$q: expected a scan of the shared sketch-pair checkpoint")
      assert(!plan.toLowerCase.contains("minhash"),
        s"$q: sketch kernel present — the pair list was recomputed")
    }
  }

  test("r13 additions: q152/q154 share the kNN checkpoint; q153 is one " +
      "codegen segment + explode + hash agg — no joins, no windows") {
    // q152's own plan is a pure scan of the memoized descent output
    val kplan = executed("q152_knn_graph")
    assert(kplan.contains("Scan ExistingRDD"),
      "q152: expected a scan of the shared kNN checkpoint")
    assert(!kplan.contains("Exchange"),
      "q152: the shared graph re-shuffled — sharing defeated")
    // q154 consumes the same checkpoint; its own work (edge collapse +
    // cut resolution) remains, but the descent must not re-run: the
    // scored-candidate join stage would show a quantized-vector scan
    val splan = executed("q154_semantic_linkage")
    assert(splan.contains("Scan ExistingRDD"),
      "q154: expected a scan of the shared kNN checkpoint")
    assert(!splan.contains("CartesianProduct"), "q154 cartesians")
    assert(!splan.contains("Scan parquet"),
      "q154: re-read embeddings — the descent was recomputed")
    // q153: segmentation is ONE codegen'd projection over the scan,
    // then explode + partial hash agg — a window or join here would
    // mean the tokenizer fell out of the map-only shape
    val bplan = executed("q153_bpe_tokens")
    assert(bplan.contains("Generate"), "q153: expected the token explode")
    assert(bplan.contains("HashAggregate"), "q153: expected hash aggs")
    assert(!bplan.contains("Join") && !bplan.contains("Window"),
      "q153: tokenization must stay join- and window-free")
    assert(bplan.contains("bpe_segment"),
      "q153: the codegen kernel is not in the plan")
  }

  test("q158: the ADC scan broadcasts the query+LUT side and heaps " +
      "top-k — no window sort, no sort-merge, no corpus-sized shuffle " +
      "beyond the heap merge (r13)") {
    val plan = executed("q158_pq_topk")
    // the non-equi excludeSelf scan is BY DESIGN a broadcast nested loop
    // over the tiny (8-row) query side — that IS the linear code scan;
    // what must never appear is a window sort or a sort-merge exchange
    assert(!plan.contains("Window"),
      "top-k must be the BottomK heap, not a window sort")
    assert(plan.contains("bottom_k") || plan.contains("BottomK"),
      "expected the bounded-heap aggregate in the plan")
    assert(!plan.contains("SortMergeJoin"),
      "the 8-row query side must broadcast")
    assert(!plan.contains("CartesianProduct"),
      "scan must be the broadcast nested loop, not a shuffled cartesian")
    assert("partial_bottom_k|partial".r.findAllIn(plan).nonEmpty,
      "heap merge must partial-aggregate map-side")
  }

  test("q169: curation run scans the memoized q49 pair checkpoint (no " +
      "sketch recompute), gates stay codegen'd, no cartesian (r13)") {
    val plan = executed("q169_curation_run")
    assert(plan.contains("Scan ExistingRDD"),
      "expected the shared q49 pair checkpoint scan")
    assert(plan.contains("blocklist_stats"),
      "blocklist gate not fused into the plan")
    assert(!plan.contains("CartesianProduct"), "q169 cartesians")
    // the minhash sketch itself must NOT re-run: banding would show a
    // Generate over the signature explode feeding a self-join
    assert(!plan.contains("minhash_md5_sig"),
      "q169 recomputed the minhash sketch — memo sharing defeated")
  }

  test("q162/q168: the IVF-PQ result is built once — q162 scans its " +
      "checkpoint, the audit joins against the same scan (r13)") {
    val plan162 = executed("q162_ivfpq_topk")
    assert(plan162.contains("Scan ExistingRDD"),
      "q162: expected the memoized checkpoint scan")
    assert(!plan162.contains("Exchange"),
      "q162: the shared result re-shuffled — sharing defeated")
    val plan168 = executed("q168_ann_recall_audit")
    assert(plan168.contains("Scan ExistingRDD"),
      "q168: audit must read the shared IVF-PQ checkpoint")
    assert(!plan168.contains("bottom_k") || {
      // the exact ground truth legitimately heaps; the APPROX side must
      // not rebuild its own heap from raw embeddings twice
      "bottom_k".r.findAllIn(plan168).size <= 2
    }, "q168: approx side appears rebuilt")
  }

  test("q178: the weighted-Jaccard multiset expansion is map-only — " +
      "zero exchanges before the signature projection (r13 item 1)") {
    // the expansion stage (tf_expand kernel + blank filter) must be a
    // narrow projection over the corpus scan: the r13 chain paid two
    // corpus-wide shuffles (explode→groupBy(doc,t)→explode→groupBy(doc))
    // for the same element sets
    val p = SketchParams.q178
    val corpus = spark.read
      .parquet(s"$dir/documents.parquet")
      .select(org.apache.spark.sql.functions.col("doc_id"),
        org.apache.spark.sql.functions.col("text"))
    val expansion = graft.operators.Dedup
      .weightedExpansion(corpus, "text", "doc_id", p.cap)
    expansion.count()
    val plan = expansion.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"pre-sketch exchange found in expansion stage:\n${plan.take(1500)}")
    assert(!plan.contains("Generate"),
      "expansion must be the kernel projection, not an explode chain")
  }

  test("r16 additions: index-served BM25 broadcasts the term prune; " +
      "packing plans keep the pinned-pid window; nothing cartesians") {
    // q197: the index dump is aggregation over one corpus scan — the
    // term prune must reach the final join as a broadcast, never a
    // cartesian
    val p197 = executed("q197_bm25_index")
    assert(!p197.contains("CartesianProduct"),
      s"q197 cartesians:\n${p197.take(1200)}")
    assert(p197.contains("BroadcastNestedLoopJoin") ||
      p197.contains("BroadcastHashJoin") || p197.contains("BroadcastExchange"),
      "q197 stats/df sides must broadcast")
    // q198: the manifest window partitions by seq_id (parallel), and
    // the offset scan stays the pinned-pid two-phase shape
    val p198 = executed("q198_pack_manifest")
    assert(!p198.contains("CartesianProduct"))
    assert(p198.contains("__pid"),
      "q198 lost the pinned-pid two-phase scan")
    // q199: per-class epoch joins are bucket-key hash joins + partial
    // aggs; no cartesian anywhere in a 4-class unrolled training
    val p199 = executed("q199_multiclass_perceptron")
    assert(!p199.contains("CartesianProduct"),
      s"q199 cartesians:\n${p199.take(1200)}")
    assert(p199.contains("partial_sum") || p199.contains("partial_count"),
      "q199 aggregation lost its map-side partial")
    // q196: the composition keeps the curation chain's shapes
    val p196 = executed("q196_curation_pack")
    assert(!p196.contains("CartesianProduct"))
    assert(p196.contains("__pid"),
      "q196 lost the pinned-pid two-phase scan")
    // q200/q201: the ordered packs stay two-phase (pinned pid), the
    // KN model joins and the per-group fills never cartesian
    val p200 = executed("q200_kn_curriculum")
    assert(!p200.contains("CartesianProduct") && p200.contains("__pid"))
    val p201 = executed("q201_unimax_alloc")
    assert(!p201.contains("CartesianProduct") && p201.contains("__pid"))
    assert(p201.contains("BroadcastHashJoin") ||
      p201.contains("BroadcastExchange"),
      "q201 group-budget table must broadcast")
    // q202: fertility joins the word-TYPE segmentation frame — tf agg
    // keeps its map-side partial, no cartesian in the DP composition
    val p202 = executed("q202_wordpiece_fertility")
    assert(!p202.contains("CartesianProduct"),
      s"q202 cartesians:\n${p202.take(1200)}")
    assert(p202.contains("partial_sum") || p202.contains("partial_count"),
      "q202 aggregation lost its map-side partial")
    // q203: two KN chains = natural-key shuffle joins; the one
    // broadcast is each model's 1-row (BT, V) frame
    val p203 = executed("q203_moore_lewis")
    assert(!p203.contains("CartesianProduct"),
      s"q203 cartesians:\n${p203.take(1200)}")
    assert(p203.contains("BroadcastNestedLoopJoin") ||
      p203.contains("BroadcastExchange"),
      "q203 lost the guarded 1-row (BT,V) broadcast")
    // q204: CC over the shared pair frame + one cluster-size join;
    // weights are a projection, never a cartesian
    val p204 = executed("q204_soft_dedup")
    assert(!p204.contains("CartesianProduct"),
      s"q204 cartesians:\n${p204.take(1200)}")
    // q205: the DSIR composition — profile/τ rides 1-row guarded
    // broadcasts, the membership join hashes, nothing cartesians
    val p205 = executed("q205_dsir_resample")
    assert(!p205.contains("CartesianProduct"),
      s"q205 cartesians:\n${p205.take(1200)}")
    assert(p205.contains("BroadcastExchange"),
      "q205 lost the guarded 1-row tau broadcast")
    // q206: the KS cumsum window must stay partitioned by the pinned
    // pid (the two-phase scan), never the naive global window
    val p206 = executed("q206_ks_drift")
    assert(!p206.contains("CartesianProduct"),
      s"q206 cartesians:\n${p206.take(1200)}")
    val win206 = p206.split("\n").find(_.contains("windowspecdefinition"))
    assert(win206.exists(_.contains("__pid")),
      s"q206 window not partitioned by __pid: ${win206.getOrElse("<none>")}")
    // q207: the per-group report — group-partitioned windows (parallel
    // across sources), never the empty global window, no cartesian
    val p207 = executed("q207_ks_by_source")
    assert(!p207.contains("CartesianProduct"),
      s"q207 cartesians:\n${p207.take(1200)}")
    val win207 = p207.split("\n").find(_.contains("windowspecdefinition"))
    assert(win207.exists(_.contains("grp#")),
      s"q207 window not partitioned by group: ${win207.getOrElse("<none>")}")
    // q208: the norm projection is map-only before the KS chain; the
    // cumsum window stays pinned-pid
    val p208 = executed("q208_emb_norm_drift")
    assert(!p208.contains("CartesianProduct"),
      s"q208 cartesians:\n${p208.take(1200)}")
    val win208 = p208.split("\n").find(_.contains("windowspecdefinition"))
    assert(win208.exists(_.contains("__pid")),
      s"q208 window not partitioned by __pid: ${win208.getOrElse("<none>")}")
    // q209/q210: the eval family reads the memoized q190 scored frame
    // (a checkpoint scan, no retraining) and keeps the prefix-scan
    // window pinned-pid
    Seq("q209_pr_curve", "q210_auc_exact").foreach { q =>
      val p = executed(q)
      assert(!p.contains("CartesianProduct"), s"$q cartesians")
      assert(p.contains("Scan ExistingRDD"),
        s"$q must serve from the memoized q190 scored checkpoint")
      val win = p.split("\n").find(_.contains("windowspecdefinition"))
      assert(win.exists(_.contains("__pid")),
        s"$q window not partitioned by __pid: ${win.getOrElse("<none>")}")
    }
    // q212: the per-group AUC — group-partitioned window (parallel
    // across languages), the lang attach a plain equi-join
    val p212 = executed("q212_auc_by_lang")
    assert(!p212.contains("CartesianProduct"), "q212 cartesians")
    val win212 = p212.split("\n").find(_.contains("windowspecdefinition"))
    assert(win212.exists(_.contains("grp#")),
      s"q212 window not partitioned by group: ${win212.getOrElse("<none>")}")
    // q211: one map + one partial hash-agg over the memoized scored
    // checkpoint — no join, no window
    val p211 = executed("q211_calibration_bins")
    assert(p211.contains("Scan ExistingRDD"),
      "q211 must serve from the memoized q190 scored checkpoint")
    assert(!p211.contains("Join") && !p211.contains("Window"),
      s"q211 must be map + hash-agg only:\n${p211.take(1200)}")
    assert(p211.contains("partial_count") || p211.contains("partial_sum"),
      "q211 aggregation lost its map-side partial")
  }

  test("q31: pigeonhole bands join as an equi join, never a cartesian; " +
      "the pair distinct is a hash aggregate (r17)") {
    val plan = executed("q31_simhash")
    assert(!plan.contains("CartesianProduct"),
      "banded self-join must stay an equi join")
    assert(plan.contains("HashAggregate"),
      "candidate-pair distinct must hash-aggregate")
  }

  test("q35: fuzzy top-1 joins on the block key (no cartesian) and " +
      "takes one window pass (r17)") {
    val plan = executed("q35_token_sort_fuzzy")
    assert(!plan.contains("CartesianProduct"),
      "blocked join must stay an equi join")
    assert("Window".r.findAllIn(plan).size >= 1,
      "per-customer argmax should be one window pass")
  }

  test("q218: card assembly broadcasts the per-source frames and never " +
      "cartesians; the funnel aggregate keeps its map-side partial (r17)") {
    val plan = executed("q218_data_card")
    assert(plan.contains("BroadcastHashJoin"),
      "the ~20-row plan/dim sides must broadcast")
    assert(!plan.contains("CartesianProduct"))
    assert(plan.contains("partial_count") || plan.contains("partial_sum"),
      "funnel aggregation lost its map-side partial")
  }

  test("q222: the visible SA tail never cartesians; AQE-vs-checkpoint " +
      "partitioning behavior pinned (why the rounds don't pre-pin) (r18)") {
    // the doubling rounds execute during construction (eager
    // checkpoints), so the executed plan shows the adjacency/removal
    // tail — it must stay equi-keyed
    val plan = executed("q222_exact_substr")
    assert(!plan.contains("CartesianProduct"))
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan.take(1500))
    // design-constraint regression pin (r18 discovery): under AQE a
    // localCheckpoint reports UnknownPartitioning, so a pre-pinned
    // repartition does NOT survive into downstream plans — which is
    // why SuffixArray's rounds (and any checkpoint-loop operator)
    // must budget the self-join exchanges instead of pre-pinning.
    // With AQE OFF the pin IS preserved — if Spark ever starts
    // preserving it under AQE too, this assertion flips and the
    // repartition becomes worth re-adding.
    import org.apache.spark.sql.functions._
    def groupedPlan(): String = {
      val a = spark.range(100)
        .select((col("id") % 10).as("doc_id"), col("id").as("pos"))
        .repartition(col("doc_id"))
        .localCheckpoint(true)
      val g = a.groupBy("doc_id").count()
      g.collect()
      g.queryExecution.executedPlan.toString
    }
    assert(groupedPlan().contains("Exchange hashpartitioning"),
      "AQE now preserves checkpoint partitioning — re-add the " +
        "SuffixArray/Classifier doc_id pre-pins and update their docs")
    val aqe = spark.conf.get("spark.sql.adaptive.enabled")
    try {
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      assert(!groupedPlan().contains("Exchange"),
        "AQE-off checkpoint no longer preserves partitioning")
    } finally spark.conf.set("spark.sql.adaptive.enabled", aqe)
  }

  test("q223: repetition report stays hash-agg + per-doc windows — no " +
      "cartesian, partial aggregation present (r18)") {
    // the registered query memoizes (q228 shares the report), so its
    // executed plan is a checkpoint scan — assert on the operator
    import org.apache.spark.sql.functions.col
    val df = graft.operators.TextAnalysis.gopherRepetitionReport(
      Tables.load(spark, dir, "documents")
        .select(col("doc_id"), col("text")),
      "text", "doc_id")
    df.count()
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"))
    assert(plan.contains("partial_count") || plan.contains("partial_sum"),
      "the gram aggregations lost their map-side partials")
  }

  test("q224/q225: reranker gold + refine probe sides broadcast; " +
      "candidate joins never cartesian (r18)") {
    val p224 = executed("q224_trained_reranker")
    assert(!p224.contains("CartesianProduct"))
    // the re-score's broadcast probe executes during construction (the
    // rescored frame is checkpointed); the visible tail is the heap +
    // the approx_d join-back — both must stay equi-keyed
    val p225 = executed("q225_ivfpq_refine")
    assert(!p225.contains("CartesianProduct"))
    assert(!p225.contains("BroadcastNestedLoopJoin"))
  }

  test("q89/q149: layout bucketing plans contain NO unpartitioned " +
      "window (the single-task global sort is gone, r20)") {
    for (q <- Seq("q89_zorder", "q149_hilbert_layout")) {
      val df = SparkEntry.queries(q)(spark, dir)
      val bad = df.queryExecution.optimizedPlan.collect {
        case w: org.apache.spark.sql.catalyst.plans.logical.Window
            if w.partitionSpec.isEmpty => w
      }
      assert(bad.isEmpty,
        s"$q: unpartitioned Window would collapse the table to one " +
          s"task at scale: $bad")
    }
  }

  test("ALL queries: no unpartitioned WindowExec anywhere — suite-wide " +
      "sweep, including checkpoint-hidden internal plans (r21)") {
    // A final-plan inspection misses windows buried behind
    // localCheckpoints (most builders checkpoint eagerly DURING query
    // construction), so the sweep listens for the physical operator's
    // own runtime warning — "No Partition Defined for Window
    // operation" is logged by WindowExec.doExecute on EVERY execution,
    // checkpoint materializations included. Running every query with
    // zero captured warnings is the enforceable form of SCALE §9aa's
    // "no single-task window on any production path" claim (VERDICT
    // r20 item 1: the nnDescent/tripletMining md5 rings falsified the
    // per-query spot asserts).
    import org.apache.logging.log4j.LogManager
    import org.apache.logging.log4j.core.LoggerContext
    val hits = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    @volatile var current = "<init>"
    val appender = new org.apache.logging.log4j.core.appender.AbstractAppender(
        "graft-win-sweep", null, null, true,
        org.apache.logging.log4j.core.config.Property.EMPTY_ARRAY) {
      override def append(e: org.apache.logging.log4j.core.LogEvent): Unit =
        if (e.getMessage.getFormattedMessage
            .contains("No Partition Defined for Window operation"))
          hits.add(current)
    }
    appender.start()
    val ctx = LogManager.getContext(false).asInstanceOf[LoggerContext]
    val rootCfg = ctx.getConfiguration.getRootLogger
    rootCfg.addAppender(appender, org.apache.logging.log4j.Level.WARN, null)
    ctx.updateLoggers()
    try {
      SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
        current = name
        // noop write, NOT count(): count() lets the optimizer prune
        // window subtrees whose columns it can prove unused (a Window
        // never changes cardinality), silently skipping the very
        // operator this sweep polices — the first sweep draft passed
        // on count() while the Verify parquet writes of the same
        // queries fired 60 warnings (guide §1.4)
        fn(spark, dir).write.format("noop").mode("overwrite").save()
      }
    } finally {
      rootCfg.removeAppender("graft-win-sweep")
      ctx.updateLoggers()
      appender.stop()
    }
    val offenders = hits.toArray.distinct
    assert(offenders.isEmpty,
      s"single-task global windows executed under: ${offenders.mkString(", ")}")
  }

  test("custom expressions stay inside whole-stage codegen (no fallback)") {
    val df = SparkEntry.queries("q11_abn_validate")(spark, dir)
    df.count()
    val plan = df.queryExecution.executedPlan.toString
    // abn_valid evaluates inside a codegen stage: the project containing it
    // carries a codegen id marker
    assert("\\*\\(\\d+\\)".r.findAllIn(plan).nonEmpty,
      s"no whole-stage codegen stages in plan:\n${plan.take(1500)}")
  }
}
