package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Sketch aggregates: HLL distinct-count sketches (mergeable across
  * partitions/groups — the cardinality side of the sketch family next to
  * [[graft.functions.MinHashAgg]]'s similarity sketches). */
class SketchSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.session
  private val dir = "/root/testdata/sf0.01"

  test("hll sketch estimate tracks exact distinct counts within 5%") {
    val li = Tables.lineitem(spark, dir)
    val row = li.agg(
      countDistinct(col("l_partkey")).as("exact"),
      hll_sketch_estimate(hll_sketch_agg(col("l_partkey"))).as("approx"))
      .head()
    val exact = row.getLong(0).toDouble
    val approx = row.getLong(1).toDouble
    assert(math.abs(approx - exact) / exact < 0.05,
      s"exact=$exact approx=$approx")
  }

  test("hll sketches merge across groups (union tracks the exact count)") {
    val li = Tables.lineitem(spark, dir)
    val perFlag = li.groupBy(col("l_returnflag"))
      .agg(hll_sketch_agg(col("l_partkey")).as("sk"))
    val merged = perFlag.agg(
      hll_sketch_estimate(hll_union_agg(col("sk"))).as("est"))
      .head().getLong(0).toDouble
    val exact = li.agg(countDistinct(col("l_partkey"))).head().getLong(0).toDouble
    // merged estimate is itself approximate — hold it to the same 5% band
    assert(math.abs(merged - exact) / exact < 0.05,
      s"merged=$merged exact=$exact")
  }

  test("approx_count_distinct (HLL++) also within 5%") {
    val li = Tables.lineitem(spark, dir)
    val row = li.agg(
      countDistinct(col("l_orderkey")).as("exact"),
      approx_count_distinct(col("l_orderkey")).as("approx")).head()
    assert(math.abs(row.getLong(1).toDouble - row.getLong(0)) / row.getLong(0) < 0.05)
  }

  test("count-min sketch: estimates are one-sided within eps*N (heavy hitters)") {
    val li = Tables.lineitem(spark, dir)
    val eps = 0.005
    val cms = li.stat.countMinSketch(col("l_returnflag"),
      eps = eps, confidence = 0.99, seed = 42)
    val exact = li.groupBy(col("l_returnflag")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val n = exact.values.sum
    exact.foreach { case (k, c) =>
      val est = cms.estimateCount(k)
      assert(est >= c, s"count-min must never under-count: $k $est < $c")
      assert(est <= c + (eps * n).toLong,
        s"$k over-counted beyond the eps*N bound: $est vs $c")
    }
  }

  test("space-saving: exact regime equals a full group-by count") {
    import spark.implicits._
    val rows = (0 until 3000).map(i => ("g" + (i % 2), "item" + (i % 10)))
      .toDF("grp", "item")
    val hh = rows.groupBy("grp")
      .agg(graft.functions.SpaceSaving.space_saving(col("item"), 64).as("hh"))
      .select(col("grp"), explode(col("hh")).as("h"))
      .select(col("grp"), col("h.item"), col("h.cnt"), col("h.err"))
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3))).toMap
    val exact = rows.groupBy("grp", "item").count().collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(hh.keySet == exact.keySet)
    exact.foreach { case (k, c) =>
      assert(hh(k) == (c, 0L), s"$k: ${hh(k)} != ($c, 0)")
    }
  }

  test("space-saving: past capacity, frequency guarantees hold") {
    import spark.implicits._
    // zipf-ish: item j appears ~3000/j times over a 100-item domain
    val stream = (1 to 100).flatMap(j => Seq.fill(3000 / j)(s"w$j"))
    val n = stream.size.toLong
    val cap = 8
    val trueCounts = stream.groupBy(identity).map { case (w, s) => w -> s.size.toLong }
    val out = stream.toDF("item").withColumn("g", lit(1))
      .repartition(4) // force multi-partition partial buffers + merge
      .groupBy("g")
      .agg(graft.functions.SpaceSaving.space_saving(col("item"), cap).as("hh"))
      .select(explode(col("hh")).as("h"))
      .select(col("h.item"), col("h.cnt"), col("h.err"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(out.size <= cap)
    // every item with true count > N/capacity is guaranteed present
    trueCounts.filter(_._2 > n / cap).foreach { case (w, _) =>
      assert(out.contains(w), s"heavy item $w missing")
    }
    out.foreach { case (w, (cnt, err)) =>
      val t = trueCounts(w)
      assert(cnt >= t, s"$w under-counted: $cnt < $t")
      assert(cnt - err <= t, s"$w outside [cnt-err, cnt]: $cnt-$err vs $t")
      assert(err <= n / cap + 1, s"$w err $err beyond N/capacity")
    }
  }

  test("bloom filter: zero false negatives, false-positive rate near fpp") {
    val cust = Tables.customer(spark, dir)
    val n = cust.count()
    val bf = cust.stat.bloomFilter(col("c_custkey"), n, 0.03)
    // every inserted key must hit
    val misses = cust.select(col("c_custkey")).collect()
      .count(r => !bf.mightContain(r.getLong(0)))
    assert(misses == 0, s"$misses false negatives")
    // disjoint probe keys: fp rate should be near the requested 3%
    val probes = (1 to 20000).map(i => 10000000L + i)
    val fp = probes.count(bf.mightContain).toDouble / probes.size
    assert(fp < 0.09, s"false-positive rate $fp far above requested 0.03")
  }
}
