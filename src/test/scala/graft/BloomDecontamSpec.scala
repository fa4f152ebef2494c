package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Dedup

/** Bloom-gated decontamination (q159): row-identical to the exact
  * screen, no false negatives ever, and a measured pruning ratio — the
  * property that justifies the operator at scale (only hits + the fpp
  * sliver reach the confirm join's exchange). */
class BloomDecontamSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.session
  private val dir = "/root/testdata/sf0.01"
  private val N = 5

  private lazy val docs = Tables.load(spark, dir, "documents")
    .select(col("doc_id"),
      regexp_replace(trim(col("text")), "[ \\t\\n\\r\\f\\u000B\\u0085\\u00A0]+", " ")
        .as("text"))
  private lazy val isBench = col("doc_id") % 9 === 4
  private lazy val corpus = docs.filter(!isBench)
  private lazy val bench = docs.filter(isBench)

  test("row-identical to the exact screen (the by-construction claim, " +
      "verified): same doc set, same hit counts, same flags") {
    val exact = Dedup.decontaminate(corpus, bench, "text", "doc_id", N)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSet
    val bloomed = Dedup.bloomDecontaminate(corpus, bench, "text", "doc_id",
        N, expectedItems = 200000L, fpp = 0.01)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSet
    assert(bloomed == exact,
      s"diverged on ${bloomed.diff(exact).take(3)} / ${exact.diff(bloomed).take(3)}")
    assert(exact.exists(_._3), "no contaminated doc — the screen never fired")
  }

  test("no false negatives: every benchmark gram passes the codegen'd " +
      "probe; pruning: the clean-gram survivor rate is within a few " +
      "multiples of fpp") {
    val benchGrams = bench
      .select(explode_outer(Dedup.shingles(col("text"), N)).as("g"))
      .distinct()
    val bloom = benchGrams.stat.bloomFilter("g", 200000L, 0.01)
    // no false negatives — the property the parity result rests on
    val fn = benchGrams.filter(
      !graft.functions.exprs.bloom_might_contain(col("g"), bloom)).count()
    assert(fn == 0L, s"$fn benchmark grams rejected by their own filter")
    // pruning on the corpus gram stream: survivors = true hits + fp sliver
    val grams = corpus
      .select(col("doc_id"), explode_outer(Dedup.shingles(col("text"), N)).as("g"))
    val total = grams.count()
    val survivors = grams.filter(
      graft.functions.exprs.bloom_might_contain(col("g"), bloom)).count()
    val trueHits = grams.join(benchGrams, Seq("g")).count()
    assert(survivors >= trueHits, "prefilter dropped a true hit")
    val cleanSurvivorRate =
      (survivors - trueHits).toDouble / (total - trueHits)
    assert(cleanSurvivorRate <= 0.05,
      s"clean-gram survivor rate $cleanSurvivorRate — filter not pruning " +
        s"(total=$total survivors=$survivors hits=$trueHits)")
    // and the prefilter is a real cut: most of the stream never reaches
    // the confirm join on this mostly-clean corpus
    assert(survivors.toDouble / total <= 0.5,
      s"prefilter passed ${survivors}/$total grams")
  }

  test("the probe runs inside whole-stage codegen on the scan") {
    val benchGrams = bench
      .select(explode_outer(Dedup.shingles(col("text"), N)).as("g"))
      .distinct()
    val bloom = benchGrams.stat.bloomFilter("g", 200000L, 0.01)
    val screened = corpus
      .select(explode_outer(Dedup.shingles(col("text"), N)).as("g"))
      .filter(graft.functions.exprs.bloom_might_contain(col("g"), bloom))
    screened.count()
    val plan = screened.queryExecution.executedPlan.toString
    assert(plan.contains("bloom_might_contain"), plan.take(1200))
    assert("\\*\\(\\d+\\)".r.findAllIn(plan).nonEmpty,
      s"no codegen stage around the probe:\n${plan.take(1200)}")
  }
}
