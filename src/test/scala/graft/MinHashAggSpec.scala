package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.MinHashAgg
import graft.operators.Dedup

/** Group-level MinHash aggregation: per-source signatures estimate
  * corpus-overlap Jaccard without pairwise doc comparison. */
class MinHashAggSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.session

  test("aggregated signature equals the signature of the union of sets") {
    import spark.implicits._
    val k = 16
    val docs = Seq(
      ("srcA", "the quick brown fox jumps over the lazy dog"),
      ("srcA", "pack my box with five dozen liquor jugs"),
      ("srcB", "the quick brown fox jumps over the lazy dog"),
      ("srcB", "pack my box with five dozen liquor jugs"))
      .toDF("src", "text").withColumn("doc_id", monotonically_increasing_id())
    val sigs = Dedup.shingleHashSet(docs, "text", "doc_id", 3)
      .join(docs.select(col("doc_id").as("doc"), col("src")), Seq("doc"))
      .withColumn("sig", Dedup.minhashSignature(col("sh"), k))
    val grouped = sigs.groupBy("src")
      .agg(MinHashAgg.group_minhash(k)(col("sig")).as("gsig"))
      .collect().map(r => r.getString(0) ->
        r.getAs[scala.collection.Seq[Long]]("gsig").toSeq).toMap
    // identical corpora → identical group signatures
    assert(grouped("srcA") == grouped("srcB"))
    assert(grouped("srcA").length == k)
  }

  test("estimated Jaccard separates overlapping from disjoint corpora") {
    import spark.implicits._
    val k = 32
    val base = (0 until 30).map(i => ("A", s"shared document number $i about topic $i"))
    val overlap = base.map { case (_, t) => ("B", t) } ++
      (0 until 10).map(i => ("B", s"extra b-only item $i"))
    val disjoint = (0 until 30).map(i => ("C", s"totally different corpus entry $i"))
    val docs = (base ++ overlap ++ disjoint).toDF("src", "text")
      .withColumn("doc_id", monotonically_increasing_id())
    val sigs = Dedup.shingleHashSet(docs, "text", "doc_id", 2)
      .join(docs.select(col("doc_id").as("doc"), col("src")), Seq("doc"))
      .withColumn("sig", Dedup.minhashSignature(col("sh"), k))
    val g = sigs.groupBy("src")
      .agg(MinHashAgg.group_minhash(k)(col("sig")).as("gsig"))
    val pairs = g.select(col("src").as("src_a"), col("gsig").as("sig_a"))
      .crossJoin(g.select(col("src").as("src_b"), col("gsig").as("sig_b")))
      .filter(col("src_a") < col("src_b"))
      .select(col("src_a"), col("src_b"),
        MinHashAgg.estimatedJaccard(col("sig_a"), col("sig_b")).as("j"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2))
      .toMap
    assert(pairs(("A", "B")) > pairs(("A", "C")),
      s"overlap ${pairs(("A", "B"))} should beat disjoint ${pairs(("A", "C"))}")
    assert(pairs(("A", "B")) > 0.5)
  }
}
