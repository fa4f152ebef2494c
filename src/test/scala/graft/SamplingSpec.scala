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

  test("stratified sample keeps k per group") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.01")
    val got = Sampling.stratifiedSample(docs, "lang", "doc_id", 10)
    val counts = got.groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts.values.forall(_ == 10), counts.toString)
    assert(counts.keySet == Set("en", "es", "de", "fr", "zh"))
  }
}
