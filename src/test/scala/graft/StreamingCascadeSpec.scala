package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Cascade

/** The rule-match stage of the cascade running CONTINUOUSLY: a stream of
  * crawl records equi-joined (stream-static) against the ABR dimension —
  * the incremental-ingest shape a production matcher runs between bulk
  * refreshes. The same Cascade.ruleMatch code serves batch and stream. */
class StreamingCascadeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.session

  test("streaming rule-match equals its batch twin") {
    import spark.implicits._
    val abr = Seq(
      ("51824753556", "Harbour Mining Group Pty Ltd"),
      ("83914571673", "Wattle Consulting"))
      .toDF("abr_abn", "abr_name")

    val crawlRows = Seq(
      ("a.com.au", "51824753556"),
      ("b.com.au", "99999999999"), // unmatched
      ("c.com.au", "83914571673"))
    val dir = java.nio.file.Files.createTempDirectory("stream-cascade")
    crawlRows.toDF("domain", "crawl_abn")
      .write.parquet(dir.resolve("batch0").toString)

    val crawlStream = spark.readStream
      .schema("domain STRING, crawl_abn STRING")
      .parquet(dir.toString + "/*")
    val matched = Cascade.ruleMatch(crawlStream, abr, "crawl_abn", "abr_abn")

    val q = matched.writeStream.outputMode("append")
      .format("memory").queryName("stream_rule_match").start()
    try {
      q.processAllAvailable()
      val got = spark.table("stream_rule_match")
        .select("domain", "abr_abn", "match_method", "match_confidence")
        .collect().map(r => (r.getString(0), r.getString(1), r.getString(2),
          r.getString(3))).toSet
      assert(got == Set(
        ("a.com.au", "51824753556", "rule_based_abn", "high"),
        ("c.com.au", "83914571673", "rule_based_abn", "high")))
    } finally q.stop()
  }

  test("the FULL q141 variant-corpus cascade (clean -> rule -> residue " +
      "-> blocked fuzzy -> LLM stub -> union) through foreachBatch " +
      "equals its batch twin row-for-row (r13)") {
    val dir = "/root/testdata/sf0.001"
    val (abr, crawl) = SparkEntry.variantCorpus(spark, dir)
    def shape(df: org.apache.spark.sql.DataFrame) = df
      .select("crawl_domain", "crawl_company_name", "abr_abn",
        "match_method", "match_score", "match_confidence")
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2),
        r.getString(3), String.valueOf(r.get(4)), r.getString(5)))
      .toSet
    val batch = shape(graft.pipeline.Pipeline.run(spark, abr, crawl,
      graft.pipeline.Pipeline.Config(enableLlm = true)))
    assert(batch.nonEmpty, "batch cascade produced nothing")

    // stream the crawl side in TWO micro-batches; each batch runs the
    // IDENTICAL pipeline against the static abr dimension — the
    // incremental-ingest twin of the flagship query
    val tmp = java.nio.file.Files.createTempDirectory("stream-q141")
    val crawlRows = crawl.cache()
    val half = crawlRows.count() / 2
    crawlRows.filter(col("postcode").cast("long") % 2 === 0)
      .write.parquet(tmp.resolve("b0").toString)
    crawlRows.filter(col("postcode").cast("long") % 2 === 1)
      .write.parquet(tmp.resolve("b1").toString)
    val schema = crawl.schema
    val streamed = scala.collection.mutable.Set
      .empty[(String, String, String, String, String, String)]
    val q = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(tmp.toString + "/*")
      .writeStream.outputMode("append")
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        streamed.synchronized {
          streamed ++= shape(graft.pipeline.Pipeline.run(spark, abr, b,
            graft.pipeline.Pipeline.Config(enableLlm = true)))
        }
        ()
      }
      .start()
    try q.processAllAvailable() finally q.stop()
    crawlRows.unpersist()
    assert(half > 0)
    assert(streamed.toSet == batch,
      s"stream/batch diverge: only-stream=${(streamed.toSet -- batch).take(3)} " +
        s"only-batch=${(batch -- streamed).take(3)}")
  }
}
