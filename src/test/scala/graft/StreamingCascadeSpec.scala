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
}
