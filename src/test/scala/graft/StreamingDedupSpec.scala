package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.EventStreams

/** Streaming incremental dedup: micro-batches of documents screened
  * against a static corpus via foreachBatch + Dedup.incrementalDedup —
  * near-dups of the corpus are dropped per batch, novel docs append to
  * the sink, and the screen re-runs independently for every batch. */
class StreamingDedupSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.session

  test("micro-batched ingest keeps only documents novel vs the corpus") {
    import spark.implicits._
    val inDir = java.nio.file.Files.createTempDirectory("sdedup-in")
    val sink = java.nio.file.Files.createTempDirectory("sdedup-out").toString + "/t"
    val ckpt = java.nio.file.Files.createTempDirectory("sdedup-ck").toString

    val corpus = Seq(
      (1L, "the quick brown fox jumps over the lazy dog today again"),
      (2L, "completely different text about spark sql execution engines"))
      .toDF("doc_id", "text")

    // batch 1: one exact dup, one near-dup (tail truncated), one novel
    Seq(
      (10L, "the quick brown fox jumps over the lazy dog today again"),
      (11L, "the quick brown fox jumps over the lazy dog today"),
      (12L, "entirely novel words nowhere near anything in history yet"))
      .toDF("doc_id", "text")
      .coalesce(1).write.parquet(inDir.resolve("b1").toString)

    val stream = spark.readStream
      .schema("doc_id LONG, text STRING")
      .parquet(inDir.toString + "/*")
    val q = EventStreams.dedupedIngest(stream, corpus, "text", "doc_id",
      sink, ckpt, jaccardThreshold = 0.5)
    try {
      q.processAllAvailable()
      val afterB1 = spark.read.parquet(sink)
        .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
      assert(afterB1 == Seq(12L))

      // batch 2: another corpus near-dup + another novel doc
      Seq(
        (20L, "different text about spark sql execution engines"),
        (21L, "fresh unrelated content arriving in the second batch now"))
        .toDF("doc_id", "text")
        .coalesce(1).write.parquet(inDir.resolve("b2").toString)
      q.processAllAvailable()
      val afterB2 = spark.read.parquet(sink)
        .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
      assert(afterB2 == Seq(12L, 21L))
    } finally q.stop()
  }
}
