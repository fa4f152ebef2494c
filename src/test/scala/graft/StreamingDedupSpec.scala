package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.EventStreams

/** Streaming incremental dedup: micro-batches of documents screened
  * against a static corpus via foreachBatch — corpus-side state
  * (fingerprints, banded signatures, shingle sets) is prepared ONCE
  * before the query starts, each batch only probes it; near-dups of the
  * corpus are dropped per batch and novel docs append to the sink. */
class StreamingDedupSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.session

  test("prepared-corpus probe returns exactly the one-shot incrementalDedup result") {
    import spark.implicits._
    val corpus = (1L to 40L).map(i =>
      (i, s"corpus document number $i with some shared words of substance"))
      .toDF("doc_id", "text")
    val batch = Seq(
      (101L, "corpus document number 7 with some shared words of substance"), // exact
      // trailing whitespace: different md5 (survives the exact screen) but
      // an IDENTICAL shingle set (split+trim), so Jaccard = 1.0 and the
      // band collision is guaranteed — a deterministic near-dup drop
      (102L, "corpus document number 9 with some shared words of substance  "),
      (103L, "entirely novel words that resemble nothing in the history"))
      .toDF("doc_id", "text")
    val oneShot = graft.operators.Dedup
      .incrementalDedup(batch, corpus, "text", "doc_id", jaccardThreshold = 0.5)
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    val prepared = graft.operators.Dedup.prepareCorpus(corpus, "text", "doc_id")
    val viaPrepared = graft.operators.Dedup
      .incrementalDedupPrepared(batch, prepared, "text", "doc_id",
        jaccardThreshold = 0.5)
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(viaPrepared == oneShot)
    assert(viaPrepared == Seq(103L))
  }

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
