package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Packing
import graft.streaming.EventStreams

/** Streaming exact-fill sequence packing (`EventStreams.packedIngest`)
  * — the q194/q196 family's continuous-ingestion twin: micro-batches
  * pack as the continuation of everything packed before them, so the
  * sink equals one batch `packSequences` run over the concatenated
  * stream, sequences filling ACROSS batch boundaries; a restarted
  * query re-derives its offset from the sink. */
class StreamingPackSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.session
  import spark.implicits._

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  test("streamed micro-batches == batch packSequences over the " +
      "concatenated stream; sequences fill across batch boundaries; " +
      "a fresh query resumes from the sink's committed offset") {
    val L = 64L
    val rng = new scala.util.Random(11)
    val all = (0 until 90)
      .map(i => (i.toLong, 1L + rng.nextInt(40).toLong))
    val expected = Packing.packSequences(
        all.toDF("doc_id", "n_tokens"), "n_tokens", "doc_id", L)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sorted.toSeq

    val sink = tmp("pack-out") + "/t"
    val in1 = java.nio.file.Files.createTempDirectory("pack-in1")
    val q1 = EventStreams.packedIngest(
      spark.readStream.schema("doc_id LONG, n_tokens LONG")
        .parquet(in1.toString + "/*"),
      "n_tokens", "doc_id", L, sink, tmp("pack-ck1"))
    try {
      all.slice(0, 50).toDF("doc_id", "n_tokens")
        .coalesce(1).write.parquet(in1.resolve("b1").toString)
      q1.processAllAvailable()
      all.slice(50, 70).toDF("doc_id", "n_tokens")
        .coalesce(1).write.parquet(in1.resolve("b2").toString)
      q1.processAllAvailable()
    } finally q1.stop()

    // a FRESH query (new source, new checkpoint) against the same sink
    // must resume exactly where the committed output ends
    val in2 = java.nio.file.Files.createTempDirectory("pack-in2")
    val q2 = EventStreams.packedIngest(
      spark.readStream.schema("doc_id LONG, n_tokens LONG")
        .parquet(in2.toString + "/*"),
      "n_tokens", "doc_id", L, sink, tmp("pack-ck2"))
    try {
      all.slice(70, 90).toDF("doc_id", "n_tokens")
        .coalesce(1).write.parquet(in2.resolve("b3").toString)
      q2.processAllAvailable()
    } finally q2.stop()

    val got = spark.read.parquet(sink)
      .collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("seq_id"),
        r.getAs[Long]("piece_start"), r.getAs[Long]("piece_tokens")))
      .sorted.toSeq
    assert(got == expected)

    // the boundary behavior actually exercised: some sequence holds
    // pieces from docs on both sides of a batch split (b1 ends at doc
    // 49; unless its token total landed exactly on a sequence edge,
    // the open sequence is completed by batch 2)
    val tokensB1 = all.slice(0, 50).map(_._2).sum
    if (tokensB1 % L != 0) {
      val boundarySeq = tokensB1 / L
      val members = got.filter(_._2 == boundarySeq).map(_._1)
      assert(members.exists(_ < 50) && members.exists(_ >= 50),
        s"sequence $boundarySeq does not span the batch boundary")
    }
  }
}
