package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.TextAnalysis
import graft.streaming.EventStreams

/** Streaming twin of the q188 Kneser–Ney LM gate: the model trains
  * once on the static reference, micro-batches score against it under
  * a fixed kn_mean cutoff, and the streamed survivors equal the batch
  * operator run on the union (the StreamingR14Spec convention). */
class StreamingKnGateSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.session
  import spark.implicits._

  test("kn gate: stream over two micro-batches == batch score+filter " +
      "of the union; sub-threshold docs never reach the sink") {
    val inDir = java.nio.file.Files.createTempDirectory("kn-in")
    val sink = java.nio.file.Files
      .createTempDirectory("kn-out").toString + "/t"
    val ckpt = java.nio.file.Files.createTempDirectory("kn-ck").toString
    val ref = (0L to 9L)
      .map(i => (i, "the cat sat on the mat and the dog ran " * 2))
      .toDF("doc_id", "text")
    val b1 = Seq(
      (100L, "the cat sat on the mat and the dog"),
      (101L, "zzq qqz zqq qzz zzz qqq zqz qzq zzq"))
    val b2 = Seq(
      (200L, "the dog ran the cat sat on the mat"),
      (201L, "qzz zzq zqz wqw qwq zzz qqz zqq qqq"))
    b1.toDF("doc_id", "text").coalesce(1)
      .write.parquet(inDir.resolve("b1").toString)
    val stream = spark.readStream
      .schema("doc_id LONG, text STRING")
      .parquet(inDir.toString + "/*")
    // above the smoothing floor (an all-unseen doc scores about
    // 1/(BT+V+1), which this tiny reference puts near 0.05) and well
    // below the fluent docs' trigram-mass scores
    val cutoff = 0.1
    val q = EventStreams.knGateIngest(stream, ref, "text", "doc_id",
      cutoff, sink, ckpt)
    try {
      q.processAllAvailable()
      b2.toDF("doc_id", "text").coalesce(1)
        .write.parquet(inDir.resolve("b2").toString)
      q.processAllAvailable()
      val streamed = spark.read.parquet(sink)
        .select("doc_id", "n_trigrams", "kn_sum", "kn_mean")
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getDouble(3))).toSet
      val batch = TextAnalysis.knTrigramScore(
          (b1 ++ b2).toDF("doc_id", "text"),
          TextAnalysis.knTrigramModel(ref, "text"), "text", "doc_id")
        .filter(col("kn_mean") >= cutoff)
        .select("doc_id", "n_trigrams", "kn_sum", "kn_mean")
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getDouble(3))).toSet
      assert(streamed == batch, s"stream $streamed != batch $batch")
      val ids = streamed.map(_._1)
      assert(ids.contains(100L) && ids.contains(200L),
        "fluent docs should survive the gate")
      assert(!ids.contains(101L) && !ids.contains(201L),
        "gibberish must not reach the sink")
    } finally q.stop()
  }

  test("moore-lewis gate: stream over two micro-batches == batch " +
      "mooreLewisSelect on the union; general-like docs never land") {
    val inDir = java.nio.file.Files.createTempDirectory("ml-in")
    val sink = java.nio.file.Files
      .createTempDirectory("ml-out").toString + "/t"
    val ckpt = java.nio.file.Files.createTempDirectory("ml-ck").toString
    val refIn = (0L to 9L)
      .map(i => (i, "the cat sat on the mat " * 3)).toDF("doc_id", "text")
    val refGen = (0L to 9L)
      .map(i => (i, "stock market index fell sharply today " * 3))
      .toDF("doc_id", "text")
    val b1 = Seq(
      (100L, "the cat sat on the mat"),
      (101L, "stock market index fell sharply"))
    val b2 = Seq(
      (200L, "the cat sat on the mat the cat"),
      (201L, "market index fell sharply today"))
    b1.toDF("doc_id", "text").coalesce(1)
      .write.parquet(inDir.resolve("b1").toString)
    val stream = spark.readStream
      .schema("doc_id LONG, text STRING")
      .parquet(inDir.toString + "/*")
    val q = EventStreams.mooreLewisIngest(stream, refIn, refGen,
      "text", "doc_id", sink, ckpt)
    try {
      q.processAllAvailable()
      b2.toDF("doc_id", "text").coalesce(1)
        .write.parquet(inDir.resolve("b2").toString)
      q.processAllAvailable()
      val streamed = spark.read.parquet(sink)
        .select("doc_id", "n_trigrams", "kn_in", "kn_gen", "ml_diff")
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getLong(3), r.getLong(4))).toSet
      val batch = graft.operators.Selection.mooreLewisSelect(
          (b1 ++ b2).toDF("doc_id", "text"), refIn, refGen,
          "text", "doc_id")
        .filter(col("selected"))
        .select("doc_id", "n_trigrams", "kn_in", "kn_gen", "ml_diff")
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getLong(3), r.getLong(4))).toSet
      assert(streamed == batch, s"stream $streamed != batch $batch")
      val ids = streamed.map(_._1)
      assert(ids == Set(100L, 200L),
        s"only in-domain-like docs should land, got $ids")
    } finally q.stop()
  }
}
