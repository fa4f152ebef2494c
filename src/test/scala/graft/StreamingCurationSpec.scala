package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Classifier, Dedup, Packing}
import graft.streaming.EventStreams

/** End-to-end streaming curation ([[EventStreams.curationIngest]]):
  * trained quality gate + blocklist + LIVE near-dup screen (the index
  * absorbing each batch's survivors) + exact-fill packing as the
  * stream's continuation — every stage's rejection observable in the
  * sink, and the packed rows equal to the per-batch batch operators
  * replayed with the same running offset. */
class StreamingCurationSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.session
  import spark.implicits._

  private def junkify(text: String): String = text.split(" ")
    .map(w => java.security.MessageDigest.getInstance("MD5")
      .digest((w + ":junk").getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.take(8))
    .mkString(" ")

  test("curation ingest: junk, blocked, history-dup and cross-batch " +
      "near-dup all rejected; survivors pack as one continuous stream") {
    val inDir = java.nio.file.Files.createTempDirectory("cur-in")
    val sink = java.nio.file.Files
      .createTempDirectory("cur-out").toString + "/t"
    val ckpt = java.nio.file.Files.createTempDirectory("cur-ck").toString
    val goodTexts = (0 until 12).map(i =>
      s"the quick brown fox jumps over dog $i and runs far away home")
    // train the q190-style filter: real vs md5-junk twins
    val train = goodTexts.zipWithIndex.map { case (t, i) =>
      (i.toLong, t, 1L) } ++
      goodTexts.zipWithIndex.map { case (t, i) =>
        (100L + i, junkify(t), -1L) }
    val weights = Classifier.perceptronTrain(
      train.toDF("doc_id", "text", "label"), "text", "doc_id",
      "label", nBuckets = 256, epochs = 2).localCheckpoint(true)
    // dedup history holds doc h1; b1's 203 is its near-copy
    val history = Dedup.prepareCorpus(
      Seq((1000L, "alpha beta gamma delta epsilon zeta eta theta " +
        "iota kappa")).toDF("doc_id", "text"), "text", "doc_id")
    val b1 = Seq(
      (200L, "the quick brown fox jumps over dog A and runs far away home"),
      // junk in the TRAINED junk vocabulary (goodTexts(1)'s twin), so
      // the gate's learned negative weights fire on it
      (201L, junkify(goodTexts(1))),
      (202L, "the quick brown fox jumps over BADWORD and runs far away home"),
      (203L, "alpha beta gamma delta epsilon zeta eta theta iota kappa2"))
    val b2 = Seq(
      // near-copy of b1's survivor 200 — only the absorb catches it
      (300L, "the quick brown fox jumps over dog A and runs far away homes"),
      (301L, "the quick brown fox jumps over dog B and runs far away home"))
    b1.toDF("doc_id", "text").coalesce(1)
      .write.parquet(inDir.resolve("b1").toString)
    val stream = spark.readStream
      .schema("doc_id LONG, text STRING")
      .parquet(inDir.toString + "/*")
    val q = EventStreams.curationIngest(stream, "text", "doc_id",
      weights, Seq("BADWORD"), history, seqLen = 8L, sink, ckpt,
      nBuckets = 256, jaccardThreshold = 0.5, checkpointEvery = 2)
    try {
      q.processAllAvailable()
      b2.toDF("doc_id", "text").coalesce(1)
        .write.parquet(inDir.resolve("b2").toString)
      q.processAllAvailable()
      val rows = spark.read.parquet(sink)
        .select("doc_id", "seq_id", "piece_start", "piece_tokens")
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getLong(3)))
      val landed = rows.map(_._1).toSet
      // junk (201) fails the quality gate, 202 is blocklisted, 203 is a
      // history near-dup, 300 is a near-dup of the ABSORBED 200
      assert(landed == Set(200L, 301L),
        s"expected only 200 and 301 to land, got $landed")
      // the pack is the continuation: replay the batch packer per batch
      val d200 = b1.head._2
      val d301 = b2(1)._2
      val expect1 = Packing.packSequences(
        Seq((200L, d200.split(" ").length.toLong)).toDF("doc_id", "n"),
        "n", "doc_id", 8L).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      val off1 = d200.split(" ").length.toLong
      val expect2 = Packing.packSequences(
        Seq((301L, d301.split(" ").length.toLong)).toDF("doc_id", "n"),
        "n", "doc_id", 8L, baseOffset = off1).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      assert(rows.toSet == (expect1 ++ expect2).toSet,
        s"stream pack ${rows.toSet} != replayed ${(expect1 ++ expect2).toSet}")
      // cross-batch fill: 301's first piece completes 200's open sequence
      val seqTotals = rows.groupBy(_._2).view.mapValues(_.map(_._4).sum)
      val maxSeq = rows.map(_._2).max
      seqTotals.foreach { case (seq, tot) =>
        if (seq < maxSeq) assert(tot == 8L,
          s"sequence $seq must be exactly filled, got $tot") }
      assert(rows.exists(r => r._1 == 301L && r._2 == off1 / 8L),
        "301 must continue the sequence 200 left open")
    } finally q.stop()
  }

  test("curation ingest with indexPath: a restarted query rehydrates " +
      "the absorbed near-dup index from the persisted artifact, so " +
      "near-copies of pre-crash survivors stay rejected") {
    val inDir = java.nio.file.Files.createTempDirectory("curp-in")
    val sink = java.nio.file.Files
      .createTempDirectory("curp-out").toString + "/t"
    val ckpt = java.nio.file.Files.createTempDirectory("curp-ck").toString
    val idxPath = java.nio.file.Files
      .createTempDirectory("curp-idx").toString + "/idx"
    val goodTexts = (0 until 12).map(i =>
      s"the quick brown fox jumps over dog $i and runs far away home")
    val train = goodTexts.zipWithIndex.map { case (t, i) =>
      (i.toLong, t, 1L) } ++
      goodTexts.zipWithIndex.map { case (t, i) =>
        (100L + i, junkify(t), -1L) }
    val weights = Classifier.perceptronTrain(
      train.toDF("doc_id", "text", "label"), "text", "doc_id",
      "label", nBuckets = 256, epochs = 2).localCheckpoint(true)
    val seedCorpus = Seq((1000L, "alpha beta gamma delta epsilon " +
      "zeta eta theta iota kappa")).toDF("doc_id", "text")
    def seed() = Dedup.prepareCorpus(seedCorpus, "text", "doc_id")
    def start() = {
      val stream = spark.readStream
        .schema("doc_id LONG, text STRING")
        .parquet(inDir.toString + "/*")
      // the seed is rebuilt STALE on each start — only the persisted
      // index can carry batch-1 absorptions across the restart
      EventStreams.curationIngest(stream, "text", "doc_id",
        weights, Seq("BADWORD"), seed(), seqLen = 8L, sink, ckpt,
        nBuckets = 256, jaccardThreshold = 0.5, checkpointEvery = 1,
        indexPath = Some(idxPath))
    }
    val b1 = Seq((400L,
      "the quick brown fox jumps over dog A and runs far away home"))
    b1.toDF("doc_id", "text").coalesce(1)
      .write.parquet(inDir.resolve("b1").toString)
    val q1 = start()
    try q1.processAllAvailable() finally q1.stop()
    // "crash": the second query only has the stale seed + the artifact
    Seq(
      // near-copy of the pre-restart survivor 400 — rejected only if
      // the index was rehydrated from idxPath
      (401L,
        "the quick brown fox jumps over dog A and runs far away homes"),
      (402L,
        "the quick brown fox jumps over dog B and runs far away home"))
      .toDF("doc_id", "text").coalesce(1)
      .write.parquet(inDir.resolve("b2").toString)
    val q2 = start()
    try {
      q2.processAllAvailable()
      val landed = spark.read.parquet(sink)
        .select("doc_id").collect().map(_.getLong(0)).toSet
      assert(landed == Set(400L, 402L),
        s"expected 401 rejected after restart, got $landed")
    } finally q2.stop()
  }
}
