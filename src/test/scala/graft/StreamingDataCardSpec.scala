package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Classifier, Dedup}
import graft.streaming.EventStreams

/** The streaming data card ([[EventStreams.dataCardIngest]], q218's
  * twin): per micro-batch one card row per source, equal to the batch
  * composition replayed on the same rows — funnel verdicts, the
  * history-screen dup rate, the per-source KS drift vs the static
  * reference, and the mixture plan over kept tokens. */
class StreamingDataCardSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.session
  import spark.implicits._

  private def junkify(text: String): String = text.split(" ")
    .map(w => java.security.MessageDigest.getInstance("MD5")
      .digest((w + ":junk").getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.take(8))
    .mkString(" ")

  test("per-batch card rows equal the batch composition; dups, " +
      "blocked and junk shrink the funnel; drift and plan land") {
    val inDir = java.nio.file.Files.createTempDirectory("dc-in")
    val sink = java.nio.file.Files
      .createTempDirectory("dc-out").toString + "/t"
    val ckpt = java.nio.file.Files.createTempDirectory("dc-ck").toString
    val goodTexts = (0 until 12).map(i =>
      s"the quick brown fox jumps over dog $i and runs far away home")
    val train = goodTexts.zipWithIndex.map { case (t, i) =>
      (i.toLong, t, 1L) } ++
      goodTexts.zipWithIndex.map { case (t, i) =>
        (100L + i, junkify(t), -1L) }
    val weights = Classifier.perceptronTrain(
      train.toDF("doc_id", "text", "label"), "text", "doc_id",
      "label", nBuckets = 256, epochs = 2).localCheckpoint(true)
    val history = Dedup.prepareCorpus(
      Seq((1000L, "alpha beta gamma delta epsilon zeta eta theta " +
        "iota kappa")).toDF("doc_id", "text"), "text", "doc_id")
    val reference = (0 until 40).map(i =>
      (s"s${i % 2}", (50L + i))).toDF("source", "n_chars")
      .localCheckpoint(true)
    val ppm = Map("s0" -> 400000L, "s1" -> 200000L)
    val b1 = Seq(
      (200L, "s0", 61L,
        "the quick brown fox jumps over dog A and runs far away home"),
      (201L, "s0", 30L, junkify(goodTexts(1))),
      (202L, "s1", 62L,
        "the quick brown fox jumps over BADWORD and runs far away home"),
      (203L, "s1", 55L,
        "alpha beta gamma delta epsilon zeta eta theta iota kappa2"))
    val b2 = Seq(
      (300L, "s0", 58L,
        "the quick brown fox jumps over dog B and runs far away home"))
    def card(rows: Seq[(Long, String, Long, String)]) =
      EventStreams.dataCardOfBatch(
        rows.toDF("doc_id", "source", "n_chars", "text"),
        "text", "doc_id", "source", "n_chars", weights,
        Seq("BADWORD"), history, reference, ppm, 1000L,
        nBuckets = 256, jaccardThreshold = 0.5)
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
          r.getLong(3), r.getLong(5))).toSet
    b1.toDF("doc_id", "source", "n_chars", "text").coalesce(1)
      .write.parquet(inDir.resolve("b1").toString)
    val stream = spark.readStream
      .schema("doc_id LONG, source STRING, n_chars LONG, text STRING")
      .parquet(inDir.toString + "/*")
    val q = EventStreams.dataCardIngest(stream, "text", "doc_id",
      "source", "n_chars", weights, Seq("BADWORD"), history,
      reference, ppm, 1000L, sink, ckpt, nBuckets = 256,
      jaccardThreshold = 0.5)
    try {
      q.processAllAvailable()
      b2.toDF("doc_id", "source", "n_chars", "text").coalesce(1)
        .write.parquet(inDir.resolve("b2").toString)
      q.processAllAvailable()
      val got = spark.read.parquet(sink)
        .collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
          r.getLong(3), r.getLong(4), r.getLong(6)))
        .toSet
      // batch replay: per batch id the same composition
      val expect =
        card(b1).map(t => (0L, t._1, t._2, t._3, t._4, t._5)) ++
        card(b2).map(t => (1L, t._1, t._2, t._3, t._4, t._5))
      assert(got == expect, s"stream $got != replay $expect")
      // b1/s0: 201 is junk -> 1 of 2 kept; b1/s1: 202 blocked, 203 a
      // history near-dup -> 0 of 2 kept and 1 dup
      val byKey = got.map(r => (r._1, r._2) -> r).toMap
      assert(byKey((0L, "s0"))._3 == 2 && byKey((0L, "s0"))._4 == 1)
      assert(byKey((0L, "s1"))._3 == 2 && byKey((0L, "s1"))._4 == 0 &&
        byKey((0L, "s1"))._6 == 1)
      assert(byKey((1L, "s0"))._3 == 1 && byKey((1L, "s0"))._4 == 1)
      // the q221 temperature plan rides each batch's card rows (r18):
      // stream rows equal a direct temperaturePlan over the batch's
      // per-source kept-token inventory — stream ≡ batch for the
      // temperature columns too
      val gotTemp = spark.read.parquet(sink)
        .select(col("batch_id"), col("source"), col("temp_s_q"),
          col("temp_target_tokens"), col("temp_sample_rate"),
          col("temp_epochs"))
        .collect()
        .map(r => (r.getLong(0), r.getString(1)) ->
          ((r.getLong(2), r.getLong(3), r.getDouble(4), r.getLong(5))))
        .toMap
      val inv = spark.read.parquet(sink)
        .select(col("batch_id"), col("source"), col("kept_tokens"))
        .collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      Seq(0L, 1L).foreach { bid =>
        val bInv = inv.filter(_._1 == bid)
          .map(r => (r._2, r._3)).toSeq
        val direct = graft.operators.Sampling.temperaturePlan(
            bInv.toDF("source", "kept_tokens"),
            "source", "kept_tokens", 1000L, alphaHalvings = 1)
          .collect()
          .map(r => r.getString(0) ->
            ((r.getLong(2), r.getLong(3), r.getDouble(4), r.getLong(5))))
          .toMap
        direct.foreach { case (src, want) =>
          assert(gotTemp((bid, src)) == want,
            s"batch $bid/$src temp plan ${gotTemp((bid, src))} != " +
              s"direct $want")
        }
      }
    } finally q.stop()
  }
}
