package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Classifier
import graft.streaming.EventStreams

/** The calibrated streaming gates (VERDICT r16 item 6): stream ≡ batch
  * for [[EventStreams.calibratedGateIngest]] and
  * [[EventStreams.calibratedTagIngest]], INCLUDING the isotonic
  * step-function edge bins — a score below the lowest trained bin
  * (clamps up), a score in an interior gap bin (takes the greatest
  * trained bin below), and a trained-bin hit.
  *
  * Scores are ENGINEERED, not trained: with every token bucket's weight
  * set to the same value v and the bias bucket (= nBuckets) to b, a
  * doc with n tokens scores exactly v·n + b regardless of hash
  * collisions — so each fixture doc lands in a chosen bin. */
class CalibratedRouterSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.session
  import spark.implicits._

  private val NB = 8

  /** (bucket, w) for buckets 0..NB-1 = tokenW plus bias bucket NB. */
  private def flatWeights(tokenW: Long, bias: Long) =
    ((0 until NB).map(b => (b.toLong, tokenW)) :+ (NB.toLong, bias))
      .toDF("bucket", "w")

  /** Calibrator over bins 0 (lo 0, rate 0.2) and 3 (lo 24, rate 0.9)
    * at binWidth 8 — bins 1..2 are interior gaps, bins < 0 untrained. */
  private def calibrator() = Classifier.isotonicCalibrate(
    Seq((0L, 0L, 10L, 2L), (3L, 24L, 10L, 9L))
      .toDF("bin", "lo", "n", "n_pos"))

  private def doc(id: Long, n: Int): (Long, String) =
    (id, (1 to n).map(i => s"t$i").mkString(" "))

  test("calibrated gate: stream == batch composition; below-lowest " +
      "clamps up, gap bin takes the greatest trained bin below") {
    val inDir = java.nio.file.Files.createTempDirectory("cg-in")
    val sink = java.nio.file.Files
      .createTempDirectory("cg-out").toString + "/t"
    val ckpt = java.nio.file.Files.createTempDirectory("cg-ck").toString
    // score = 4n - 10: n=1 -> -6 (bin -1, below lowest -> 0.2);
    // n=3 -> 2 (bin 0 -> 0.2); n=7 -> 18 (bin 2, gap -> 0.2);
    // n=9 -> 26 (bin 3 -> 0.9, the only pass at minProb 0.5)
    val w = flatWeights(4L, -10L).localCheckpoint(true)
    val cal = calibrator().localCheckpoint(true)
    val b1 = Seq(doc(1L, 1), doc(2L, 3))
    val b2 = Seq(doc(3L, 7), doc(4L, 9))
    b1.toDF("doc_id", "text").coalesce(1)
      .write.parquet(inDir.resolve("b1").toString)
    val stream = spark.readStream
      .schema("doc_id LONG, text STRING")
      .parquet(inDir.toString + "/*")
    val q = EventStreams.calibratedGateIngest(stream, w, cal,
      "text", "doc_id", binWidth = 8L, minProb = 0.5, sink, ckpt, NB)
    try {
      q.processAllAvailable()
      b2.toDF("doc_id", "text").coalesce(1)
        .write.parquet(inDir.resolve("b2").toString)
      q.processAllAvailable()
      val got = spark.read.parquet(sink).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
          r.getBoolean(3))).toSet
      val batch = Classifier.calibrateScores(
          Classifier.perceptronScore((b1 ++ b2).toDF("doc_id", "text"),
            w, "text", "doc_id", NB), cal, "score", 8L)
        .select(col("doc_id"), col("score"), col("cal_rate"),
          (col("cal_rate") >= 0.5).as("passed"))
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
          r.getBoolean(3))).toSet
      assert(got == batch, s"stream $got != batch $batch")
      val byId = got.map(r => r._1 -> r).toMap
      assert(byId(1L)._2 == -6L && byId(1L)._3 == 0.2 && !byId(1L)._4,
        "below-lowest score must clamp up to bin 0's rate")
      assert(byId(3L)._2 == 18L && byId(3L)._3 == 0.2 && !byId(3L)._4,
        "gap-bin score must take the greatest trained bin below")
      assert(byId(4L)._2 == 26L && byId(4L)._3 == 0.9 && byId(4L)._4,
        "trained high bin must pass the 0.5 gate")
    } finally q.stop()
  }

  test("calibrated router: stream == batch; low-confidence argmax " +
      "lands in the review lane") {
    val inDir = java.nio.file.Files.createTempDirectory("cr-in")
    val sink = java.nio.file.Files
      .createTempDirectory("cr-out").toString + "/t"
    val ckpt = java.nio.file.Files.createTempDirectory("cr-ck").toString
    // k0 scores 4n-10, k1 scores 2n-1: argmax is k1 for n<5 (low
    // margins) and k0 for n>=5; winner margins land in the q215-style
    // bins (n=2 -> k1@3 -> bin 0 -> 0.2; n=9 -> k0@26 -> bin 3 -> 0.9)
    val w = flatWeights(4L, -10L).withColumn("label", lit("k0"))
      .unionByName(
        flatWeights(2L, -1L).withColumn("label", lit("k1")))
      .select(col("label"), col("bucket"), col("w"))
      .localCheckpoint(true)
    val cal = calibrator().localCheckpoint(true)
    val b1 = Seq(doc(1L, 2))
    val b2 = Seq(doc(2L, 9), doc(3L, 7))
    b1.toDF("doc_id", "text").coalesce(1)
      .write.parquet(inDir.resolve("b1").toString)
    val stream = spark.readStream
      .schema("doc_id LONG, text STRING")
      .parquet(inDir.toString + "/*")
    val q = EventStreams.calibratedTagIngest(stream, w, cal,
      "text", "doc_id", binWidth = 8L, minProb = 0.5, sink, ckpt, NB)
    try {
      q.processAllAvailable()
      b2.toDF("doc_id", "text").coalesce(1)
        .write.parquet(inDir.resolve("b2").toString)
      q.processAllAvailable()
      val got = spark.read.parquet(sink).collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
          r.getDouble(3), r.getBoolean(4))).toSet
      val batch = Classifier.calibrateScores(
          Classifier.perceptronScoreMulti(
            (b1 ++ b2).toDF("doc_id", "text"), w, "text", "doc_id", NB),
          cal, "score", 8L)
        .select(col("doc_id"), col("predicted"), col("score"),
          col("cal_rate"), (col("cal_rate") >= 0.5).as("routed"))
        .collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
          r.getDouble(3), r.getBoolean(4))).toSet
      assert(got == batch, s"stream $got != batch $batch")
      val byId = got.map(r => r._1 -> r).toMap
      assert(byId(1L)._2 == "k1" && byId(1L)._3 == 3L && !byId(1L)._5,
        "low-margin doc must route to review")
      assert(byId(2L)._2 == "k0" && byId(2L)._3 == 26L && byId(2L)._5,
        "high-confidence doc must route")
      assert(byId(3L)._2 == "k0" && !byId(3L)._5,
        "gap-bin confidence stays under the routing threshold")
    } finally q.stop()
  }
}
