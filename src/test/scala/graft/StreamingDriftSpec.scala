package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Stats
import graft.streaming.EventStreams

/** Streaming twin of the q206 KS drift monitor: each micro-batch is
  * KS-tested independently against the static reference, and every
  * sink row equals the batch [[Stats.ksStatistic]] on that batch's
  * input (the StreamingR14Spec convention); the `drifted` flag fires
  * exactly on the shifted batch. */
class StreamingDriftSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.session
  import spark.implicits._

  test("drift monitor: per-batch rows == batch ksStatistic; the " +
      "shifted batch alarms, the in-distribution batch does not") {
    val inDir = java.nio.file.Files.createTempDirectory("ks-in")
    val sink = java.nio.file.Files
      .createTempDirectory("ks-out").toString + "/t"
    val ckpt = java.nio.file.Files.createTempDirectory("ks-ck").toString
    val ref = (1L to 100L).map(i => i % 10L + 1L).toDF("len")
    // b1 draws from the reference's value range; b2 is shifted far right
    val b1 = (0 until 40).map(i => i.toLong % 10L + 1L)
    val b2 = (0 until 30).map(i => i.toLong % 10L + 500L)
    b1.toDF("len").coalesce(1)
      .write.parquet(inDir.resolve("b1").toString)
    val stream = spark.readStream
      .schema("len LONG")
      .parquet(inDir.toString + "/*")
    val q = EventStreams.driftMonitorIngest(stream, ref, "len",
      sink, ckpt, minKs = 0.5)
    try {
      q.processAllAvailable()
      b2.toDF("len").coalesce(1)
        .write.parquet(inDir.resolve("b2").toString)
      q.processAllAvailable()
      val rows = spark.read.parquet(sink)
        .orderBy(col("batch_id"))
        .collect()
        .map(r => (r.getLong(1), r.getLong(2), r.getLong(3),
          r.getLong(4), r.getDouble(5), r.getBoolean(6)))
      assert(rows.length == 2, s"one row per batch: ${rows.length}")
      // each sink row replays the batch operator on that batch alone
      val expect = Seq(b1, b2).map { bv =>
        val r = Stats.ksStatistic(bv.toDF("len"), ref, "len").head()
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
          r.getDouble(4))
      }
      rows.zip(expect).foreach { case (got, want) =>
        assert((got._1, got._2, got._3, got._4, got._5) == want,
          s"stream $got != batch $want")
      }
      // disjoint support in b2 -> KS = 1 -> alarm; b1 stays quiet
      assert(!rows(0)._6 && rows(0)._5 < 0.5,
        s"in-distribution batch must not alarm: ${rows(0)}")
      assert(rows(1)._6 && rows(1)._5 == 1.0,
        s"shifted batch must alarm: ${rows(1)}")
    } finally q.stop()
  }

  test("eval monitor: per-batch AUC == batch aucExact; the degraded " +
      "batch alarms; a one-class batch is skipped") {
    import graft.operators.Classifier
    val inDir = java.nio.file.Files.createTempDirectory("auc-in")
    val sink = java.nio.file.Files
      .createTempDirectory("auc-out").toString + "/t"
    val ckpt = java.nio.file.Files.createTempDirectory("auc-ck").toString
    // b1 well-separated (auc 1.0); b2 anti-correlated (auc ~0);
    // b3 one-class -> no row
    val b1 = (1 to 20).map(i =>
      (i.toLong, if (i <= 10) 100L + i else i.toLong,
        if (i <= 10) 1L else -1L))
    val b2 = (1 to 20).map(i =>
      (100L + i, if (i <= 10) i.toLong else 100L + i,
        if (i <= 10) 1L else -1L))
    val b3 = (1 to 5).map(i => (200L + i, i.toLong, 1L))
    def writeBatch(rows: Seq[(Long, Long, Long)], name: String): Unit =
      rows.toDF("id", "score", "label").coalesce(1)
        .write.parquet(inDir.resolve(name).toString)
    writeBatch(b1, "b1")
    val stream = spark.readStream
      .schema("id LONG, score LONG, label LONG")
      .parquet(inDir.toString + "/*")
    val q = EventStreams.evalMonitorIngest(stream, "score", "label",
      sink, ckpt, minAuc = 0.8)
    try {
      q.processAllAvailable()
      writeBatch(b2, "b2"); q.processAllAvailable()
      writeBatch(b3, "b3"); q.processAllAvailable()
      val rows = spark.read.parquet(sink).orderBy(col("batch_id"))
        .collect()
        .map(r => (r.getLong(1), r.getLong(2), r.getLong(3),
          r.getDouble(4), r.getBoolean(5)))
      assert(rows.length == 2, s"one-class batch must be skipped: $rows")
      val expect = Seq(b1, b2).map { bv =>
        val r = Classifier.aucExact(bv.toDF("id", "score", "label"),
          "score", "label").head()
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))
      }
      rows.zip(expect).foreach { case (got, want) =>
        assert((got._1, got._2, got._3, got._4) == want,
          s"stream $got != batch $want")
      }
      assert(rows(0)._4 == 1.0 && !rows(0)._5,
        s"separated batch must not alarm: ${rows(0)}")
      assert(rows(1)._4 < 0.2 && rows(1)._5,
        s"anti-correlated batch must alarm: ${rows(1)}")
    } finally q.stop()
  }
}
