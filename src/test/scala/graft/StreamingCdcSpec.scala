package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Scd
import graft.streaming.EventStreams

/** Streaming CDC twin of q136's `snapshotDiff` (batch ≡ stream): keyed
  * micro-batches of after-image rows flow through the SAME null-safe
  * classification via foreachBatch, and the per-batch union plus the
  * end-of-stream `removedKeys` sweep reproduces the one-shot
  * `snapshotDiff` exactly. */
class StreamingCdcSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.session

  private def diffMap(rows: Array[org.apache.spark.sql.Row]): Map[Long, String] =
    rows.map(r => r.getLong(0) -> r.getString(1)).toMap

  test("upsertDiff + removedKeys over key-disjoint slices equals one-shot " +
      "snapshotDiff (incl. NULL-vs-value changes)") {
    import spark.implicits._
    val before = Seq(
      (1L, Some("a"), 10.0), (2L, Some("b"), 20.0), (3L, None, 30.0),
      (4L, Some("d"), 40.0), (5L, Some("e"), 50.0))
      .toDF("k", "attr", "bal")
    val after = Seq(
      (1L, Some("a"), 10.0),          // unchanged
      (2L, Some("B"), 20.0),          // changed (value)
      (3L, Some("c"), 30.0),          // changed (NULL -> value)
      (7L, Some("new"), 70.0))        // added; 4,5 removed
      .toDF("k", "attr", "bal")
    val oneShot = diffMap(Scd.snapshotDiff(before, after,
      Seq("k"), Seq("attr", "bal")).collect())
    val slices = Seq(after.filter(col("k") <= 2L), after.filter(col("k") > 2L))
    val viaSlices = slices.map(s => diffMap(Scd.upsertDiff(before, s,
        Seq("k"), Seq("attr", "bal")).collect()))
      .reduce(_ ++ _) ++
      diffMap(Scd.removedKeys(before, after, Seq("k")).collect())
    assert(viaSlices == oneShot)
    assert(oneShot == Map(1L -> "unchanged", 2L -> "changed",
      3L -> "changed", 4L -> "removed", 5L -> "removed", 7L -> "added"))
  }

  test("cdcIngest micro-batches + removed sweep equal the batch snapshotDiff") {
    import spark.implicits._
    val inDir = java.nio.file.Files.createTempDirectory("cdc-in")
    val sink = java.nio.file.Files.createTempDirectory("cdc-out").toString + "/t"
    val ckpt = java.nio.file.Files.createTempDirectory("cdc-ck").toString

    val before = Seq(
      (1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0),
      (4L, "d", 40.0), (5L, "e", 50.0), (6L, "f", 60.0))
      .toDF("k", "attr", "bal")

    // batch 1: 1 unchanged, 2 changed, 7 added
    Seq((1L, "a", 10.0), (2L, "bX", 20.0), (7L, "g", 70.0))
      .toDF("k", "attr", "bal")
      .coalesce(1).write.parquet(inDir.resolve("b1").toString)

    val stream = spark.readStream
      .schema("k LONG, attr STRING, bal DOUBLE")
      .parquet(inDir.toString + "/*")
    val q = EventStreams.cdcIngest(stream, before,
      Seq("k"), Seq("attr", "bal"), sink, ckpt)
    try {
      q.processAllAvailable()
      val afterB1 = diffMap(spark.read.parquet(sink).collect())
      assert(afterB1 == Map(1L -> "unchanged", 2L -> "changed", 7L -> "added"))

      // batch 2: 3 changed (bal), 8 added; 4,5,6 never arrive
      Seq((3L, "c", 31.0), (8L, "h", 80.0))
        .toDF("k", "attr", "bal")
        .coalesce(1).write.parquet(inDir.resolve("b2").toString)
      q.processAllAvailable()

      val streamed = diffMap(spark.read.parquet(sink).collect())
      val allAfter = Seq(
        (1L, "a", 10.0), (2L, "bX", 20.0), (7L, "g", 70.0),
        (3L, "c", 31.0), (8L, "h", 80.0)).toDF("k", "attr", "bal")
      val sweep = diffMap(Scd.removedKeys(before, allAfter, Seq("k")).collect())
      val oneShot = diffMap(Scd.snapshotDiff(before, allAfter,
        Seq("k"), Seq("attr", "bal")).collect())
      assert(streamed ++ sweep == oneShot)
      assert(sweep.keySet == Set(4L, 5L, 6L))
    } finally q.stop()
  }
}
