package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Linkage
import graft.streaming.EventStreams

/** Streaming record linkage: micro-batches of incoming records scored
  * against a static reference with a pre-calibrated Fellegi–Sunter
  * model via foreachBatch — model calibration happens ONCE before the
  * query starts, scoring is joins + a pure map, batch ≡ stream.
  */
class StreamingLinkageSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.session

  private def reference = {
    import spark.implicits._
    Seq((1L, 10L, "red", "S"), (2L, 10L, "red", "M"),
      (3L, 20L, "blue", "S"), (4L, 20L, "blue", "M"))
      .toDF("id", "blk", "color", "size")
  }
  private val fields = Seq("color", "size")
  // a hand model: agreement multiplies by 4 (color) / 3 (size),
  // disagreement halves — decision = both agree (score 12 ≥ 10)
  private val weights =
    Map("color" -> (4.0, 0.5), "size" -> (3.0, 0.5))

  test("scoreAgainstReference blocks, scores, and decides like the " +
      "pair-list form") {
    import spark.implicits._
    val batch = Seq((101L, 10L, "red", "M"), (102L, 20L, "green", "M"))
      .toDF("id", "blk", "color", "size")
    val got = Linkage.scoreAgainstReference(batch, reference,
        "id", "blk", fields, weights, threshold = 10.0)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getDouble(3), r.getBoolean(4)))).toMap
    // 101 blocks to refs 1,2: vs 1 color-only (4·0.5), vs 2 both (4·3)
    assert(got((101L, 1L)) == ((1L, 4.0 * 0.5, false)))
    assert(got((101L, 2L)) == ((2L, 4.0 * 3.0, true)))
    // 102 blocks to refs 3,4: size agreement only on 4
    assert(got((102L, 3L)) == ((0L, 0.5 * 0.5, false)))
    assert(got((102L, 4L)) == ((1L, 0.5 * 3.0, false)))
    // equivalence with the pair-list entry point over the same pairs
    val union = batch.unionByName(reference)
    val cands = Seq((101L, 1L), (101L, 2L), (102L, 3L), (102L, 4L))
      .toDF("id_a", "id_b")
    val viaPairs = Linkage.scorePairsRaw(union, "id", fields, cands,
        weights, threshold = 10.0)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getDouble(3), r.getBoolean(4)))).toMap
    assert(got == viaPairs)
  }

  test("micro-batched linkage ingest sinks exactly the matches the " +
      "batch form decides") {
    import spark.implicits._
    val inDir = java.nio.file.Files.createTempDirectory("slink-in")
    val sink = java.nio.file.Files
      .createTempDirectory("slink-out").toString + "/t"
    val ckpt = java.nio.file.Files.createTempDirectory("slink-ck").toString

    val b1 = Seq((101L, 10L, "red", "M"), (102L, 20L, "green", "M"))
      .toDF("id", "blk", "color", "size")
    b1.coalesce(1).write.parquet(inDir.resolve("b1").toString)

    val stream = spark.readStream
      .schema("id LONG, blk LONG, color STRING, size STRING")
      .parquet(inDir.toString + "/*")
    val q = EventStreams.linkageIngest(stream, reference,
      "id", "blk", fields, weights, threshold = 10.0, sink, ckpt)
    try {
      q.processAllAvailable()
      val afterB1 = spark.read.parquet(sink)
        .select("id_a", "id_b").collect()
        .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
      assert(afterB1 == Seq((101L, 2L)))

      // batch 2 arrives: a fresh record matching ref 3 on both fields
      Seq((201L, 20L, "blue", "S"))
        .toDF("id", "blk", "color", "size")
        .coalesce(1).write.parquet(inDir.resolve("b2").toString)
      q.processAllAvailable()
      val afterB2 = spark.read.parquet(sink)
        .select("id_a", "id_b").collect()
        .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
      assert(afterB2 == Seq((101L, 2L), (201L, 3L)))

      // stream result ≡ one-shot batch over the union of both batches
      val oneShot = Linkage.scoreAgainstReference(
          b1.unionByName(Seq((201L, 20L, "blue", "S"))
            .toDF("id", "blk", "color", "size")),
          reference, "id", "blk", fields, weights, threshold = 10.0)
        .filter(col("is_match"))
        .select("id_a", "id_b").collect()
        .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
      assert(afterB2 == oneShot)
    } finally q.stop()
  }

  test("event-time ingest: replayed duplicate suppressed, record behind " +
      "the watermark dropped, fresh record scored") {
    import spark.implicits._
    val inDir = java.nio.file.Files.createTempDirectory("slink-et-in")
    val sink = java.nio.file.Files
      .createTempDirectory("slink-et-out").toString + "/t"
    val ckpt = java.nio.file.Files.createTempDirectory("slink-et-ck").toString

    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    // b1: one matching record at 12:00 — advances the watermark to
    // 11:50 (10-minute delay) once the batch completes
    Seq((101L, ts("2024-03-01 12:00:00"), 10L, "red", "M"))
      .toDF("id", "ts", "blk", "color", "size")
      .coalesce(1).write.parquet(inDir.resolve("b1").toString)

    val stream = spark.readStream
      .schema("id LONG, ts TIMESTAMP, blk LONG, color STRING, size STRING")
      .parquet(inDir.toString + "/*")
    val q = EventStreams.linkageIngestEventTime(stream, reference,
      "id", "blk", fields, weights, threshold = 10.0, sink, ckpt)
    try {
      q.processAllAvailable()
      val afterB1 = spark.read.parquet(sink)
        .select("id_a", "id_b").collect()
        .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
      assert(afterB1 == Seq((101L, 2L)))

      // b2: (a) id 101 replayed within the watermark — suppressed as a
      // duplicate; (b) id 301 at 10:00, behind the 11:50 watermark —
      // dropped as late even though it would match ref 3 on both
      // fields; (c) fresh id 201 — scored and sunk
      Seq((101L, ts("2024-03-01 12:01:00"), 10L, "red", "M"),
          (301L, ts("2024-03-01 10:00:00"), 20L, "blue", "S"),
          (201L, ts("2024-03-01 12:05:00"), 20L, "blue", "S"))
        .toDF("id", "ts", "blk", "color", "size")
        .coalesce(1).write.parquet(inDir.resolve("b2").toString)
      q.processAllAvailable()
      val afterB2 = spark.read.parquet(sink)
        .select("id_a", "id_b").collect()
        .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
      assert(afterB2 == Seq((101L, 2L), (201L, 3L)),
        "expected the replay and the late record to be dropped")
    } finally q.stop()
  }
}
