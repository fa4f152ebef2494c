package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.EventStreams

/** Stream-stream interval join and watermark-bounded exact dedup: the two
  * stateful streaming shapes beyond windowed aggregation. Each is driven
  * as a real streaming query over a file source and asserted against its
  * batch twin (the SAME operator on batch frames). */
class StreamStreamJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.session
  private val dir = "/root/testdata/sf0.001"

  private def eventsDir(): java.nio.file.Path = {
    val d = java.nio.file.Files.createTempDirectory("ss-ss")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$dir/events.parquet"),
      d.resolve("events.parquet"))
    d
  }

  test("stream-stream interval join matches the batch interval join") {
    val trigger = EventStreams.readEventStream(spark, eventsDir().toString)
      .filter(col("event_type") === "click")
    val outcome = EventStreams.readEventStream(spark, eventsDir().toString)
      .filter(col("event_type") === "purchase")
    val joined = EventStreams.correlateStreams(trigger, outcome,
      maxLag = "10 minutes", watermark = "20 minutes")

    val q = joined.writeStream.outputMode("append")
      .format("memory").queryName("ss_ss_join").start()
    try {
      q.processAllAvailable()
      val got = spark.table("ss_ss_join")
        .collect().map(r => (r.getLong(1), r.getLong(3))).toSet

      val batchEvents = Tables.events(spark, dir)
      val want = EventStreams.correlateStreams(
          batchEvents.filter(col("event_type") === "click"),
          batchEvents.filter(col("event_type") === "purchase"),
          maxLag = "10 minutes", watermark = "20 minutes")
        .collect().map(r => (r.getLong(1), r.getLong(3))).toSet
      assert(want.nonEmpty, "fixture must produce click->purchase pairs")
      assert(got == want)
      // every matched outcome trails its trigger by at most the lag
      spark.table("ss_ss_join").collect().foreach { r =>
        val lag = r.getLong(5)
        assert(lag >= 0 && lag <= 600, r.toString)
      }
    } finally q.stop()
  }

  test("left-outer interval join: unmatched triggers emit NULL outcomes " +
      "once the watermark passes; batch twin agrees") {
    import spark.implicits._
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    def write(d: java.nio.file.Path, name: String,
        rows: Seq[(Long, java.sql.Timestamp, Long, String, Double)]): Unit =
      rows.toDF("event_id", "ts", "user_id", "event_type", "value")
        .coalesce(1).write.parquet(d.resolve(name).toString)

    val tDir = java.nio.file.Files.createTempDirectory("ss-lo-t")
    val oDir = java.nio.file.Files.createTempDirectory("ss-lo-o")
    // b1 — user 1 clicks and buys in-window; user 2 clicks, never buys
    write(tDir, "b1", Seq(
      (1L, ts("2024-03-01 12:00:00"), 1L, "click", 0.0),
      (2L, ts("2024-03-01 12:00:00"), 2L, "click", 0.0)))
    write(oDir, "b1", Seq(
      (10L, ts("2024-03-01 12:04:00"), 1L, "purchase", 5.0)))

    val schema = "event_id LONG, ts TIMESTAMP, user_id LONG, " +
      "event_type STRING, value DOUBLE"
    val trig = spark.readStream.schema(schema).parquet(tDir + "/*")
    val out = spark.readStream.schema(schema).parquet(oDir + "/*")
    val joined = EventStreams.correlateStreamsOuter(trig, out,
      maxLag = "10 minutes", watermark = "20 minutes")
    val q = joined.writeStream.outputMode("append")
      .format("memory").queryName("ss_lo_join").start()
    try {
      q.processAllAvailable()
      // nothing null-emitted yet: the outcome watermark hasn't passed
      // click + maxLag, so user 2's click is still withheld
      val early = spark.table("ss_lo_join").collect()
        .map(r => (r.getLong(1), if (r.isNullAt(3)) -1L else r.getLong(3)))
        .toSet
      assert(early == Set((1L, 10L)), early)

      // b2 — late enough outcome-side events to push the watermark past
      // 12:10 + 20 min on both sides
      write(tDir, "b2", Seq(
        (3L, ts("2024-03-01 13:00:00"), 9L, "click", 0.0)))
      write(oDir, "b2", Seq(
        (11L, ts("2024-03-01 13:00:00"), 9L, "noise", 0.0)))
      q.processAllAvailable()
      // one more empty-ish batch lets the state manager evict + emit
      write(tDir, "b3", Seq(
        (4L, ts("2024-03-01 14:00:00"), 9L, "click", 0.0)))
      write(oDir, "b3", Seq(
        (12L, ts("2024-03-01 14:00:00"), 9L, "noise", 0.0)))
      q.processAllAvailable()
      val got = spark.table("ss_lo_join").collect()
        .map(r => (r.getLong(1), if (r.isNullAt(3)) -1L else r.getLong(3)))
        .toSet
      assert(got.contains((2L, -1L)),
        s"unmatched click never null-emitted: $got")
      assert(got.contains((1L, 10L)))

      // batch twin over the union of all files: same pairs, nulls and
      // all, with no watermark withholding
      val bt = spark.read.schema(schema).parquet(tDir + "/*")
      val bo = spark.read.schema(schema).parquet(oDir + "/*")
      val want = EventStreams.correlateStreamsOuter(bt, bo,
          maxLag = "10 minutes", watermark = "20 minutes")
        .collect()
        .map(r => (r.getLong(1), if (r.isNullAt(3)) -1L else r.getLong(3)))
        .toSet
      assert(got == want, s"stream $got vs batch $want")
    } finally q.stop()
  }

  test("dropDuplicatesWithinWatermark suppresses replayed events") {
    // two triggers: the second file replays the first's events exactly
    val d = java.nio.file.Files.createTempDirectory("ss-dedup")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$dir/events.parquet"),
      d.resolve("b1.parquet"))
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$dir/events.parquet"),
      d.resolve("b2.parquet"))
    val stream = EventStreams.readEventStream(spark, d.toString)
    val deduped = EventStreams.dedupWithinWatermark(stream)

    val q = deduped.writeStream.outputMode("append")
      .format("memory").queryName("ss_dedup")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("ss-dedup-ck").toString)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    try {
      q.awaitTermination()
      val ids = spark.table("ss_dedup")
        .select(col("event_id")).collect().map(_.getLong(0))
      val total = Tables.events(spark, dir).count()
      assert(ids.length == total,
        s"each replayed event must appear once: ${ids.length} vs $total")
      assert(ids.distinct.length == ids.length)
    } finally q.stop()
  }
}
