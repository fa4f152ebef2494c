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
