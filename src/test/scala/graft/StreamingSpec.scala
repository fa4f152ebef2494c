package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.EventStreams

/** Structured Streaming parity: the same transform over readStream (memory
  * sink, processAllAvailable) must equal its batch execution — Spark's
  * incremental model guarantees it; this spec pins it. */
class StreamingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.session

  private val dir = "/root/testdata/sf0.001"

  test("streaming tumbling counts == batch tumbling counts") {
    val batch = EventStreams.tumblingCounts(Tables.events(spark, dir))
      .collect().map(r => (r.getTimestamp(0), r.getString(2), r.getLong(3)))
      .toSet

    // FileStreamSource needs a directory, not a bare file
    val streamDir = java.nio.file.Files.createTempDirectory("events-stream")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$dir/events.parquet"),
      streamDir.resolve("events.parquet"))
    val stream = EventStreams.tumblingCounts(
      EventStreams.readEventStream(spark, streamDir.toString))
    val q = stream.writeStream
      .outputMode("complete")
      .format("memory").queryName("tumbling_test")
      .start()
    try {
      q.processAllAvailable()
      val got = spark.table("tumbling_test")
        .collect().map(r => (r.getTimestamp(0), r.getString(2), r.getLong(3)))
        .toSet
      assert(got == batch)
      assert(got.nonEmpty)
    } finally q.stop()
  }

  test("sliding windows match a brute-force bucket computation") {
    val events = Tables.events(spark, dir)
    val got = EventStreams.slidingRates(events,
        window = "1 hour", slide = "15 minutes")
      .collect().map(r => r.getTimestamp(0).getTime -> r.getLong(1)).toMap
    // brute force: each event lands in the 4 slide-aligned windows
    // covering it
    val slideMs = 15L * 60 * 1000
    val windowMs = 60L * 60 * 1000
    val want = events.select("ts").collect()
      .map(_.getTimestamp(0).getTime)
      .flatMap { t =>
        val lastStart = t - (t % slideMs)
        (0L until (windowMs / slideMs)).map(i => lastStart - i * slideMs)
          .filter(ws => t >= ws && t < ws + windowMs)
      }
      .groupBy(identity).map { case (k, v) => k -> v.length.toLong }
    assert(got == want)
    assert(got.nonEmpty)
  }

  test("mapGroupsWithState sessionization summarizes per user") {
    import spark.implicits._
    val base = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    def at(minutes: Int) = new java.sql.Timestamp(base.getTime + minutes * 60000L)
    val events = Seq(
      EventStreams.Event(1, at(0), 10L, "click", 1.0),
      EventStreams.Event(2, at(5), 10L, "click", 2.0),
      EventStreams.Event(3, at(8), 10L, "buy", 3.0),
      EventStreams.Event(4, at(0), 20L, "click", 5.0)).toDS()
    val got = EventStreams.sessionize(events, gapMs = 30 * 60000L)
      .collect().map(s => s.user_id -> s).toMap
    assert(got(10L).n_events == 3 && got(10L).total_value == 6.0)
    assert(got(10L).session_start == at(0) && got(10L).session_end == at(8))
    assert(got(20L).n_events == 1)
  }

  test("a new session starts after the inactivity gap") {
    import spark.implicits._
    val base = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    def at(minutes: Int) = new java.sql.Timestamp(base.getTime + minutes * 60000L)
    val events = Seq(
      EventStreams.Event(1, at(0), 10L, "click", 1.0),
      EventStreams.Event(2, at(5), 10L, "click", 1.0),
      EventStreams.Event(3, at(120), 10L, "click", 7.0)).toDS()
    val got = EventStreams.sessionize(events, gapMs = 30 * 60000L).collect()
    assert(got.length == 1)
    // batch fold keeps the LAST session after the gap reset
    assert(got.head.n_events == 1 && got.head.total_value == 7.0)
  }
}
