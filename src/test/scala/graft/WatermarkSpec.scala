package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.EventStreams

/** Watermark semantics under late data: append-mode windowed aggregation
  * drops events older than the watermark once it has advanced past their
  * window — the state-eviction contract that keeps unbounded streams
  * bounded. */
class WatermarkSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.session

  test("append-mode window emits closed windows and drops too-late events") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("wm")
    // exactly ONE file per logical batch: multiple part-files would be
    // consumed as separate micro-batches (maxFilesPerTrigger=1) in
    // arbitrary order, advancing the watermark past same-batch events
    def write(name: String, rows: Seq[(Long, java.sql.Timestamp, Long, String, Double, String)]): Unit =
      rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
        .coalesce(1).write.parquet(dir.resolve(name).toString)
    def at(h: Int, m: Int) =
      java.sql.Timestamp.valueOf(f"2024-01-01 $h%02d:$m%02d:00")

    // batch 1: events in hour 0 and hour 6 — watermark advances to 4:00
    write("b1", Seq(
      (1L, at(0, 10), 1L, "click", 1.0, "{}"),
      (2L, at(0, 20), 1L, "click", 1.0, "{}"),
      (3L, at(6, 0), 2L, "click", 1.0, "{}")))

    val stream = spark.readStream
      .schema("event_id LONG, ts TIMESTAMP, user_id LONG, event_type STRING, value DOUBLE, props STRING")
      .option("maxFilesPerTrigger", "1")
      .parquet(dir.toString + "/*")
    val agg = EventStreams.tumblingCounts(stream, "1 hour", "2 hours")
    val q = agg.writeStream.outputMode("append")
      .format("memory").queryName("wm_test").start()
    try {
      q.processAllAvailable()
      // batch 2: one on-time event (hour 6) and one TOO-LATE event (hour 0,
      // far behind the 4:00 watermark) — the late one must be dropped
      write("b2", Seq(
        (4L, at(6, 30), 2L, "click", 1.0, "{}"),
        (5L, at(0, 30), 1L, "click", 99.0, "{}")))
      q.processAllAvailable()
      // batch 3: advance watermark far enough to close hour-6 windows
      write("b3", Seq((6L, at(23, 0), 3L, "click", 1.0, "{}")))
      q.processAllAvailable()

      val got = spark.table("wm_test")
        .select(date_format(col("window_start"), "HH").as("h"), col("n_events"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(got("00") == 2L, s"late event must NOT be counted: $got")
      assert(got("06") == 2L, s"on-time batch-2 event must be counted: $got")
    } finally q.stop()
  }
}
