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

  test("session_window runs UNCHANGED as a streaming aggregation: the " +
      "SCALE §10 claim, pinned") {
    val events = Tables.events(spark, dir)
    val batch = EventStreams.sessionWindowAggregates(events)
      .collect().map(r => (r.getLong(0), r.getTimestamp(1),
        r.getTimestamp(2), r.getLong(3)))
    val maxTs = events.agg(max(col("ts"))).collect()(0).getTimestamp(0)
    // append mode emits a session once the watermark passes its END;
    // with delay 0 the watermark reaches max event time, so exactly the
    // batch sessions ending at-or-before maxTs must appear
    val want = batch.filter { case (_, _, end, _) =>
      !end.after(maxTs) }.toSet
    val streamDir = java.nio.file.Files.createTempDirectory("events-sess")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$dir/events.parquet"),
      streamDir.resolve("events.parquet"))
    val stream = EventStreams.sessionWindowAggregates(
      EventStreams.readEventStream(spark, streamDir.toString),
      watermark = Some("0 seconds"))
    val q = stream.writeStream
      .outputMode("append")
      .format("memory").queryName("sess_window_test")
      .start()
    try {
      q.processAllAvailable()
      val got = spark.table("sess_window_test")
        .collect().map(r => (r.getLong(0), r.getTimestamp(1),
          r.getTimestamp(2), r.getLong(3))).toSet
      assert(got == want)
      assert(got.nonEmpty)
    } finally q.stop()
  }

  test("bm25ScorePerRow is stateless: identical scores over readStream " +
      "micro-batches and batch") {
    import spark.implicits._
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .select("doc_id", "text")
    val p = SketchParams.q112
    val stats = graft.operators.TextAnalysis
      .termStats(docs, "text", "doc_id")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val n = docs.count()
    val l = docs.agg(sum(size(split(trim(lower(col("text"))), "\\s+"))))
      .collect()(0).getLong(0)
    def score(df: org.apache.spark.sql.DataFrame) =
      graft.operators.TextAnalysis.bm25ScorePerRow(
        df, "text", "doc_id", p.queries, stats, n, l)
    val want = score(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap

    // two micro-batches: the stats snapshot stays fixed (index-time), so
    // per-doc scores must be byte-identical to the batch run
    val inDir = java.nio.file.Files.createTempDirectory("bm25-stream")
    docs.filter(col("doc_id") % 2 === 0)
      .coalesce(1).write.parquet(inDir.resolve("b0").toString)
    docs.filter(col("doc_id") % 2 === 1)
      .coalesce(1).write.parquet(inDir.resolve("b1").toString)
    val stream = spark.readStream
      .schema("doc_id LONG, text STRING")
      .parquet(inDir.toString + "/*")
    val q = score(stream).writeStream
      .outputMode("append")
      .format("memory").queryName("bm25_stream_test")
      .start()
    try {
      q.processAllAvailable()
      val got = spark.table("bm25_stream_test")
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2))
        .toMap
      assert(got == want)
      assert(got.nonEmpty)
    } finally q.stop()
  }
}
