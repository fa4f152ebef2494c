package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.EventStreams

/** transformWithState (arbitrary stateful processing v2): the per-user
  * cumulative-spend monitor driven as a real two-micro-batch streaming
  * query. The alert contract — Σ new_multiples == floor(total/threshold)
  * per user, batch-boundary independent — is asserted against a plain
  * batch aggregation over the same (replayed) data, which only holds if
  * the ValueState survived between micro-batches. */
class TransformWithStateSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.session
  private val dir = "/root/testdata/sf0.001"
  private val threshold = 500.0

  test("event-time sessionizer: sessions close exactly once — by timer " +
      "when the watermark passes, or inline when a gap-exceeding row " +
      "arrives") {
    import spark.implicits._
    val providerKey = "spark.sql.streaming.stateStore.providerClass"
    val prevProvider = spark.conf.getOption(providerKey)
    spark.conf.set(providerKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val d = java.nio.file.Files.createTempDirectory("ets")
    def write(name: String,
        rows: Seq[(Long, java.sql.Timestamp, Long, String, Double)]): Unit =
      rows.toDF("event_id", "ts", "user_id", "event_type", "value")
        .coalesce(1).write.parquet(d.resolve(name).toString)
    // b1: user 1 has a 2-event session; user 2 a singleton
    write("b1", Seq(
      (1L, ts("2024-03-01 12:00:00"), 1L, "click", 1.0),
      (2L, ts("2024-03-01 12:05:00"), 1L, "click", 2.0),
      (3L, ts("2024-03-01 12:00:00"), 2L, "click", 5.0)))

    val schema = "event_id LONG, ts TIMESTAMP, user_id LONG, " +
      "event_type STRING, value DOUBLE"
    val stream = spark.readStream.schema(schema).parquet(d.toString + "/*")
      .as[EventStreams.Event]
    // gap 30 min, watermark delay 10 min
    val q = EventStreams.sessionizeEventTime(stream,
        gapMs = 30 * 60 * 1000L, watermark = "10 minutes")
      .toDF().writeStream.outputMode("append")
      .format("memory").queryName("ets_sessions")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("ets-ck").toString)
      .start()
    try {
      q.processAllAvailable()
      // watermark (11:55) hasn't passed any session end + gap: nothing
      assert(spark.table("ets_sessions").count() == 0)

      // b2: user 1 returns past the gap (inline close of the old
      // session + a fresh one); user 3's event pushes the watermark to
      // 12:50, past u2's 12:30 timer (timer close)
      write("b2", Seq(
        (4L, ts("2024-03-01 13:00:00"), 1L, "click", 7.0),
        (5L, ts("2024-03-01 13:00:00"), 3L, "click", 0.5)))
      q.processAllAvailable()
      val afterB2 = spark.table("ets_sessions")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
        .toSet
      assert(afterB2 == Set((1L, 2L, 3.0), (2L, 1L, 5.0)), afterB2)

      // b3: far-future event drives the watermark past every open
      // timer — the fresh u1 session and u3's singleton close by timer
      write("b3", Seq(
        (6L, ts("2024-03-01 15:00:00"), 9L, "click", 0.0)))
      q.processAllAvailable()
      val afterB3 = spark.table("ets_sessions")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
        .toSet
      assert(afterB3 == afterB2 ++ Set((1L, 1L, 7.0), (3L, 1L, 0.5)),
        afterB3)
      // every emitted row is a CLOSED session, exactly once per session
      val rows = spark.table("ets_sessions").collect()
      assert(rows.forall(_.getBoolean(5)))
      assert(rows.length == 4)
    } finally {
      q.stop()
      prevProvider match {
        case Some(p) => spark.conf.set(providerKey, p)
        case None    => spark.conf.unset(providerKey)
      }
    }
  }

  test("ValueState persists across micro-batches; alert sums match batch") {
    import spark.implicits._
    // transformWithState needs the multi-column-family state store
    val providerKey = "spark.sql.streaming.stateStore.providerClass"
    val prevProvider = spark.conf.getOption(providerKey)
    spark.conf.set(providerKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val d = java.nio.file.Files.createTempDirectory("tws")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$dir/events.parquet"),
      d.resolve("b1.parquet"))

    val stream = EventStreams.readEventStream(spark, d.toString)
      .select(col("event_id"), col("ts"), col("user_id"),
        col("event_type"), col("value"))
      .as[EventStreams.Event]
    val q = EventStreams.spendAlerts(stream, threshold)
      .toDF().writeStream.outputMode("append")
      .format("memory").queryName("tws_alerts")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("tws-ck").toString)
      .start()
    try {
      q.processAllAvailable()
      val s1 = spark.table("tws_alerts")
        .agg(sum(col("new_multiples"))).collect()(0).getLong(0)

      // batch 2: replay the same events (fresh ids) — totals double
      java.nio.file.Files.copy(
        java.nio.file.Paths.get(s"$dir/events.parquet"),
        d.resolve("b2.parquet"))
      q.processAllAvailable()

      val alerts = spark.table("tws_alerts")
        .groupBy(col("user_id"))
        .agg(sum(col("new_multiples")).as("multiples"),
          max(col("n_events")).as("n_events"))
        .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2)))
        .toMap
      // expectation from a plain batch aggregation over the DOUBLED data
      val want = Tables.events(spark, dir)
        .groupBy(col("user_id"))
        .agg((sum(col("value")) * 2).as("total"), count(lit(1)).as("n"))
        .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2)))
      want.foreach { case (u, total, n) =>
        val crossed = math.floor(total / threshold).toLong
        if (crossed > 0) {
          val (m, nev) = alerts.getOrElse(u, (0L, 0L))
          assert(m == crossed, s"user $u: $m multiples, want $crossed")
          // the last alert saw the full replayed event count — state
          // counted across both batches
          assert(nev == 2 * n || m == 0, s"user $u: n_events $nev vs ${2 * n}")
        }
      }
      assert(alerts.nonEmpty)
      val s2 = alerts.values.map(_._1).sum
      assert(s2 > s1, "second batch must cross further multiples")
    } finally {
      q.stop()
      prevProvider match {
        case Some(p) => spark.conf.set(providerKey, p)
        case None    => spark.conf.unset(providerKey)
      }
    }
  }
}
