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
