package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.EventStreams

/** Stream-static enrichment join: the streaming micro-batch joins a static
  * dimension on every trigger — the standard continuous-pipeline
  * enrichment shape. */
class StreamStaticJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.session
  private val dir = "/root/testdata/sf0.001"

  test("stream-static join enriches events with the customer dimension") {
    val streamDir = java.nio.file.Files.createTempDirectory("ss-join")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$dir/events.parquet"),
      streamDir.resolve("events.parquet"))
    val events = EventStreams.readEventStream(spark, streamDir.toString)
    val customers = Tables.customer(spark, dir)
      .select(col("c_custkey"), col("c_mktsegment"))

    val enriched = events
      .join(broadcast(customers), events("user_id") === customers("c_custkey"))
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n"))

    val q = enriched.writeStream.outputMode("complete")
      .format("memory").queryName("ss_join_test").start()
    try {
      q.processAllAvailable()
      val got = spark.table("ss_join_test").collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      // batch twin must agree
      val batch = Tables.events(spark, dir)
        .join(customers, col("user_id") === col("c_custkey"))
        .groupBy(col("c_mktsegment")).agg(count(lit(1)).as("n"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(got == batch)
      assert(got.nonEmpty)
    } finally q.stop()
  }
}
