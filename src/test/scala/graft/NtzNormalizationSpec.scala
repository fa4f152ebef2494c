package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{TimestampNTZType, TimestampType}
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.EventStreams

/** Writer-annotation tolerance for the event-time column: parquet writers
  * disagree on `isAdjustedToUTC`, so the SAME logical events table arrives
  * as TIMESTAMP_MICROS(UTC) → TimestampType, TIMESTAMP_MICROS(local) →
  * TimestampNTZType, or TIMESTAMP(NANOS) → LongType (under nanosAsLong).
  * Both entry points ([[Tables.events]] batch, [[EventStreams
  * .readEventStream]] streaming) must surface TimestampType — watermarks
  * reject anything else — and must denote the same instants under the
  * pinned UTC session so the annotation never changes query results. */
class NtzNormalizationSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.session

  /** Write a tiny events table with `ts` forced to the given parquet
    * annotation, return its directory. */
  private def writeEvents(ntz: Boolean): String = {
    import spark.implicits._
    val out = java.nio.file.Files.createTempDirectory(
      s"events-${if (ntz) "ntz" else "utc"}").toString
    val base = Seq(
      (1L, "2024-03-01 10:00:00", 7L, "click", 1.0),
      (2L, "2024-03-01 10:05:00", 7L, "buy", 2.0),
      (3L, "2024-03-01 11:30:00", 8L, "click", 3.0))
      .toDF("event_id", "ts_s", "user_id", "event_type", "value")
    val typed =
      if (ntz) base.withColumn("ts", col("ts_s").cast(TimestampNTZType))
      else base.withColumn("ts", col("ts_s").cast(TimestampType))
    typed.drop("ts_s")
      .select("event_id", "ts", "user_id", "event_type", "value")
      .coalesce(1).write.mode("overwrite").parquet(out)
    out
  }

  test("driver testdata really is NTZ-annotated (the shape under test)") {
    val raw = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    assert(raw.schema("ts").dataType == TimestampNTZType,
      "testdata annotation changed — this spec's premise needs revisiting")
  }

  test("Tables.events: TimestampType out, same instants, either annotation") {
    val ntzDir = writeEvents(ntz = true)
    val utcDir = writeEvents(ntz = false)
    // raw schemas differ...
    assert(spark.read.parquet(s"$ntzDir/*.parquet")
      .schema("ts").dataType == TimestampNTZType)
    assert(spark.read.parquet(s"$utcDir/*.parquet")
      .schema("ts").dataType == TimestampType)
    // ...normalized frames do not
    def viaTables(d: String) = {
      // Tables.load expects dir/events.parquet layout; normalize directly
      Tables.normalizeTs(spark.read.parquet(s"$d/*.parquet"))
    }
    val a = viaTables(ntzDir)
    val b = viaTables(utcDir)
    assert(a.schema("ts").dataType == TimestampType)
    assert(b.schema("ts").dataType == TimestampType)
    val ia = a.select(col("event_id"), col("ts").cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val ib = b.select(col("event_id"), col("ts").cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(ia == ib && ia.size == 3)
    // the real entry point over the real testdata
    assert(Tables.events(spark, "/root/testdata/sf0.001")
      .schema("ts").dataType == TimestampType)
  }

  test("readEventStream: watermarked event-time agg runs over NTZ parquet") {
    val ntzDir = writeEvents(ntz = true)
    val src = EventStreams.readEventStream(spark, ntzDir)
    assert(src.schema("ts").dataType == TimestampType)
    // the operation that hard-fails on NTZ (EVENT_TIME_IS_NOT_ON_TIMESTAMP_TYPE)
    val q = EventStreams.tumblingCounts(src)
      .writeStream.outputMode("complete")
      .format("memory").queryName("ntz_tumbling")
      .start()
    try {
      q.processAllAvailable()
      val rows = spark.table("ntz_tumbling")
        .collect().map(r => (r.getTimestamp(0), r.getString(2), r.getLong(3)))
      assert(rows.map(_._3).sum == 3L)
      assert(rows.forall(_._1 != null)) // getTimestamp works: TimestampType
    } finally q.stop()
  }
}
