package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.EventStreams

/** foreachBatch — the streaming→batch-sink bridge: each micro-batch is
  * handed to arbitrary batch writers (here the engine's own partitioned
  * parquet sink), which is how a continuous cascade lands in the same dwh
  * tables the batch pipeline writes. */
class ForeachBatchSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.session

  test("micro-batches land in a batch parquet sink via foreachBatch") {
    import spark.implicits._
    val inDir = java.nio.file.Files.createTempDirectory("feb-in")
    val outDir = java.nio.file.Files.createTempDirectory("feb-out").toString + "/t"
    Seq((1L, "click"), (2L, "view")).toDF("event_id", "event_type")
      .coalesce(1).write.parquet(inDir.resolve("b1").toString)

    val stream = spark.readStream
      .schema("event_id LONG, event_type STRING")
      .parquet(inDir.toString + "/*")
    val q = stream.writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        batch.withColumn("batch_id", lit(batchId))
          .write.mode("append").parquet(outDir)
      }
      .start()
    try {
      q.processAllAvailable()
      Seq((3L, "buy")).toDF("event_id", "event_type")
        .coalesce(1).write.parquet(inDir.resolve("b2").toString)
      q.processAllAvailable()
      val back = spark.read.parquet(outDir)
      assert(back.count() == 3)
      assert(back.select("batch_id").distinct().count() >= 2)
    } finally q.stop()
  }
}
