package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.ImageHeader
import graft.operators.{Dedup, Packing}

/** End-to-end MEDIA curation: the multimodal operators composed the way
  * a training-data build chains them — real header parse → resolution /
  * format gate → exact dedup on the binary payload → byte-budgeted shard
  * packing — proving the media family composes exactly like the text
  * family (`CurationPipelineSpec`). The parsers are oracle-gated by
  * q108/q110/q111; this spec proves COMPOSITION: binary columns flow
  * through gates, dedup, and packing, the gate reads only header bytes,
  * and shards balance on media size. */
class MediaCurationSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.session
  private val dir = "/root/testdata/sf0.001"

  test("parse -> gate -> payload dedup -> size-budgeted pack composes") {
    // media corpus: the q108 image fixture plus byte-identical payloads
    // under shifted ids (re-ingested files — the usual media-crawl dup)
    val media = SparkEntry.mediaFixture(spark, dir)
    val corpus = media.unionByName(
      media.select((col("doc_id") + 100000L).as("doc_id"), col("content")))
    val nCorpus = corpus.count()

    // 1. parse + gate: known container at >=64x64, from header bytes only
    val gated = corpus
      .withColumn("fmt", ImageHeader.imgFormat(col("content")))
      .withColumn("w", ImageHeader.imgWidth(col("content")))
      .withColumn("h", ImageHeader.imgHeight(col("content")))
      .filter(col("fmt") =!= "unknown" && col("w") >= 64 && col("h") >= 64)
    val nGated = gated.count()
    assert(nGated > 0 && nGated < nCorpus, "gate must pass some, drop some")
    assert(gated.filter(col("fmt") === "unknown").count() == 0)

    // 2. exact dedup on the payload itself (md5 over binary): every
    // shifted copy collapses onto its original (min id wins)
    val kept = gated.join(
      Dedup.exact(gated, "content", "doc_id")
        .select(col("keep_id").as("doc_id")), Seq("doc_id"))
    val keptIds = kept.select(col("doc_id")).collect().map(_.getLong(0)).toSet
    assert(keptIds.nonEmpty && !keptIds.exists(_ >= 100000L),
      "byte-identical re-ingests must dedup to the original id")
    assert(keptIds.size.toLong == nGated / 2)

    // 3. byte-budgeted shard packing: Packing's token budget generalizes
    // to any additive size column — here payload bytes
    val sized = kept.withColumn("n_bytes", octet_length(col("content")).cast("long"))
    val budget = 600L
    val shards = Packing.assignShards(sized, "n_bytes", "doc_id", budget)
    val perShard = shards.groupBy(col("shard_id"))
      .agg(sum(col("n_bytes")).as("bytes"), count(lit(1)).as("n"))
      .collect()
    assert(perShard.length > 1, "budget must force multiple shards")
    // offset-bucketed packing (shard = cumulative offset DIV budget): an
    // item joins the shard where its offset STARTS, so a shard may run
    // over by strictly less than one item — never more
    val maxPayload = sized.agg(max(col("n_bytes"))).head().getLong(0)
    perShard.foreach { r =>
      assert(r.getLong(1) < budget + maxPayload,
        s"shard ${r.get(0)}: ${r.getLong(1)} bytes breaks the offset bound")
    }
    assert(maxPayload <= budget, "fixture payloads are all under budget")
    // deterministic: same inputs, same shard assignment
    val again = Packing.assignShards(sized, "n_bytes", "doc_id", budget)
      .select("doc_id", "shard_id").collect().map(r => r.getLong(0) -> r.get(1)).toMap
    val first = shards.select("doc_id", "shard_id").collect()
      .map(r => r.getLong(0) -> r.get(1)).toMap
    assert(again == first)
  }

  test("header gate runs unchanged as a streaming projection (batch twin parity)") {
    // the gate is a stateless codegen projection, so the SAME expressions
    // drive a readStream micro-batch pipeline: binary payloads arrive in
    // files, only header bytes are parsed, gated rows append to the sink
    val media = SparkEntry.mediaFixture(spark, dir)
    val inDir = java.nio.file.Files.createTempDirectory("media-in")
    val sink = java.nio.file.Files.createTempDirectory("media-out").toString + "/t"
    val ckpt = java.nio.file.Files.createTempDirectory("media-ck").toString
    val (b1, b2) = (media.filter(col("doc_id") % 2 === 0),
      media.filter(col("doc_id") % 2 === 1))
    b1.coalesce(1).write.parquet(inDir.resolve("b1").toString)

    def gate(df: org.apache.spark.sql.DataFrame) = df
      .withColumn("fmt", ImageHeader.imgFormat(col("content")))
      .withColumn("w", ImageHeader.imgWidth(col("content")))
      .withColumn("h", ImageHeader.imgHeight(col("content")))
      .filter(col("fmt") =!= "unknown" && col("w") >= 64 && col("h") >= 64)
      .select("doc_id", "fmt", "w", "h")

    val q = gate(spark.readStream.schema("doc_id LONG, content BINARY")
        .parquet(inDir.toString + "/*"))
      .writeStream.format("parquet")
      .option("path", sink).option("checkpointLocation", ckpt)
      .start()
    try {
      q.processAllAvailable()
      b2.coalesce(1).write.parquet(inDir.resolve("b2").toString)
      q.processAllAvailable()
    } finally q.stop()

    val streamed = spark.read.parquet(sink)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2), r.getInt(3)))
      .toSet
    val batch = gate(media)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2), r.getInt(3)))
      .toSet
    assert(streamed == batch, "streamed gate must equal the batch twin")
    assert(streamed.nonEmpty)
  }
}
