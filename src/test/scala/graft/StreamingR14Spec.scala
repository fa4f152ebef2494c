package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Ann, Dedup}
import graft.streaming.EventStreams

/** Streaming twins for the r14 family (VERDICT r14 item 6): the
  * perceptual phash gate, main-content extraction, and beam-search
  * serving over the persisted backbone — each asserted batch ≡ stream
  * (the StreamingDedupSpec convention: file-source micro-batches,
  * `processAllAvailable`, compare against the batch operator). */
class StreamingR14Spec extends AnyFunSuite {
  private lazy val spark = TestSpark.session
  import spark.implicits._

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  // ----------------------------------------------------- phash gate

  private def pgm(w: Int, h: Int, pix: (Int, Int) => Int): Array[Byte] = {
    val header = s"P5\n$w $h\n255\n".getBytes("US-ASCII")
    val body = new Array[Byte](w * h)
    for (y <- 0 until h; x <- 0 until w)
      body(y * w + x) = (pix(y, x) & 0xff).toByte
    header ++ body
  }
  private def base(seed: Long)(y: Int, x: Int): Int =
    ((((y * 16 + x + 1) * (seed * 3 + 7) * 40503L) % 181) + 20).toInt

  test("phash gate: per-batch Hamming screen vs the static fingerprint " +
      "corpus - brightness twins drop, distinct and malformed-free " +
      "novel images pass, malformed payloads never pass") {
    val inDir = java.nio.file.Files.createTempDirectory("phash-in")
    val sink = tmp("phash-out") + "/t"
    val ckpt = tmp("phash-ck")
    val corpus = Seq(
      (1L, pgm(16, 16, base(5))),
      (2L, pgm(16, 16, base(9)))).toDF("doc_id", "content")
    // batch 1: a brightness twin of corpus img 1 (near-dup -> drop), a
    // reseeded distinct image (novel -> keep), a malformed blob (drop)
    Seq(
      (10L, pgm(16, 16, (y, x) => base(5)(y, x) + 16)),
      (11L, pgm(16, 16, base(777))),
      (12L, "not a pgm".getBytes("US-ASCII")))
      .toDF("doc_id", "content")
      .coalesce(1).write.parquet(inDir.resolve("b1").toString)
    val stream = spark.readStream
      .schema("doc_id LONG, content BINARY")
      .parquet(inDir.toString + "/*")
    val q = EventStreams.phashGateIngest(stream, corpus, "content",
      "doc_id", sink, ckpt, maxHamming = 6)
    try {
      q.processAllAvailable()
      assert(spark.read.parquet(sink).select("doc_id")
        .collect().map(_.getLong(0)).sorted.toSeq == Seq(11L))
      // batch 2: a noise twin of corpus img 2 (drop) + another novel
      Seq(
        (20L, pgm(16, 16, (y, x) => base(9)(y, x) + ((y + x) % 2))),
        (21L, pgm(16, 16, base(4242))))
        .toDF("doc_id", "content")
        .coalesce(1).write.parquet(inDir.resolve("b2").toString)
      q.processAllAvailable()
      assert(spark.read.parquet(sink).select("doc_id")
        .collect().map(_.getLong(0)).sorted.toSeq == Seq(11L, 21L))
    } finally q.stop()
  }

  // ----------------------------------------------- main content

  test("main-content extraction streams as a stateless projection: " +
      "stream over two micro-batches == batch mainContent of the union") {
    val inDir = java.nio.file.Files.createTempDirectory("mc-in")
    val sink = tmp("mc-out") + "/t"
    val ckpt = tmp("mc-ck")
    def page(u: String, body: String): (String, String) = (u,
      "<html><body><div><a href=/>Home</a> <a href=/a>About</a> " +
        "<a href=/c>Contact</a></div><p>" + body +
        "</p><p>Short note</p><div><a href=/t>Terms</a> " +
        "<a href=/p>Privacy</a> 2020 Corp</div></body></html>")
    // after a pure-link nav block (prev link density 1.0) boilerpipe's
    // stricter branch applies: the body must exceed 40 words to be kept
    val filler = (1 to 40).map(i => "word" + i).mkString(" ")
    val b1 = Seq(page("u1", "first article body " + filler))
    val b2 = Seq(page("u2", "second article body " + filler))
    b1.toDF("url", "html").coalesce(1)
      .write.parquet(inDir.resolve("b1").toString)
    val stream = spark.readStream
      .schema("url STRING, html STRING").parquet(inDir.toString + "/*")
    val q = EventStreams.mainContentIngest(stream, "url", "html",
      sink, ckpt)
    try {
      q.processAllAvailable()
      b2.toDF("url", "html").coalesce(1)
        .write.parquet(inDir.resolve("b2").toString)
      q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.read.parquet(sink).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    val batch = graft.sources.CrawlParse
      .mainContent((b1 ++ b2).toDF("url", "html"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(streamed == batch, "stream diverged from batch mainContent")
    assert(batch("u1").startsWith("first article") &&
      !batch("u1").contains("Privacy"))
  }

  // ------------------------------------- beam serving over the backbone

  test("beam serving per micro-batch over the PERSISTED backbone == " +
      "the batch beam loop, query-proportional per batch") {
    implicit val s = spark
    val dir = "/root/testdata/sf0.01"
    val corpus = Tables.load(spark, dir, "embeddings")
      .filter(col("vec_id") < 150)
    val modelPath = tmp("beam-model") + "/backbone"
    val graph = Ann.trainOrLoadKnnGraph(modelPath)(
      Ann.nnDescentPortable(corpus, "embedding", "vec_id", 10, 3, 1000))
    val q1 = Tables.load(spark, dir, "embeddings")
      .filter(col("vec_id") >= 150 && col("vec_id") < 155)
    val q2 = Tables.load(spark, dir, "embeddings")
      .filter(col("vec_id") >= 155 && col("vec_id") < 160)
    val inDir = java.nio.file.Files.createTempDirectory("beam-in")
    val sink = tmp("beam-out") + "/t"
    val ckpt = tmp("beam-ck")
    q1.coalesce(1).write.parquet(inDir.resolve("b1").toString)
    val stream = spark.readStream.schema(q1.schema)
      .parquet(inDir.toString + "/*")
    val query = EventStreams.beamServeIngest(stream, graph, corpus,
      "embedding", "vec_id", k = 4, ef = 8, maxRounds = 2, sink, ckpt)
    def served: Set[(Long, Long, Long, Long)] =
      spark.read.parquet(sink).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getLong(3))).toSet
    def batchBeam(qs: DataFrame): Set[(Long, Long, Long, Long)] =
      Ann.beamSearchPortable(graph, corpus, qs, "embedding", "vec_id",
          k = 4, ef = 8, maxRounds = 2)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getLong(3))).toSet
    try {
      query.processAllAvailable()
      assert(served == batchBeam(q1))
      q2.coalesce(1).write.parquet(inDir.resolve("b2").toString)
      query.processAllAvailable()
      assert(served == batchBeam(q1) ++ batchBeam(q2))
    } finally query.stop()
  }
}
