package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Multimodal

class MultimodalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.session

  private lazy val media = {
    import spark.implicits._
    val df = Seq(
      (1L, "image", "fake-image-bytes-0123456789" * 10),
      (2L, "audio", "fake-audio-bytes-abcdefghij" * 20),
      (3L, "video", "fake-video-bytes-" * 100))
      .toDF("id", "kind", "payload")
    Multimodal.fromText(df, "id", "payload", "binary-ish")
  }

  test("featurize runs the decode stub per partition and is deterministic") {
    import spark.implicits._
    val df = Seq((1L, "image", "payload-one"), (2L, "video", "payload-two"))
      .toDF("id", "kind", "payload")
    val rows = Multimodal.featurize(
      Multimodal.fromText(df.filter(col("kind") === "image"), "id", "payload", "image")
        .union(Multimodal.fromText(df.filter(col("kind") === "video"), "id", "payload", "video")),
      Multimodal.Decoder.Deterministic).collect().sortBy(_.id)
    assert(rows.length == 2)
    val img = rows(0)
    assert(img.media_type == "image" && img.n_frames == 1)
    assert(img.n_bytes == "payload-one".getBytes.length)
    assert(img.width >= 64 && img.width < 64 + 1024)
    assert(img.feature.length == 8)
    val vid = rows(1)
    assert(vid.media_type == "video" && vid.n_frames > 1)
    assert(vid.duration_ms == vid.n_frames * 40L)
    // determinism: re-run produces identical metadata
    val again = Multimodal.featurize(
      Multimodal.fromText(df.filter(col("kind") === "video"), "id", "payload", "video"),
      Multimodal.Decoder.Deterministic).collect().head
    assert(again.content_hash == vid.content_hash)
    assert(again.feature.toSeq == vid.feature.toSeq)
  }

  test("binary payload survives the round trip intact") {
    val rows = media.collect().sortBy(_.id)
    assert(new String(rows.head.content).startsWith("fake-image-bytes"))
  }

  test("frame sampling emits every stride-th fixed-size window for video only") {
    import spark.implicits._
    val df = Seq((7L, "x" * 2048)).toDF("id", "payload")
    val video = Multimodal.fromText(df, "id", "payload", "video")
    val frames = Multimodal.sampleFrames(video, stride = 2, frameBytes = 256)
    val got = frames.collect()
    assert(got.length == 4) // 2048/256 = 8 frames, stride 2 → 0,2,4,6
    assert(got.map(_.getInt(1)).sorted.toSeq == Seq(0, 2, 4, 6))
    got.foreach(r => assert(r.getAs[Array[Byte]]("frame").length == 256))
    val image = Multimodal.fromText(df, "id", "payload", "image")
    assert(Multimodal.sampleFrames(image, 2).count() == 0)
  }

  test("PortableMd5 decoder features match the md5Long60 SQL arithmetic " +
      "the q122 oracle replays") {
    import spark.implicits._
    val df = Seq((1L, "alpha payload"), (2L, "beta"), (3L, "γ utf8 ✓"))
      .toDF("id", "payload")
    // JVM side: through the real decoder boundary
    val got = Multimodal.featurize(
        Multimodal.fromText(df, "id", "payload", "image"),
        Multimodal.Decoder.PortableMd5)
      .collect().map(m => m.id -> m.feature.map(_.toLong).toSeq).toMap
    // Spark-SQL side: the identical expression the DuckDB oracle uses
    val want = df.select(col("id") +: (0 until 8).map(i =>
        (graft.functions.PortableHash.md5Long60(
          concat(col("payload"), lit(s":$i"))) % 2001L - 1000L).as(s"f$i")): _*)
      .collect()
      .map(r => r.getLong(0) -> (1 to 8).map(j => r.getLong(j))).toMap
    assert(got == want)
  }
}
