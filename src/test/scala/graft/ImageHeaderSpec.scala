package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{ImageHeader, ImageHeaderKernel => K}

/** Byte-level tests for the image-header parser
  * ([[graft.functions.ImageHeaderKernel]]) — hand-assembled containers plus
  * the truncation/desync edge cases q108's well-formed fixture never hits.
  * The q108 oracle gate covers construction↔parse parity vs DuckDB; this
  * spec covers the parser's behavior on malformed input. */
class ImageHeaderSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.session

  private def hx(s: String): Array[Byte] =
    s.replaceAll("\\s+", "").grouped(2)
      .map(Integer.parseInt(_, 16).toByte).toArray

  private val png640x480rgba = hx(
    "89504E470D0A1A0A 0000000D 49484452 00000280 000001E0 08 06 000000")
  private val gif320x200 = hx("474946383961 4001 C800 00 0000")
  // FFD8, APP0(JFIF,16), COM(5: "abc"), SOF0 1-component 100x200
  private val jpeg = hx(
    "FFD8 FFE0 0010 4A46494600 010100 0001 0001 0000" +
      " FFFE 0005 616263 FFC0 000B 08 0064 00C8 01 011100 FFD9")

  test("png: IHDR width/height/channels") {
    assert(K.width(png640x480rgba) == 640)
    assert(K.height(png640x480rgba) == 480)
    assert(K.channels(png640x480rgba) == 4) // color type 6 = rgba
    assert(K.format(png640x480rgba).toString == "png")
  }

  test("png color types map to channel counts") {
    for ((ct, ch) <- Seq(0 -> 1, 2 -> 3, 3 -> 1, 4 -> 2, 6 -> 4)) {
      val b = png640x480rgba.clone(); b(25) = ct.toByte
      assert(K.channels(b) == ch, s"color type $ct")
    }
  }

  test("gif: little-endian logical screen descriptor") {
    assert(K.width(gif320x200) == 320)
    assert(K.height(gif320x200) == 200)
    assert(K.channels(gif320x200) == 3)
    assert(K.format(gif320x200).toString == "gif")
  }

  test("jpeg: SOFn scan walks variable-length segments") {
    assert(K.format(jpeg).toString == "jpeg")
    assert(K.height(jpeg) == 100) // height precedes width in SOF
    assert(K.width(jpeg) == 200)
    assert(K.channels(jpeg) == 1)
  }

  test("jpeg: DHT (C4) is not mistaken for a start-of-frame") {
    // FFD8, DHT(len 4, 2 payload bytes), SOF2 (progressive) 3x5
    val b = hx("FFD8 FFC4 0004 0000 FFC2 000B 08 0003 0005 03 010203040506")
    assert(K.width(b) == 5 && K.height(b) == 3 && K.channels(b) == 3)
  }

  test("jpeg: EOI before any SOF yields -1, not a scan past the buffer") {
    val b = hx("FFD8 FFFE 0004 6162 FFD9")
    assert(K.width(b) == -1 && K.height(b) == -1 && K.channels(b) == -1)
    assert(K.format(b).toString == "jpeg") // container detected, frame absent
  }

  test("jpeg: desynchronized marker stream yields -1") {
    val b = hx("FFD8 FFE0 0002 4141414141414141") // length lies: lands mid-payload
    assert(K.width(b) == -1)
  }

  test("truncated headers never throw, they return -1/unknown") {
    val all = Seq(png640x480rgba, gif320x200, jpeg)
    for (src <- all; n <- 0 until src.length) {
      val b = java.util.Arrays.copyOf(src, n)
      K.format(b); K.width(b); K.height(b); K.channels(b) // must not throw
    }
    assert(K.format(Array.empty[Byte]).toString == "unknown")
    assert(K.width(hx("00112233445566778899AABBCCDDEEFF")) == -1)
  }

  test("fuzz: random bytes and corrupted real headers never throw") {
    val rng = new scala.util.Random(4242)
    // pure random buffers of every small length
    for (_ <- 1 to 2000) {
      val b = Array.fill(rng.nextInt(64))(rng.nextInt(256).toByte)
      K.format(b); K.width(b); K.height(b); K.channels(b)
    }
    // valid magics with random garbage after them — exercises every
    // length-check branch past the signature, incl. JPEG scans whose
    // segment lengths point anywhere
    val magics = Seq(
      hx("89504E470D0A1A0A"), hx("FFD8"), hx("474946383961"))
    for (m <- magics; _ <- 1 to 2000) {
      val tail = Array.fill(rng.nextInt(48))(rng.nextInt(256).toByte)
      val b = m ++ tail
      K.format(b); K.width(b); K.height(b); K.channels(b)
    }
    // bit-flipped real headers
    val real = Seq(png640x480rgba, gif320x200, jpeg)
    for (src <- real; _ <- 1 to 2000) {
      val b = src.clone()
      b(rng.nextInt(b.length)) = rng.nextInt(256).toByte
      K.format(b); K.width(b); K.height(b); K.channels(b)
    }
  }

  test("expressions parse a binary column inside a Spark plan") {
    import spark.implicits._
    val df = Seq(
      (1L, png640x480rgba), (2L, gif320x200), (3L, jpeg),
      (4L, "not an image at all".getBytes("UTF-8")))
      .toDF("id", "content")
    val rows = df.select(col("id"),
        ImageHeader.imgFormat(col("content")).as("fmt"),
        ImageHeader.imgWidth(col("content")).as("w"),
        ImageHeader.imgHeight(col("content")).as("h"),
        ImageHeader.imgChannels(col("content")).as("ch"))
      .orderBy("id").collect()
    assert(rows.map(_.getString(1)).toSeq == Seq("png", "gif", "jpeg", "unknown"))
    assert(rows.map(_.getInt(2)).toSeq == Seq(640, 320, 200, -1))
    assert(rows.map(_.getInt(3)).toSeq == Seq(480, 200, 100, -1))
    assert(rows.map(_.getInt(4)).toSeq == Seq(4, 3, 1, -1))
  }
}
