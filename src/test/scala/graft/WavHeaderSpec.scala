package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{WavHeaderKernel => K}

/** Byte-level tests for the WAV/RIFF header parser — hand-assembled
  * containers plus malformed-input cases the q111 oracle's well-formed
  * fixture never hits. */
class WavHeaderSpec extends AnyFunSuite {

  private def hx(s: String): Array[Byte] =
    s.replaceAll("\\s+", "").grouped(2)
      .map(Integer.parseInt(_, 16).toByte).toArray

  private def le16(v: Int) = f"${v & 0xff}%02X${(v >> 8) & 0xff}%02X"
  private def le32(v: Long) =
    f"${v & 0xff}%02X${(v >> 8) & 0xff}%02X${(v >> 16) & 0xff}%02X${(v >> 24) & 0xff}%02X"

  /** Canonical 16-bit stereo 44.1kHz WAV header; dataBytes of audio. */
  private def wav(rate: Int, nch: Int, bits: Int, dataBytes: Int,
      listLen: Int = 0): Array[Byte] = {
    val balign = nch * bits / 8
    val brate = rate * balign
    val pad = listLen % 2
    val list = if (listLen > 0 || pad > 0)
      "4C495354" + le32(listLen) + "4C" * listLen + "00" * pad else ""
    hx("52494646" + le32(36 + dataBytes) + "57415645" + list +
      "666D7420" + le32(16) + le16(1) + le16(nch) + le32(rate) +
      le32(brate) + le16(balign) + le16(bits) +
      "64617461" + le32(dataBytes))
  }

  test("canonical wav: all fmt fields parse") {
    val b = wav(44100, 2, 16, 441000) // 2.5 s of CD stereo
    assert(K.sampleRate(b) == 44100)
    assert(K.channels(b) == 2)
    assert(K.bitsPerSample(b) == 16)
    assert(K.durationMs(b) == 2500L)
  }

  test("duration is exact integer floor of data_bytes*1000/byte_rate") {
    val b = wav(8000, 1, 8, 12345) // byteRate 8000 -> 1543.125 ms
    assert(K.durationMs(b) == 1543L)
  }

  test("chunk walk skips LIST chunks, including odd sizes with pad byte") {
    for (k <- Seq(1, 2, 7, 18)) {
      val b = wav(16000, 1, 24, 4800, listLen = k)
      assert(K.sampleRate(b) == 16000, s"LIST len $k")
      assert(K.bitsPerSample(b) == 24, s"LIST len $k")
      assert(K.durationMs(b) == 4800L * 1000 / (16000 * 3), s"LIST len $k")
    }
  }

  test("data chunk size is read without the payload being present") {
    // header-only buffer: data SIZE declared, zero sample bytes follow —
    // the gate never materializes audio
    val b = wav(48000, 2, 32, 48000 * 8) // exactly 1 s
    assert(K.durationMs(b) == 1000L)
    assert(b.length < 100)
  }

  test("non-RIFF, truncated, and corrupt-size buffers yield -1, never throw") {
    assert(K.sampleRate("not audio".getBytes) == -1)
    assert(K.durationMs(Array.empty[Byte]) == -1L)
    val good = wav(44100, 2, 16, 1000)
    for (n <- 0 until good.length) {
      val b = java.util.Arrays.copyOf(good, n)
      K.sampleRate(b); K.channels(b); K.bitsPerSample(b); K.durationMs(b)
    }
    // chunk size pointing past the buffer: walk stops, fields -1
    val lying = wav(44100, 2, 16, 1000)
    lying(16) = 0xff.toByte; lying(17) = 0xff.toByte // LIST... no: fmt size low bytes
    K.sampleRate(lying) // must not throw regardless of what it returns
    // zero byte rate never divides
    val zeroRate = wav(0, 1, 8, 1000)
    assert(K.durationMs(zeroRate) == -1L)
    // fuzz: random buffers and bit-flipped real headers
    val rng = new scala.util.Random(777)
    for (_ <- 1 to 3000) {
      val b = Array.fill(rng.nextInt(72))(rng.nextInt(256).toByte)
      K.sampleRate(b); K.channels(b); K.bitsPerSample(b); K.durationMs(b)
    }
    for (_ <- 1 to 3000) {
      val b = good.clone()
      b(rng.nextInt(b.length)) = rng.nextInt(256).toByte
      K.sampleRate(b); K.channels(b); K.bitsPerSample(b); K.durationMs(b)
    }
  }
}
