package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Mp4Kernel

/** MP4 / ISO-BMFF box-walk kernel: hand-built box trees covering what
  * the q156 fixture doesn't — version-1 mvhd/tkhd, 64-bit largesize
  * headers, size-0 run-to-end boxes, missing/truncated boxes — plus
  * expression-vs-kernel parity through a real scan. */
class Mp4HeaderSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.session

  private def hx(s: String): Array[Byte] = {
    val c = s.replaceAll("\\s", "")
    (0 until c.length by 2)
      .map(i => Integer.parseInt(c.substring(i, i + 2), 16).toByte).toArray
  }
  private def be32(v: Long): String = f"$v%08X"
  private def be64(v: Long): String = f"$v%016X"
  private def cc(s: String): String = s.map(c => f"${c.toInt}%02X").mkString

  private val unity = "00010000" + "00000000" * 3 + "00010000" +
    "00000000" * 3 + "40000000"

  private def ftyp(brand: String) =
    "00000010" + cc("ftyp") + cc(brand) + "00000200"

  private def mvhdV0(ts: Long, dur: Long) =
    "0000006C" + cc("mvhd") + "00000000" + "00000000" * 2 +
      be32(ts) + be32(dur) + "00010000" + "0100" + "0000" +
      "00000000" * 2 + unity + "00" * 24 + "00000002"

  // v1: 8-byte creation/modification/duration -> payload 112, box 120
  private def mvhdV1(ts: Long, dur: Long) =
    "00000078" + cc("mvhd") + "01000000" + be64(0) + be64(0) +
      be32(ts) + be64(dur) + "00010000" + "0100" + "0000" +
      "00000000" * 2 + unity + "00" * 24 + "00000002"

  private def tkhdV0(w: Int, h: Int) =
    "0000005C" + cc("tkhd") + "00000007" + "00000000" * 2 + "00000001" +
      "00000000" + be32(1000) + "00000000" * 2 + "0000" * 4 + unity +
      f"$w%04X" + "0000" + f"$h%04X" + "0000"

  // v1: creation/modification/duration widen by 4 each -> box 104
  private def tkhdV1(w: Int, h: Int) =
    "00000068" + cc("tkhd") + "01000007" + be64(0) + be64(0) +
      "00000001" + "00000000" + be64(1000) + "00000000" * 2 +
      "0000" * 4 + unity + f"$w%04X" + "0000" + f"$h%04X" + "0000"

  private def box(typ: String, payloadHex: String): String =
    be32(8L + payloadHex.length / 2) + cc(typ) + payloadHex

  test("v0 tree: brand, floor-divided duration, 16.16 resolution") {
    val b = hx(ftyp("isom") +
      box("moov", mvhdV0(600, 1501) + box("trak", tkhdV0(1920, 1080))))
    assert(Mp4Kernel.brand(b) == "isom")
    assert(Mp4Kernel.durationMs(b) == 1501L * 1000 / 600) // floor 2501
    assert(Mp4Kernel.width(b) == 1920)
    assert(Mp4Kernel.height(b) == 1080)
  }

  test("v1 mvhd/tkhd: widened creation/modification/duration fields " +
      "shift every offset") {
    val b = hx(ftyp("mp42") +
      box("moov", mvhdV1(90000, 4500000L) + box("trak", tkhdV1(640, 480))))
    assert(Mp4Kernel.brand(b) == "mp42")
    assert(Mp4Kernel.durationMs(b) == 50000L)
    assert(Mp4Kernel.width(b) == 640)
    assert(Mp4Kernel.height(b) == 480)
  }

  test("largesize header (size == 1) and a size-0 run-to-end box walk") {
    // moov shipped with a 16-byte largesize header
    val moovPayload = mvhdV0(1000, 2500) + box("trak", tkhdV0(320, 240))
    val largeMoov = "00000001" + cc("moov") +
      be64(16L + moovPayload.length / 2) + moovPayload
    val b = hx(ftyp("avc1") + largeMoov)
    assert(Mp4Kernel.brand(b) == "avc1")
    assert(Mp4Kernel.durationMs(b) == 2500L)
    assert(Mp4Kernel.width(b) == 320)
    // a size-0 mdat at the end must not derail the walk before it
    val b2 = hx(ftyp("isom") +
      box("moov", mvhdV0(600, 600)) + "00000000" + cc("mdat") + "AB" * 8)
    assert(Mp4Kernel.durationMs(b2) == 1000L)
    assert(Mp4Kernel.width(b2) == -1) // no trak anywhere
  }

  test("garbage, truncation, and absence degrade to unknown/-1, " +
      "never throw") {
    assert(Mp4Kernel.brand(Array.emptyByteArray) == "unknown")
    assert(Mp4Kernel.brand(hx("00" * 16)) == "unknown")
    assert(Mp4Kernel.durationMs(hx("00" * 16)) == -1L)
    // valid ftyp but truncated moov size field overruns the buffer
    val trunc = hx(ftyp("isom") + "000000FF" + cc("moov") + "00" * 4)
    assert(Mp4Kernel.brand(trunc) == "isom")
    assert(Mp4Kernel.durationMs(trunc) == -1L)
    assert(Mp4Kernel.height(trunc) == -1)
    // mvhd with timescale 0 cannot divide
    val z = hx(ftyp("isom") + box("moov", mvhdV0(0, 99)))
    assert(Mp4Kernel.durationMs(z) == -1L)
  }

  test("expressions match the kernel through a parquet-backed scan " +
      "(codegen path)") {
    import graft.functions.VideoHeader._
    val df = SparkEntry.queries("q156_mp4_meta")(spark,
      "/root/testdata/sf0.001")
    val rows = df.collect()
    assert(rows.length > 0)
    // every non-garbage row parses; every garbage row degrades
    rows.foreach { r =>
      val id = r.getLong(0)
      if (id % 4 == 3) {
        assert(r.getString(1) == "unknown" && r.getLong(2) == -1L &&
          r.getInt(3) == -1 && r.getInt(4) == -1, s"row $id")
      } else {
        assert(Set("isom", "mp42", "avc1").contains(r.getString(1)))
        assert(r.getLong(2) >= 0 && r.getInt(3) >= 16 && r.getInt(4) >= 16,
          s"row $id")
      }
    }
    val plan = df.queryExecution.executedPlan.toString
    assert("\\*\\(\\d+\\)".r.findAllIn(plan).nonEmpty,
      "mp4 expressions fell out of whole-stage codegen")
  }
}
