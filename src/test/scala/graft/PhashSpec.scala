package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.PhashKernel

/** Perceptual hashes (q181): aHash/dHash invariances on hand-built PGM
  * images — brightness and light noise variants pair, distinct images
  * don't — plus the P5 parser's malformed-input null behavior and
  * the kernel/fixture round trip through the Spark expression. */
class PhashSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.session

  private def pgm(w: Int, h: Int, pix: (Int, Int) => Int): Array[Byte] = {
    val header = s"P5\n$w $h\n255\n".getBytes("US-ASCII")
    val body = new Array[Byte](w * h)
    for (y <- 0 until h; x <- 0 until w)
      body(y * w + x) = (pix(y, x) & 0xff).toByte
    header ++ body
  }

  private def ham(a: java.lang.Long, b: java.lang.Long): Int =
    java.lang.Long.bitCount(a.longValue ^ b.longValue)

  // a textured deterministic base image (the fixture's formula family)
  private def base(seed: Long)(y: Int, x: Int): Int =
    ((((y * 16 + x + 1) * (seed * 3 + 7) * 40503L) % 181) + 20).toInt

  test("brightness shift is EXACTLY hash-invariant (no clipping): " +
      "Hamming 0 on both hashes") {
    val img = pgm(16, 16, base(5))
    val bright = pgm(16, 16, (y, x) => base(5)(y, x) + 16)
    assert(PhashKernel.aHash64(img) == PhashKernel.aHash64(bright))
    assert(PhashKernel.dHash64(img) == PhashKernel.dHash64(bright))
  }

  test("light alternating noise moves the hashes a little; a reseeded " +
      "distinct image moves them a lot") {
    val img = pgm(24, 24, base(5))
    val noisy = pgm(24, 24, (y, x) => base(5)(y, x) + ((y + x) % 2))
    val other = pgm(24, 24, base(5 * 7919 + 123))
    val dNoise = ham(PhashKernel.dHash64(img), PhashKernel.dHash64(noisy))
    val dOther = ham(PhashKernel.dHash64(img), PhashKernel.dHash64(other))
    assert(dNoise <= 6, s"noise variant drifted to Hamming $dNoise")
    assert(dOther > 16, s"distinct image too close: Hamming $dOther")
    assert(dNoise < dOther)
  }

  test("pooling handles rasters that do not divide the 8-grid evenly " +
      "(cross-multiplied means, never division)") {
    // 20×12: row blocks of 1-2 rows, aHash col blocks of 2-3 cols, and
    // the 8×9 dHash grid gets single-pixel cells — any float-mean
    // shortcut or floor bias would disagree with the exact rule
    val img = pgm(20, 12, base(9))
    val a = PhashKernel.aHash64(img)
    val d = PhashKernel.dHash64(img)
    assert(a != null && d != null)
    // brightness invariance must survive uneven pooling too
    val bright = pgm(20, 12, (y, x) => base(9)(y, x) + 16)
    assert(PhashKernel.aHash64(bright) == a)
    assert(PhashKernel.dHash64(bright) == d)
  }

  test("constant image: no block mean exceeds the overall mean, no " +
      "gradient — both hashes are exactly 0") {
    val img = pgm(16, 16, (_, _) => 77)
    assert(PhashKernel.aHash64(img).longValue == 0L)
    assert(PhashKernel.dHash64(img).longValue == 0L)
  }

  test("malformed payloads hash to null (no in-range sentinel: dHash " +
      "can legitimately produce any 64-bit value): wrong magic, " +
      "truncated raster, 16-bit maxval, empty") {
    val ok = pgm(16, 16, base(1))
    assert(PhashKernel.aHash64(ok) != null)
    assert(PhashKernel.aHash64("P6".getBytes ++ ok.drop(2)) == null)
    assert(PhashKernel.aHash64(ok.dropRight(10)) == null)
    assert(PhashKernel.aHash64(
      "P5\n16 16\n65535\n".getBytes ++ new Array[Byte](512)) == null)
    assert(PhashKernel.dHash64(Array.emptyByteArray) == null)
    assert(PhashKernel.dHash64("P5\n0 16\n255\n".getBytes) == null)
    // and an all-gradient image proves -1 WAS reachable for dHash:
    // every 8x9 cell mean strictly exceeds its right neighbor
    val grad = pgm(18, 16, (_, x) => 240 - x * 13)
    assert(PhashKernel.dHash64(grad).longValue == -1L)
  }

  test("q181 fixture end-to-end: every within-group variant pair " +
      "(base/bright/noise) is found, no reseeded-distinct pair leaks " +
      "in a controlled slice") {
    val dir = "/root/testdata/sf0.001"
    val out = SparkEntry.queries("q181_phash_neardup")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val nDocs = Tables.load(spark, dir, "documents").count()
    val groups = (0L until nDocs / 4)
    // base/bright pair in EVERY group (uniform shift → Hamming 0 by
    // arithmetic). Noise pairs are guaranteed only on the 16×16 groups
    // (even g): there every dHash cell gains exactly +0.5 mean — again
    // invariant — while 24×24 cells gain 4/9 vs 5/9 and near-tie
    // comparisons can legitimately flip past the threshold (g=81 sits
    // at Hamming 11 — correctly NOT a near-dup).
    val want = groups.flatMap(g => Seq((4 * g, 4 * g + 1))) ++
      groups.filter(_ % 2 == 0).flatMap(g =>
        Seq((4 * g, 4 * g + 2), (4 * g + 1, 4 * g + 2)))
    val missing = want.filterNot(out.contains)
    assert(missing.isEmpty, s"missing variant pairs: ${missing.take(5)}")
    // the reseeded member (4g+3) must not pair WITHIN its group
    val leaked = groups.flatMap(g =>
      Seq((4 * g, 4 * g + 3), (4 * g + 1, 4 * g + 3),
        (4 * g + 2, 4 * g + 3))).filter(out.contains)
    assert(leaked.isEmpty, s"distinct images paired: ${leaked.take(5)}")
  }
}
