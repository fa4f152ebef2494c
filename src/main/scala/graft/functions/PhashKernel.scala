package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{DataType, LongType}

/** Perceptual image hashes (aHash / dHash, 64-bit) over UNCOMPRESSED
  * grayscale bitmaps (binary PGM, "P5") — the media near-dup fingerprint
  * the exact-payload-md5 path cannot provide: a re-encoded, brightened,
  * or lightly-noised copy changes every payload byte but barely moves a
  * perceptual hash, so near-dup detection runs as Hamming banding over
  * 64-bit fingerprints ([[graft.operators.Dedup.hammingNearDup]], the
  * q31 SimHash machinery) instead of an impossible byte compare.
  *
  * Like the q108/q111/q156 sibling kernels this is pure byte arithmetic,
  * zero native libs: the parser walks a real PNM header (magic,
  * whitespace-separated width/height/maxval, single-byte samples), and
  * the hash is exact integer pooling over the raw pixels. Compressed
  * containers (PNG/JPEG) sit behind the declared codec boundary — a real
  * deployment decodes to a bitmap first; everything downstream of the
  * decode IS this code.
  *
  * Definitions (all integer, engine-replayable — the q181 DuckDB twin
  * recomputes both hashes from the same bytes):
  *  - pooling: pixel (y, x) belongs to aHash block (y·8 div h, x·8 div w)
  *    — an 8×8 grid — and to dHash cell (y·8 div h, x·9 div w) — an 8×9
  *    grid. Blocks are DEFINED by this assignment (no rounding duality
  *    to argue about); uneven sizes are handled by exact mean
  *    comparison via cross-multiplication, never division.
  *  - aHash bit (r·8+c): mean(block) > mean(image), i.e.
  *    s_block · N > S · n_block. A uniform brightness shift adds the
  *    same amount to both means — bits are exactly invariant (no
  *    clipping), which is the property the near-dup join exploits.
  *  - dHash bit (r·8+c), c < 8: mean(cell r,c) > mean(cell r,c+1) —
  *    the horizontal-gradient hash, likewise brightness-invariant.
  *
  * Malformed/truncated payloads hash to NULL (nullable expressions, the
  * ADVICE r14 fix): an in-range sentinel like the q108 kernels' -1 is
  * unsound here because dHash can legitimately produce any 64-bit value
  * — an image brightening monotonically right-to-left sets all 64
  * gradient bits, colliding with -1 — so validity rides the SQL null
  * channel and malformed rows drop out of the banding join naturally.
  * Maxval must be ≤ 255 (1-byte samples); PGM comment lines are not
  * supported (the fixture never emits them — a production ingest
  * normalizes headers first).
  */
object PhashKernel {

  private def isWs(c: Int): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\r' || c == 0x0b || c == '\f'

  /** Parse "P5" header: returns Array(w, h, pixelOffset) or null. */
  private def parseP5(b: Array[Byte]): Array[Int] = {
    if (b.length < 4 || b(0) != 'P' || b(1) != '5') return null
    var i = 2
    val vals = new Array[Int](3)
    var k = 0
    while (k < 3) {
      while (i < b.length && isWs(b(i) & 0xff)) i += 1
      if (i >= b.length || b(i) < '0' || b(i) > '9') return null
      var v = 0
      while (i < b.length && b(i) >= '0' && b(i) <= '9') {
        v = v * 10 + (b(i) - '0')
        if (v > 1000000) return null
        i += 1
      }
      vals(k) = v
      k += 1
    }
    // exactly ONE whitespace byte separates maxval from the raster
    if (i >= b.length || !isWs(b(i) & 0xff)) return null
    i += 1
    val w = vals(0)
    val h = vals(1)
    if (w <= 0 || h <= 0 || vals(2) <= 0 || vals(2) > 255) return null
    if (b.length - i < w.toLong * h) return null
    Array(w, h, i)
  }

  /** 8×`gridW` pooled sums and counts over the raster: returns
    * (sums, counts) flattened row-major, or null when malformed. */
  private def pool(b: Array[Byte], gridW: Int): (Array[Long], Array[Long], Int, Int) = {
    val hd = parseP5(b)
    if (hd == null) return null
    val w = hd(0)
    val h = hd(1)
    val off = hd(2)
    val sums = new Array[Long](8 * gridW)
    val counts = new Array[Long](8 * gridW)
    var y = 0
    while (y < h) {
      val r = y * 8 / h
      val rowBase = off + y * w
      var x = 0
      while (x < w) {
        val cell = r * gridW + x * gridW / w
        sums(cell) += (b(rowBase + x) & 0xff)
        counts(cell) += 1L
        x += 1
      }
      y += 1
    }
    (sums, counts, w, h)
  }

  /** Average hash: bit (r·8+c) set iff block mean > image mean;
    * null when the payload is not a well-formed P5 bitmap. */
  def aHash64(b: Array[Byte]): java.lang.Long = {
    val p = pool(b, 8)
    if (p == null) return null
    val (sums, counts, w, h) = p
    val n = w.toLong * h
    var total = 0L
    var i = 0
    while (i < 64) { total += sums(i); i += 1 }
    var hash = 0L
    i = 0
    while (i < 64) {
      if (sums(i) * n > total * counts(i)) hash |= (1L << i)
      i += 1
    }
    java.lang.Long.valueOf(hash)
  }

  /** Difference hash: bit (r·8+c) set iff cell (r,c) mean > (r,c+1) mean
    * on the 8×9 grid; null when the payload is malformed. */
  def dHash64(b: Array[Byte]): java.lang.Long = {
    val p = pool(b, 9)
    if (p == null) return null
    val (sums, counts, _, _) = p
    var hash = 0L
    var r = 0
    while (r < 8) {
      var c = 0
      while (c < 8) {
        val l = r * 9 + c
        if (sums(l) * counts(l + 1) > sums(l + 1) * counts(l))
          hash |= (1L << (r * 8 + c))
        c += 1
      }
      r += 1
    }
    java.lang.Long.valueOf(hash)
  }
}

case class AHash64(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullable: Boolean = true // malformed payload hashes to null
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "ahash64"
  override protected def nullSafeEval(v: Any): Any =
    PhashKernel.aHash64(v.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      java.lang.Long ${ev.value}_r = graft.functions.PhashKernel.aHash64($c);
      if (${ev.value}_r == null) { ${ev.isNull} = true; }
      else { ${ev.value} = ${ev.value}_r.longValue(); }""")
  override protected def withNewChildInternal(newChild: Expression): AHash64 =
    copy(child = newChild)
}

case class DHash64(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullable: Boolean = true // malformed payload hashes to null
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "dhash64"
  override protected def nullSafeEval(v: Any): Any =
    PhashKernel.dHash64(v.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      java.lang.Long ${ev.value}_r = graft.functions.PhashKernel.dHash64($c);
      if (${ev.value}_r == null) { ${ev.isNull} = true; }
      else { ${ev.value} = ${ev.value}_r.longValue(); }""")
  override protected def withNewChildInternal(newChild: Expression): DHash64 =
    copy(child = newChild)
}

object Phash {
  def ahash64(c: Column): Column = Bridge.column(AHash64(Bridge.expression(c)))
  def dhash64(c: Column): Column = Bridge.column(DHash64(Bridge.expression(c)))
}
