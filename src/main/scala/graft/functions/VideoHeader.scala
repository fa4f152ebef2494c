package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{DataType, IntegerType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Real video-container decode for MP4 / ISO base media (ISO/IEC
  * 14496-12) payloads — the video sibling of [[ImageHeaderKernel]] and
  * [[WavHeaderKernel]], completing the image/audio/video triad: major
  * brand from `ftyp`, exact millisecond duration from `moov/mvhd`
  * (timescale + duration, integer floor division), and presentation
  * width/height from the first `moov/trak/tkhd` (16.16 fixed point,
  * integer part). Pure byte arithmetic over the box tree — size(4 BE) +
  * type(4cc) headers, 64-bit `largesize` extension, size-0
  * runs-to-end — with NO codec library and no sample data touched:
  * the gate a video training pipeline runs (brand allowlists, duration
  * buckets, resolution floors) before paying for a real decode.
  *
  * Parity: q156_mp4_meta rebuilds box trees in DuckDB hex and re-walks
  * the top-level, `moov`-child, and `trak`-child box lists with
  * recursive CTEs (the q111 RIFF-walk pattern), so every parsed field
  * is hash-checked against an independent implementation.
  */
object Mp4Kernel {

  private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xff
  private def be32(b: Array[Byte], i: Int): Long =
    (u8(b, i).toLong << 24) | (u8(b, i + 1) << 16) |
      (u8(b, i + 2) << 8) | u8(b, i + 3)
  private def be64(b: Array[Byte], i: Int): Long =
    (be32(b, i) << 32) | be32(b, i + 4)

  private def is4cc(b: Array[Byte], i: Int, t: String): Boolean =
    u8(b, i) == t.charAt(0) && u8(b, i + 1) == t.charAt(1) &&
      u8(b, i + 2) == t.charAt(2) && u8(b, i + 3) == t.charAt(3)

  /** (payloadStart, payloadEnd) of the first box named `t` in the box
    * list spanning [from, until), or null. Payload starts after the
    * 8-byte header (16 with a largesize). A size below the header
    * length or past `until` is corrupt → stop. */
  private def find(b: Array[Byte], from: Int, until: Int,
      t: String): Array[Int] = {
    var i = from
    while (i + 8 <= until) {
      var size = be32(b, i)
      var hdr = 8
      if (size == 1L && i + 16 <= until) { size = be64(b, i + 8); hdr = 16 }
      else if (size == 0L) size = (until - i).toLong
      if (size < hdr || i + size > until) return null
      if (is4cc(b, i + 4, t))
        return Array(i + hdr, i + size.toInt)
      i += size.toInt
    }
    null
  }

  /** A plausibility gate: the first box parses and is one of the
    * ISO-BMFF signature types. */
  private def looksIso(b: Array[Byte]): Boolean =
    b.length >= 12 && (is4cc(b, 4, "ftyp") || is4cc(b, 4, "moov") ||
      is4cc(b, 4, "free") || is4cc(b, 4, "mdat") || is4cc(b, 4, "wide"))

  /** Major brand 4cc from the `ftyp` box, or "unknown". */
  def brand(b: Array[Byte]): String = {
    if (!looksIso(b)) return "unknown"
    val f = find(b, 0, b.length, "ftyp")
    if (f == null || f(0) + 4 > f(1)) return "unknown"
    new String(b, f(0), 4, java.nio.charset.StandardCharsets.US_ASCII)
  }

  /** (timescale, duration) from `moov/mvhd` (version 0 or 1), or null. */
  private def mvhd(b: Array[Byte]): Array[Long] = {
    if (!looksIso(b)) return null
    val moov = find(b, 0, b.length, "moov")
    if (moov == null) return null
    val m = find(b, moov(0), moov(1), "mvhd")
    if (m == null) return null
    val v = u8(b, m(0))
    if (v == 1) {
      if (m(0) + 28 > m(1)) return null
      Array(be32(b, m(0) + 20), be64(b, m(0) + 24))
    } else {
      if (m(0) + 20 > m(1)) return null
      Array(be32(b, m(0) + 12), be32(b, m(0) + 16))
    }
  }

  /** Exact presentation duration in milliseconds —
    * `floor(duration · 1000 / timescale)` in integer arithmetic — or
    * -1 when there is no parseable `mvhd` (or timescale 0). */
  def durationMs(b: Array[Byte]): Long = {
    val m = mvhd(b)
    if (m == null || m(0) <= 0) -1L else m(1) * 1000L / m(0)
  }

  /** tkhd payload bounds of the FIRST `moov/trak`, or null. */
  private def tkhd(b: Array[Byte]): Array[Int] = {
    if (!looksIso(b)) return null
    val moov = find(b, 0, b.length, "moov")
    if (moov == null) return null
    val trak = find(b, moov(0), moov(1), "trak")
    if (trak == null) return null
    find(b, trak(0), trak(1), "tkhd")
  }

  /** Integer part of the 16.16 fixed-point width/height at payload
    * offset `off0` (version 0) / `off0 + 12` (version 1), or -1. */
  private def fixed16(b: Array[Byte], off0: Int): Int = {
    val t = tkhd(b)
    if (t == null) return -1
    val off = if (u8(b, t(0)) == 1) off0 + 12 else off0
    if (t(0) + off + 4 > t(1)) return -1
    (be32(b, t(0) + off) >> 16).toInt
  }

  /** Presentation width from the first track's `tkhd`, or -1. */
  def width(b: Array[Byte]): Int = fixed16(b, 76)

  /** Presentation height from the first track's `tkhd`, or -1. */
  def height(b: Array[Byte]): Int = fixed16(b, 80)

  def brandUTF8(b: Array[Byte]): UTF8String = UTF8String.fromString(brand(b))
}

case class Mp4Brand(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "mp4_brand"
  override protected def nullSafeEval(v: Any): Any =
    Mp4Kernel.brandUTF8(v.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Mp4Kernel.brandUTF8($c)")
  override protected def withNewChildInternal(newChild: Expression): Mp4Brand =
    copy(child = newChild)
}

case class Mp4DurationMs(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "mp4_duration_ms"
  override protected def nullSafeEval(v: Any): Any =
    Mp4Kernel.durationMs(v.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Mp4Kernel.durationMs($c)")
  override protected def withNewChildInternal(newChild: Expression): Mp4DurationMs =
    copy(child = newChild)
}

case class Mp4Width(child: Expression) extends UnaryExpression {
  override def dataType: DataType = IntegerType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "mp4_width"
  override protected def nullSafeEval(v: Any): Any =
    Mp4Kernel.width(v.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Mp4Kernel.width($c)")
  override protected def withNewChildInternal(newChild: Expression): Mp4Width =
    copy(child = newChild)
}

case class Mp4Height(child: Expression) extends UnaryExpression {
  override def dataType: DataType = IntegerType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "mp4_height"
  override protected def nullSafeEval(v: Any): Any =
    Mp4Kernel.height(v.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Mp4Kernel.height($c)")
  override protected def withNewChildInternal(newChild: Expression): Mp4Height =
    copy(child = newChild)
}

object VideoHeader {
  def mp4Brand(c: Column): Column =
    Bridge.column(Mp4Brand(Bridge.expression(c)))
  def mp4DurationMs(c: Column): Column =
    Bridge.column(Mp4DurationMs(Bridge.expression(c)))
  def mp4Width(c: Column): Column =
    Bridge.column(Mp4Width(Bridge.expression(c)))
  def mp4Height(c: Column): Column =
    Bridge.column(Mp4Height(Bridge.expression(c)))
}
