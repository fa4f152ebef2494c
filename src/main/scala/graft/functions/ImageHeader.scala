package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Real image-header decode over opaque `binary` media columns — pure byte
  * arithmetic, zero native libs, so the [[graft.operators.Multimodal]]
  * pipeline's metadata stage is a genuine parser rather than the declared
  * hash stub (the stub remains only behind the codec boundary that a real
  * deployment fills with a JNI decoder).
  *
  * Formats: PNG (IHDR chunk), JPEG (SOFn marker scan over variable-length
  * segments), GIF87a/89a (logical screen descriptor). All three are
  * fixed-offset or marker-delimited byte reads — exactly the fields a
  * training-data pipeline filters on (min-resolution gates, aspect-ratio
  * buckets) before paying for a full pixel decode.
  *
  * Parity gate: q108_media_meta reconstructs the same container bytes in
  * DuckDB and re-parses them with hex-string slicing + a recursive-CTE
  * JPEG marker scan, so every parsed field is hash-checked against an
  * independent implementation.
  */
object ImageHeaderKernel {

  private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xff
  private def be16(b: Array[Byte], i: Int): Int = (u8(b, i) << 8) | u8(b, i + 1)
  private def le16(b: Array[Byte], i: Int): Int = u8(b, i) | (u8(b, i + 1) << 8)
  private def be32(b: Array[Byte], i: Int): Int =
    (u8(b, i) << 24) | (u8(b, i + 1) << 16) | (u8(b, i + 2) << 8) | u8(b, i + 3)

  private def isPng(b: Array[Byte]): Boolean =
    b.length >= 26 &&
      u8(b, 0) == 0x89 && u8(b, 1) == 0x50 && u8(b, 2) == 0x4e && u8(b, 3) == 0x47 &&
      u8(b, 4) == 0x0d && u8(b, 5) == 0x0a && u8(b, 6) == 0x1a && u8(b, 7) == 0x0a &&
      // first chunk must be IHDR per spec
      u8(b, 12) == 'I' && u8(b, 13) == 'H' && u8(b, 14) == 'D' && u8(b, 15) == 'R'

  private def isJpeg(b: Array[Byte]): Boolean =
    b.length >= 4 && u8(b, 0) == 0xff && u8(b, 1) == 0xd8

  private def isGif(b: Array[Byte]): Boolean =
    b.length >= 13 &&
      u8(b, 0) == 'G' && u8(b, 1) == 'I' && u8(b, 2) == 'F' &&
      u8(b, 3) == '8' && (u8(b, 4) == '7' || u8(b, 4) == '9') && u8(b, 5) == 'a'

  /** Offset of the first SOFn (start-of-frame) segment payload, or -1.
    * Walks FF-marker segments from offset 2; SOFn is any of C0–CF except
    * DHT (C4), JPG (C8), DAC (CC). Stops at SOS (DA) / EOI (D9) — frame
    * headers always precede entropy-coded data. */
  private def jpegSofOffset(b: Array[Byte]): Int = {
    var i = 2
    while (i + 4 <= b.length) {
      if (u8(b, i) != 0xff) return -1 // desynchronized: not a marker
      val marker = u8(b, i + 1)
      if (marker == 0xd9 || marker == 0xda) return -1 // EOI / SOS: no SOF seen
      if (marker >= 0xc0 && marker <= 0xcf &&
          marker != 0xc4 && marker != 0xc8 && marker != 0xcc) {
        return i + 4 // skip marker (2) + length (2): payload starts here
      }
      i += 2 + be16(b, i + 2) // next marker: 2 marker bytes + length incl. itself
    }
    -1
  }

  /** Container format by magic bytes: "png" | "jpeg" | "gif" | "unknown". */
  def format(b: Array[Byte]): UTF8String =
    UTF8String.fromString(
      if (isPng(b)) "png" else if (isJpeg(b)) "jpeg"
      else if (isGif(b)) "gif" else "unknown")

  /** Pixel width, or -1 when the header is absent/truncated. */
  def width(b: Array[Byte]): Int =
    if (isPng(b)) be32(b, 16)
    else if (isGif(b)) le16(b, 6)
    else if (isJpeg(b)) {
      val sof = jpegSofOffset(b)
      if (sof >= 0 && sof + 5 <= b.length) be16(b, sof + 3) else -1
    } else -1

  /** Pixel height, or -1 when the header is absent/truncated. */
  def height(b: Array[Byte]): Int =
    if (isPng(b)) be32(b, 20)
    else if (isGif(b)) le16(b, 8)
    else if (isJpeg(b)) {
      val sof = jpegSofOffset(b)
      if (sof >= 0 && sof + 3 <= b.length) be16(b, sof + 1) else -1
    } else -1

  /** Channel count: PNG from IHDR color type (0 gray, 2 rgb, 3 palette,
    * 4 gray+alpha, 6 rgba), JPEG from the SOF component count, GIF always
    * palette-indexed RGB (3). -1 when unknown. */
  def channels(b: Array[Byte]): Int =
    if (isPng(b)) u8(b, 25) match {
      case 0 => 1; case 2 => 3; case 3 => 1; case 4 => 2; case 6 => 4
      case _ => -1
    }
    else if (isGif(b)) 3
    else if (isJpeg(b)) {
      val sof = jpegSofOffset(b)
      if (sof >= 0 && sof + 6 <= b.length) u8(b, sof + 5) else -1
    } else -1
}

/** Scalar codegen expressions over a binary column. Headers are <100 bytes,
  * so per-field re-parse (4 scans) is noise next to one avoided UDF
  * boundary — each stays inside whole-stage codegen. */
case class ImgFormat(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "img_format"
  override protected def nullSafeEval(v: Any): Any =
    ImageHeaderKernel.format(v.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ImageHeaderKernel.format($c)")
  override protected def withNewChildInternal(newChild: Expression): ImgFormat =
    copy(child = newChild)
}

case class ImgWidth(child: Expression) extends UnaryExpression {
  override def dataType: DataType = IntegerType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "img_width"
  override protected def nullSafeEval(v: Any): Any =
    ImageHeaderKernel.width(v.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ImageHeaderKernel.width($c)")
  override protected def withNewChildInternal(newChild: Expression): ImgWidth =
    copy(child = newChild)
}

case class ImgHeight(child: Expression) extends UnaryExpression {
  override def dataType: DataType = IntegerType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "img_height"
  override protected def nullSafeEval(v: Any): Any =
    ImageHeaderKernel.height(v.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ImageHeaderKernel.height($c)")
  override protected def withNewChildInternal(newChild: Expression): ImgHeight =
    copy(child = newChild)
}

case class ImgChannels(child: Expression) extends UnaryExpression {
  override def dataType: DataType = IntegerType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "img_channels"
  override protected def nullSafeEval(v: Any): Any =
    ImageHeaderKernel.channels(v.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ImageHeaderKernel.channels($c)")
  override protected def withNewChildInternal(newChild: Expression): ImgChannels =
    copy(child = newChild)
}

object ImageHeader {
  def imgFormat(c: Column): Column = Bridge.column(ImgFormat(Bridge.expression(c)))
  def imgWidth(c: Column): Column = Bridge.column(ImgWidth(Bridge.expression(c)))
  def imgHeight(c: Column): Column = Bridge.column(ImgHeight(Bridge.expression(c)))
  def imgChannels(c: Column): Column = Bridge.column(ImgChannels(Bridge.expression(c)))
}
