package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{DataType, IntegerType, LongType}

/** Real audio-header decode for WAV/RIFF payloads — the audio sibling of
  * [[ImageHeaderKernel]]: sample rate, channel count, bit depth, and
  * exact duration from the `fmt `/`data` chunk headers, walking the
  * RIFF chunk list (variable-length chunks, odd-size pad bytes) without
  * touching sample data. Pure byte arithmetic, zero codec libs; the
  * gate a speech/audio training pipeline runs (sample-rate filters,
  * duration buckets, mono/stereo routing) before paying for a real
  * decode.
  *
  * Parity: q111_wav_meta rebuilds identical RIFF containers in DuckDB
  * and re-walks the chunk list with a recursive CTE over the hex image,
  * so every parsed field is hash-checked against an independent
  * implementation (same adjudication pattern as the q108 image oracle).
  */
object WavHeaderKernel {

  private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xff
  private def le16(b: Array[Byte], i: Int): Int = u8(b, i) | (u8(b, i + 1) << 8)
  private def le32(b: Array[Byte], i: Int): Long =
    (u8(b, i) | (u8(b, i + 1) << 8) | (u8(b, i + 2) << 16)).toLong |
      (u8(b, i + 3).toLong << 24)

  private def isRiffWave(b: Array[Byte]): Boolean =
    b.length >= 12 &&
      u8(b, 0) == 'R' && u8(b, 1) == 'I' && u8(b, 2) == 'F' && u8(b, 3) == 'F' &&
      u8(b, 8) == 'W' && u8(b, 9) == 'A' && u8(b, 10) == 'V' && u8(b, 11) == 'E'

  /** Offset of the named chunk's DATA (just past its 8-byte header), or
    * -1. Walks the chunk list from offset 12; chunks are 8-byte header +
    * size bytes, padded to even (RIFF word alignment). */
  private def chunkOffset(b: Array[Byte], c0: Char, c1: Char, c2: Char,
      c3: Char): Int = {
    if (!isRiffWave(b)) return -1
    var i = 12
    while (i + 8 <= b.length) {
      val size = le32(b, i + 4)
      if (u8(b, i) == c0 && u8(b, i + 1) == c1 &&
          u8(b, i + 2) == c2 && u8(b, i + 3) == c3) return i + 8
      // next chunk: header + payload, odd payloads padded by one byte
      val step = 8L + size + (size & 1L)
      if (step <= 0 || i + step > Int.MaxValue) return -1 // corrupt size
      i += step.toInt
    }
    -1
  }

  private def fmtOff(b: Array[Byte]): Int = chunkOffset(b, 'f', 'm', 't', ' ')

  /** Samples per second from the fmt chunk, or -1. */
  def sampleRate(b: Array[Byte]): Int = {
    val o = fmtOff(b)
    if (o >= 0 && o + 8 <= b.length) le32(b, o + 4).toInt else -1
  }

  /** Channel count from the fmt chunk, or -1. */
  def channels(b: Array[Byte]): Int = {
    val o = fmtOff(b)
    if (o >= 0 && o + 4 <= b.length) le16(b, o + 2) else -1
  }

  /** Bits per sample from the fmt chunk, or -1. */
  def bitsPerSample(b: Array[Byte]): Int = {
    val o = fmtOff(b)
    if (o >= 0 && o + 16 <= b.length) le16(b, o + 14) else -1
  }

  /** Exact duration in milliseconds — `floor(data_bytes * 1000 /
    * byte_rate)` over the declared data-chunk size and fmt byte rate
    * (integer arithmetic: both engines agree bit-for-bit), or -1. The
    * data chunk need not be materialized in the buffer; only its SIZE
    * field is read — which is what makes this a header-only gate. */
  def durationMs(b: Array[Byte]): Long = {
    val f = fmtOff(b)
    if (f < 0 || f + 12 > b.length) return -1L
    val byteRate = le32(b, f + 8)
    if (byteRate <= 0) return -1L
    val d = chunkOffset(b, 'd', 'a', 't', 'a')
    if (d < 0) return -1L
    val dataBytes = le32(b, d - 4) // size field precedes the data offset
    dataBytes * 1000L / byteRate
  }
}

case class WavSampleRate(child: Expression) extends UnaryExpression {
  override def dataType: DataType = IntegerType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "wav_sample_rate"
  override protected def nullSafeEval(v: Any): Any =
    WavHeaderKernel.sampleRate(v.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.WavHeaderKernel.sampleRate($c)")
  override protected def withNewChildInternal(newChild: Expression): WavSampleRate =
    copy(child = newChild)
}

case class WavChannels(child: Expression) extends UnaryExpression {
  override def dataType: DataType = IntegerType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "wav_channels"
  override protected def nullSafeEval(v: Any): Any =
    WavHeaderKernel.channels(v.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.WavHeaderKernel.channels($c)")
  override protected def withNewChildInternal(newChild: Expression): WavChannels =
    copy(child = newChild)
}

case class WavBits(child: Expression) extends UnaryExpression {
  override def dataType: DataType = IntegerType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "wav_bits"
  override protected def nullSafeEval(v: Any): Any =
    WavHeaderKernel.bitsPerSample(v.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.WavHeaderKernel.bitsPerSample($c)")
  override protected def withNewChildInternal(newChild: Expression): WavBits =
    copy(child = newChild)
}

case class WavDurationMs(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "wav_duration_ms"
  override protected def nullSafeEval(v: Any): Any =
    WavHeaderKernel.durationMs(v.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.WavHeaderKernel.durationMs($c)")
  override protected def withNewChildInternal(newChild: Expression): WavDurationMs =
    copy(child = newChild)
}

object AudioHeader {
  def wavSampleRate(c: Column): Column =
    Bridge.column(WavSampleRate(Bridge.expression(c)))
  def wavChannels(c: Column): Column =
    Bridge.column(WavChannels(Bridge.expression(c)))
  def wavBits(c: Column): Column =
    Bridge.column(WavBits(Bridge.expression(c)))
  def wavDurationMs(c: Column): Column =
    Bridge.column(WavDurationMs(Bridge.expression(c)))
}
