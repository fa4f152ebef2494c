package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.SimHashKernel

/** Multimodal-column plumbing for training-data pipelines: image/audio/
  * video travel as opaque `binary` columns next to typed metadata, and
  * decode/feature-extraction runs as a batched per-partition stage (the
  * Scala analog of `mapInPandas`) so heavyweight decoders amortize their
  * init across a partition.
  *
  * Container-header metadata (format / width / height / channels for
  * PNG/JPEG/GIF) is a REAL byte parser — see
  * [[graft.functions.ImageHeaderKernel]], oracled end-to-end by
  * q108_media_meta. Only the pixel-level decode behind
  * [[Decoder.Deterministic]] remains a stub (this container ships no
  * codec libs): it derives plausible metadata from a stable content
  * hash. The Spark-side plumbing — schema, partition-sized batching,
  * typed output rows, decoder injection — is real and tested; swapping
  * in a JNI/FFI decoder is a one-class change.
  */
object Multimodal {

  /** A media row: opaque payload + routing metadata. */
  final case class MediaRow(id: Long, media_type: String, content: Array[Byte])

  /** Extracted features/metadata per media item. */
  final case class MediaMeta(
      id: Long, media_type: String, n_bytes: Long, content_hash: Long,
      width: Int, height: Int, n_frames: Int, duration_ms: Long,
      feature: Array[Float])

  /** Decoder boundary — one instance per executor partition. */
  trait Decoder extends Serializable {
    def decode(row: MediaRow): MediaMeta
  }

  object Decoder {
    /** Deterministic fake decode: metadata derived from an FNV-1a hash of
      * the payload. Stands in for image decode / audio probe / video
      * demux; STUB — replace with a real codec binding in production. */
    object Deterministic extends Decoder {
      override def decode(row: MediaRow): MediaMeta = {
        val h = SimHashKernel.fnv1a64(row.content)
        val w = 64 + (((h & 0x7fffffffL) % 1024L)).toInt
        val ht = 64 + (((h >>> 32) % 1024L)).toInt
        val frames = row.media_type match {
          case "video" => 1 + ((h >>> 16) % 300L).toInt
          case _ => 1
        }
        // 8-dim fake embedding: successive hash mixes, scaled to [-1, 1]
        val feat = Array.tabulate(8) { i =>
          val m = SimHashKernel.fnv1a64(Array[Byte](
            (h >>> (8 * (i % 8))).toByte, i.toByte))
          (m.toDouble / Long.MaxValue.toDouble).toFloat
        }
        MediaMeta(row.id, row.media_type, row.content.length.toLong, h,
          w, ht, frames, frames.toLong * 40L, feat)
      }
    }

    /** Engine-PORTABLE decode stub: the 8-dim feature vector is
      * `(md5_60bit(payload ++ ":i") % 2001) − 1000` per dimension —
      * exact integers in [-1000, 1000] that any md5-capable engine
      * recomputes from the same bytes (the JVM twin of
      * [[graft.functions.PortableHash.md5Long60]]'s 15-hex-char
      * prefix). Same decoder boundary and batch shape as
      * [[Deterministic]] (which it reuses for the non-feature
      * metadata); this is what lets the media → featurize → ANN
      * COMPOSITION be hash-verified end-to-end (q122's oracle replays
      * the features in SQL), not just its relational shell. */
    object PortableMd5 extends Decoder {
      private def md5Long60(bytes: Array[Byte]): Long = {
        val d = java.security.MessageDigest.getInstance("MD5").digest(bytes)
        val hex = d.take(8).map(b => f"$b%02x").mkString.substring(0, 15)
        java.lang.Long.parseLong(hex, 16)
      }
      override def decode(row: MediaRow): MediaMeta = {
        val base = Deterministic.decode(row)
        val feat = Array.tabulate(8) { i =>
          val m = md5Long60(row.content ++ s":$i".getBytes("UTF-8"))
          ((m % 2001L) - 1000L).toFloat
        }
        base.copy(feature = feat)
      }
    }
  }

  /** Batched decode stage: `mapPartitions` so decoder init happens once per
    * partition, not per row (the mapInPandas batch-shape on the JVM). */
  def featurize(media: Dataset[MediaRow], decoder: Decoder): Dataset[MediaMeta] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it => it.map(decoder.decode) }
  }

  /** Deterministic frame sampling for video payloads: every `stride`-th
    * "frame" (fixed-size byte windows of the payload — stand-in for real
    * demuxed frames), emitted as (id, frame_no, frame_bytes). */
  def sampleFrames(media: Dataset[MediaRow], stride: Int,
      frameBytes: Int = 256): DataFrame = {
    import media.sparkSession.implicits._
    media.flatMap { row =>
      if (row.media_type != "video") Iterator.empty
      else {
        val n = math.max(1, row.content.length / frameBytes)
        Iterator.range(0, n, stride).map { f =>
          val from = f * frameBytes
          val until = math.min(row.content.length, from + frameBytes)
          (row.id, f, java.util.Arrays.copyOfRange(row.content, from, until))
        }
      }
    }.toDF("id", "frame_no", "frame")
  }

  /** Build a MediaRow dataset from any (id, text-ish payload) DataFrame —
    * fixture helper so tests/queries can exercise the plumbing without
    * real media files. */
  def fromText(df: DataFrame, idCol: String, textCol: String,
      mediaType: String): Dataset[MediaRow] = {
    import df.sparkSession.implicits._
    df.select(col(idCol).cast("long").as("id"),
        lit(mediaType).as("media_type"),
        col(textCol).cast("binary").as("content"))
      .as[MediaRow]
  }
}
