package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal columns: image/audio/video as opaque `binary` with typed
  * metadata. Formats with trivially-public headers (BMP, RIFF/WAV) are
  * decoded for real in pure JVM code; everything else falls back to a
  * clearly-marked deterministic stub (the full codec libraries are absent in
  * this container). The Spark-side plumbing (schema, batch iteration,
  * partition-local decode, typed output) is real and tested either way, and
  * is exactly where a JNI/FFI decoder for the remaining formats would slot
  * in. */
object MultimodalOps {

  final case class MediaMeta(
      doc_id: Long,
      n_bytes: Int,
      media_type: String,
      width: Int,
      height: Int,
      n_frames: Int,
      sample_hash: Long)

  /** Strided content hash — real sampling, shared by all decode paths
    * (sample, don't scan 100MB blobs). */
  private def sampleHash(bytes: Array[Byte]): Long = {
    var h = 1125899906842597L
    var i = 0
    val step = math.max(1, bytes.length / 64)
    while (i < bytes.length) { h = h * 31 + bytes(i); i += step }
    h
  }

  @inline private def le16(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)
  @inline private def le32(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8) |
      ((b(o + 2) & 0xff) << 16) | ((b(o + 3) & 0xff) << 24)

  /** REAL decode of the BMP header (public format: 14-byte file header +
    * BITMAPINFOHEADER/BITMAPCOREHEADER). Emits media_type "image", pixel
    * width/height (height may be stored negative for top-down rows — the
    * magnitude is the pixel count), n_frames = 1. */
  private def decodeBmp(docId: Long, bytes: Array[Byte]): Option[MediaMeta] = {
    if (bytes.length < 26 || bytes(0) != 'B' || bytes(1) != 'M') return None
    val dibSize = le32(bytes, 14)
    val (w, h) =
      if (dibSize == 12) (le16(bytes, 18), le16(bytes, 20)) // BITMAPCOREHEADER
      else if (bytes.length >= 30) (le32(bytes, 18), math.abs(le32(bytes, 22)))
      else return None
    if (w <= 0 || h <= 0) return None
    Some(MediaMeta(docId, bytes.length, "image", w, h, 1, sampleHash(bytes)))
  }

  /** REAL decode of the RIFF/WAVE header (public format): walks the chunk
    * list for `fmt ` (channels, sample rate, bits, block align) and `data`
    * (payload size). Emits media_type "audio" with the audio meaning of the
    * generic columns: width = sample rate (Hz), height = bits per sample,
    * n_frames = data frames (samples per channel) = dataBytes / blockAlign. */
  private def decodeWav(docId: Long, bytes: Array[Byte]): Option[MediaMeta] = {
    if (bytes.length < 44) return None
    if (!(bytes(0) == 'R' && bytes(1) == 'I' && bytes(2) == 'F' && bytes(3) == 'F' &&
        bytes(8) == 'W' && bytes(9) == 'A' && bytes(10) == 'V' && bytes(11) == 'E'))
      return None
    // Long cursor: a (possibly malformed or truncated-blob) chunk may
    // declare a size near Int.MaxValue, and an Int `o += size` would wrap
    // negative and index out of bounds instead of ending the walk
    var oL = 12L
    var sampleRate = 0; var bits = 0; var blockAlign = 0; var dataBytes = -1
    while (oL + 8 <= bytes.length && (sampleRate == 0 || dataBytes < 0)) {
      val o = oL.toInt
      val size = le32(bytes, o + 4)
      if (size < 0) return None
      val isFmt = bytes(o) == 'f' && bytes(o + 1) == 'm' &&
        bytes(o + 2) == 't' && bytes(o + 3) == ' '
      val isData = bytes(o) == 'd' && bytes(o + 1) == 'a' &&
        bytes(o + 2) == 't' && bytes(o + 3) == 'a'
      if (isFmt && o + 8 + 16 <= bytes.length) {
        sampleRate = le32(bytes, o + 12)
        blockAlign = le16(bytes, o + 20)
        bits = le16(bytes, o + 22)
      } else if (isData) {
        // data payload may be truncated in a sampled blob; the declared
        // size is the authoritative frame count
        dataBytes = size
      }
      oL += 8L + size.toLong + (size & 1) // RIFF chunks are word-aligned
    }
    if (sampleRate <= 0 || blockAlign <= 0 || dataBytes < 0) return None
    Some(MediaMeta(docId, bytes.length, "audio", sampleRate, bits,
      dataBytes / blockAlign, sampleHash(bytes)))
  }

  /** STUB decoder for formats whose codecs are absent here: derives
    * deterministic pseudo-metadata from the bytes. A real implementation
    * would hand `bytes` to the codec; everything around this call is
    * production plumbing. */
  def decodeStub(docId: Long, bytes: Array[Byte]): MediaMeta = {
    val h = sampleHash(bytes)
    val mt = (math.floorMod(h, 3L)).toInt match {
      case 0 => "image"; case 1 => "audio"; case _ => "video"
    }
    MediaMeta(docId, bytes.length, mt,
      320 + (math.floorMod(h >> 3, 8L)).toInt * 160,
      240 + (math.floorMod(h >> 7, 8L)).toInt * 120,
      if (mt == "video") 1 + (math.floorMod(h >> 11, 240L)).toInt else 1,
      h)
  }

  /** Decode one payload: real header parse for BMP/WAV, stub otherwise. */
  def decodeMedia(docId: Long, bytes: Array[Byte]): MediaMeta =
    decodeBmp(docId, bytes)
      .orElse(decodeWav(docId, bytes))
      .getOrElse(decodeStub(docId, bytes))

  /** Partition-local decode + feature extraction over a binary column.
    * mapPartitions (not a per-row UDF) so a real decoder could amortize
    * codec init per task — the Scala analogue of a batched pandas UDF. */
  def extractMeta(media: DataFrame): Dataset[MediaMeta] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // real codecs would be initialised ONCE here, per task
        it.map { case (id, bytes) => decodeMedia(id, bytes) }
      }
  }

  /** Frame sampling for "video" rows: every `stride`-th frame index with a
    * deterministic per-frame content hash (stub). Emits one row per sampled
    * frame — the generator/UDTF role via flatMap. */
  def sampleFrames(meta: Dataset[MediaMeta], stride: Int = 30): DataFrame = {
    val spark = meta.sparkSession
    import spark.implicits._
    meta.filter(_.media_type == "video")
      .flatMap { m =>
        (0 until m.n_frames by stride).map { f =>
          (m.doc_id, f, m.sample_hash ^ (f.toLong * 2654435761L))
        }
      }
      .toDF("doc_id", "frame_idx", "frame_hash")
  }

  /** Minimal valid BMP bytes (BITMAPINFOHEADER, 24bpp, no pixel data beyond
    * the declared dimensions' first row padding) — used by
    * [[syntheticMedia]] so q20 exercises the REAL header decoder. */
  def bmpBytes(width: Int, height: Int): Array[Byte] = {
    val b = new Array[Byte](54)
    b(0) = 'B'; b(1) = 'M'
    def w32(o: Int, v: Int): Unit = {
      b(o) = (v & 0xff).toByte; b(o + 1) = ((v >> 8) & 0xff).toByte
      b(o + 2) = ((v >> 16) & 0xff).toByte; b(o + 3) = ((v >> 24) & 0xff).toByte
    }
    w32(2, 54); w32(10, 54); w32(14, 40); w32(18, width); w32(22, height)
    b(26) = 1; b(28) = 24
    b
  }

  /** Minimal valid WAV bytes (PCM fmt + data header, payload declared but
    * not materialized — the decoder reads declared sizes, as it must for
    * sampled blobs). */
  def wavBytes(sampleRate: Int, channels: Int, bits: Int, nFrames: Int): Array[Byte] = {
    val blockAlign = channels * bits / 8
    val dataBytes = nFrames * blockAlign
    val b = new Array[Byte](44)
    def w32(o: Int, v: Int): Unit = {
      b(o) = (v & 0xff).toByte; b(o + 1) = ((v >> 8) & 0xff).toByte
      b(o + 2) = ((v >> 16) & 0xff).toByte; b(o + 3) = ((v >> 24) & 0xff).toByte
    }
    def w16(o: Int, v: Int): Unit = {
      b(o) = (v & 0xff).toByte; b(o + 1) = ((v >> 8) & 0xff).toByte
    }
    b(0) = 'R'; b(1) = 'I'; b(2) = 'F'; b(3) = 'F'; w32(4, 36 + dataBytes)
    b(8) = 'W'; b(9) = 'A'; b(10) = 'V'; b(11) = 'E'
    b(12) = 'f'; b(13) = 'm'; b(14) = 't'; b(15) = ' '; w32(16, 16)
    w16(20, 1); w16(22, channels); w32(24, sampleRate)
    w32(28, sampleRate * blockAlign); w16(32, blockAlign); w16(34, bits)
    b(36) = 'd'; b(37) = 'a'; b(38) = 't'; b(39) = 'a'; w32(40, dataBytes)
    b
  }

  /** Build a media table from the documents table. One third of the rows
    * carry REAL BMP or WAV headers (deterministic dimensions from doc_id) so
    * the genuine decoders are exercised end-to-end; the rest keep the text
    * bytes as an opaque payload routed to the stub — the mixed-format shape
    * of a real crawl. */
  def syntheticMedia(documents: DataFrame): DataFrame = {
    val spark = documents.sparkSession
    import spark.implicits._
    documents.select(col("doc_id"), col("text")).as[(Long, String)]
      .map { case (id, text) =>
        val payload = (id % 6) match {
          case 0 => bmpBytes(64 + (id % 13).toInt * 16, 48 + (id % 7).toInt * 16)
          case 3 => wavBytes(8000 * (1 + (id % 3).toInt), 1 + (id % 2).toInt,
            16, 1000 + (id % 500).toInt)
          case _ => text.getBytes("UTF-8")
        }
        (id, payload)
      }
      .toDF("doc_id", "payload")
  }
}
