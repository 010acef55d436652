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
  @inline private def be32(b: Array[Byte], o: Int): Int =
    ((b(o) & 0xff) << 24) | ((b(o + 1) & 0xff) << 16) |
      ((b(o + 2) & 0xff) << 8) | (b(o + 3) & 0xff)
  @inline private def chunkIs(b: Array[Byte], o: Int, t: String): Boolean =
    b(o) == t.charAt(0).toByte && b(o + 1) == t.charAt(1).toByte &&
      b(o + 2) == t.charAt(2).toByte && b(o + 3) == t.charAt(3).toByte

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

  private val PngSig =
    Array(0x89, 'P'.toInt, 'N'.toInt, 'G'.toInt, 0x0d, 0x0a, 0x1a, 0x0a)

  /** REAL decode of the PNG header (public format, RFC 2083 / W3C PNG):
    * 8-byte signature, then the mandatory first IHDR chunk (length 13,
    * big-endian width/height + depth/color/compression/filter/interlace).
    * The chunk list is then walked up to the first IDAT/IEND looking for
    * an APNG `acTL` animation-control chunk — when present its num_frames
    * becomes n_frames (an animated PNG is a frame sequence), else 1.
    * Pixel decode needs inflate + per-scanline unfiltering and stays out
    * of scope here (the BMP path covers sample-level decode). */
  private def decodePng(docId: Long, bytes: Array[Byte]): Option[MediaMeta] = {
    if (bytes.length < 33) return None
    var i = 0
    while (i < 8) {
      if ((bytes(i) & 0xff) != PngSig(i)) return None
      i += 1
    }
    if (be32(bytes, 8) != 13 || !chunkIs(bytes, 12, "IHDR")) return None
    val w = be32(bytes, 16)
    val h = be32(bytes, 20)
    if (w <= 0 || h <= 0) return None
    var frames = 1
    // Long cursor, like the RIFF walk: a malformed declared size must end
    // the walk, never wrap an Int index
    var oL = 8L + 8L + 13L + 4L
    var done = false
    while (!done && oL + 8 <= bytes.length) {
      val o = oL.toInt
      val size = be32(bytes, o)
      if (size < 0) done = true
      else {
        if (chunkIs(bytes, o + 4, "IDAT") || chunkIs(bytes, o + 4, "IEND"))
          done = true
        else if (chunkIs(bytes, o + 4, "acTL") && o + 12 <= bytes.length) {
          val nf = be32(bytes, o + 8)
          if (nf > 0) frames = nf
        }
        oL += 8L + size.toLong + 4L
      }
    }
    Some(MediaMeta(docId, bytes.length, "image", w, h, frames,
      sampleHash(bytes)))
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

  /** Decode one payload: real header parse for BMP/PNG/WAV, stub
    * otherwise. */
  def decodeMedia(docId: Long, bytes: Array[Byte]): MediaMeta =
    decodeBmp(docId, bytes)
      .orElse(decodePng(docId, bytes))
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

  /** REAL sample-level audio decode + feature extraction for 16-bit PCM
    * RIFF/WAV payloads: parses the chunk list, reads the MATERIALIZED
    * `data` samples (16-bit LE; multi-channel frames are averaged to mono),
    * windows them into `frameSize`-sample frames, and emits per-frame RMS
    * energy and zero-crossing rate — the two features every audio-quality /
    * silence-trim pipeline computes first. Unlike [[extractMeta]] this
    * touches actual sample words, so it only accepts WAVs whose data chunk
    * bytes are present (a truncated blob yields only its complete frames);
    * non-WAV / non-16-bit payloads produce no rows. Pure JVM — PCM needs no
    * codec library; a compressed format's decoder would slot into the same
    * mapPartitions.
    *
    * Scale shape: partition-local decode (one codec init per task), one
    * output row per frame — no shuffle; downstream aggs see (doc_id,
    * frame_idx)-grained rows exactly like video frame sampling. */
  def audioFrameFeatures(media: DataFrame, frameSize: Int = 256): DataFrame = {
    require(frameSize > 0, s"frameSize must be positive, got $frameSize")
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (id, b) => pcmFrames(id, b, frameSize) }
      }
      .toDF("doc_id", "frame_idx", "n_samples", "rms", "zcr")
  }

  /** Decode one WAV payload to per-frame (rms, zcr) rows; see
    * [[audioFrameFeatures]]. */
  private def pcmFrames(
      id: Long, b: Array[Byte], frameSize: Int)
      : Iterator[(Long, Int, Int, Double, Double)] = {
    if (b.length < 44 ||
        !(b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F' &&
          b(8) == 'W' && b(9) == 'A' && b(10) == 'V' && b(11) == 'E'))
      return Iterator.empty
    var oL = 12L
    var channels = 0; var bits = 0; var dataOff = -1; var dataLen = 0
    while (oL + 8 <= b.length && (channels == 0 || dataOff < 0)) {
      val o = oL.toInt
      val size = le32(b, o + 4)
      if (size < 0) return Iterator.empty
      if (b(o) == 'f' && b(o + 1) == 'm' && b(o + 2) == 't' && b(o + 3) == ' ' &&
          o + 8 + 16 <= b.length) {
        channels = le16(b, o + 10); bits = le16(b, o + 22)
      } else if (b(o) == 'd' && b(o + 1) == 'a' && b(o + 2) == 't' && b(o + 3) == 'a') {
        dataOff = o + 8
        // only the bytes actually present participate (sampled blobs)
        dataLen = math.min(size, b.length - dataOff)
      }
      oL += 8L + size.toLong + (size & 1)
    }
    if (channels <= 0 || bits != 16 || dataOff < 0) return Iterator.empty
    val bytesPerFrame = channels * 2
    val nSamples = dataLen / bytesPerFrame
    val mono = new Array[Double](nSamples)
    var i = 0
    while (i < nSamples) {
      var acc = 0.0
      var c = 0
      while (c < channels) {
        // sign-extend the 16-bit LE word
        acc += le16(b, dataOff + i * bytesPerFrame + c * 2).toShort.toDouble
        c += 1
      }
      mono(i) = acc / channels
      i += 1
    }
    (0 until nSamples / frameSize).iterator.map { f =>
      val start = f * frameSize
      var sq = 0.0
      var crossings = 0
      var j = 0
      while (j < frameSize) {
        val v = mono(start + j)
        sq += v * v
        if (j > 0 && (v < 0) != (mono(start + j - 1) < 0)) crossings += 1
        j += 1
      }
      (id, f, frameSize, math.sqrt(sq / frameSize),
        crossings.toDouble / (frameSize - 1))
    }
  }

  /** Per-image pixel-level features from REAL 24-bpp BMP decoding: channel
    * means plus a 64-bit perceptual average-hash (8×8 luma pool, bit k set
    * when cell k's mean luma exceeds the grand cell mean, row-major k =
    * row*8+col from the TOP-left) — the classic image near-dup primitive; a
    * downstream hamming-bucket join on `ahash` is exactly the q17 SimHash
    * shape. Non-BMP / truncated payloads yield no row (sampled-blob-safe).
    *
    * Scale shape: one `mapPartitions` batch-decode pass, zero shuffles —
    * the same slot [[audioFrameFeatures]] uses for PCM; output is one
    * fixed-width row per image, so whatever aggregates or joins follow
    * operate on image-count-sized data, never pixels. */
  def imagePixelFeatures(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (id, b) => bmpPixelStats(id, b) }
      }
      .toDF("doc_id", "width", "height", "mean_r", "mean_g", "mean_b", "ahash")
  }

  private def bmpPixelStats(id: Long, b: Array[Byte])
      : Option[(Long, Int, Int, Double, Double, Double, Long)] = {
    if (b.length < 54 || b(0) != 'B' || b(1) != 'M') return None
    val off = le32(b, 10)
    val w = le32(b, 18)
    val h = le32(b, 22) // positive = bottom-up rows (the only layout we emit)
    val bits = le16(b, 28)
    if (bits != 24 || w <= 0 || h <= 0 || w > 65536 || h > 65536) return None
    val stride = (w * 3 + 3) & ~3
    if (off < 54 || off.toLong + stride.toLong * h > b.length) return None
    var sr = 0.0; var sg = 0.0; var sb = 0.0
    val cellSum = new Array[Double](64)
    val cellN = new Array[Long](64)
    var y = 0
    while (y < h) {
      // image row y (top-down) lives at physical row h-1-y
      val rowOff = off + (h - 1 - y) * stride
      val ci = y * 8 / h
      var x = 0
      while (x < w) {
        val o = rowOff + x * 3
        val bl = b(o) & 0xff; val gr = b(o + 1) & 0xff; val rd = b(o + 2) & 0xff
        sr += rd; sg += gr; sb += bl
        val k = ci * 8 + x * 8 / w
        cellSum(k) += (rd + gr + bl) / 3.0
        cellN(k) += 1
        x += 1
      }
      y += 1
    }
    val n = w.toLong * h
    var grand = 0.0
    val cell = new Array[Double](64)
    var k = 0
    while (k < 64) {
      cell(k) = if (cellN(k) > 0) cellSum(k) / cellN(k) else 0.0
      grand += cell(k)
      k += 1
    }
    grand /= 64.0
    var hash = 0L
    k = 0
    while (k < 64) {
      if (cell(k) > grand) hash |= 1L << k
      k += 1
    }
    Some((id, w, h, sr / n, sg / n, sb / n, hash))
  }

  /** Full 24-bpp BMP bytes WITH a deterministic pixel array (B = x mod 256,
    * R = y mod 256, G = g0): channel means and the aHash pool have closed
    * forms, so [[imagePixelFeatures]] is spec-checked against arithmetic,
    * not against itself. Rows are bottom-up and 4-byte padded per the
    * format. */
  def bmpBytesPixels(width: Int, height: Int, g0: Int): Array[Byte] = {
    require(width > 0 && height > 0, s"bad dims ${width}x$height")
    val stride = (width * 3 + 3) & ~3
    val total = 54 + stride * height
    val b = new Array[Byte](total)
    b(0) = 'B'; b(1) = 'M'
    def w32(o: Int, v: Int): Unit = {
      b(o) = (v & 0xff).toByte; b(o + 1) = ((v >> 8) & 0xff).toByte
      b(o + 2) = ((v >> 16) & 0xff).toByte; b(o + 3) = ((v >> 24) & 0xff).toByte
    }
    w32(2, total); w32(10, 54); w32(14, 40); w32(18, width); w32(22, height)
    b(26) = 1; b(28) = 24
    var y = 0
    while (y < height) {
      val rowOff = 54 + (height - 1 - y) * stride
      var x = 0
      while (x < width) {
        val o = rowOff + x * 3
        b(o) = (x % 256).toByte
        b(o + 1) = (g0 % 256).toByte
        b(o + 2) = (y % 256).toByte
        x += 1
      }
      y += 1
    }
    b
  }

  /** Build an image table from the documents table: every doc gets a small
    * REAL pixel-bearing BMP with doc_id-deterministic dimensions and green
    * level, so q71 exercises sample-level decode end-to-end. */
  def syntheticImages(documents: DataFrame): DataFrame = {
    val spark = documents.sparkSession
    import spark.implicits._
    documents.select(col("doc_id")).as[Long]
      .map { id =>
        (id, bmpBytesPixels(32 + (id % 5).toInt * 8, 24 + (id % 3).toInt * 8,
          (id % 200).toInt))
      }
      .toDF("doc_id", "payload")
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

  /** Minimal valid PNG bytes: signature, IHDR (8-bit truecolor), an
    * optional APNG acTL when frames > 1, an empty IDAT (declared, not
    * materialized — the header decoder never inflates) and IEND, each
    * chunk with its REAL CRC32 over type+data per the spec. */
  def pngBytes(width: Int, height: Int, frames: Int = 1): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(64)
    PngSig.foreach(v => out.write(v))
    def w32(v: Int): Unit = {
      out.write((v >> 24) & 0xff); out.write((v >> 16) & 0xff)
      out.write((v >> 8) & 0xff); out.write(v & 0xff)
    }
    def chunk(t: String, data: Array[Byte]): Unit = {
      w32(data.length)
      val tb = t.getBytes("US-ASCII")
      out.write(tb, 0, 4); out.write(data, 0, data.length)
      val crc = new java.util.zip.CRC32()
      crc.update(tb); crc.update(data)
      w32(crc.getValue.toInt)
    }
    val ihdr = new Array[Byte](13)
    def b32(a: Array[Byte], o: Int, v: Int): Unit = {
      a(o) = ((v >> 24) & 0xff).toByte; a(o + 1) = ((v >> 16) & 0xff).toByte
      a(o + 2) = ((v >> 8) & 0xff).toByte; a(o + 3) = (v & 0xff).toByte
    }
    b32(ihdr, 0, width); b32(ihdr, 4, height)
    ihdr(8) = 8; ihdr(9) = 2 // 8-bit truecolor; compression/filter/interlace 0
    chunk("IHDR", ihdr)
    if (frames > 1) {
      val actl = new Array[Byte](8)
      b32(actl, 0, frames) // num_frames; num_plays 0 = loop forever
      chunk("acTL", actl)
    }
    chunk("IDAT", Array.emptyByteArray)
    chunk("IEND", Array.emptyByteArray)
    out.toByteArray
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

  /** WAV bytes WITH materialized 16-bit PCM samples: a square wave of the
    * given period (samples flip sign every period/2), identical across
    * channels — closed-form features (RMS = amplitude exactly; ZCR =
    * crossings at every half-period boundary) make the sample-level decoder
    * hand-verifiable. */
  def wavBytesPcm(
      sampleRate: Int,
      channels: Int,
      nFrames: Int,
      period: Int,
      amplitude: Int): Array[Byte] = {
    require(period >= 2 && period % 2 == 0, s"period must be even >= 2, got $period")
    val header = wavBytes(sampleRate, channels, 16, nFrames)
    val b = java.util.Arrays.copyOf(header, 44 + nFrames * channels * 2)
    var i = 0
    while (i < nFrames) {
      val v = if ((i / (period / 2)) % 2 == 0) amplitude else -amplitude
      var c = 0
      while (c < channels) {
        val o = 44 + (i * channels + c) * 2
        b(o) = (v & 0xff).toByte; b(o + 1) = ((v >> 8) & 0xff).toByte
        c += 1
      }
      i += 1
    }
    b
  }

  /** Audio table from the documents table: every row carries a REAL 16-bit
    * PCM WAV whose tone period/length derive from doc_id — the
    * sample-level decode path ([[audioFrameFeatures]]) runs on actual
    * audio bytes end-to-end. */
  def syntheticAudio(documents: DataFrame): DataFrame = {
    val spark = documents.sparkSession
    import spark.implicits._
    documents.select(col("doc_id")).as[Long]
      .map { id =>
        (id, wavBytesPcm(8000, 1 + (id % 2).toInt, 1024 + (id % 7).toInt * 256,
          4 + (id % 14).toInt * 2, 4000 + (id % 16).toInt * 500))
      }
      .toDF("doc_id", "payload")
  }

  /** Build a media table from the documents table. Half the rows carry
    * REAL BMP, PNG (some animated, with acTL) or WAV headers with
    * deterministic dimensions from doc_id so the genuine decoders are
    * exercised end-to-end; the rest keep the text bytes as an opaque
    * payload routed to the stub — the mixed-format shape of a real
    * crawl. */
  def syntheticMedia(documents: DataFrame): DataFrame = {
    val spark = documents.sparkSession
    import spark.implicits._
    documents.select(col("doc_id"), col("text")).as[(Long, String)]
      .map { case (id, text) =>
        val payload = (id % 6) match {
          case 0 => bmpBytes(64 + (id % 13).toInt * 16, 48 + (id % 7).toInt * 16)
          case 1 => pngBytes(80 + (id % 11).toInt * 16, 60 + (id % 5).toInt * 12,
            if (id % 4 == 1) 2 + (id % 9).toInt else 1)
          case 3 => wavBytes(8000 * (1 + (id % 3).toInt), 1 + (id % 2).toInt,
            16, 1000 + (id % 500).toInt)
          case _ => text.getBytes("UTF-8")
        }
        (id, payload)
      }
      .toDF("doc_id", "payload")
  }
}
