package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal columns: image/audio/video as opaque `binary` with typed
  * metadata. The actual codec libraries are absent in this container, so the
  * DECODE step is a clearly-marked deterministic stub — but the Spark-side
  * plumbing (schema, batch iteration, partition-local decode, typed output)
  * is real and tested, and is exactly where a JNI/FFI decoder would slot in. */
object MultimodalOps {

  final case class MediaMeta(
      doc_id: Long,
      n_bytes: Int,
      media_type: String,
      width: Int,
      height: Int,
      n_frames: Int,
      sample_hash: Long)

  /** STUB decoder: derives deterministic pseudo-metadata from the bytes.
    * A real implementation would hand `bytes` to an image/audio decoder;
    * everything around this call is production plumbing. */
  def decodeStub(docId: Long, bytes: Array[Byte]): MediaMeta = {
    var h = 1125899906842597L
    var i = 0
    val step = math.max(1, bytes.length / 64) // sample, don't scan 100MB blobs
    while (i < bytes.length) { h = h * 31 + bytes(i); i += step }
    val mt = (math.floorMod(h, 3L)).toInt match {
      case 0 => "image"; case 1 => "audio"; case _ => "video"
    }
    MediaMeta(docId, bytes.length, mt,
      320 + (math.floorMod(h >> 3, 8L)).toInt * 160,
      240 + (math.floorMod(h >> 7, 8L)).toInt * 120,
      if (mt == "video") 1 + (math.floorMod(h >> 11, 240L)).toInt else 1,
      h)
  }

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
        it.map { case (id, bytes) => decodeStub(id, bytes) }
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

  /** Build a media table from the documents table (text bytes as the opaque
    * payload) — the plumbing input for tests/queries in this container. */
  def syntheticMedia(documents: DataFrame): DataFrame =
    documents.select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"))
}
