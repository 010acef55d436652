package graft.ops

import graft.pipeline.SparkTestBase
import org.apache.spark.sql.functions._

/** Real header decode (BMP / RIFF-WAV, public formats) + stub fallback for
  * codec-less formats, and the q20 plumbing over the mixed media table. */
class MultimodalOpsSpec extends SparkTestBase {
  import spark.implicits._

  test("BMP header decode yields exact pixel dimensions") {
    val m = MultimodalOps.decodeMedia(7L, MultimodalOps.bmpBytes(640, 480))
    assert(m.media_type == "image" && m.width == 640 && m.height == 480 &&
      m.n_frames == 1)
    // top-down BMPs store a negative height; magnitude is the pixel count
    val neg = MultimodalOps.bmpBytes(64, 0)
    def w32(b: Array[Byte], o: Int, v: Int): Unit = {
      b(o) = (v & 0xff).toByte; b(o + 1) = ((v >> 8) & 0xff).toByte
      b(o + 2) = ((v >> 16) & 0xff).toByte; b(o + 3) = ((v >> 24) & 0xff).toByte
    }
    w32(neg, 22, -48)
    assert(MultimodalOps.decodeMedia(7L, neg).height == 48)
  }

  test("WAV header decode yields rate, bits, and frame count from the chunk walk") {
    val m = MultimodalOps.decodeMedia(9L, MultimodalOps.wavBytes(16000, 2, 16, 12345))
    assert(m.media_type == "audio" && m.width == 16000 && m.height == 16 &&
      m.n_frames == 12345)
    // an extra odd-sized chunk before fmt must be skipped with word alignment
    val base = MultimodalOps.wavBytes(8000, 1, 16, 10)
    val extra = new Array[Byte](12 + 8 + 3 + 1 + 32) // RIFF hdr + LIST(3 + pad) + rest
    System.arraycopy(base, 0, extra, 0, 12)
    extra(12) = 'L'; extra(13) = 'I'; extra(14) = 'S'; extra(15) = 'T'
    extra(16) = 3 // chunk size 3, padded to 4
    System.arraycopy(base, 12, extra, 24, 32)
    val m2 = MultimodalOps.decodeMedia(9L, extra)
    assert(m2.media_type == "audio" && m2.width == 8000 && m2.n_frames == 10,
      s"chunk walk failed: $m2")
  }

  test("malformed RIFF with a near-Int.MaxValue chunk size falls back, not crashes") {
    // the chunk walk must use a Long cursor: an Int `o += size` would wrap
    // negative and throw ArrayIndexOutOfBoundsException out of the decoder
    val b = MultimodalOps.wavBytes(8000, 1, 16, 10)
    val evil = b.clone()
    // first chunk (fmt) declares size 0x7FFFFFF4
    evil(16) = 0xf4.toByte; evil(17) = 0xff.toByte
    evil(18) = 0xff.toByte; evil(19) = 0x7f.toByte
    val m = MultimodalOps.decodeMedia(5L, evil)
    assert(m == MultimodalOps.decodeStub(5L, evil),
      "unwalkable chunk list must route to the stub")
  }

  test("unknown payloads fall back to the deterministic stub") {
    val bytes = "not a media file at all".getBytes("UTF-8")
    val m = MultimodalOps.decodeMedia(3L, bytes)
    assert(m == MultimodalOps.decodeStub(3L, bytes))
    assert(Set("image", "audio", "video").contains(m.media_type))
  }

  test("PNG header decode yields exact dimensions; acTL drives n_frames") {
    val still = MultimodalOps.decodeMedia(1L, MultimodalOps.pngBytes(640, 480))
    assert(still.media_type == "image")
    assert(still.width == 640 && still.height == 480)
    assert(still.n_frames == 1)
    val anim = MultimodalOps.decodeMedia(2L,
      MultimodalOps.pngBytes(320, 200, frames = 7))
    assert(anim.width == 320 && anim.height == 200)
    assert(anim.n_frames == 7, "APNG acTL num_frames must be decoded")
  }

  test("malformed PNG falls back to the stub, never crashes") {
    // valid signature but a truncated/oversized first chunk
    val sig = MultimodalOps.pngBytes(10, 10).take(12)
    val m = MultimodalOps.decodeMedia(4L, sig)
    assert(m == MultimodalOps.decodeStub(4L, sig))
    // signature + declared near-Int.MaxValue IHDR length must not wrap
    val evil = MultimodalOps.pngBytes(10, 10).clone()
    evil(8) = 0x7f.toByte // IHDR length 0x7f00000d != 13 -> rejected
    val m2 = MultimodalOps.decodeMedia(5L, evil)
    assert(m2 == MultimodalOps.decodeStub(5L, evil))
  }

  test("q20 decodes the mixed media table: real BMP/PNG/WAV rows carry header-derived metadata") {
    val out = graft.Queries.all("q20_media_meta")(spark, "/root/testdata/sf0.001")
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(out.nonEmpty)
    for ((id, r) <- out) {
      if (id % 6 == 0) {
        assert(r.getAs[String]("media_type") == "image")
        assert(r.getAs[Int]("width") == 64 + (id % 13).toInt * 16, s"doc $id")
        assert(r.getAs[Int]("height") == 48 + (id % 7).toInt * 16, s"doc $id")
      } else if (id % 6 == 1) {
        assert(r.getAs[String]("media_type") == "image")
        assert(r.getAs[Int]("width") == 80 + (id % 11).toInt * 16, s"doc $id")
        assert(r.getAs[Int]("height") == 60 + (id % 5).toInt * 12, s"doc $id")
        assert(r.getAs[Int]("n_frames") ==
          (if (id % 4 == 1) 2 + (id % 9).toInt else 1), s"doc $id")
      } else if (id % 6 == 3) {
        assert(r.getAs[String]("media_type") == "audio")
        assert(r.getAs[Int]("width") == 8000 * (1 + (id % 3).toInt), s"doc $id")
        assert(r.getAs[Int]("n_frames") == 1000 + (id % 500).toInt, s"doc $id")
      }
    }
  }

  test("corpus guard: no opaque text payload begins with a real decoder's magic") {
    // The q20/q21 DuckDB mirrors select their reconstruction branch by
    // doc_id % 6, while the engine tries decodeBmp/decodePng/decodeWav and
    // falls back to the stub. The two selections agree only while no text
    // payload starts with 'BM' or 'RIFF'+'WAVE' (the PNG signature is
    // non-UTF-8-text by construction). Checked at BOTH the fixture scale
    // and the driver's sf0.01 gate scale, so a doc_id-dependent generator
    // change beyond the sf0.001 id range still trips here before it trips
    // the driver's hash gate as an opaque mismatch.
    for (sf <- Seq("sf0.001", "sf0.01")) {
      val offenders = spark.read.parquet(s"/root/testdata/$sf/documents.parquet")
        .where(col("doc_id") % 6 isin (2, 4, 5))
        .where(col("text").startsWith("BM") || col("text").startsWith("RIFF"))
        .count()
      assert(offenders == 0L, s"$sf: $offenders opaque payloads collide with a decoder magic")
    }
  }

  test("audioFrameFeatures: closed-form RMS/ZCR on square-wave PCM, mono and stereo") {
    import spark.implicits._
    // period 8 (half = 4 divides the 256 frame): every sample is ±A so
    // RMS = A exactly; sign flips at every 4th index -> 63 crossings / 255
    val rows = Seq(
      (1L, MultimodalOps.wavBytesPcm(8000, 1, 512, 8, 5000)),
      (2L, MultimodalOps.wavBytesPcm(8000, 2, 512, 8, 3000)), // stereo, averaged
      (3L, "not audio".getBytes("UTF-8"))                     // ignored
    ).toDF("doc_id", "payload")
    val out = MultimodalOps.audioFrameFeatures(rows, 256).collect()
      .map(r => (r.getLong(0), r.getInt(1)) ->
        ((r.getDouble(3), r.getDouble(4)))).toMap
    assert(out.keySet == Set((1L, 0), (1L, 1), (2L, 0), (2L, 1)), s"got ${out.keySet}")
    for (f <- 0 to 1) {
      assert(out((1L, f)) == ((5000.0, 63.0 / 255.0)), s"mono frame $f: ${out((1L, f))}")
      assert(out((2L, f)) == ((3000.0, 63.0 / 255.0)), s"stereo frame $f: ${out((2L, f))}")
    }
  }

  test("audioFrameFeatures: truncated data chunk yields only complete frames") {
    import spark.implicits._
    val full = MultimodalOps.wavBytesPcm(8000, 1, 512, 8, 5000)
    // cut mid-way through the second frame's samples (44B header + 300*2B)
    val cut = java.util.Arrays.copyOf(full, 44 + 600)
    val out = MultimodalOps.audioFrameFeatures(
        Seq((9L, cut)).toDF("doc_id", "payload"), 256)
      .collect().map(_.getInt(1)).toSet
    assert(out == Set(0), s"only the complete first frame survives: $out")
  }

  test("imagePixelFeatures: closed-form channel means and aHash on the gradient BMP") {
    // B = x, G = 77, R = y on a 64x48 image: mean_b = 31.5, mean_r = 23.5;
    // cell(i,j) luma = (83 + 6i + 8j)/3, grand = 44, so bit i*8+j is set
    // iff 6i + 8j > 49 (parity makes equality impossible -> FP-safe margin)
    val img = MultimodalOps.bmpBytesPixels(64, 48, 77)
    val r = MultimodalOps.imagePixelFeatures(Seq((1L, img)).toDF("doc_id", "payload"))
      .collect().head
    assert(r.getInt(1) == 64 && r.getInt(2) == 48)
    assert(r.getDouble(3) == 23.5 && r.getDouble(4) == 77.0 && r.getDouble(5) == 31.5,
      s"channel means: ${(r.getDouble(3), r.getDouble(4), r.getDouble(5))}")
    var expect = 0L
    for (i <- 0 until 8; j <- 0 until 8 if 6 * i + 8 * j > 49)
      expect |= 1L << (i * 8 + j)
    assert(r.getLong(6) == expect,
      s"ahash ${r.getLong(6).toBinaryString} vs ${expect.toBinaryString}")
  }

  test("imagePixelFeatures: pixel-less headers and non-BMP payloads yield no rows") {
    val rows = MultimodalOps.imagePixelFeatures(Seq(
      (1L, MultimodalOps.bmpBytes(64, 48)),           // header only, no pixels
      (2L, "just some text".getBytes("UTF-8"))
    ).toDF("doc_id", "payload")).collect()
    assert(rows.isEmpty, s"got ${rows.length} rows")
  }

  test("imagePixelFeatures: identical pixels => identical ahash; shifted gradient differs in means only") {
    val a = MultimodalOps.imagePixelFeatures(Seq(
      (1L, MultimodalOps.bmpBytesPixels(40, 24, 10)),
      (2L, MultimodalOps.bmpBytesPixels(40, 24, 10)),
      (3L, MultimodalOps.bmpBytesPixels(40, 24, 200))  // same gradient, brighter green
    ).toDF("doc_id", "payload"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(6), r.getDouble(4)))).toMap
    assert(a(1L) == a(2L), "byte-identical images hash identically")
    assert(a(1L)._1 == a(3L)._1, "uniform brightness shift leaves the aHash invariant")
    assert(a(1L)._2 != a(3L)._2, "but the channel means see it")
  }
}
