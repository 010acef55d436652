package graft.ops

import org.json4s._
import org.apache.spark.sql.functions._
import graft.pipeline.SparkTestBase
import graft.kernel.GoldenJson

/** The ArrayType(ArrayType(Double)) series-column surface, pinned against
  * the reference: the multivariate golden cases (produced by running the
  * actual reference segmentation in tools/gen_golden.py §7) flow through the
  * COLUMN path and must yield the reference's exact change points. */
class MultivarOpsSpec extends SparkTestBase {
  import GoldenJson._
  import spark.implicits._

  test("segmentSeries over a nested-array column reproduces the reference cps") {
    val j = load("multivariate")
    val JArray(cases) = (j \ "cases"): @unchecked
    assert(cases.nonEmpty)
    val rows = cases.map { c =>
      val seed = (c \ "seed").values.asInstanceOf[BigInt].toInt
      (seed.toString, doubleMatrix(c \ "dims"), ints(c \ "cps").toSeq)
    }
    val df = rows.map { case (k, dims, _) => (k, dims) }.toDF("key", "series")
    assert(df.schema("series").dataType.simpleString == "array<array<double>>")
    val got = MultivarOps.segmentSeries(df, "key", "series").collect()
      .map(r => r.key -> r.cps.toSeq).toMap
    for ((k, _, expected) <- rows)
      assert(got(k) == expected, s"case seed=$k: ${got(k)} vs reference $expected")
  }

  test("assembleSeriesColumn builds the dim-major series from long-form rows") {
    val long = Seq(
      ("u1", 3L, 30.0, 300.0), ("u1", 1L, 10.0, 100.0), ("u1", 2L, 20.0, 200.0),
      ("u2", 1L, 5.0, 50.0)
    ).toDF("url", "bucket", "size", "tlen")
    val out = MultivarOps.assembleSeriesColumn(long, "url", "bucket", Seq("size", "tlen"))
      .as[(String, Array[Array[Double]])].collect().toMap
    assert(out("u1").map(_.toSeq).toSeq ==
      Seq(Seq(10.0, 20.0, 30.0), Seq(100.0, 200.0, 300.0)), "dim-major, ordered by bucket")
    assert(out("u2").map(_.toSeq).toSeq == Seq(Seq(5.0), Seq(50.0)))
  }

  test("segmentChunked bounds tasks to chunks and rebases first_cp globally") {
    // one 900-point mega key with chunkSpan 250 -> 4 chunks; per-chunk
    // segmentation is the documented at-scale semantics, so the expected
    // output is computed by running the kernel per chunk LOCALLY and
    // merging — equality proves (a) assembly grouped on (key, chunk), not
    // the whole key, and (b) the first change point is rebased by the
    // cumulative point count of earlier chunks
    val rng = new scala.util.Random(5)
    def sig(i: Int): (Double, Double) = {
      // regime shift at i=375 (the middle of chunk 1): period 8 -> 16 (short
      // periods keep the SuSS window small enough for min_seg = 5·w to
      // validate within a 250-point chunk), so chunk 1 holds 125 points of
      // each regime
      val p = if (i < 375) 8.0 else 16.0
      val a = if (i < 375) 1.0 else 2.0
      (a * math.sin(2 * math.Pi * i / p) + 0.05 * rng.nextGaussian(),
        a * math.cos(2 * math.Pi * i / p) + 0.05 * rng.nextGaussian())
    }
    val pts = (0 until 900).map { i => val (s1, s2) = sig(i); (i, s1, s2) }
    val long = pts.map { case (i, s1, s2) => ("mega", i.toLong, s1, s2) }
      .toDF("url", "bucket", "size", "tlen")
    val out = MultivarOps.segmentChunked(long, "url", "bucket",
        Seq("size", "tlen"), chunkSpan = 250L).collect()
    assert(out.length == 1)
    val row = out(0)

    // local reference: kernel per chunk, merged
    val chunks = pts.groupBy(_._1 / 250).toSeq.sortBy(_._1).map(_._2)
    assert(chunks.length == 4, "fixture must span multiple chunks")
    var offset = 0L
    var totalCps = 0
    var firstGlobal = -1L
    val perChunkCps = chunks.map { ch =>
      val sorted = ch.sortBy(_._1)
      val dims = Array(sorted.map(_._2).toArray, sorted.map(_._3).toArray)
      val cps = new graft.kernel.BinaryClaSPSegmentation().fitPredict(dims)
      totalCps += cps.length
      if (cps.nonEmpty && firstGlobal < 0) firstGlobal = offset + cps(0)
      offset += sorted.length
      cps.toSeq
    }
    assert(row.getAs[Long]("n_points") == 900L)
    assert(row.getAs[Int]("n_dims") == 2)
    assert(row.getAs[Int]("n_cps") == totalCps && totalCps > 0,
      s"engine ${row.getAs[Int]("n_cps")} cps vs local $totalCps ($perChunkCps)")
    assert(row.getAs[Int]("first_cp") == firstGlobal,
      s"engine first_cp ${row.getAs[Int]("first_cp")} vs local rebased $firstGlobal")
    // the shift at 450 sits in chunk 1 (250-499): chunk 0 must be clean so
    // the rebase is actually exercised (first_cp >= 250)
    assert(perChunkCps.head.isEmpty && firstGlobal >= 250,
      s"fixture should put the first cp past chunk 0 (got $perChunkCps)")
  }

  test("q35 runs end-to-end and finds change points") {
    val out = graft.Queries.all("q35_mv_series_column")(spark, "/root/testdata/sf0.001").collect()
    assert(out.length == 12)
    assert(out.forall(_.getAs[Long]("n_points") > 0))
    assert(out.exists(_.getAs[Int]("n_cps") > 0), "synthetic crawl urls should segment")
  }
}
