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

  test("q35 runs end-to-end and finds change points") {
    val out = graft.Queries.all("q35_mv_series_column")(spark, "/root/testdata/sf0.001").collect()
    assert(out.length == 12)
    assert(out.forall(_.getAs[Long]("n_points") > 0))
    assert(out.exists(_.getAs[Int]("n_cps") > 0), "synthetic crawl urls should segment")
  }
}
