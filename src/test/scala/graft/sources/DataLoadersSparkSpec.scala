package graft.sources

import graft.pipeline.SparkTestBase

/** The loaders' DataFrame surfaces: schema + per-series kernel consumption
  * (groupByKey over the benchmark tables — SURVEY §2.1 Spark mapping). */
class DataLoadersSparkSpec extends SparkTestBase {
  import spark.implicits._

  private def resourceDir(p: String): String =
    new java.io.File(getClass.getResource(p).toURI).getAbsolutePath

  test("tssbDF exposes the benchmark as a typed table and segments per series") {
    val df = DataLoaders.tssbDF(spark, resourceDir("/loaders/tssb"))
    assert(df.columns.toSeq == Seq("dataset", "window_size", "cps", "labels", "time_series"))
    val cps = df.select("dataset", "time_series").as[(String, Array[Double])]
      .groupByKey(_._1)
      .mapGroups { (name, it) =>
        val ts = it.next()._2
        name -> new graft.kernel.BinaryClaSPSegmentation().fitPredict(ts).length
      }
      .collect().toMap
    assert(cps.size == 2 && cps.values.forall(_ >= 1), s"per-series segmentation: $cps")
  }

  test("hasDF exposes the multivariate benchmark with dim-major series") {
    val df = DataLoaders.hasDF(spark,
      new java.io.File(resourceDir("/loaders/has"), "has.csv.zip").getAbsolutePath)
    assert(df.columns.toSeq == Seq("dataset", "window_size", "cps", "activities", "dims"))
    val rows = df.select("dataset", "dims").as[(String, Array[Array[Double]])].collect()
    assert(rows.length == 2)
    assert(rows.exists(_._2.length == 9) && rows.exists(_._2.length == 6),
      "indoor 9-dim and outdoor 6-dim")
  }
}
