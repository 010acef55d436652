package graft.ops

import graft.pipeline.SparkTestBase
import org.apache.spark.sql.functions._

/** Mergeable quantile sketch: exact below capacity (the q54 oracle pins
  * that against DuckDB quantile_cont), rank-error-bounded once compaction
  * fires, and cascade-stable (minute → hour → day merges). */
class QuantileSketchSpec extends SparkTestBase {
  import spark.implicits._

  private def seqQuantileCont(sorted: Array[Double], q: Double): Double = {
    val pos = q * (sorted.length - 1)
    val lo = math.floor(pos).toInt
    val frac = pos - lo
    if (frac == 0) sorted(lo)
    else sorted(lo) + frac * (sorted(lo + 1) - sorted(lo))
  }

  test("below capacity the sketch quantile equals quantile_cont exactly") {
    val rng = new scala.util.Random(61)
    for (n <- Seq(1, 2, 7, 100, 255)) {
      val xs = Array.fill(n)(rng.nextDouble() * 100)
      var s = QuantileSketch.empty(256)
      xs.foreach(x => s = QuantileSketch.update(s, x))
      val sorted = xs.sorted
      for (q <- Seq(0.0, 0.25, 0.5, 0.95, 1.0)) {
        val got = QuantileSketch.quantile(s, q)
        val want = seqQuantileCont(sorted, q)
        assert(got == want, s"n=$n q=$q: $got vs $want")
      }
    }
  }

  test("odd capacities are rejected and small even ones conserve weight") {
    intercept[IllegalArgumentException](QuantileSketch.empty(255))
    intercept[IllegalArgumentException](QuantileSketch.empty(1))
    // k=6 (k/2 odd): merges create odd upper buffers whose compaction must
    // carry the leftover, not drop it — total weight always equals n
    val rng = new scala.util.Random(73)
    val parts = (0 until 8).map { _ =>
      var s = QuantileSketch.empty(6)
      (0 until 500).foreach(_ => s = QuantileSketch.update(s, rng.nextDouble()))
      s
    }
    val merged = parts.reduce(QuantileSketch.merge)
    val weight = merged.lvl0Len.toLong +
      merged.upper.indices.map(h => merged.upper(h).length.toLong << (h + 1)).sum
    assert(merged.n == 4000L)
    assert(weight == merged.n, s"weight $weight must equal n ${merged.n}")
  }

  test("compacted regime: rank error stays within 2.5% of n at k=256") {
    val rng = new scala.util.Random(67)
    val n = 50000
    val xs = Array.fill(n)(rng.nextDouble() * 1000)
    // distributed build: partial sketches per partition, merged — the
    // exact shape of a groupBy aggregation with map-side combine
    val merged = xs.toSeq.toDS().repartition(8)
      .groupByKey(_ => 0).agg(new QuantileSketch.SketchAgg(256).toColumn)
      .collect()(0)._2
    assert(merged.n == n)
    val sorted = xs.sorted
    for (q <- Seq(0.1, 0.5, 0.9)) {
      val got = QuantileSketch.quantile(merged, q)
      // true rank of the reported value
      val rank = sorted.count(_ <= got)
      assert(math.abs(rank - q * n) <= 0.025 * n,
        s"q=$q: reported $got has rank $rank, want ${q * n} +- ${0.025 * n}")
    }
    // sketch stays O(k log(n/k)): far smaller than the data
    val held = merged.lvl0Len + merged.upper.map(_.length).sum
    assert(held <= 256 * 12, s"sketch holds $held values")
  }

  test("tier cascade (minute -> hour -> day) equals a flat sketch's error envelope") {
    val rng = new scala.util.Random(71)
    // 24h of per-minute data, 40 points/minute = 57.6k points
    val byMinute = (0 until 1440).map { m =>
      m -> Array.fill(40)(rng.nextGaussian() * 10 + (m / 60) * 0.5)
    }
    val minuteSketches = byMinute.map { case (m, xs) =>
      var s = QuantileSketch.empty(256)
      xs.foreach(x => s = QuantileSketch.update(s, x))
      (m, s)
    }
    val hourSketches = minuteSketches.groupBy(_._1 / 60).map { case (h, ms) =>
      h -> ms.map(_._2).reduce(QuantileSketch.merge)
    }
    val daySketch = hourSketches.values.reduce(QuantileSketch.merge)
    val all = byMinute.flatMap(_._2).toArray.sorted
    assert(daySketch.n == all.length.toLong)
    for (q <- Seq(0.1, 0.5, 0.9)) {
      val got = QuantileSketch.quantile(daySketch, q)
      val rank = all.count(_ <= got)
      assert(math.abs(rank - q * all.length) <= 0.03 * all.length,
        s"cascaded q=$q: rank $rank vs ${q * all.length}")
    }
  }

  test("level-0 capacity tracks content (sparse-group wire size) without changing values") {
    // a sparse group's sketch must not ship k doubles for a handful of
    // values — capacity grows lazily — and laziness must not perturb the
    // sketch: quantiles equal a reference fold at every prefix
    var s = QuantileSketch.empty(256)
    assert(s.lvl0.length == 8, "empty sketch allocates the minimum buffer")
    val rng = new scala.util.Random(41)
    val seen = scala.collection.mutable.ArrayBuffer.empty[Double]
    for (i <- 1 to 200) {
      val v = rng.nextDouble() * 100
      s = QuantileSketch.update(s, v)
      seen += v
      assert(s.lvl0.length <= math.max(8, 2 * s.lvl0Len max 8),
        s"capacity ${s.lvl0.length} outruns content ${s.lvl0Len} at n=$i")
      if (i <= 256) { // exact regime: quantile == quantile_cont over seen
        val sorted = seen.sorted
        val pos = 0.5 * (sorted.length - 1)
        val expect = sorted(pos.toInt) +
          (pos - pos.toInt) * (sorted(math.ceil(pos).toInt) - sorted(pos.toInt))
        assert(QuantileSketch.quantile(s, 0.5) == expect, s"median drift at n=$i")
      }
    }
    // merge of two lazily-grown sketches conserves weight and stays exact
    var t = QuantileSketch.empty(256)
    (1 to 20).foreach(i => t = QuantileSketch.update(t, i.toDouble))
    val m = QuantileSketch.merge(s, t)
    assert(m.n == 220L)
  }

  test("sketch columns round-trip through parquet and keep merging") {
    // the property that makes the cascade a STORED continuous aggregate:
    // write the finest tier's sketches to parquet, read them back later,
    // and roll up coarser tiers without ever touching raw data again
    val rng = new scala.util.Random(79)
    val rows = for (key <- Seq("a", "b"); m <- 0L until 6L) yield {
      var s = QuantileSketch.empty(256)
      (0 until 30).foreach(_ => s = QuantileSketch.update(s, rng.nextDouble() * 50))
      (key, m, s)
    }
    val dir = java.nio.file.Files.createTempDirectory("kll_tier").toString
    rows.toDS().toDF("key", "m", "sk").write.mode("overwrite").parquet(dir)
    val back = spark.read.parquet(dir)
      .as[(String, Long, Kll)]
      .groupByKey(_._1).mapValues(_._3)
      .agg(new QuantileSketch.MergeAgg(256).toColumn)
      .collect().toMap
    for (key <- Seq("a", "b")) {
      val direct = rows.filter(_._1 == key).map(_._3).reduce(QuantileSketch.merge)
      val stored = back(key)
      assert(stored.n == direct.n && stored.n == 180L)
      for (q <- Seq(0.1, 0.5, 0.9))
        assert(QuantileSketch.quantile(stored, q) == QuantileSketch.quantile(direct, q),
          s"$key q=$q differs after the parquet round-trip")
    }
  }

  test("q54 cascade runs end-to-end with one row per (user, day)") {
    val dir = "/root/testdata/sf0.001"
    assume(new java.io.File(s"$dir/events.parquet").exists(), s"$dir not present")
    val out = graft.Queries.all("q54_sketch_cascade")(spark, dir)
    val n = out.count()
    assert(n > 0)
    assert(out.filter(col("p50") > col("p95")).isEmpty, "p50 <= p95")
  }
}
