package graft.ops

import graft.pipeline.{CrawlSignals, Rollup, SparkTestBase, SyntheticCrawl}

class StateOpsSpec extends SparkTestBase {
  import spark.implicits._

  test("transitionProbs row-normalizes per (key, from_state)") {
    val df = Seq(
      ("u1", 1L, "a"), ("u1", 2L, "b"), ("u1", 3L, "a"), ("u1", 4L, "b"),
      ("u2", 1L, "x"), ("u2", 2L, "x"), ("u2", 3L, "y")
    ).toDF("k", "ts", "state")
    import org.apache.spark.sql.functions.col
    val out = StateOps.transitionProbs(df, col("k"), Seq(col("ts")), col("state"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2), r.getLong(3), r.getDouble(4)))
    assert(out.toSet == Set(
      ("u1", "a", "b", 2L, 1.0), ("u1", "b", "a", 1L, 1.0),
      ("u2", "x", "x", 1L, 0.5), ("u2", "x", "y", 1L, 0.5)))
  }

  test("lttb keeps endpoints, respects threshold and picks extreme points") {
    import graft.ops.DownsampleOps.lttbIndices
    val n = 1000
    val ts = Array.tabulate(n)(i => i.toLong * 60000L)
    val v = Array.tabulate(n)(i => math.sin(2 * math.Pi * i / 50.0) * (1 + i / 500.0))
    val idx = lttbIndices(ts, v, 100)
    assert(idx.length == 100)
    assert(idx.head == 0 && idx.last == n - 1)
    assert(idx.sorted.sameElements(idx) && idx.distinct.length == idx.length)
    // a spike must survive downsampling (it maximizes its bucket's triangle)
    val v2 = v.clone(); v2(537) = 50.0
    assert(lttbIndices(ts, v2, 100).contains(537), "spike dropped")
    // degenerate thresholds pass through
    assert(lttbIndices(ts, v, n + 5).length == n)
    assert(lttbIndices(ts.take(2), v.take(2), 2).sameElements(Array(0, 1)))
  }

  test("epochStates emits one labeled row per (url, epoch)") {
    val pages = SyntheticCrawl.pagesDF(spark, nUrls = 6, basePoints = 400)
    val rollup = Rollup.scalableRollup(CrawlSignals.pageSize(pages), 60000L, "1m", segment = true)
    val epochCounts = rollup.filter(!_.gap_filled).toDF()
      .select("url", "epoch").distinct().groupBy("url").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val states = StateOps.epochStates(rollup).collect()
      .map(r => (r.getString(0), r.getInt(1), r.getInt(2), r.getInt(3)))
    val byUrl = states.groupBy(_._1)
    assert(byUrl.keySet == epochCounts.keySet)
    for ((url, rows) <- byUrl) {
      assert(rows.length == epochCounts(url).toInt, s"$url: one row per epoch")
      assert(rows.map(_._2).sorted.sameElements(0 until rows.length), s"$url: epochs 0..k")
      val nStates = rows.head._4
      assert(rows.forall(_._4 == nStates))
      val distinctStates = rows.map(_._3).distinct.sorted
      assert(distinctStates.sameElements(1 to nStates), s"$url: states 1..$nStates")
      assert(nStates <= rows.length)
    }
    // the synthetic crawl plants non-recurring regimes, so the detector
    // should mostly KEEP epochs distinct (merging behavior itself is pinned
    // exactly by ClapGoldenSpec's recurring-state fixtures)
    assert(states.count(r => r._4 > 1) > 0, "every url collapsed to one state")
  }
}
