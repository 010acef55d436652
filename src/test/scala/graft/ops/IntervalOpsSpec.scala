package graft.ops

import graft.pipeline.SparkTestBase
import org.apache.spark.sql.functions._

/** Unit coverage for interval merging / containment joins and the
  * time-weighted average (cross-engine checks are the q78/q79 oracles). */
class IntervalOpsSpec extends SparkTestBase {
  import spark.implicits._

  test("mergeIntervals merges contiguous buckets per partition, splits on gaps") {
    val b = 100L
    val df = Seq(
      ("d1", 0L), ("d1", 100L), ("d1", 200L), // one island [0, 300)
      ("d1", 400L),                           // gap -> [400, 500)
      ("d2", 200L), ("d2", 300L)              // other partition [200, 400)
    ).toDF("day", "bstart")
    val out = IntervalOps.mergeIntervals(df, col("day"), col("bstart"), b)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(out == Set((0L, 300L, 3L), (400L, 500L, 1L), (200L, 400L, 2L)))
  }

  test("rangeJoin pairs each point with covering intervals exactly once") {
    val iv = Seq((0L, 300L, "i1"), (250L, 400L, "i2"), (1000L, 1100L, "i3"))
      .toDF("s", "e", "iv")
    val pt = Seq((1L, 0L), (2L, 299L), (3L, 260L), (4L, 300L), (5L, 999L),
      (6L, 1099L)).toDF("id", "t")
    val out = IntervalOps.rangeJoin(pt, col("t"), iv, col("s"), col("e"), 100L)
      .select("id", "iv")
      .collect().map(r => (r.getLong(0), r.getString(1)))
    assert(out.length == out.distinct.length, "no duplicate pairs")
    assert(out.toSet == Set(
      (1L, "i1"),               // start inclusive
      (2L, "i1"), (2L, "i2"),   // overlapping intervals both match
      (3L, "i1"), (3L, "i2"),
      (4L, "i2"),               // end exclusive for i1
      (6L, "i3")))              // point 5 covered by nothing
  }

  test("timeWeightedAvg holds values to the next sample; NULL on zero span") {
    // key g1: v=10 for 100ms, v=30 for 300ms, last sample unweighted
    //   twa = (10*100 + 30*300) / 400 = 25.0
    val df = Seq(
      ("g1", 0L, 1L, 10.0), ("g1", 100L, 2L, 30.0), ("g1", 400L, 3L, 999.0),
      ("g2", 50L, 4L, 7.0) // single sample -> NULL twa
    ).map { case (k, ms, id, v) => (k, new java.sql.Timestamp(ms), id, v) }
      .toDF("k", "ts", "id", "v")
    val out = AnalyticsOps.timeWeightedAvg(df, col("k"), lit(1), col("ts"),
        col("id"), col("v"))
      .collect().map(r => r.getString(0) ->
        ((Option(r.get(4)).map(_.asInstanceOf[Double]), r.getLong(2),
          r.getLong(3)))).toMap
    assert(out("g1") == ((Some(25.0), 400L, 3L)))
    assert(out("g2") == ((None, 0L, 1L)), "zero span yields NULL, not Inf")
  }

  test("counterIncrease sums deltas, treats drops as resets contributing v") {
    // c1: 10 -> 15 (+5) -> 3 (RESET, +3) -> 8 (+5) = 13, 1 reset
    val df = Seq(
      ("c1", 0L, 1L, 10.0), ("c1", 1L, 2L, 15.0),
      ("c1", 2L, 3L, 3.0), ("c1", 3L, 4L, 8.0),
      ("c2", 0L, 5L, 42.0) // single sample: unobserved growth -> NULL
    ).toDF("k", "t", "id", "v")
    val out = AnalyticsOps.counterIncrease(df, col("k"), lit(1), col("t"),
        col("id"), col("v"))
      .select(col("key"), col("increase").cast("double"), col("resets"), col("n"))
      .collect().map(r => r.getString(0) ->
        ((Option(r.get(1)).map(_.asInstanceOf[Double]), r.getLong(2),
          r.getLong(3)))).toMap
    assert(out("c1") == ((Some(13.0), 1L, 4L)))
    assert(out("c2") == ((None, 0L, 1L)))
  }

  test("overlapJoin emits each intersecting pair exactly once, half-open") {
    val left = Seq((1L, 0L, 1000L), (2L, 5000L, 9000L)).toDF("lid", "ls", "le")
    val right = Seq(
      (10L, 500L, 700L),   // contained in 1
      (11L, 1000L, 2000L), // touches 1 exactly at the boundary -> NOT overlap
      (12L, 800L, 6000L),  // overlaps BOTH 1 and 2, shares many buckets each
      (13L, 8999L, 12000L) // clips 2's last ms
    ).toDF("rid", "rs", "re")
    // tiny bucket: pairs share dozens of buckets — the canonical-bucket
    // filter must still emit each exactly once
    val out = IntervalOps.overlapJoin(left, col("ls"), col("le"),
        right, col("rs"), col("re"), 100L)
      .select("lid", "rid").as[(Long, Long)].collect().sorted.toSeq
    assert(out == Seq((1L, 10L), (1L, 12L), (2L, 12L), (2L, 13L)))
  }
}
