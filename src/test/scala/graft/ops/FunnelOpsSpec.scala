package graft.ops

import graft.pipeline.SparkTestBase
import org.apache.spark.sql.functions._

/** Unit coverage for funnel/cohort analytics (cross-engine checks are the
  * q76/q77 DuckDB oracles; these pin the ordering semantics on hand-built
  * edges). */
class FunnelOpsSpec extends SparkTestBase {
  import spark.implicits._

  private def ev(rows: (String, Long, String)*) =
    rows.map { case (u, ms, t) => (u, new java.sql.Timestamp(ms), t) }
      .toDF("user_id", "ts", "event_type")

  test("funnel requires each step strictly after the previous completion") {
    val df = ev(
      // u1: clean A(10) -> B(20) -> C(30), plus an earlier B(5) that must
      // NOT count (before A) and a later A(15) that must not move ts_1
      ("u1", 5L, "B"), ("u1", 10L, "A"), ("u1", 15L, "A"),
      ("u1", 20L, "B"), ("u1", 30L, "C"),
      // u2: A(10), B(20), but C only BEFORE B -> depth 2
      ("u2", 10L, "A"), ("u2", 20L, "B"), ("u2", 15L, "C"),
      // u3: B and C but never A -> excluded entirely
      ("u3", 1L, "B"), ("u3", 2L, "C"),
      // u4: A only -> depth 1
      ("u4", 7L, "A"),
      // u5: C at the SAME ts as B -> strict > rejects it, depth 2
      ("u5", 1L, "A"), ("u5", 2L, "B"), ("u5", 2L, "C"))
    val out = FunnelOps.funnel(df, col("user_id"), col("ts"),
        col("event_type"), Seq("A", "B", "C"))
      .collect().map(r => r.getString(0) ->
        ((Option(r.getTimestamp(1)).map(_.getTime),
          Option(r.getTimestamp(2)).map(_.getTime),
          Option(r.getTimestamp(3)).map(_.getTime), r.getInt(4)))).toMap
    assert(out.keySet == Set("u1", "u2", "u4", "u5"), "only step-1 users")
    assert(out("u1") == ((Some(10L), Some(20L), Some(30L), 3)))
    assert(out("u2") == ((Some(10L), Some(20L), None, 2)),
      "step k before step k-1 must not count")
    assert(out("u4") == ((Some(7L), None, None, 1)))
    assert(out("u5") == ((Some(1L), Some(2L), None, 2)),
      "equal timestamps are not strictly after")
  }

  test("cohortRetention cohorts by first-seen period and dedups activity") {
    val day = 86400000L
    val df = ev(
      // u1: first seen day 0; active day 0 (twice -> dedup), day 2
      ("u1", 100L, "x"), ("u1", 200L, "x"), ("u1", 2 * day + 5L, "x"),
      // u2: first seen day 1; active days 1 and 2
      ("u2", day + 1L, "x"), ("u2", 2 * day + 1L, "x"))
    val out = FunnelOps.cohortRetention(df, col("user_id"), col("ts"), day)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(out == Map(
      (0L, 0L) -> 1L, (0L, 2L) -> 1L,   // u1: offsets 0 and 2
      (1L, 0L) -> 1L, (1L, 1L) -> 1L))  // u2: offsets 0 and 1
  }
}
