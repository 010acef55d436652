package graft.ops

import graft.pipeline.SparkTestBase

class AsofOpsSpec extends SparkTestBase {
  import spark.implicits._

  test("asofJoin attaches the latest right payload at-or-before each left ts") {
    val left = Seq(
      ("u1", 5L, 100L), ("u1", 10L, 101L), ("u1", 15L, 102L), ("u1", 20L, 103L),
      ("u2", 10L, 200L)
    ).toDF("key", "t", "id")
    val right = Seq(
      ("u1", 10L, 1.0), ("u1", 18L, 2.0) // u2 has no right rows
    ).toDF("key", "t", "v")
    val out = AsofOps.asofJoin(left, right, "key", "t", Seq("v"))
      .collect().map(r => (r.getLong(2), Option(r.get(3)).map(_.asInstanceOf[Double]))).toMap
    assert(out(100L).isEmpty, "before first right row -> null")
    assert(out(101L).contains(1.0), "equal ts matches (<=)")
    assert(out(102L).contains(1.0))
    assert(out(103L).contains(2.0))
    assert(out(200L).isEmpty, "key with no right rows -> null")
  }

  test("asofJoin takes ALL payload values from the single latest right row (nulls included)") {
    // the latest right row holds NULL in one payload column; a true ASOF
    // join must NOT patch that NULL with a stale value from an older row
    val left = Seq(("u1", 20L, 1L)).toDF("key", "t", "id")
    val right = Seq(
      ("u1", 5L, Some(1.0), Some("old")),
      ("u1", 10L, None, Some("mid")),
      ("u1", 15L, Some(3.0), None) // latest: b is NULL here
    ).toDF("key", "t", "a", "b")
    val row = AsofOps.asofJoin(left, right, "key", "t", Seq("a", "b")).collect()(0)
    assert(row.getDouble(row.fieldIndex("a")) == 3.0)
    assert(row.isNullAt(row.fieldIndex("b")),
      "NULL in the latest right row must survive, not be back-filled from an older row")
  }

  test("asofForward attaches the earliest right payload at-or-after each ts") {
    val left = Seq(("u1", 10L, 1L), ("u1", 15L, 2L), ("u1", 30L, 3L),
      ("u2", 5L, 4L)).toDF("key", "t", "id")
    val right = Seq(("u1", 15L, 100.0), ("u1", 25L, 200.0))
      .toDF("key", "t", "p")
    val out = AsofOps.asofForward(left, right, "key", "t", Seq("p"))
      .select("id", "p").collect()
      .map(r => r.getLong(0) -> Option(r.get(1)).map(_.asInstanceOf[Double]))
      .toMap
    assert(out(1L) == Some(100.0), "next right after t=10 is t=15")
    assert(out(2L) == Some(100.0), "equal ts matches (ties include equality)")
    assert(out(3L) == None, "no future right row -> NULL")
    assert(out(4L) == None, "keys are independent")
  }
}
