package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Gap-based sessionization of an event stream — the classic web-log /
  * training-data-pipeline primitive: a new session starts whenever a key's
  * inactivity gap exceeds `gapMs`. */
object SessionOps {

  /** Tag every event with a 1-based per-key `session_id`.
    *
    * Scale shape: two window passes (lag → boundary flag → running count)
    * over ONE hash partitioning by key — Catalyst reuses the exchange, so
    * it costs a single shuffle and no self-join; per-key window state is
    * O(1). Ties on ts are broken by `tieCol` so the boundary assignment is
    * total-order deterministic at any parallelism. */
  def sessionize(
      events: DataFrame,
      keyCol: Column,
      tsCol: Column,
      tieCol: Column,
      gapMs: Long): DataFrame = {
    val wOrd = Window.partitionBy(keyCol).orderBy(tsCol, tieCol)
    // explicit ROWS frame: with a RANGE frame, sort-key peers would share
    // a running-sum value — tieCol makes the order total, but keep the
    // frame row-exact so the SQL twin is unambiguous
    val wRun = wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val tsMs = unix_millis(tsCol.cast("timestamp"))
    val prevMs = lag(tsMs, 1).over(wOrd)
    val boundary = when(prevMs.isNull || tsMs - prevMs > gapMs, 1L).otherwise(0L)
    events.withColumn("session_id", sum(boundary).over(wRun))
  }
}
