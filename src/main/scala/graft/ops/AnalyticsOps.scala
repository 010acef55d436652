package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Per-series derivative/outlier/histogram analytics — the PromQL-style
  * `delta`/`rate`, anomaly flagging, and distribution-rollup primitives a
  * time-series store serves next to its continuous aggregates. */
object AnalyticsOps {

  /** Per-key first difference and per-second rate of a value column.
    *
    * Scale shape: one keyed window pass (single hash exchange on the key,
    * O(1) state per row — exactly the [[SessionOps.sessionize]] shape).
    * Ties on ts are broken by `tieCol` so lag() is total-order
    * deterministic at any parallelism. Rows with no predecessor (series
    * heads) carry NULL delta/rate, like PromQL's empty first scrape. */
  def deltaRate(
      events: DataFrame,
      keyCol: Column,
      tsCol: Column,
      tieCol: Column,
      valueCol: Column): DataFrame = {
    val w = Window.partitionBy(keyCol).orderBy(tsCol, tieCol)
    val tsMs = unix_millis(tsCol.cast("timestamp"))
    val gapMs = tsMs - lag(tsMs, 1).over(w)
    val delta = valueCol - lag(valueCol, 1).over(w)
    events
      .withColumn("delta", delta)
      // rate per second; NULL (not Inf) on duplicate timestamps
      .withColumn("rate", when(gapMs > 0, delta / (gapMs / lit(1000.0))))
  }

  /** Population z-score of every row against its (key, bucket) group, with
    * an outlier flag at `threshold` standard deviations.
    *
    * Scale shape: group stats come from a partial+final hash aggregate
    * (map-side combine — NOT an unbounded window, whose per-group sort
    * state would be O(group)), then join back on the grouping keys.
    * Catalyst reuses one hash partitioning for both the aggregate and the
    * join at scale; the stats side is bucket-count-sized, so AQE can
    * broadcast it when small. Zero-variance groups get z = NULL. */
  def zscore(
      events: DataFrame,
      keyCol: Column,
      bucketCol: Column,
      valueCol: Column,
      threshold: Double): DataFrame = {
    val tagged = events.withColumn("__key", keyCol).withColumn("__bucket", bucketCol)
    val stats = tagged.groupBy(col("__key"), col("__bucket"))
      .agg(avg(valueCol).as("__mu"), stddev_pop(valueCol).as("__sd"))
    tagged.join(stats, Seq("__key", "__bucket"))
      .withColumn("z", when(col("__sd") > 0, (valueCol - col("__mu")) / col("__sd")))
      .withColumn("is_outlier", coalesce(abs(col("z")) > threshold, lit(false)))
      .drop("__key", "__bucket", "__mu", "__sd")
  }

  /** Fixed-width value histogram per (key, bucket): bin = floor(value /
    * binWidth), so bins are globally aligned without a min/max pre-pass.
    *
    * Scale shape: a single partial+final hash aggregate — the map-side
    * combine collapses each partition to its distinct (key, bucket, bin)
    * rows before the shuffle, which is what makes a distribution rollup
    * cheap at 100 TB (cardinality is bins × groups, not rows). */
  def histogram(
      events: DataFrame,
      keyCol: Column,
      bucketCol: Column,
      valueCol: Column,
      binWidth: Double): DataFrame = {
    require(binWidth > 0, s"binWidth must be positive, got $binWidth")
    events
      .groupBy(keyCol, bucketCol,
        floor(valueCol / lit(binWidth)).cast("long").as("bin"))
      .agg(count(lit(1)).as("cnt"),
        round(min(valueCol), 6).as("bin_min"),
        round(max(valueCol), 6).as("bin_max"))
  }
}
