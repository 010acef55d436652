package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Visualization-grade downsampling. M4 (Jugel et al., VLDB 2014 — public
  * method) keeps, per (series, time bucket), exactly the rows that attain
  * the bucket's first/last timestamp or min/max value: error-free min/max
  * rendering at a target resolution with a bounded output of ≤4 rows per
  * bucket class. Set semantics (ALL attaining rows) keep the operator
  * deterministic under ties — no arbitrary pick, and a plain SQL twin. */
object DownsampleOps {

  /** M4 downsample: keep rows attaining per-(key, bucket) extremes. One
    * shuffle on (key, bucket); the four extremes come from a single window
    * pass (partial min/max per partition, no self-join). */
  def m4(
      df: DataFrame,
      keyCol: Column,
      tsCol: Column,
      valueCol: Column,
      bucketMs: Long): DataFrame = {
    // parquet timestamps load as TIMESTAMP_NTZ in Spark 4; the session runs
    // UTC so the cast is instant-preserving, and the bucket goes back out
    // as NTZ for clean comparison with date_trunc twins
    val ms = unix_millis(tsCol.cast("timestamp"))
    val withBucket = df.withColumn("bucket",
      timestamp_millis(ms - pmod(ms, lit(bucketMs))).cast("timestamp_ntz"))
    val w = Window.partitionBy(keyCol, col("bucket"))
    withBucket
      .withColumn("keep",
        tsCol === min(tsCol).over(w) || tsCol === max(tsCol).over(w) ||
        valueCol === min(valueCol).over(w) || valueCol === max(valueCol).over(w))
      .filter(col("keep"))
      .drop("keep")
  }
}
