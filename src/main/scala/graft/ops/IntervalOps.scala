package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Interval analytics: island merging and containment joins — the "which
  * events fell inside which windows" primitives (maintenance windows,
  * incident spans, burst periods).
  *
  * Everything here is integer/timestamp arithmetic over min/max/count
  * aggregates, so results are exact cross-engine at any parallelism. */
object IntervalOps {

  /** Merge flagged time buckets into maximal contiguous intervals
    * (islands): consecutive `bucketMs`-spaced bucket starts become one
    * [start_ms, end_ms) span (end exclusive = last bucket + bucketMs).
    *
    * Scale shape: one keyed window pass partitioned by `partCol` (e.g. the
    * day — keeps every window partition bounded even when one key flags
    * millions of buckets) and one hash aggregate. Input is BUCKETS (already
    * aggregated), not events, so the window sort is cheap by construction. */
  def mergeIntervals(
      buckets: DataFrame,
      partCol: Column,
      bucketStartCol: Column,
      bucketMs: Long): DataFrame = {
    require(bucketMs > 0, s"bucketMs must be positive, got $bucketMs")
    val tagged = buckets.select(partCol.as("__part"),
      bucketStartCol.cast("long").as("__b"))
    val w = Window.partitionBy("__part").orderBy("__b")
    // island id = bucket index minus rank: constant within a contiguous run
    tagged
      .withColumn("__island",
        (col("__b") / lit(bucketMs)).cast("long") - row_number().over(w))
      .groupBy(col("__part"), col("__island"))
      .agg(min(col("__b")).as("start_ms"),
        (max(col("__b")) + lit(bucketMs)).as("end_ms"),
        count(lit(1)).as("n_buckets"))
      .drop("__island", "__part")
  }

  /** Containment join: each point row paired with every interval that
    * covers its timestamp (half-open: start ≤ ts < end) — WITHOUT the
    * inequality join a naive `ts BETWEEN start AND end` predicate compiles
    * to (BroadcastNestedLoopJoin / CartesianProduct: every point × every
    * interval).
    *
    * Scale shape: intervals are exploded to the `bucketMs` buckets they
    * cover (fan-out = interval length / bucketMs — pick bucketMs near the
    * typical interval length), points carry their own bucket, and the pair
    * is an EQUI-join on the bucket key followed by an exact containment
    * filter. A point's bucket matches an interval's exploded rows at most
    * once (its own bucket), so no dedup pass is needed. Both sides shuffle
    * on the bucket — event-sized but keyed, AQE-broadcastable when the
    * interval side is small. */
  def rangeJoin(
      points: DataFrame,
      tsCol: Column,
      intervals: DataFrame,
      startCol: Column,
      endCol: Column,
      bucketMs: Long): DataFrame = {
    require(bucketMs > 0, s"bucketMs must be positive, got $bucketMs")
    val iv = intervals
      .withColumn("__s", startCol.cast("long"))
      .withColumn("__e", endCol.cast("long"))
      .withColumn("__bucket",
        explode(sequence(floor(col("__s") / lit(bucketMs)).cast("long"),
          // end is exclusive: an interval ending exactly on a bucket
          // boundary does not cover that bucket
          floor((col("__e") - lit(1)) / lit(bucketMs)).cast("long"))))
    val pt = points
      .withColumn("__ts", tsCol.cast("long"))
      .withColumn("__bucket", floor(col("__ts") / lit(bucketMs)).cast("long"))
    pt.join(iv, Seq("__bucket"))
      .filter(col("__ts") >= col("__s") && col("__ts") < col("__e"))
      .drop("__bucket", "__s", "__e", "__ts")
  }

  /** Overlap join of two interval sets: every (left, right) pair whose
    * half-open [start, end) spans intersect — without the cartesian an
    * inequality-join predicate would compile to, and without a dedup pass.
    *
    * Scale shape: both sides explode to the buckets they cover (fan-out =
    * span/bucketMs), candidates pair through an EQUI-join on the bucket,
    * and the CANONICAL-BUCKET trick makes each overlapping pair emit
    * exactly once: of all the buckets a pair shares, only the one
    * containing the overlap's start (the max of the two starts) passes
    * the final filter. Callers must ensure the two sides' column names
    * don't collide (alias before calling). */
  def overlapJoin(
      left: DataFrame, lStart: Column, lEnd: Column,
      right: DataFrame, rStart: Column, rEnd: Column,
      bucketMs: Long): DataFrame = {
    require(bucketMs > 0, s"bucketMs must be positive, got $bucketMs")
    // empty [x, x) intervals intersect nothing (and would explode a
    // DESCENDING 2-bucket sequence at bucket-aligned x) — drop them first
    def fan(df: DataFrame, s: Column, e: Column, sn: String, en: String) =
      df.withColumn(sn, s.cast("long")).withColumn(en, e.cast("long"))
        .filter(col(sn) < col(en))
        .withColumn("__bucket",
          explode(sequence(floor(col(sn) / lit(bucketMs)).cast("long"),
            floor((col(en) - lit(1)) / lit(bucketMs)).cast("long"))))
    val l = fan(left, lStart, lEnd, "__ls", "__le")
    val r = fan(right, rStart, rEnd, "__rs", "__re")
    l.join(r, Seq("__bucket"))
      .filter(col("__ls") < col("__re") && col("__rs") < col("__le"))
      .filter(col("__bucket") ===
        floor(greatest(col("__ls"), col("__rs")) / lit(bucketMs)).cast("long"))
      .drop("__bucket", "__ls", "__le", "__rs", "__re")
  }
}
