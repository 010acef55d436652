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

  /** PAA + symbolic representation per (key, frame): the frame's samples
    * are piecewise-aggregated into time slots (PAA, Keogh et al. 2001) and
    * each slot mean is discretized to a fixed alphabet — SAX (Lin et al.
    * 2003), with EMPIRICAL-QUANTILE breakpoints instead of the classic
    * Gaussian ones: symbols are assigned by `ntile(alphabet)` over the
    * frame's slot means. The quantile variant (standard in the
    * discretization literature) is chosen deliberately — Gaussian
    * breakpoints need an FP z-normalization whose mean/std reassociate
    * across engines, while rank-based discretization is pure integer
    * order statistics, bit-exact anywhere. Emits one word per (key,
    * frame): the slot-ordered symbol string — the index token for motif
    * grouping, symbolic matching, and cheap whole-frame dedup.
    *
    * Scale shape: one event-sized partial+final hash aggregate down to
    * (key, frame, slot) PAA means (DECIMAL sums — exact), one keyed
    * window for the ntile ranks (frame-sized partitions: ≤ `slots` rows
    * each, never raw events), then one hash aggregate assembling the
    * word via sort_array over ≤ `slots` symbols per group. */
  def quantileSax(
      events: DataFrame,
      keyCol: Column,
      frameCol: Column,
      slotCol: Column,
      valueCol: Column,
      alphabet: Int = 4): DataFrame = {
    require(alphabet >= 2 && alphabet <= 26, s"alphabet must be 2..26, got $alphabet")
    val paa = events
      .groupBy(keyCol.as("key"), frameCol.as("frame"), slotCol.as("slot"))
      .agg(sum(valueCol.cast("decimal(12,2)")).as("__vs"),
        count(lit(1)).as("__n"))
      .withColumn("__mean", col("__vs").cast("double") / col("__n"))
    val w = Window.partitionBy("key", "frame").orderBy(col("__mean"), col("slot"))
    paa
      .withColumn("__sym",
        char(ntile(alphabet).over(w) + lit('a'.toInt - 1)))
      .groupBy("key", "frame")
      .agg(
        array_join(transform(
          sort_array(collect_list(struct(col("slot"), col("__sym")))),
          x => x("__sym")), "").as("word"),
        count(lit(1)).as("n_slots"))
  }

  /** Cross-series motif candidates from the SAX index ([[quantileSax]]):
    * pairs of series whose frames discretize to the SAME word in the same
    * frame window — the symbolic time-series analogue of MinHash-LSH
    * near-dup pairing (word = bucket key), and the standard cheap motif
    * prefilter in the SAX literature.
    *
    * Scale shape: input is the WORD table (frame-count rows, never raw
    * events); pairing is an equi-join keyed on (frame, word) with the same
    * bucket-cap guard as the LSH ops — words shared by more than
    * `maxBucket` series in one frame (degenerate flat patterns, e.g. all-
    * constant days) are DROPPED WHOLE rather than quadratically exploded.
    * The cap is deterministic (a membership predicate, not a sample), so
    * an exact SQL oracle mirrors it with HAVING. Pairs emit exactly once
    * with url_a < url_b (the input key's native ordering). */
  def saxMotifPairs(words: DataFrame, maxBucket: Int = 50): DataFrame = {
    require(maxBucket >= 2, s"maxBucket must be >= 2, got $maxBucket")
    // window count over one (frame, word)-keyed exchange instead of the
    // former groupBy-count + inner-join membership (r6, guide §2.4): the
    // join shape evaluated the SAX word table — a per-frame quantile
    // discretization over the events — three times (count build + one per
    // self-join side); with the window, both self-join sides canonicalize
    // to the same exchange and ReuseExchange computes the word table once.
    // The isNotNull filters reproduce the inner join's null-key drop.
    val member = words
      .filter(col("frame").isNotNull && col("word").isNotNull)
      .withColumn("__n",
        count(lit(1)).over(Window.partitionBy("frame", "word")))
      .filter(col("__n") >= 2 && col("__n") <= maxBucket)
      .select(col("frame"), col("word"), col("key"))
    val a = member.select(col("frame"), col("word"), col("key").as("url_a"))
    val b = member.select(col("frame"), col("word"), col("key").as("url_b"))
    a.join(b, Seq("frame", "word"))
      .filter(col("url_a") < col("url_b"))
      .select("frame", "word", "url_a", "url_b")
  }

  /** LTTB — largest-triangle-three-buckets (Steinarsson 2013, public
    * method): select `threshold` visually representative points of one
    * series. Input must be time-sorted; returns the SELECTED INDICES
    * (first and last always kept; per bucket, the point maximizing the
    * triangle area with the previously selected point and the next
    * bucket's centroid; strict > keeps the first maximum). Pure kernel —
    * run per series inside a bucket-row group like the other per-url ops. */
  def lttbIndices(ts: Array[Long], v: Array[Double], threshold: Int): Array[Int] = {
    val n = ts.length
    if (threshold >= n || threshold < 3) return Array.range(0, n)
    val out = new Array[Int](threshold)
    out(0) = 0
    val bucketSize = (n - 2).toDouble / (threshold - 2)
    var a = 0
    var i = 0
    while (i < threshold - 2) {
      // next bucket's centroid
      var cStart = (math.floor((i + 1) * bucketSize) + 1).toInt
      var cEnd = (math.floor((i + 2) * bucketSize) + 1).toInt
      if (cEnd > n) cEnd = n
      var cx = 0.0; var cy = 0.0
      var j = cStart
      while (j < cEnd) { cx += ts(j).toDouble; cy += v(j); j += 1 }
      val m = math.max(cEnd - cStart, 1)
      cx /= m; cy /= m
      // current bucket: maximize triangle area with point a and the centroid
      val bStart = (math.floor(i * bucketSize) + 1).toInt
      val bEnd = math.min((math.floor((i + 1) * bucketSize) + 1).toInt, n)
      val ax = ts(a).toDouble; val ay = v(a)
      var best = -1.0
      var bestIdx = bStart
      j = bStart
      while (j < bEnd) {
        val area = math.abs((ax - cx) * (v(j) - ay) - (ax - ts(j).toDouble) * (cy - ay)) * 0.5
        if (area > best) { best = area; bestIdx = j }
        j += 1
      }
      out(i + 1) = bestIdx
      a = bestIdx
      i += 1
    }
    out(threshold - 1) = n - 1
    out
  }
}
