package graft.pipeline

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.kernel.{BinaryClaSPSegmentation, Gorilla}

/** One raw observation of one series (`url` is the series key; `ts` epoch
  * millis UTC). The Spark-side analogue of the reference's positional
  * ndarray series (`/root/reference/claspy/utils.py:8-42`) keyed per url. */
final case class SeriesPoint(url: String, ts: Long, value: Double)

/** One rollup bucket at one retention tier. `epoch` is the index of the
  * containing ClaSP segment ("new segment = new aggregate epoch"); -1 when
  * segmentation was not requested. Gap-filled buckets carry cnt=0/sum=0 and
  * a locf mean so cascades stay raw-point-exact. */
final case class RollupRow(
    url: String,
    tier: String,
    epoch: Int,
    bucket_start: Long, // epoch millis
    cnt: Long,
    sum: Double,
    min: Double,
    max: Double,
    mean: Double,
    gap_filled: Boolean)

/** Gorilla-compressed (bucket_start, mean) stream of one (url, epoch)
  * segment at the base tier. */
final case class EpochBlob(url: String, epoch: Int, n_buckets: Int, gorilla: Array[Byte])

object Rollup {

  val TierMs: Map[String, Long] =
    Map("1m" -> 60000L, "1h" -> 3600000L, "1d" -> 86400000L)

  /** Series longer than this many buckets are segmented chunk-wise (the
    * reference's own guidance for mega-series: route to a linear-ish path
    * rather than one O(n²) kernel — `claspy/notebooks/streaming_time_series
    * .ipynb`; chunk decomposition mirrors `pranges`,
    * `claspy/nearest_neighbour.py:389-400`). */
  val MegaSeriesBuckets = 10000

  // ------------------------------------------------------------------ kernel

  /** Per-url kernel: bucket + gap-fill at `bucketMs`, ClaSP-segment the
    * gap-filled mean series into epochs, emit one RollupRow per bucket.
    * Runs entirely inside one task (per-series locality — SURVEY.md §2.3). */
  def kernelRollup(
      url: String,
      ptsIn: Iterator[(Long, Double)],
      bucketMs: Long,
      tier: String,
      segment: Boolean): Array[RollupRow] = {
    val pts = ptsIn.toArray
    if (pts.isEmpty) return Array.empty
    java.util.Arrays.sort(pts, Ordering.by[(Long, Double), (Long, Double)](identity))

    val first = Math.floorDiv(pts.head._1, bucketMs)
    val last = Math.floorDiv(pts.last._1, bucketMs)
    val nB = (last - first + 1).toInt
    require(nB > 0 && nB < (1 << 28), s"url=$url buckets=$nB out of range")

    val cnt = new Array[Long](nB)
    val sum = new Array[Double](nB)
    val mn = Array.fill(nB)(Double.PositiveInfinity)
    val mx = Array.fill(nB)(Double.NegativeInfinity)
    var i = 0
    while (i < pts.length) {
      val b = (Math.floorDiv(pts(i)._1, bucketMs) - first).toInt
      val v = pts(i)._2
      cnt(b) += 1; sum(b) += v
      if (v < mn(b)) mn(b) = v
      if (v > mx(b)) mx(b) = v
      i += 1
    }

    // gap-fill: locf mean (first bucket always has data by construction)
    val mean = new Array[Double](nB)
    var lastMean = 0.0
    i = 0
    while (i < nB) {
      if (cnt(i) > 0) lastMean = sum(i) / cnt(i)
      mean(i) = lastMean
      i += 1
    }

    val epochs: Array[Int] =
      if (!segment) Array.fill(nB)(-1)
      else segmentEpochs(mean)

    Array.tabulate(nB) { b =>
      val gap = cnt(b) == 0L
      RollupRow(url, tier, epochs(b), (first + b) * bucketMs,
        cnt(b), sum(b),
        if (gap) mean(b) else mn(b),
        if (gap) mean(b) else mx(b),
        mean(b), gap)
    }
  }

  /** ClaSP change points over the bucket-mean series → dense epoch ids.
    * Mega-series go through the streaming ClaSS detector — O(ring) per point
    * instead of O(n²) total — mirroring the reference's own recommendation
    * for very large archives (`claspy/notebooks/streaming_time_series.ipynb`). */
  def segmentEpochs(series: Array[Double]): Array[Int] = {
    val n = series.length
    val cps: Array[Int] =
      if (n <= MegaSeriesBuckets) segmentSafe(series, 0)
      else {
        val stream = new graft.kernel.streaming.StreamingClaSPSegmentation(
          nTimepoints = MegaSeriesBuckets, nWarmupIn = MegaSeriesBuckets, logCps = true)
        try {
          var i = 0
          while (i < n) { stream.update(series(i)); i += 1 }
          stream.changePoints.filter(c => c > 0 && c < n).distinct.sorted.toArray
        } catch { case _: Exception => Array.empty[Int] }
      }
    val epochs = new Array[Int](n)
    var e = 0; var next = 0; var i = 0
    while (i < n) {
      if (next < cps.length && i == cps(next)) { e += 1; next += 1 }
      epochs(i) = e
      i += 1
    }
    epochs
  }

  /** BinaryClaSPSegmentation with degenerate-input guards: too-short or
    * (near-)constant series yield no change points. */
  private def segmentSafe(series: Array[Double], offset: Int): Array[Int] = {
    if (series.length < 60) return Array.empty
    var mn = Double.PositiveInfinity; var mx = Double.NegativeInfinity
    var i = 0
    while (i < series.length) {
      val v = series(i)
      if (v < mn) mn = v
      if (v > mx) mx = v
      i += 1
    }
    if (!(mx - mn > 0) || mx.isNaN || mn.isNaN) return Array.empty
    try new BinaryClaSPSegmentation().fitPredict(series).map(_ + offset)
    catch { case _: Exception => Array.empty }
  }

  /** Gorilla blobs per (url, epoch) over the base-tier (bucket_start, mean)
    * stream. Input must be one url's rollup rows. */
  def kernelBlobs(url: String, rows: Array[RollupRow]): Array[EpochBlob] = {
    val sorted = rows.sortBy(_.bucket_start)
    sorted.groupBy(_.epoch).toArray.sortBy(_._1).map { case (epoch, rs) =>
      EpochBlob(url, epoch, rs.length,
        Gorilla.encode(rs.map(_.bucket_start), rs.map(_.mean)))
    }
  }

  // --------------------------------------------------------------- pipeline

  /** Base-tier rollup with ClaSP-adaptive epochs: shuffle once on url
    * (groupByKey), run the kernel per series inside the task. */
  def adaptiveRollup(
      points: Dataset[SeriesPoint],
      bucketMs: Long = 60000L,
      tier: String = "1m",
      segment: Boolean = true): Dataset[RollupRow] = {
    val spark = points.sparkSession
    import spark.implicits._
    points
      .groupByKey(_.url)
      .flatMapGroups { (url, it) =>
        kernelRollup(url, it.map(p => (p.ts, p.value)), bucketMs, tier, segment).iterator
      }
  }

  /** Gorilla blobs per (url, epoch) straight from points (one shuffle). */
  def epochBlobs(
      points: Dataset[SeriesPoint],
      bucketMs: Long = 60000L,
      segment: Boolean = true): Dataset[EpochBlob] = {
    val spark = points.sparkSession
    import spark.implicits._
    points
      .groupByKey(_.url)
      .flatMapGroups { (url, it) =>
        val rows = kernelRollup(url, it.map(p => (p.ts, p.value)), bucketMs, "base", segment)
        kernelBlobs(url, rows).iterator
      }
  }

  /** Tier cascade: re-aggregate a lower tier's NON-gap rows into a coarser
    * tier (classic continuous-aggregate cascade — the lower tier is the
    * partial aggregate, so Spark's partial/final hash-agg does the rest;
    * raw-point-exact because gap rows carry cnt=0/sum=0). */
  def cascade(lower: Dataset[RollupRow], tier: String): Dataset[RollupRow] = {
    val spark = lower.sparkSession
    import spark.implicits._
    val ms = TierMs(tier)
    // plain Catalyst hash-agg: whole-stage codegen + map-side partial
    // aggregation, unlike a typed mapGroups which would force an opaque
    // object shuffle of every lower-tier row
    lower.toDF()
      .filter(!col("gap_filled"))
      .groupBy(col("url"), col("epoch"),
        (col("bucket_start") - pmod(col("bucket_start"), lit(ms))).as("bucket_start"))
      .agg(sum("cnt").as("cnt"), sum("sum").as("sum"),
        min("min").as("min"), max("max").as("max"))
      .select(col("url"), lit(tier).as("tier"), col("epoch"), col("bucket_start"),
        col("cnt"), col("sum"), col("min"), col("max"),
        (col("sum") / col("cnt")).as("mean"), lit(false).as("gap_filled"))
      .as[RollupRow]
  }

  /** Retention: keep only buckets younger than `retainMs` relative to
    * `nowMs` (the data's max timestamp in tests/bench — never wall clock,
    * for determinism). */
  def retain(rows: Dataset[RollupRow], nowMs: Long, retainMs: Long): Dataset[RollupRow] =
    rows.filter(col("bucket_start") >= lit(nowMs - retainMs))

  // ------------------------------------------- DataFrame-level gap-fill op

  /** Declarative gap-fill + locf over an aggregated (key, bucket, mean)
    * frame: sequence() per key → explode → left join → last(ignoreNulls)
    * window. Catalyst-visible (unlike the in-kernel path) so the optimizer
    * can prune/push; used by the oracle-checked q_gapfill queries. */
  def gapFillLocf(
      agg: DataFrame, // columns: key, bucket (timestamp), mean (double)
      bucketSeconds: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val spans = agg.groupBy("key")
      .agg(min("bucket").as("b0"), max("bucket").as("b1"))
      .select(col("key"), explode(
        sequence(col("b0"), col("b1"), expr(s"interval $bucketSeconds seconds"))).as("bucket"))
    val w = Window.partitionBy("key").orderBy("bucket")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    spans.join(agg, Seq("key", "bucket"), "left")
      .withColumn("gap_filled", col("mean").isNull)
      .withColumn("mean", last("mean", ignoreNulls = true).over(w))
  }
}
