package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.kernel.{AgglomerativeClapDetection, RocketClassifier}
import graft.pipeline.RollupRow

/** Declarative state-sequence operators: the DataFrame-scale twin of the
  * kernel-side process extraction (`graft.kernel.AgglomerativeClapDetection
  * .transitionProbs`, reference `claspy/state_detection.py:430-441`). Lag +
  * hash-aggregate + a partition-local window: one shuffle on the series key,
  * everything else map-side. */
object StateOps {

  /** Per-key state-transition counts and row-normalized probabilities over
    * an ordered state sequence. Output: key, from_state, to_state, cnt,
    * prob (prob sums to 1 per (key, from_state) row of the transition
    * matrix). */
  def transitionProbs(
      df: DataFrame,
      keyCol: Column,
      orderCols: Seq[Column],
      stateCol: Column): DataFrame = {
    val seqW = Window.partitionBy(keyCol).orderBy(orderCols: _*)
    val probW = Window.partitionBy(col("key"), col("from_state"))
    df.select(keyCol.as("key"), stateCol.as("to_state"),
        lag(stateCol, 1).over(seqW).as("from_state"))
      .filter(col("from_state").isNotNull)
      .groupBy("key", "from_state", "to_state")
      .agg(count(lit(1)).as("cnt"))
      .withColumn("prob", round(col("cnt").cast("double") / sum("cnt").over(probW), 6))
  }

  /** Recurring-epoch state labels: the ClaSP-adaptive rollup cuts each url's
    * series into epochs at change points; this merges epochs that REVISIT a
    * regime (agglomerative CLaP over the bucket-mean series with the epoch
    * boundaries as given change points) so downstream consumers can key on
    * stable state ids instead of monotonically growing epoch ids. One group
    * per url over BUCKET rows (the same bounded shape as rollup phase 2).
    * Output: (url, epoch, state, n_states) with state in 1..n_states. */
  def epochStates(rows1m: Dataset[RollupRow], sampleSize: Int = 1000): DataFrame = {
    val spark = rows1m.sparkSession
    import spark.implicits._
    rows1m
      .groupByKey(_.url)
      .flatMapGroups { (url, it) =>
        val rows = it.toArray.sortBy(_.bucket_start)
        val means = rows.map(_.mean)
        val cps = (1 until rows.length)
          .filter(i => rows(i).epoch != rows(i - 1).epoch).toArray
        val nSegs = cps.length + 1
        try {
          val det = new AgglomerativeClapDetection(
            windowSizeMethod = "suss", classifier = new RocketClassifier(100),
            sampleSize = sampleSize)
          val res = det.fit(Array(means), cps)
          res.labels.zipWithIndex.map { case (state, epoch) =>
            (url, epoch, state, res.labels.distinct.length)
          }.iterator
        } catch {
          // degenerate series (too short / constant): every epoch its own state
          case ex: Exception =>
            graft.pipeline.Rollup.logKernelFailure(
              "CLaP epoch-state merge", "one state per epoch", ex)
            (0 until nSegs).map(e => (url, e, e + 1, nSegs)).iterator
        }
      }
      .toDF("url", "epoch", "state", "n_states")
  }
}
