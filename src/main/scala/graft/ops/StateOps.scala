package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

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
}
