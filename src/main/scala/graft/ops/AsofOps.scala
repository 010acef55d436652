package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** As-of (latest-value) joins for time-series tables.
  *
  * The classic formulation is a range join (`l.key = r.key AND r.ts <=
  * l.ts`, keep the max r.ts), which Spark executes as an exploding
  * inequality join. This implementation uses the scalable union + running
  * last-value form instead: tag both inputs, union, and carry the right
  * side's payload forward with a `last(ignoreNulls)` window ordered by
  * (ts, side) per key — ONE shuffle on the key, O(1) state per row, no
  * pair explosion, and right rows at the same timestamp sort before left
  * rows so `r.ts <= l.ts` ties match (the ASOF-join convention). */
object AsofOps {

  /** For each left row, attach the most recent right payload with
    * `right(tsCol) <= left(tsCol)` per `keyCol`. Right payload columns are
    * null until the first right row. Output = left columns + payload. */
  def asofJoin(
      left: DataFrame,
      right: DataFrame,
      keyCol: String,
      tsCol: String,
      payloadCols: Seq[String]): DataFrame =
    asofImpl(left, right, keyCol, tsCol, payloadCols, forward = false)

  /** FORWARD as-of: for each left row, the EARLIEST right payload with
    * `right(tsCol) >= left(tsCol)` per key — the "next observation" join
    * (NOCB back-fill, match-to-next-feed-tick). Identical union +
    * running-carry shape, walked in DESCENDING time order; right rows at
    * the same timestamp still match (ties include equality, the ASOF
    * convention mirrored). */
  def asofForward(
      left: DataFrame,
      right: DataFrame,
      keyCol: String,
      tsCol: String,
      payloadCols: Seq[String]): DataFrame =
    asofImpl(left, right, keyCol, tsCol, payloadCols, forward = true)

  private def asofImpl(
      left: DataFrame,
      right: DataFrame,
      keyCol: String,
      tsCol: String,
      payloadCols: Seq[String],
      forward: Boolean): DataFrame = {
    val leftCols = left.columns.toSeq
    require(!payloadCols.exists(leftCols.contains),
      s"payload columns ${payloadCols.filter(leftCols.contains).mkString(",")} collide with left columns")
    // All payload values must come from the SAME right row (a right row
    // holding NULL in one payload column must not be patched with a stale
    // older value), so the payload travels as ONE nullable struct and is
    // unpacked after the carry — matching DuckDB/standard ASOF semantics.
    val payloadStructType = org.apache.spark.sql.types.StructType(
      payloadCols.map(c => right.schema(c).copy(name = c)))
    // 0 sorts before 1: right rows win ties at equal ts
    val l = left.withColumn("_side", lit(1))
      .withColumn("_payload", lit(null).cast(payloadStructType))
    val r0 = right.select(Seq(keyCol, tsCol).distinct.map(col) :+
        struct(payloadCols.map(col): _*).as("_payload"): _*)
      .withColumn("_side", lit(0))
    val r = leftCols.filterNot(Seq(keyCol, tsCol).contains)
      .foldLeft(r0)((df, c) => df.withColumn(c, lit(null).cast(left.schema(c).dataType)))
      .select((leftCols :+ "_payload" :+ "_side").map(col): _*)
    val unioned = l.select((leftCols :+ "_payload" :+ "_side").map(col): _*)
      .unionByName(r)
    val ord = if (forward) col(tsCol).desc else col(tsCol).asc
    val w = Window.partitionBy(keyCol).orderBy(ord, col("_side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = unioned
      .withColumn("_payload", last(col("_payload"), ignoreNulls = true).over(w))
      .filter(col("_side") === 1)
    payloadCols.foldLeft(carried) {
      (df, c) => df.withColumn(c, col("_payload").getField(c))
    }
      .drop("_side", "_payload")
  }
}
