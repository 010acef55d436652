package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import graft.kernel.BinaryClaSPSegmentation
import graft.pipeline.Rollup

/** Generic multivariate-series-column surface (SURVEY §1.4 row 3): a
  * `ArrayType(ArrayType(DoubleType))` column holds one dim-major `(d, n)`
  * series per row, and the multivariate ClaSP kernel runs directly over it.
  * This is the column-shaped twin of the q28 signal pipeline — any producer
  * that can assemble a nested-array column (collect_list over bounded
  * chunks, a parquet array column, a feature joiner) gets segmentation
  * without bespoke plumbing. */
object MultivarOps {

  final case class MvSegmentRow(
      key: String, n_dims: Int, n_points: Long, n_cps: Int, cps: Array[Int])

  /** Segment each row's dim-major multivariate series. One kernel call per
    * ROW (not per group): the caller bounds row width (e.g. chunked
    * assembly like q28/Rollup phase 1), so tasks stay bounded and the
    * stage needs no shuffle at all — a pure map over whatever
    * partitioning the input already has. */
  def segmentSeries(df: DataFrame, keyCol: String, seriesCol: String): Dataset[MvSegmentRow] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(keyCol).cast("string"), col(seriesCol))
      .as[(String, Array[Array[Double]])]
      .map { case (key, dims) =>
        val n = if (dims.isEmpty) 0L else dims(0).length.toLong
        val cps =
          try new BinaryClaSPSegmentation().fitPredict(dims)
          catch {
            case e: Exception =>
              Rollup.logKernelFailure("multivariate ClaSP (series column)", "no change points", e)
              Array.empty[Int]
          }
        MvSegmentRow(key, dims.length, n, cps.length, cps)
      }
  }

  /** Assemble a dim-major nested-array series column from long-form rows
    * `(key, order, v1..vd)` — sort_array over collected structs keeps the
    * assembly fully in Catalyst (no kernel shuffle); bounded per key by the
    * caller (chunk keys for mega-series, same contract as Rollup phase 1). */
  def assembleSeriesColumn(
      df: DataFrame, keyCol: String, orderCol: String, valueCols: Seq[String]): DataFrame = {
    val collected = df
      .groupBy(col(keyCol).as("key"))
      .agg(sort_array(collect_list(struct(
        (col(orderCol).as("o") +: valueCols.map(c => col(c).cast("double").as(c))): _*))).as("pts"))
    collected.select(col("key"),
      array(valueCols.map(c => expr(s"transform(pts, p -> p.$c)")): _*).as("series"))
  }
}
