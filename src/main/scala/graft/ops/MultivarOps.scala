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

  /** Shared dim-major assembly: group by `keyCols`, collect (order, v1..vd)
    * structs, sort by order, transform into one array per dim. Keeps the
    * assembly fully in Catalyst (no kernel shuffle); group width is bounded
    * by the caller's choice of keys. */
  private def assemble(
      df: DataFrame, keyCols: Seq[org.apache.spark.sql.Column],
      orderCol: org.apache.spark.sql.Column, valueCols: Seq[String]): DataFrame =
    df.groupBy(keyCols: _*)
      .agg(sort_array(collect_list(struct(
        (orderCol.as("o") +: valueCols.map(c => col(c).cast("double").as(c))): _*))).as("pts"))
      .withColumn("series",
        array(valueCols.map(c => expr(s"transform(pts, p -> p.$c)")): _*))
      .drop("pts")

  /** Assemble a dim-major nested-array series column from long-form rows
    * `(key, order, v1..vd)` — bounded per key by the caller (chunk keys for
    * mega-series, same contract as Rollup phase 1; see [[segmentChunked]]
    * for the built-in chunked variant). */
  def assembleSeriesColumn(
      df: DataFrame, keyCol: String, orderCol: String, valueCols: Seq[String]): DataFrame =
    assemble(df, Seq(col(keyCol).as("key")), col(orderCol), valueCols)

  private[ops] final case class MvChunkRow(
      key: String, chunk: Long, n_dims: Int, n_points: Long, n_cps: Int,
      first_cp: Int)

  /** Two-phase multivariate segmentation for mega series — the chunked twin
    * of [[assembleSeriesColumn]]+[[segmentSeries]], in the exact shape of
    * the q28 signal pipeline and Rollup phase 1/2:
    *
    *   phase 1: rows are assembled per `(key, floorDiv(order, chunkSpan))`,
    *     so NO task ever collects a whole mega key — per-task memory and
    *     the O(n²) kernel cost are both bounded by the chunk width;
    *   phase 2: per-chunk results merge per key with a hash aggregate
    *     (chunk-count-sized data); each chunk's first in-chunk change point
    *     is rebased to a whole-series index via the cumulative point count
    *     of earlier chunks (a chunk-count-sized window, never row-sized).
    *
    * Per-chunk segmentation is the documented semantics at scale (identical
    * to q28): change points are detected within chunk-local context, which
    * bounds the straggler a 100×-scale mega key would otherwise create.
    * Output: `(key, n_dims, n_points, n_cps, first_cp)` with
    * `first_cp = -1` when no chunk yields a change point. */
  def segmentChunked(
      df: DataFrame, keyCol: String, orderCol: String, valueCols: Seq[String],
      chunkSpan: Long): DataFrame = {
    require(chunkSpan > 0, s"chunkSpan must be positive, got $chunkSpan")
    val spark = df.sparkSession
    import spark.implicits._
    val series = assemble(df,
        Seq(col(keyCol).cast("string").as("key"),
          floor(col(orderCol).cast("long") / lit(chunkSpan)).cast("long").as("chunk")),
        col(orderCol).cast("long"), valueCols)
      .select("key", "chunk", "series")
    val perChunk = series.as[(String, Long, Array[Array[Double]])]
      .map { case (key, chunk, dims) =>
        val n = if (dims.isEmpty) 0L else dims(0).length.toLong
        val cps =
          try new BinaryClaSPSegmentation().fitPredict(dims)
          catch {
            case e: Exception =>
              Rollup.logKernelFailure("multivariate ClaSP (chunked)", "no change points", e)
              Array.empty[Int]
          }
        MvChunkRow(key, chunk, dims.length, n, cps.length,
          if (cps.nonEmpty) cps(0) else -1)
      }.toDF()
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("key").orderBy("chunk")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    perChunk
      .withColumn("offset", coalesce(sum("n_points").over(w), lit(0L)))
      .groupBy("key")
      .agg(max("n_dims").as("n_dims"), sum("n_points").as("n_points"),
        sum("n_cps").cast("int").as("n_cps"),
        min(when(col("first_cp") >= 0, col("offset") + col("first_cp"))).as("fc"))
      .select(col("key"), col("n_dims"), col("n_points"), col("n_cps"),
        coalesce(col("fc"), lit(-1L)).cast("int").as("first_cp"))
  }
}
