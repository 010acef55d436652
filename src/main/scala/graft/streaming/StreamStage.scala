package graft.streaming

import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import graft.kernel.streaming.StreamingClaSPSegmentation
import graft.pipeline.SeriesPoint

/** One detected global change point of one series. `global_cp` is the index
  * in the per-url ingest order (reference semantics:
  * `claspy/streaming/segmentation.py:228-230`). */
final case class CpEvent(url: String, global_cp: Int, n_ingested: Long)

/** Per-url summary after replaying a series through the streaming detector. */
final case class StreamSummary(url: String, n_points: Long, window_size: Int,
    n_cps: Int, last_cp: Int)

/** Spark Structured Streaming wrapper for the streaming ClaSP state machine
  * (SURVEY.md §2.9). The reference ingests strictly in order with no late
  * data (ring buffers bound memory, not watermarks); the wrapper therefore
  * sorts each micro-batch per key and expects upstream event-time ordering
  * across batches (replay in order, or watermark+buffer upstream). */
object StreamStage {

  /** Config for the per-url detector. */
  final case class Config(
      nTimepoints: Int = 10000,
      nWarmup: Int = 300,
      jump: Int = 5,
      logCps: Boolean = true)

  private def feed(
      state: StreamingClaSPSegmentation,
      url: String,
      sorted: Iterator[SeriesPoint]): List[CpEvent] = {
    val before = state.changePoints.length
    var n = 0L
    sorted.foreach { p => state.update(p.value); n += 1 }
    state.changePoints.drop(before).map(cp =>
      CpEvent(url, cp, state.ingested.toLong)).toList
  }

  /** Structured Streaming: one ClaSS state machine per url inside
    * flatMapGroupsWithState; emits newly detected change points per batch. */
  def detectStream(points: Dataset[SeriesPoint], cfg: Config = Config())
      : Dataset[CpEvent] = {
    val spark = points.sparkSession
    import spark.implicits._
    implicit val stateEnc: Encoder[StreamingClaSPSegmentation] =
      Encoders.javaSerialization[StreamingClaSPSegmentation]
    points
      .groupByKey(_.url)
      .flatMapGroupsWithState[StreamingClaSPSegmentation, CpEvent](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (url: String, it: Iterator[SeriesPoint], gs: GroupState[StreamingClaSPSegmentation]) =>
          val state = gs.getOption.getOrElse(
            new StreamingClaSPSegmentation(cfg.nTimepoints, cfg.nWarmup,
              jump = cfg.jump, logCps = cfg.logCps))
          val out = feed(state, url, it.toArray.sortBy(_.ts).iterator)
          gs.update(state)
          out.iterator
      }
  }

  /** Batch replay: the same state machine over complete per-url series —
    * the mega-series path (reference's own guidance: streaming ClaSP for
    * very large archives) and the Verify surface. */
  def detectBatch(points: Dataset[SeriesPoint], cfg: Config = Config())
      : Dataset[CpEvent] = {
    val spark = points.sparkSession
    import spark.implicits._
    points.groupByKey(_.url).flatMapGroups { (url, it) =>
      val state = new StreamingClaSPSegmentation(cfg.nTimepoints, cfg.nWarmup,
        jump = cfg.jump, logCps = cfg.logCps)
      feed(state, url, it.toArray.sortBy(_.ts).iterator).iterator
    }
  }

  /** Batch replay summary (always one row per url — used by rows-only
    * verification so empty-cp series still surface). */
  def summarizeBatch(points: Dataset[SeriesPoint], cfg: Config = Config())
      : Dataset[StreamSummary] = {
    val spark = points.sparkSession
    import spark.implicits._
    points.groupByKey(_.url).mapGroups { (url, it) =>
      val state = new StreamingClaSPSegmentation(cfg.nTimepoints, cfg.nWarmup,
        jump = cfg.jump, logCps = cfg.logCps)
      val pts = it.toArray.sortBy(_.ts)
      pts.foreach(p => state.update(p.value))
      StreamSummary(url, pts.length.toLong,
        if (state.isWarmedUp) state.windowSize else -1,
        state.changePoints.length, state.lastCp)
    }
  }
}
