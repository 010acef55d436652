package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.pipeline.{SeriesPoint, SparkTestBase, SyntheticCrawl, CrawlSignals}

class StreamStageSpec extends SparkTestBase {
  import spark.implicits._

  private def crawlPoints(nUrls: Int) =
    CrawlSignals.pageSize(SyntheticCrawl.pagesDF(spark, nUrls, basePoints = 900))
      .collect().sortBy(p => (p.url, p.ts))

  test("batch replay detects change points on regime-shift series") {
    val pts = crawlPoints(8).toSeq.toDS()
    val cfg = StreamStage.Config(nTimepoints = 2048, nWarmup = 200)
    val summaries = StreamStage.summarizeBatch(pts, cfg).collect()
    assert(summaries.length == 8)
    assert(summaries.forall(_.window_size > 0), "all series must warm up")
    assert(summaries.exists(_.n_cps > 0), "at least one series must yield a cp")
  }

  test("structured streaming emits the same cps as batch replay") {
    val all = crawlPoints(4)
    val cfg = StreamStage.Config(nTimepoints = 2048, nWarmup = 200)

    val batchCps = StreamStage.detectBatch(all.toSeq.toDS(), cfg)
      .collect().map(e => (e.url, e.global_cp)).toSet

    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[SeriesPoint]
    val q = StreamStage.detectStream(mem.toDS(), cfg)
      .writeStream.format("memory").queryName("cps")
      .outputMode("append").start()
    // feed in event-time order, split across three micro-batches per url
    val byUrl = all.groupBy(_.url).values.toSeq
    val batches = (0 until 3).map(i => byUrl.flatMap { pts =>
      val n = pts.length
      pts.slice(i * n / 3, (i + 1) * n / 3)
    })
    batches.foreach { b =>
      mem.addData(b.toSeq)
      q.processAllAvailable() // one micro-batch per chunk, in order
    }
    q.stop()
    val streamCps = spark.table("cps").as[CpEvent]
      .collect().map(e => (e.url, e.global_cp)).toSet
    assert(streamCps == batchCps,
      s"stream $streamCps vs batch $batchCps")
  }
}
