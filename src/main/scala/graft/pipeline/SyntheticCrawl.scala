package graft.pipeline

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** One crawl snapshot of one page — the BASELINE.json input_hint shape:
  * pages(url STRING, warc_ts TIMESTAMP, html BINARY, text STRING, lang STRING).
  * `warc_ts` carried as epoch millis in the typed row; converted to a real
  * TIMESTAMP column by [[SyntheticCrawl.pagesDF]]. */
final case class PageRow(url: String, warc_ts: Long, html: Array[Byte], text: String, lang: String)

/** Deterministic Common-Crawl-shaped generator (FIXTURES.md §3). Fully
  * distributed: `spark.range(nUrls)` + per-url LCG seeded by url index, so
  * the data is identical at any parallelism/partitioning — the basis for the
  * bit-for-bit N-vs-4N scaling evidence. No wall-clock anywhere.
  *
  * Signal design (per url): crawl cadence = `cadenceMs` with deterministic
  * gaps; page-size regime (html length) shifts amplitude/period at planted
  * change points — frequency/shape shifts, not pure level shifts, because the
  * reference's z-normed distance is level-invariant; `text` repeats
  * byte-identically across crawls except at planted churn points (the
  * north-rule "byte-identical extracted text per url" invariant), where
  * `lang` flips too. */
object SyntheticCrawl {

  val T0: Long = 1577836800000L // 2020-01-01T00:00:00Z

  final val Langs = Array("en", "de", "fr", "es", "zh")

  @inline private def next(s: Long): Long = s * 6364136223846793005L + 1442695040888963407L
  @inline private def u01(s: Long): Double = ((s >>> 11).toDouble) / (1L << 53).toDouble

  /** Planted change points for url `i` with `nPoints` crawls: 1-4 cps at
    * deterministic fractions, capped so each segment stays long enough for
    * ClaSP's min_seg_size = 5·window (SURVEY.md §2.12) to ever validate. */
  def plantedCps(i: Long, nPoints: Int): Array[Int] = {
    val k = math.max(1, math.min(1 + (i % 4).toInt, nPoints / 150))
    Array.tabulate(k)(j => ((j + 1) * nPoints) / (k + 1))
  }

  /** Heavy-tailed crawl count for url `i`: 90% short, 9% medium, 1% mega. */
  def pointsFor(i: Long, base: Int): Int = {
    val r = i % 100
    if (r < 90) base + (i % 97).toInt
    else if (r < 99) base * 8 + (i % 397).toInt
    else base * 64 + (i % 997).toInt
  }

  def generate(spark: SparkSession, nUrls: Int, basePoints: Int = 120,
      cadenceMs: Long = 60000L): Dataset[PageRow] = {
    import spark.implicits._
    spark.range(0, nUrls.toLong, 1, math.min(nUrls, 64))
      .as[Long]
      .flatMap(i => urlRows(i, basePoints, cadenceMs))
  }

  /** All crawl rows of one url — pure function of (i, basePoints, cadenceMs). */
  def urlRows(i: Long, basePoints: Int, cadenceMs: Long): Seq[PageRow] = {
    val n = pointsFor(i, basePoints)
    val cps = plantedCps(i, n)
    val url = f"https://site-${i % 1000}%04d.example/page-${i / 1000}%03d"
    var s = next(i * 2654435761L + 1)
    val out = new scala.collection.mutable.ArrayBuffer[PageRow](n)
    var ts = T0 + (i % 17) * 1000L
    var seg = 0
    // per-segment text block: byte-identical until the next churn point
    var text = textFor(i, seg, { s = next(s); s })
    var lang = Langs(((i + seg) % Langs.length).toInt)
    var p = 0
    while (p < n) {
      if (seg < cps.length && p == cps(seg)) {
        seg += 1
        text = textFor(i, seg, { s = next(s); s })
        lang = Langs(((i + seg) % Langs.length).toInt)
      }
      // page-size signal: sine with per-segment period+amplitude, plus noise.
      // Periods stay short (7-19 crawls) so suss learns a small window, and
      // (seg*31) % 5 steps by 1 per segment so adjacent segments ALWAYS
      // differ in period — z-normed distance is level/amplitude-invariant,
      // so period is the detectable discriminator.
      val period = 7.0 + 3.0 * ((i + seg * 31) % 5).toDouble
      val amp = 300.0 + 200.0 * ((i + seg * 17) % 4).toDouble
      s = next(s)
      val noise = (u01(s) - 0.5) * 60.0
      val size = (1200 + amp * math.sin(2 * math.Pi * p / period) + noise).toInt.max(64)
      val html = htmlFor(size, s)
      out += PageRow(url, ts, html, text, lang)
      // cadence with deterministic gaps: every 17th step skips 2-4 buckets
      // (gap-fill locf plateaus longer than ~w/4 would blur the z-normed
      // subsequence shapes the kernel keys on)
      s = next(s)
      val skip = if (p % 17 == 16) 2 + (s % 3).toInt.abs else 1
      ts += cadenceMs * skip
      p += 1
    }
    out.toSeq
  }

  /** html bytes whose LENGTH is the signal; content deterministic. */
  private def htmlFor(size: Int, seed: Long): Array[Byte] = {
    val b = new Array[Byte](size)
    var s = seed
    var j = 0
    while (j < size) { s = next(s); b(j) = ((s >>> 40) & 0x7f).toByte; j += 1 }
    b
  }

  private def textFor(i: Long, seg: Int, seed: Long): String = {
    val words = Array("the", "crawl", "page", "data", "web", "index", "series",
      "rollup", "spark", "engine", "segment", "epoch", "bucket", "stream")
    var s = seed
    val n = 40 + ((i + seg) % 60).toInt
    val sb = new StringBuilder
    var j = 0
    while (j < n) {
      s = next(s)
      sb.append(words(((s >>> 33) % words.length).toInt.abs)).append(' ')
      j += 1
    }
    sb.result().trim
  }

  /** DataFrame with the exact input_hint schema (warc_ts TIMESTAMP). */
  def pagesDF(spark: SparkSession, nUrls: Int, basePoints: Int = 120,
      cadenceMs: Long = 60000L): DataFrame =
    generate(spark, nUrls, basePoints, cadenceMs)
      .withColumn("warc_ts", timestamp_millis(col("warc_ts")))
      .select("url", "warc_ts", "html", "text", "lang")
}

/** Signal extraction: pages → per-url SeriesPoint streams. Stays fully
  * declarative so Catalyst prunes the scan — when reading from parquet only
  * the referenced columns leave the reader, and `html` never ships anywhere
  * because only octet_length(html) is selected (SURVEY.md §4.2). */
object CrawlSignals {

  /** page-size signal: octet_length(html) per crawl. */
  def pageSize(pages: DataFrame): Dataset[SeriesPoint] = {
    val spark = pages.sparkSession
    import spark.implicits._
    pages
      .filter(col("html").isNotNull)
      .select(col("url"),
        unix_millis(col("warc_ts")).as("ts"),
        octet_length(col("html")).cast("double").as("value"))
      .as[SeriesPoint]
  }

  /** text-length signal over DEDUPed text: the byte-identical-per-url
    * invariant means consecutive crawls repeat text; keep the first crawl of
    * each distinct (url, text) block. */
  def textLen(pages: DataFrame): Dataset[SeriesPoint] = {
    val spark = pages.sparkSession
    import spark.implicits._
    pages
      .filter(col("text").isNotNull)
      .groupBy(col("url"), xxhash64(col("text")).as("text_hash"))
      .agg(min(unix_millis(col("warc_ts"))).as("ts"),
        first(length(col("text"))).cast("double").as("value"))
      .select($"url", $"ts", $"value")
      .as[SeriesPoint]
  }

  /** lang-churn signal: 1.0 where lang differs from the previous crawl. */
  def langChurn(pages: DataFrame): Dataset[SeriesPoint] = {
    val spark = pages.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("url").orderBy("ts")
    pages
      .select(col("url"), unix_millis(col("warc_ts")).as("ts"), col("lang"))
      .withColumn("value",
        when(lag("lang", 1).over(w).isNull, 0.0)
          .when(col("lang") =!= lag("lang", 1).over(w), 1.0)
          .otherwise(0.0))
      .select($"url", $"ts", $"value")
      .as[SeriesPoint]
  }
}
