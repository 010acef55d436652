package graft
import org.apache.spark.sql.{SparkSession, DataFrame}
import org.apache.spark.sql.functions._
import graft.pipeline.{CrawlSignals, Rollup, SyntheticCrawl}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {
  /** Flagship: full engine slice (synthetic crawl table → page-size signal →
    * ClaSP-adaptive 1m rollup → 1d cascade). Driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame = {
    val pages = SyntheticCrawl.pagesDF(spark, nUrls = 16, basePoints = 300)
    Rollup.cascade(
      Rollup.scalableRollup(CrawlSignals.pageSize(pages), 60000L, "1m", segment = true),
      "1d").toDF()
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Queries.all

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Queries.oracles
}
