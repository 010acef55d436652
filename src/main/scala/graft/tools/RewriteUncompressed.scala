package graft.tools

import org.apache.spark.sql.SparkSession

/** One-off helper: re-encode a parquet dir with a different codec (used to
  * compare scan cost of snappy vs uncompressed for the bench pages table —
  * the html payload is match-heavy, so snappy decode is the scan's hot
  * loop; see BASELINE.md round-3 notes). */
object RewriteUncompressed {
  def main(args: Array[String]): Unit = {
    val Array(in, out, codec) = args.take(3)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.parquet.compression.codec", codec)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.read.parquet(in).write.mode("overwrite")
      .option("compression", codec).parquet(out)
    spark.stop()
  }
}
