package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ops.DedupOps

/** Scratch profiler for the MinHash-LSH pipeline stages (not part of the
  * driver contract). */
object ProfileQ16 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
      .select("doc_id", "text")
    val clones = docs.select((col("doc_id") + lit(1000000000L)).as("doc_id"), col("text"))
    val all = docs.union(clones)

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"$label: ${(System.nanoTime() - t0) / 1e9}%.1f s"); r
    }
    import graft.functions.functions.{hashed_shingles, minhash_sig}
    time("native shingles")(
      all.select(sum(size(hashed_shingles(col("text"), 3)))).head())
    time("native sigs")(
      all.select(sum(size(minhash_sig(col("text"), 3, 16)))).head())
    time("q16 full")(println(DedupOps.minhashLshPairs(all, threshold = 0.5).count()))
    spark.stop()
  }
}
