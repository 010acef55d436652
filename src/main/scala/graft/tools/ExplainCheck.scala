package graft.tools
import org.apache.spark.sql.SparkSession
object ExplainCheck {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.01"
    // 1. scan pruning: only referenced columns read, filter pushed
    val q = spark.read.parquet(s"$dir/events.parquet")
      .filter(org.apache.spark.sql.functions.col("user_id") < 10)
      .groupBy("user_id").count()
    println("=== q1 scan ===")
    println(q.queryExecution.executedPlan.toString.split("\n")
      .filter(l => l.contains("ReadSchema") || l.contains("PushedFilters") || l.contains("WholeStageCodegen")).mkString("\n"))
    // 2. broadcast in topk
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val topk = graft.ops.SimilarityOps.bruteForceTopK(emb, emb.filter(org.apache.spark.sql.functions.col("vec_id") < 8), 5)
    println("=== topk join strategy ===")
    println(topk.queryExecution.executedPlan.toString.split("\n").filter(l => l.contains("Join")).mkString("\n"))
    // 3. lineitem agg: partial aggregation present
    val li = graft.Queries.all("q12_lineitem_agg")(spark, dir)
    println("=== q12 agg ===")
    println(li.queryExecution.executedPlan.toString.split("\n").filter(l => l.contains("HashAggregate") || l.contains("ReadSchema")).mkString("\n"))
    spark.stop()
  }
}
