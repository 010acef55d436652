package graft.tools
import org.apache.spark.sql.SparkSession
object SortScan {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.001"
    for ((name, fn) <- graft.Queries.all.toSeq.sortBy(_._1)) {
      try {
        val p = fn(spark, dir).queryExecution.executedPlan.toString
        val n = p.split("\n").count(_.contains("SortAggregate"))
        if (n > 0) println(s"SORTAGG $name: $n")
      } catch { case e: Throwable => println(s"ERR $name: ${e.getClass.getSimpleName}") }
    }
    println("scan done")
    spark.stop()
  }
}
