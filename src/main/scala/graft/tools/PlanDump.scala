package graft.tools

import org.apache.spark.sql.SparkSession

/** Ad-hoc plan dump for one driver query: `runMain graft.tools.PlanDump q05_dedup_exact`. */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    println(graft.Queries.all(args(0))(spark, "/root/testdata/sf0.01")
      .queryExecution.executedPlan.toString)
    spark.stop()
  }
}
