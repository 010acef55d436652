package graft.tools
import org.apache.spark.sql.SparkSession

/** Plan sweep over every driver query: reports scale antipatterns
  * (SortAggregate fallbacks, single-partition exchanges, unpartitioned
  * windows, cartesian/unkeyed joins) so a new query can't silently ship a
  * shape that dies at 100×. Known-deliberate exceptions are listed inline. */
object SortScan {
  // q09/q19/q152 broadcast a tiny query side into an NLJ by design
  // (plan-pinned; q152 adds the cross-language predicate to the same
  // brute-force shape);
  // q29 is a bounded ≤60-doc oracle pin with an explicit theta join;
  // q37/q65/q112/q118/q131 crossJoin a broadcast 1-ROW anchor/stats aggregate
  // (the SinglePartition exchange under it is the global agg producing that
  // one row — aggregate-sized, plan-pinned in PlanSpec)
  // q134/q140/q141 share the same 1-row (or topN-row: q137's top-200 grid)
  // broadcast-aggregate crossJoin shape
  private val allowedNlj =
    Set("q09_topk_cosine", "q19_ivf_topk", "q152_crosslingual_topk",
      "q29_jaccard_exact",
      "q37_retention_expiry", "q65_bm25", "q112_staleness",
      "q118_lm_perplexity", "q131_keywords", "q134_quality_gate",
      "q137_source_divergence", "q140_pmi_collocations",
      "q141_kneser_ney_lm", "q146_churn_survival")
  // q142's single-partition exchange is the 1-row min/max aggregate that
  // explodes into the broadcast day spine (span/86400000 rows); q143's is
  // the unpartitioned rolling window over the BUCKET-COUNT-sized hourly
  // aggregate (hours in the span — post-reduction, never event-sized)
  // q146's are the 1-row (N, maxDay) anchor plus the risk-set window and
  // curve fold over the lifetime SPECTRUM (distinct event times <= days in
  // span — post-reduction, never key-sized)
  private val allowedSinglePartition =
    Set("q37_retention_expiry", "q65_bm25", "q112_staleness",
      "q118_lm_perplexity", "q131_keywords", "q134_quality_gate",
      "q140_pmi_collocations", "q141_kneser_ney_lm",
      "q142_trailing_actives", "q143_rolling_corr",
      "q146_churn_survival")

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.001"
    var hits = 0
    for ((name, fn) <- graft.Queries.all.toSeq.sortBy(_._1)) {
      try {
        val p = fn(spark, dir).queryExecution.executedPlan.toString
        val lines = p.split("\n")
        def flag(msg: String): Unit = { hits += 1; println(s"FLAG $name: $msg") }
        if (p.contains("SortAggregate")) flag("SortAggregate fallback")
        if (p.contains("CartesianProduct")) flag("CartesianProduct")
        if (p.contains("BroadcastNestedLoopJoin") && !allowedNlj(name))
          flag("BroadcastNestedLoopJoin outside allowlist")
        // global exchanges: rangepartitioning(…, n) is fine; SinglePartition
        // means some operator pulled everything to one task
        if (!allowedSinglePartition(name))
          for (l <- lines if l.contains("Exchange SinglePartition"))
            flag(s"single-partition exchange: ${l.trim.take(120)}")
      } catch { case e: Throwable => hits += 1; println(s"ERR $name: ${e.getClass.getSimpleName}") }
    }
    println(s"scan done, $hits flags")
    spark.stop()
  }
}
