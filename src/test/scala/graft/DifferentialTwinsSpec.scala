package graft

import org.apache.spark.sql.functions._
import graft.pipeline.SparkTestBase

/** Cross-implementation checks for rows-only queries: two independent paths
  * through the engine must agree row-for-row, converting invariant-only
  * coverage into differential coverage (VERDICT r2 §next-round 3). */
class DifferentialTwinsSpec extends SparkTestBase {

  private val dir = "/root/testdata/sf0.001"

  test("q13's non-epoch columns are row-identical to oracle-green q30") {
    // q13 = segmented two-phase rollup (epoch column added by the ClaSP
    // kernel); q30 = the same rollup unsegmented, DuckDB-oracle-green.
    // Epoch assignment must not perturb any aggregate/gap column.
    val q13 = Queries.all("q13_epoch_rollup_1h")(spark, dir)
      .select("user_id", "bucket_start", "cnt", "mean_val", "gap_filled")
    val q30 = Queries.all("q30_rollup_gapfill_1h")(spark, dir)
      .select("user_id", "bucket_start", "cnt", "mean_val", "gap_filled")
    assert(q13.count() == q30.count())
    assert(q13.exceptAll(q30).isEmpty && q30.exceptAll(q13).isEmpty,
      "segmented and unsegmented rollups disagree on shared columns")
  }

  test("q14 epoch counts are consistent with q13's epoch column") {
    val q13 = Queries.all("q13_epoch_rollup_1h")(spark, dir)
    val fromQ13 = q13.groupBy("user_id")
      .agg((max("epoch") + 1).as("n_epochs"), count(lit(1)).as("n_buckets"),
        sum(when(col("gap_filled"), 1L).otherwise(0L)).as("n_gap_buckets"))
    val q14 = Queries.all("q14_clasp_summary")(spark, dir)
    assert(q14.exceptAll(fromQ13).isEmpty && fromQ13.exceptAll(q14).isEmpty,
      "q14 summary disagrees with a recount over q13 rows")
  }
}
