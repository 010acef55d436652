package graft.ops

import graft.pipeline.SparkTestBase
import org.apache.spark.sql.functions._

/** SpaceSaving heavy hitters: exact in the low-cardinality regime (the q52
  * oracle pins that against DuckDB counts), guarantee-bounded in the
  * high-cardinality sketchy regime. */
class HeavyHittersSpec extends SparkTestBase {
  import spark.implicits._

  test("exact regime: capacity > cardinality reproduces exact counts at any partitioning") {
    val rng = new scala.util.Random(41)
    val items = Seq("a", "b", "c", "d", "e", "f")
    val rows = (0 until 5000).map(i => ("g" + (i % 3), items(rng.nextInt(items.length))))
    val exact = rows.groupBy(identity).map { case ((g, it), rs) => (g, it) -> rs.size.toLong }
    val out = HeavyHitters.perBucket(
        rows.toDF("g", "item").repartition(8), col("g"), col("item"),
        capacity = 64, k = 10)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(out.size == 18, "3 groups x 6 items")
    for (((g, it), (est, err, _)) <- out) {
      assert(est == exact((g, it)), s"($g,$it): est $est vs exact ${exact((g, it))}")
      assert(err == 0L, "no eviction ever happens below capacity")
    }
    // ranks are dense 1..6 per group in (est desc, item) order
    for (g <- Seq("g0", "g1", "g2")) {
      val ranks = out.collect { case ((`g`, it), (est, _, rank)) => (rank, -est, it) }.toSeq.sorted
      assert(ranks.map(_._1) == (1L to 6L), s"$g ranks: $ranks")
    }
  }

  test("sketchy regime: planted heavy items survive with bounded estimates") {
    // 3 heavies (1000 each) buried in 5000 singletons, capacity 32:
    // n/capacity = 8000/32 = 250 < 1000, so the SpaceSaving guarantee
    // requires every heavy to be reported; est >= true >= est - err
    val heavies = Seq("H1", "H2", "H3")
    val rng = new scala.util.Random(43)
    val rows = rng.shuffle(
      heavies.flatMap(h => Seq.fill(1000)(h)) ++
        (0 until 5000).map(i => s"noise_$i")).map(("all", _))
    val out = HeavyHitters.perBucket(
        rows.toDF("g", "item").repartition(8), col("g"), col("item"),
        capacity = 32, k = 32)
      .collect().map(r => r.getString(1) -> ((r.getLong(2), r.getLong(3)))).toMap
    for (h <- heavies) {
      assert(out.contains(h), s"heavy item $h (true count 1000 > n/capacity) must be reported")
      val (est, err) = out(h)
      assert(est >= 1000L, s"$h: overestimate invariant ($est)")
      assert(est - err <= 1000L, s"$h: est $est - err $err must not exceed true")
    }
    assert(out.size <= 32, "summary never exceeds capacity")
  }

  test("q52 end-to-end matches exact per-day top-5 in the oracle regime") {
    val dir = "/root/testdata/sf0.001"
    assume(new java.io.File(s"$dir/events.parquet").exists(), s"$dir not present")
    val got = graft.Queries.all("q52_heavy_hitters")(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(4)) -> ((r.getString(1), r.getLong(2)))).toMap
    val exact = spark.read.parquet(s"$dir/events.parquet")
      .groupBy(date_trunc("day", col("ts")).cast("string").as("bucket"), col("event_type"))
      .agg(count(lit(1)).as("cnt"))
      .withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("bucket")
          .orderBy(col("cnt").desc, col("event_type"))))
      .filter(col("rank") <= 5)
      .collect().map(r => (r.getString(0), r.getInt(3).toLong) ->
        ((r.getString(1), r.getLong(2)))).toMap
    assert(got.nonEmpty && got == exact,
      s"sketch top-5 must equal exact top-5 below capacity (got ${got.size} vs ${exact.size})")
  }
}
