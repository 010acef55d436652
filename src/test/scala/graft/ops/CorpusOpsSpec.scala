package graft.ops

import graft.pipeline.SparkTestBase
import org.apache.spark.sql.functions._

class CorpusOpsSpec extends SparkTestBase {
  import spark.implicits._

  test("tokenBudget keeps docs in doc_id order until the stratum budget is reached") {
    val docs = Seq(
      // stratum (en, web): 4+4+4 tokens, budget 10 → docs 1,2,3 kept (3 starts
      // at cum 8 < 10, overshoots to 12), doc 4 starts at 12 → dropped
      (1L, "a b c d", "en", "web"),
      (2L, "e f g h", "en", "web"),
      (3L, "i j k l", "en", "web"),
      (4L, "m n o p", "en", "web"),
      // stratum (de, web): independent budget
      (5L, "q r s t u v w x y z a2 b2", "de", "web")
    ).toDF("doc_id", "text", "lang", "source")
    val kept = CorpusOps.tokenBudget(docs, 10L)
      .select("doc_id", "cum_tokens").as[(Long, Long)].collect().toMap
    assert(kept.keySet == Set(1L, 2L, 3L, 5L), s"got ${kept.keySet}")
    assert(kept(3L) == 12L && kept(5L) == 12L)
  }

  test("decontaminate flags docs sharing a k-gram with the eval set and drops eval docs") {
    val docs = Seq(
      (0L, "w1 w2 w3 w4 w5 w6"),       // eval doc
      (1L, "x0 w2 w3 w4 w5 w6 x1"),    // shares 5-gram "w2..w6" → contaminated
      (2L, "w1 w2 w3 w4 zz w6"),       // longest shared run is 4 → clean
      (3L, "p q r s t u")              // disjoint → clean
    ).toDF("doc_id", "text")
    val out = CorpusOps
      .decontaminate(docs, docs.filter($"doc_id" === 0L).select("doc_id"), k = 5)
      .as[(Long, Boolean)].collect().toMap
    assert(out == Map(1L -> true, 2L -> false, 3L -> false), s"got $out")
  }

  test("shardAssign is a pure function of doc_id: partitioning-invariant, contiguous pos") {
    val docs = (0L until 200L).map(i => (i, s"t$i")).toDF("doc_id", "text")
    val a = CorpusOps.shardAssign(docs, 16)
      .as[(Long, Int, Int)].collect().sorted.toSeq
    val b = CorpusOps.shardAssign(docs.repartition(7), 16)
      .as[(Long, Int, Int)].collect().sorted.toSeq
    assert(a == b, "shard/pos must not depend on input partitioning")
    assert(a.map(_._1).distinct.size == 200)
    // every shard's positions are exactly 1..size (a valid export manifest)
    a.groupBy(_._2).foreach { case (shard, rows) =>
      assert(rows.map(_._3).sorted == (1 to rows.size).toSeq, s"shard $shard pos gap")
    }
    // the multiplicative hash actually spreads: no shard holds >3x its share
    val sizes = a.groupBy(_._2).map(_._2.size)
    assert(sizes.max <= 3 * 200 / 16, s"degenerate shard sizes: $sizes")
  }

  test("stratifiedSample takes exactly n per stratum, deterministically") {
    val docs = (0L until 120L)
      .map(i => (i, s"t$i", if (i % 2 == 0) "en" else "de", "web"))
      .toDF("doc_id", "text", "lang", "source")
    val s1 = CorpusOps.stratifiedSample(docs, 10)
      .as[(Long, String, String, Int)].collect().sorted.toSeq
    val s2 = CorpusOps.stratifiedSample(docs.repartition(5), 10)
      .as[(Long, String, String, Int)].collect().sorted.toSeq
    assert(s1 == s2, "sample must be partitioning-invariant")
    val byStratum = s1.groupBy(r => (r._2, r._3))
    assert(byStratum.keySet == Set(("en", "web"), ("de", "web")))
    byStratum.foreach { case (k, rows) =>
      assert(rows.size == 10, s"stratum $k size ${rows.size}")
      assert(rows.map(_._4).sorted == (1 to 10).toSeq)
    }
  }

  test("decontaminateStream on a doc stream equals batch decontaminate") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val data = Seq(
      (0L, "w1 w2 w3 w4 w5 w6"),
      (1L, "x0 w2 w3 w4 w5 w6 x1"),
      (2L, "w1 w2 w3 w4 zz w6"),
      (3L, "p q r s t u"))
    val evalDocs = data.filter(_._1 == 0L).toDF("doc_id", "text")
    val batch = CorpusOps
      .decontaminate(data.toDF("doc_id", "text"), evalDocs.select("doc_id"), k = 5)
      .as[(Long, Boolean)].collect().toMap
    val mem = MemoryStream[(Long, String)]
    val out = CorpusOps.decontaminateStream(
      mem.toDF.toDF("doc_id", "text"), evalDocs, k = 5)
    val q = out.writeStream.format("memory").queryName("decon_stream")
      .outputMode("append").start()
    try {
      mem.addData(data.filter(_._1 != 0L): _*) // non-eval docs arrive on the stream
      q.processAllAvailable()
      val got = spark.table("decon_stream").as[(Long, Boolean)].collect().toMap
      assert(got == batch, s"stream $got vs batch $batch")
    } finally q.stop()
  }
}
