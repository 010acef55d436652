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
