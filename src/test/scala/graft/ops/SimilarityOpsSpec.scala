package graft.ops

import org.apache.spark.sql.functions._
import graft.pipeline.SparkTestBase

class SimilarityOpsSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val emb = spark.read
    .parquet("/root/testdata/sf0.001/embeddings.parquet").cache()

  test("native cosine is bit-identical to the HOF composition") {
    val a = emb.select($"vec_id".as("ia"), $"embedding".as("ea"))
    val b = emb.select($"vec_id".as("ib"), $"embedding".as("eb"))
    val pairs = a.join(b, $"ia" < $"ib").limit(20000)
      .select(SimilarityOps.cosine($"ea", $"eb").as("fast"),
        SimilarityOps.cosineHof($"ea", $"eb").as("ref"))
    assert(pairs.filter($"fast" =!= $"ref").count() == 0)
  }

  test("native RHP signature is identical to the HOF composition") {
    val both = emb.select(
      SimilarityOps.rhpSignature($"embedding", 16).as("fast"),
      SimilarityOps.rhpSignatureHof($"embedding", 16).as("ref"))
    assert(both.filter($"fast" =!= $"ref").count() == 0)
  }

  test("brute-force top-k: self-similarity excluded, ranks contiguous, sims sorted") {
    val topk = SimilarityOps.bruteForceTopK(emb, emb.filter($"vec_id" < 5), 5).collect()
    assert(topk.length == 25)
    val byQ = topk.groupBy(_.getAs[Long]("query_id"))
    for ((q, rows) <- byQ) {
      val sorted = rows.sortBy(_.getAs[Int]("rank"))
      assert(sorted.map(_.getAs[Int]("rank")).toSeq == (1 to 5))
      val sims = sorted.map(_.getAs[Double]("sim"))
      assert(sims.zip(sims.tail).forall { case (x, y) => x >= y })
      assert(rows.forall(_.getAs[Long]("neighbor_id") != q))
    }
  }

  test("LSH near-dup finds exact clones at sim 1.0") {
    val base = emb.select("vec_id", "embedding").limit(100)
    val clones = base.select(($"vec_id" + 100000).as("vec_id"), $"embedding")
    val pairs = SimilarityOps.lshNearDupPairs(base.union(clones), threshold = 0.99)
    assert(pairs.filter($"vec_b" === $"vec_a" + 100000 && $"sim" >= 0.999999).count() == 100)
  }

  test("IVF top-k achieves reasonable recall vs brute force") {
    val queries = emb.filter($"vec_id" < 10)
    val exact = SimilarityOps.bruteForceTopK(emb, queries, 5).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    val approx = SimilarityOps.ivfTopK(emb, queries, 5, nCentroids = 16, nProbe = 8).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    val recall = (exact intersect approx).size.toDouble / exact.size
    // fixed-seed dataset (driver testdata) + deterministic seeding/Lloyd:
    // measured 0.84 at nProbe=8/16 centroids; floor set just below
    assert(recall >= 0.75, s"IVF recall $recall too low (expected ~0.84)")
  }

  test("IVF with full probe is EXACTLY brute force (differential identity)") {
    // probing every centroid removes the approximation: the candidate set is
    // the whole corpus, so top-k must equal the brute-force top-k pair set
    val queries = emb.filter($"vec_id" < 10)
    val exact = SimilarityOps.bruteForceTopK(emb, queries, 5).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    val full = SimilarityOps.ivfTopK(emb, queries, 5, nCentroids = 16, nProbe = 16).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    assert(full == exact, s"full-probe IVF diverged from brute force: ${full diff exact} / ${exact diff full}")
  }
}
