package graft.functions

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Recall contract of the IVF search: nprobe-cell probing is approximate
  * by design — this spec measures recall@k against the exact brute-force
  * top-k on the harness embeddings, documenting what the (k, nprobe)
  * knobs buy. Probing ALL cells must be exact (recall 1.0): with every
  * cell probed the candidate set is the whole corpus, so any loss would
  * be a bug in the assignment/probe plumbing, not approximation. */
class IvfRecallSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def hits(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
    df.select(col("query_id").cast("long"), col("neighbor_id").cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("probing all cells reproduces brute-force exactly; fewer cells degrade gracefully") {
    val e = Tables.embeddings(spark, dir)
    val pred = col("vec_id") < 20
    val exact = hits(SimilarityOps.bruteTopK(e, "vec_id", "embedding", pred, 5))

    // all 16 cells probed → candidate set = corpus → identical top-k
    val full = hits(SimilarityOps.ivfTopK(e, "vec_id", "embedding",
      k = 16, queryPred = pred, nprobe = 16, topN = 5))
    assert(full == exact)

    // the production setting (nprobe = 4 of 16) keeps useful recall and
    // can only return a subset-quality result, never spurious extras
    val probed = hits(SimilarityOps.ivfTopK(e, "vec_id", "embedding",
      k = 16, queryPred = pred, nprobe = 4, topN = 5))
    val recall = probed.intersect(exact).size.toDouble / exact.size
    assert(recall >= 0.5, s"recall@5 collapsed to $recall")
    // monotonicity: more probes can only help
    val probed8 = hits(SimilarityOps.ivfTopK(e, "vec_id", "embedding",
      k = 16, queryPred = pred, nprobe = 8, topN = 5))
    val recall8 = probed8.intersect(exact).size.toDouble / exact.size
    assert(recall8 >= recall, s"recall@5 fell from $recall to $recall8 with more probes")
  }

  test("fitted centroids keep the exact-when-probing-all contract") {
    val e = Tables.embeddings(spark, dir)
    val pred = col("vec_id") < 20
    val fit = SimilarityOps.kmeansFit(e, "vec_id", "embedding", k = 8, iters = 2)
    val exact = hits(SimilarityOps.bruteTopK(e, "vec_id", "embedding", pred, 5))
    val full = hits(SimilarityOps.ivfTopK(e, "vec_id", "embedding",
      k = 8, queryPred = pred, nprobe = 8, topN = 5, centroids = Some(fit)))
    assert(full == exact)
  }
}
