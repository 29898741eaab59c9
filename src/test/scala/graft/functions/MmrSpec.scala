package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** MMR re-ranking: the greedy diversity pick must actually reorder —
  * a duplicate of the round-1 winner falls behind an orthogonal
  * lower-relevance candidate at a diversity-heavy λ, ties break to the
  * smaller id, and λ = 1 degenerates to plain relevance order. */
class MmrSpec extends SparkSpec {

  import spark.implicits._

  // id 0 is the query; 1 and 2 are EXACT duplicates of it (rel = 1,
  // mutual sim = 1); 3 is orthogonal (rel = 0, sim to 1/2 = 0)
  private val vecs = Seq(
    (0L, Array(1f, 0f, 0f)),
    (1L, Array(1f, 0f, 0f)),
    (2L, Array(1f, 0f, 0f)),
    (3L, Array(0f, 1f, 0f))
  ).toDF("vec_id", "embedding")

  private def ranks(lambda: Double): Seq[Long] =
    SimilarityOps.mmrRerank(vecs, "vec_id", "embedding",
        col("vec_id") === 0, pool = 3, k = 3, lambda = lambda)
      .orderBy("rank").collect().map(_.getLong(0)).toSeq

  test("diversity-heavy λ demotes the duplicate below the orthogonal candidate") {
    // λ = 0.3: round 1 → id 1 (rel tie with 2, smaller id). round 2:
    // id 2 scores 0.3·1 − 0.7·1 = −0.4, id 3 scores 0 − 0 = 0 → id 3.
    // round 3: only id 2 remains
    assert(ranks(0.3) == Seq(1L, 3L, 2L))
  }

  test("λ = 1 degenerates to pure relevance order (the s1 ranking)") {
    assert(ranks(1.0) == Seq(1L, 2L, 3L))
  }

  test("score column carries the greedy objective, rounded") {
    val rows = SimilarityOps.mmrRerank(vecs, "vec_id", "embedding",
        col("vec_id") === 0, pool = 3, k = 3, lambda = 0.3)
      .orderBy("rank").collect()
    assert(rows(0).getDouble(3) == 0.3) // 0.3·1 − 0.7·0
    assert(rows(1).getDouble(3) == 0.0) // 0.3·0 − 0.7·0
    assert(rows(2).getDouble(3) == -0.4) // 0.3·1 − 0.7·1
  }
}
