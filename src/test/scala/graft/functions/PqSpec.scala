package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Product quantization (encode + ADC search) — structural contracts
  * and the exact-reconstruction equivalence; the s10/s11 oracle pair
  * checks the general fitted case against the DuckDB replay. */
class PqSpec extends SparkSpec {

  private lazy val emb = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")

  test("encode: m codes per vector, each in [0, ksub), positive recon norm") {
    val enc = SimilarityOps.pqEncode(emb, "vec_id", "embedding",
      m = 2, ksub = 4, iters = 1).collect()
    assert(enc.length == emb.count())
    assert(enc.forall { r =>
      val cs = r.getString(1).split(",").map(_.toInt)
      cs.length == 2 && cs.forall(c => c >= 0 && c < 4) && r.getDouble(2) > 0
    })
  }

  test("codebooks covering the corpus reconstruct exactly: ADC ≡ brute force") {
    // iters=0 keeps the init convention (centroid s = subvector of vector
    // s), and the corpus IS those ksub vectors — so every vector encodes
    // to itself, reconstruction is exact, and the ADC decomposition
    // Σ_s ⟨q_s, c_s⟩ / (‖q‖·√Σ‖c_s‖²) must reproduce brute-force cosine
    // at the rounded-6 contract
    val sub = emb.filter(col("vec_id") < 8)
    val pq = SimilarityOps.pqTopK(sub, "vec_id", "embedding", m = 2, ksub = 8,
      iters = 0, queryPred = col("vec_id") < 8, topN = 7)
    val brute = SimilarityOps.bruteTopK(sub, "vec_id", "embedding",
      col("vec_id") < 8, 7)
    assert(pq.exceptAll(brute).isEmpty && brute.exceptAll(pq).isEmpty,
      "exact-reconstruction ADC diverged from brute force")
    assert(pq.count() == 8L * 7)
  }

  test("ragged and non-divisible dimensions are rejected") {
    import spark.implicits._
    val ragged = Seq((0L, Seq(1f, 2f)), (1L, Seq(1f, 2f, 3f)))
      .toDF("vec_id", "embedding")
    intercept[IllegalArgumentException] {
      SimilarityOps.pqEncode(ragged, "vec_id", "embedding", 2, 2, 0)
    }
    intercept[IllegalArgumentException] {
      // uniform dim 64 but m does not divide it
      SimilarityOps.pqEncode(emb, "vec_id", "embedding", 3, 2, 0)
    }
  }
}
