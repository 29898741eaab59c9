package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The driver-state contracts, fed OVER-contract inputs: every bounded
  * collect in the similarity/dedup family must refuse loudly with its
  * own diagnostic BEFORE pulling data, never OOM or silently degrade.
  * (dbscan's bound is pinned in `DbscanSpec`; pcaPowerProject's d ≤ 256
  * in `PcaSpec`'s family — this suite covers the rest.) */
class ContractGuardSpec extends SparkSpec {

  test("an over-contract caller-supplied centroid set is refused, not collected") {
    val s = spark
    import s.implicits._
    val vecs = (0L to 20L).map(i => (i, Array(i.toFloat, 1f)))
      .toDF("vec_id", "embedding")
    // 101 centroids: one past the ×100 score-encoding bound
    val cents = (0L to 100L).map(i => (i, Array(i.toFloat, 1f)))
      .toDF("cid", "cv")
    val e = intercept[IllegalArgumentException] {
      SimilarityOps.ivfAssign(vecs, "vec_id", "embedding", k = 101,
        centroids = Some(cents)).count()
    }
    assert(e.getMessage.contains("100"), e.getMessage)
  }

  test("kmeansFit refuses k past the centroid contract") {
    val s = spark
    import s.implicits._
    val vecs = (0L to 5L).map(i => (i, Array(i.toFloat, 1f)))
      .toDF("vec_id", "embedding")
    val e = intercept[IllegalArgumentException] {
      SimilarityOps.kmeansFit(vecs, "vec_id", "embedding", k = 101, iters = 1)
    }
    assert(e.getMessage.toLowerCase.contains("k"), e.getMessage)
  }

  test("bloomDecontaminate refuses a plan-literal-sized bitset loudly") {
    val s = spark
    import s.implicits._
    val docs = Seq((1L, "some text here")).toDF("doc_id", "text")
    val e = intercept[IllegalArgumentException] {
      DedupOps.bloomDecontaminate(docs, docs, "doc_id", "text",
        shingleN = 2, bits = 1 << 27)
    }
    assert(e.getMessage.contains("2^26"), e.getMessage)
  }

  test("pcaPowerProject's d cap fires before the driver covariance") {
    val s = spark
    import s.implicits._
    val wide = Seq((1L, Array.fill(257)(0.5f)), (2L, Array.fill(257)(0.25f)))
      .toDF("vec_id", "embedding")
    val e = intercept[IllegalArgumentException] {
      SimilarityOps.pcaPowerProject(wide, "vec_id", "embedding", iters = 2)
    }
    assert(e.getMessage.contains("256"), e.getMessage)
  }
}
