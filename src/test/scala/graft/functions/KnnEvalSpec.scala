package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Leave-one-out kNN eval: perfect accuracy on separated clusters, a
  * planted mislabel shows up in exactly its class's accuracy, and the
  * vote tie-break is the smallest label. */
class KnnEvalSpec extends SparkSpec {

  private def vecs(rows: Seq[(Long, Seq[Float], Int)]) = {
    val s = spark
    import s.implicits._
    rows.toDF("vec_id", "embedding", "label")
  }

  test("separated clusters are classified perfectly") {
    val rows = (0L until 10L).map(i =>
      (i, Seq(1.0f, 0.0f, i.toFloat / 100), 0)) ++
      (10L until 20L).map(i => (i, Seq(0.0f, 1.0f, i.toFloat / 100), 1))
    val got = SimilarityOps.knnEval(vecs(rows), "vec_id", "embedding",
        "label", lit(true), k = 3)
      .collect().map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(got(0) === ((10L, 10L, 1.0)))
    assert(got(1) === ((10L, 10L, 1.0)))
  }

  test("a planted mislabel costs exactly its own query") {
    // vec 0 sits in cluster A but carries label 1: its own prediction is
    // 0 (wrong), and with k=3 its neighbors' votes are unaffected
    val rows = Seq((0L, Seq(1.0f, 0.0f, 0.0f), 1)) ++
      (1L until 8L).map(i => (i, Seq(1.0f, 0.0f, i.toFloat / 100), 0)) ++
      (8L until 16L).map(i => (i, Seq(0.0f, 1.0f, i.toFloat / 100), 1))
    val got = SimilarityOps.knnEval(vecs(rows), "vec_id", "embedding",
        "label", lit(true), k = 3)
      .collect().map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    // label-0 queries: 7, all still correct (the mislabeled vec is only 1
    // of 3 votes for its nearest neighbors)
    assert(got(0) === ((7L, 7L, 1.0)))
    // label-1 queries: 9 total, the planted one predicted 0 -> 8 correct
    assert(got(1)._1 === 9L && got(1)._2 === 8L)
  }

  test("vote ties resolve to the smallest label") {
    // k=2: each query sees one neighbor of each cluster equally often ->
    // engineered tie between labels 3 and 7 resolves to 3
    val rows = Seq(
      (0L, Seq(1.0f, 0.0f), 3), (1L, Seq(1.0f, 0.001f), 7),
      (2L, Seq(1.0f, -0.001f), 3))
    val got = SimilarityOps.knnEval(vecs(rows), "vec_id", "embedding",
        "label", col("vec_id") === 0L, k = 2)
      .collect().map(r => r.getInt(0) -> r.getDouble(3)).toMap
    // query 0 (label 3) sees votes {7, 3} -> tie -> predict 3 -> correct
    assert(got(3) === 1.0)
  }
}
