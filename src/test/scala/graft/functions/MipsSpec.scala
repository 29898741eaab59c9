package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** MIPS: the unnormalized retrieval mode and its reduction to cosine
  * search. The reduction (append sqrt(M² − |x|²) to corpus vectors, 0 to
  * queries, M ≥ max corpus norm) is what lets the IVF machinery serve
  * MIPS at scale — its rank-equivalence is the load-bearing claim and is
  * pinned here on raw doubles, independent of Spark. */
class MipsSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("mipsTopK == independent window-ranked brute force") {
    val s = spark
    val emb = graft.Tables.embeddings(s, dir)
    val got = SimilarityOps.mipsTopK(emb, "vec_id", "embedding",
      col("vec_id") < 10, 5)
    val q = emb.filter(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
    val c = emb.select(col("vec_id").as("neighbor_id"), col("embedding").as("cv"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy("query_id")
      .orderBy(col("score").desc, col("neighbor_id").asc)
    val brute = c.join(q, col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        round(SimilarityOps.dot(col("qv"), col("cv")), 6).as("score"))
      .withColumn("rank", row_number().over(w).cast("int"))
      .filter(col("rank") <= 5)
      .select("query_id", "rank", "neighbor_id", "score")
    assert(got.count() == brute.count())
    assert(got.exceptAll(brute).count() == 0)
    assert(brute.exceptAll(got).count() == 0)
  }

  test("norm augmentation: cosine ranking over augmented vectors == MIPS ranking") {
    val s = spark
    val emb = graft.Tables.embeddings(s, dir).limit(120)
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray)
    assert(emb.length > 50)
    def dot(a: Array[Float], b: Array[Float]): Double =
      a.indices.foldLeft(0.0)((acc, i) => acc + a(i).toDouble * b(i).toDouble)
    val maxNorm = math.sqrt(emb.map(v => dot(v._2, v._2)).max)
    val m2 = maxNorm * maxNorm
    for ((qid, qv) <- emb.take(8)) {
      val others = emb.filter(_._1 != qid)
      // MIPS order: by raw inner product
      val byDot = others.sortBy { case (id, v) => (-dot(qv, v), id) }.map(_._1)
      // augmented-cosine order: ACTUALLY build the augmented vectors —
      // corpus vectors gain a sqrt(M²−|x|²) dimension, the query gains
      // 0 — and rank by the cosine OF THOSE vectors with their computed
      // norms. Every augmented corpus norm is M by construction, so the
      // denominator is constant and the cosine order must reproduce the
      // dot order.
      def dotD(a: Array[Double], b: Array[Double]): Double =
        a.indices.foldLeft(0.0)((acc, i) => acc + a(i) * b(i))
      val augQ = qv.map(_.toDouble) :+ 0.0
      val byAug = others.sortBy { case (id, v) =>
        val augC = v.map(_.toDouble) :+ math.sqrt(m2 - dot(v, v))
        val cos = dotD(augQ, augC) /
          (math.sqrt(dotD(augQ, augQ)) * math.sqrt(dotD(augC, augC)))
        (-cos, id)
      }.map(_._1)
      assert(byDot.sameElements(byAug), s"query $qid rank order diverged")
    }
  }
}
