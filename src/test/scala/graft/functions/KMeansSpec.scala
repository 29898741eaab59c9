package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

import scala.util.Random

/** [[SimilarityOps.kmeansFit]] against an INDEPENDENT plain-Scala Lloyd
  * replay (never the operator itself re-run — systematic bugs would
  * cancel), plus the fitted-centroid path through ivfAssign/ivfTopK. */
class KMeansSpec extends SparkSpec {

  private def normScala(v: Array[Float]): Double =
    math.sqrt(v.foldLeft(0.0)((acc, x) => acc + x.toDouble * x.toDouble))

  private def dotScala(a: Array[Float], b: Array[Float]): Double = {
    var acc = 0.0
    var i = 0
    while (i < math.min(a.length, b.length)) {
      acc += a(i).toDouble * b(i).toDouble; i += 1
    }
    acc
  }

  private def round6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  /** Reference Lloyd: same init, score encoding, round(avg,6)→float
    * update, empty-cluster carry — written independently over plain
    * Scala collections. */
  private def lloydScala(vecs: Seq[(Long, Array[Float])], k: Int,
                         iters: Int): Map[Long, Array[Float]] = {
    var cents: Map[Long, Array[Float]] =
      vecs.filter(_._1 < k).map { case (id, v) => id -> v }.toMap
    for (_ <- 1 to iters) {
      val assigned = vecs.map { case (id, v) =>
        val vn = normScala(v)
        val best = cents.toSeq.map { case (cid, cv) =>
          val score = math.round(round6(dotScala(v, cv) / (vn * normScala(cv)))
            * 1000000) * 100 - cid
          (cid, score)
        }.maxBy(_._2)._1
        (best, v)
      }
      cents = cents.map { case (cid, prev) =>
        val members = assigned.filter(_._1 == cid).map(_._2)
        if (members.isEmpty) cid -> prev
        else {
          val dims = members.head.length
          val m = Array.tabulate(dims) { d =>
            round6(members.map(_(d).toDouble).sum / members.length).toFloat
          }
          cid -> m
        }
      }
    }
    cents
  }

  private def corpus(n: Int, dims: Int, seed: Long): Seq[(Long, Array[Float])] = {
    val rnd = new Random(seed)
    (0L until n).map { id =>
      val raw = Array.fill(dims)(rnd.nextGaussian().toFloat)
      val nrm = normScala(raw)
      id -> raw.map(x => (x / nrm).toFloat)
    }
  }

  test("kmeansFit equals an independent plain-Scala Lloyd replay") {
    val s = spark
    import s.implicits._
    val data = corpus(n = 80, dims = 8, seed = 42)
    val df = data.toDF("vec_id", "embedding")
    val expected = lloydScala(data, k = 5, iters = 3)

    val got = SimilarityOps.kmeansFit(df, "vec_id", "embedding", k = 5, iters = 3)
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap

    assert(got.keySet == expected.keySet)
    got.foreach { case (cid, cv) =>
      assert(cv.sameElements(expected(cid)),
        s"centroid $cid: ${cv.mkString(",")} vs ${expected(cid).mkString(",")}")
    }
  }

  test("iters = 0 returns the deterministic id<k init unchanged") {
    val s = spark
    import s.implicits._
    val data = corpus(n = 20, dims = 4, seed = 7)
    val df = data.toDF("vec_id", "embedding")
    val got = SimilarityOps.kmeansFit(df, "vec_id", "embedding", k = 3, iters = 0)
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    assert(got.keySet == Set(0L, 1L, 2L))
    got.foreach { case (cid, cv) =>
      assert(cv.sameElements(data(cid.toInt)._2))
    }
  }

  test("ivfAssign/ivfTopK accept fitted centroids") {
    val s = spark
    import s.implicits._
    val data = corpus(n = 60, dims = 8, seed = 11)
    val df = data.toDF("vec_id", "embedding")
    val cents = SimilarityOps.kmeansFit(df, "vec_id", "embedding", k = 4, iters = 2)

    val assign = SimilarityOps.ivfAssign(df, "vec_id", "embedding", k = 4,
      centroids = Some(cents))
    assert(assign.count() == 60)
    val cids = assign.select("centroid_id").distinct()
      .collect().map(_.getLong(0)).toSet
    assert(cids.subsetOf(Set(0L, 1L, 2L, 3L)))

    val hits = SimilarityOps.ivfTopK(df, "vec_id", "embedding", k = 4,
      queryPred = col("vec_id") < 3, nprobe = 2, topN = 4,
      centroids = Some(cents))
    val byQuery = hits.collect().groupBy(_.getLong(0))
    assert(byQuery.keySet == Set(0L, 1L, 2L))
    byQuery.values.foreach { rows =>
      assert(rows.length <= 4)
      // ranks are 1..n with sims non-increasing
      val sorted = rows.sortBy(_.getInt(1))
      assert(sorted.map(_.getInt(1)).toSeq == (1 to rows.length))
      val sims = sorted.map(_.getDouble(3))
      assert(sims.zip(sims.tail).forall { case (a, b) => a >= b })
    }
  }
}
