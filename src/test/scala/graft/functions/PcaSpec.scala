package graft.functions

import graft.SparkSpec

/** [[SimilarityOps.pcaPowerProject]] against an independent plain-Scala
  * replication (collect → mean → covariance → power iteration →
  * projection with the same rounding discipline), plus the variance
  * property that makes it a PCA: the fitted direction explains at least
  * as much variance as the initial axis. */
class PcaSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def round6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("matches an independent plain-Scala power-iteration replication") {
    val s = spark
    import s.implicits._
    val rows = graft.Tables.embeddings(s, dir)
      .select("vec_id", "embedding")
      .as[(Long, Array[Float])].collect().sortBy(_._1)
    val d = rows.head._2.length
    val n = rows.length

    val mu = Array.tabulate(d)(i => round6(rows.map(_._2(i).toDouble).sum / n))
    val cent = rows.map { case (_, e) => Array.tabulate(d)(i => e(i).toDouble - mu(i)) }
    val cov = Array.tabulate(d, d)((i, j) =>
      round6(cent.map(c => c(i) * c(j)).sum / n))
    var v = Array.tabulate(d)(i => if (i == 0) 1.0 else 0.0)
    for (_ <- 1 to 4) {
      val w = Array.tabulate(d)(i => (0 until d).map(j => cov(i)(j) * v(j)).sum)
      val m = w.map(math.abs).max
      v = w.map(x => round6(x / m))
    }
    val expected = rows.map { case (id, e) =>
      id -> round6((0 until d).foldLeft(0.0)((acc, k) =>
        acc + (e(k).toDouble - mu(k)) * v(k)))
    }.toMap

    val got = SimilarityOps.pcaPowerProject(
        graft.Tables.embeddings(s, dir), "vec_id", "embedding", iters = 4)
      .as[(Long, Double)].collect().toMap
    assert(got.keySet == expected.keySet)
    got.foreach { case (id, p) =>
      assert(math.abs(p - expected(id)) < 1e-4, s"vec $id: $p vs ${expected(id)}")
    }
  }

  test("the fitted direction explains more variance than the initial axis") {
    val s = spark
    import s.implicits._
    val proj = SimilarityOps.pcaPowerProject(
        graft.Tables.embeddings(s, dir), "vec_id", "embedding", iters = 4)
      .as[(Long, Double)].collect().map(_._2)
    val dim0 = graft.Tables.embeddings(s, dir)
      .select("embedding").as[Array[Float]].collect().map(_(0).toDouble)
    def variance(xs: Array[Double]): Double = {
      val m = xs.sum / xs.length
      xs.map(x => (x - m) * (x - m)).sum / xs.length
    }
    // the power-iterated direction is normalized by max-abs (not unit
    // length, which only shrinks it), so its variance exceeding the raw
    // first axis is a conservative check of "it rotated toward the PC"
    assert(variance(proj) >= variance(dim0),
      s"proj var ${variance(proj)} < axis-0 var ${variance(dim0)}")
  }
}
