package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** [[SimilarityOps.jlProject]] — exactness against a plain-Scala replay
  * of the quantize→sign-fold pipeline, the ragged-row contract, and the
  * Johnson–Lindenstrauss property itself: projected squared distances
  * (scaled by dim/dimOut) track true squared distances on real
  * embeddings. */
class JlProjectSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def signs(dim: Int, dimOut: Int): Array[Array[Long]] =
    Array.tabulate(dimOut, dim) { (j, i) =>
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s"$i:$j".getBytes("UTF-8")).map("%02x".format(_)).mkString
      1L - 2L * (java.lang.Long.parseLong(hex.substring(0, 15), 16) % 2L)
    }

  test("projection ≡ plain-Scala replay on the real embeddings") {
    val emb = graft.Tables.embeddings(spark, dir)
    val got = SimilarityOps.jlProject(emb, "vec_id", "embedding", 64, 16)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toVector).toMap
    val s = signs(64, 16)
    val raw = emb.select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray)
    assert(raw.nonEmpty)
    raw.foreach { case (id, v) =>
      val q = v.map(x => BigDecimal(x.toDouble * 1000)
        .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong)
      val want = (0 until 16).map(j =>
        (0 until 64).map(i => q(i) * s(j)(i)).sum).toVector
      assert(got(id) === want, s"vec $id")
    }
  }

  test("JL property: distance fidelity grows with k, estimator unbiased (deterministic physics)") {
    val emb = graft.Tables.embeddings(spark, dir)
      .filter(col("vec_id") < 60)
    val raw = emb.select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble * 1000).toArray)
      .toMap
    val ids = raw.keys.toSeq.sorted
    val pairs = for (a <- ids; b <- ids if a < b) yield (a, b)
    def d2(x: Array[Double], y: Array[Double]) =
      x.zip(y).map { case (u, v) => (u - v) * (u - v) }.sum
    def corr(x: Seq[Double], y: Seq[Double]): Double = {
      val n = x.size; val mx = x.sum / n; val my = y.sum / n
      val cov = x.zip(y).map { case (a, b) => (a - mx) * (b - my) }.sum
      val sx = math.sqrt(x.map(a => (a - mx) * (a - mx)).sum)
      val sy = math.sqrt(y.map(b => (b - my) * (b - my)).sum)
      cov / (sx * sy)
    }
    val t = pairs.map { case (a, b) => d2(raw(a), raw(b)) }
    def projStats(k: Int): (Double, Double) = {
      val proj = SimilarityOps.jlProject(emb, "vec_id", "embedding", 64, k)
        .collect().map(r => r.getLong(0) ->
          r.getSeq[Long](1).map(_.toDouble).toArray).toMap
      val p = pairs.map { case (a, b) => d2(proj(a), proj(b)) / k }
      (corr(t, p), p.sum / t.sum)
    }
    // the matrix and data are both deterministic, so these are fixed
    // numbers, not flaky samples: fidelity rises with k (JL), and the
    // |Px|²/k estimator of |x|² stays unbiased at every k
    val (c16, r16) = projStats(16)
    val (c64, r64) = projStats(64)
    assert(c16 > 0.25, s"k=16 lost all geometry: corr=$c16")
    assert(c64 > 0.5, s"k=64 should track distances: corr=$c64")
    assert(c64 > c16, s"fidelity must grow with k: $c16 vs $c64")
    Seq(r16 -> 16, r64 -> 64).foreach { case (r, k) =>
      assert(r > 0.5 && r < 2.0, s"k=$k estimator scale off: $r")
    }
  }

  test("ragged rows are rejected, not mis-projected") {
    val s = spark
    import s.implicits._
    val mixed = Seq(
      (1L, Array.fill(64)(1.0f)), (2L, Array.fill(63)(1.0f)))
      .toDF("vec_id", "embedding")
    val out = SimilarityOps.jlProject(mixed, "vec_id", "embedding", 64, 16)
      .select("vec_id").as[Long].collect().toSet
    assert(out === Set(1L))
    intercept[IllegalArgumentException] {
      SimilarityOps.jlProject(mixed, "vec_id", "embedding", 64, 128)
    }
  }
}
