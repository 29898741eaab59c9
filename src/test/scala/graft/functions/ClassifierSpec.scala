package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

import scala.util.Random

/** [[Classifier]] against an INDEPENDENT plain-Scala gradient-descent
  * replay (never the operator itself re-run — systematic bugs would
  * cancel), plus shape/threshold contracts of the scoring projection. */
class ClassifierSpec extends SparkSpec {

  private def round6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  /** DotProductFloat's exact arithmetic: left-to-right, each term a
    * float×float product widened to double. */
  private def dotScala(x: Array[Float], w: Array[Float]): Double = {
    var acc = 0.0
    var i = 0
    while (i < math.min(x.length, w.length)) {
      acc += x(i).toDouble * w(i).toDouble; i += 1
    }
    acc
  }

  private def sigmoid6(z: Double): Double = round6(1.0 / (1.0 + math.exp(-z)))

  /** Reference fit: same prepended intercept, float-cast weights into the
    * margin fold, round-6 margin/sigmoid/gradient/step — written
    * independently over plain Scala collections. */
  private def gdScala(rows: Seq[(Array[Float], Double)], iters: Int,
                      lr: Double): Array[Double] = {
    val xs = rows.map { case (v, y) => (1.0f +: v, y) }
    val d = xs.head._1.length
    var w = Array.fill(d)(0.0)
    for (_ <- 1 to iters) {
      val wf = w.map(_.toFloat)
      val resid = xs.map { case (x, y) => (x, sigmoid6(round6(dotScala(x, wf))) - y) }
      val g = Array.tabulate(d) { j =>
        round6(resid.map { case (x, r) => r * x(j).toDouble }.sum / resid.length)
      }
      w = Array.tabulate(d)(j => round6(w(j) - lr * g(j)))
    }
    w
  }

  /** Linearly-separable-ish corpus: two gaussian blobs, labels by blob. */
  private def corpus(n: Int, dims: Int, seed: Long): Seq[(Long, Array[Float], Int)] = {
    val rnd = new Random(seed)
    (0L until n).map { id =>
      val pos = id % 2 == 0
      val center = if (pos) 0.4f else -0.4f
      val v = Array.fill(dims)(center + rnd.nextGaussian().toFloat * 0.5f)
      (id, v, if (pos) 1 else 0)
    }
  }

  test("logisticFit equals an independent plain-Scala gradient replay") {
    val s = spark
    import s.implicits._
    val data = corpus(n = 120, dims = 6, seed = 42)
    val df = data.toDF("vec_id", "embedding", "label")
    val expected = gdScala(
      data.map { case (_, v, l) => (v, l.toDouble) }, iters = 5, lr = 1.0)

    val got = Classifier.logisticFit(df, "embedding", col("label") === 1,
      iters = 5, lr = 1.0)

    assert(got.length == expected.length)
    got.zip(expected).zipWithIndex.foreach { case ((g, e), j) =>
      assert(g == e, s"w($j): $g vs $e")
    }
  }

  test("scores match the frozen-weight replay and the threshold gate") {
    val s = spark
    import s.implicits._
    val data = corpus(n = 120, dims = 6, seed = 7)
    val df = data.toDF("vec_id", "embedding", "label")
    val w = Classifier.logisticFit(df, "embedding", col("label") === 1,
      iters = 5, lr = 1.0)
    val wf = w.map(_.toFloat)

    val got = Classifier.logisticScore(df, "vec_id", "embedding", w,
        threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getBoolean(2))).toSeq

    assert(got.size == data.size)
    val byId = data.map(t => t._1 -> t._2).toMap
    got.foreach { case (id, score, keep) =>
      val exp = sigmoid6(round6(dotScala(1.0f +: byId(id), wf)))
      assert(score == exp, s"score($id): $score vs $exp")
      assert(keep == (score >= 0.5))
    }
  }

  test("the fit separates separable blobs (training accuracy)") {
    val s = spark
    import s.implicits._
    val data = corpus(n = 200, dims = 6, seed = 11)
    val df = data.toDF("vec_id", "embedding", "label")
    val scored = Classifier.fitScore(df, "vec_id", "embedding",
      col("label") === 1, iters = 8, lr = 1.0, threshold = 0.5)
    val labels = data.map(t => t._1 -> (t._3 == 1)).toMap
    val acc = scored.collect()
      .count(r => r.getBoolean(2) == labels(r.getLong(0))).toDouble / data.size
    assert(acc >= 0.9, s"training accuracy $acc below 0.9 on separable blobs")
  }

  test("iters = 0 returns the zero init and scores everything at 0.5") {
    val s = spark
    import s.implicits._
    val data = corpus(n = 20, dims = 4, seed = 3)
    val df = data.toDF("vec_id", "embedding", "label")
    val w = Classifier.logisticFit(df, "embedding", col("label") === 1,
      iters = 0, lr = 0.5)
    assert(w.length == 5 && w.forall(_ == 0.0))
    val scores = Classifier.logisticScore(df, "vec_id", "embedding", w,
      threshold = 0.5).select("score").collect().map(_.getDouble(0))
    assert(scores.forall(_ == 0.5))
  }

  test("non-representable learning rates are rejected") {
    val s = spark
    import s.implicits._
    val df = corpus(n = 4, dims = 2, seed = 1).toDF("vec_id", "embedding", "label")
    intercept[IllegalArgumentException] {
      Classifier.logisticFit(df, "embedding", col("label") === 1,
        iters = 1, lr = 0.3)
    }
  }
}
