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

  test("AUC: perfect separation = 1, all-tied scores = 0.5, hand case exact") {
    val s = spark
    import s.implicits._
    def auc(rows: Seq[(Double, Int)]): Double =
      Classifier.aucFromScores(rows.toDF("score", "y"), "score", "y")
        .collect().head.getDouble(2)
    assert(auc(Seq((0.9, 1), (0.8, 1), (0.2, 0), (0.1, 0))) == 1.0)
    assert(auc(Seq((0.5, 1), (0.5, 1), (0.5, 0), (0.5, 0))) == 0.5)
    assert(auc(Seq((0.9, 0), (0.8, 0), (0.2, 1), (0.1, 1))) == 0.0)
    // positives {0.8, 0.4}, negatives {0.6, 0.2}: pairs won = 3 of 4
    assert(auc(Seq((0.8, 1), (0.4, 1), (0.6, 0), (0.2, 0))) == 0.75)
    // one tie across classes at 0.6 → half credit: (2 + 0.5 + 1)/4
    assert(auc(Seq((0.8, 1), (0.6, 1), (0.6, 0), (0.2, 0))) == 0.875)
  }

  test("isotonic minimax pools adjacent violators exactly like PAVA") {
    val s = spark
    import s.implicits._
    // equal-weight rates 0.1, 0.5, 0.3, 0.7: buckets 1 and 2 violate
    // monotonicity and pool to (5+3)/20 = 0.4; ends stay untouched
    val stats = Seq((0, 10L, 1L), (1, 10L, 5L), (2, 10L, 3L), (3, 10L, 7L))
      .toDF("bucket", "n", "pos")
    val out = Classifier.isotonicCalibration(stats, "bucket", "n", "pos")
      .collect().map(r => r.getInt(0) -> r.getDouble(4)).toMap
    assert(out == Map(0 -> 0.1, 1 -> 0.4, 2 -> 0.4, 3 -> 0.7), s"$out")
  }

  test("isotonic minimax: weighted pooling and a full-decreasing collapse") {
    val s = spark
    import s.implicits._
    // weighted violators: (n=10, 0.8) then (n=30, 0.4) pool to
    // (8+12)/40 = 0.5
    val wtd = Seq((0, 10L, 8L), (1, 30L, 12L)).toDF("bucket", "n", "pos")
    val w = Classifier.isotonicCalibration(wtd, "bucket", "n", "pos")
      .collect().map(r => r.getInt(0) -> r.getDouble(4)).toMap
    assert(w == Map(0 -> 0.5, 1 -> 0.5), s"$w")

    // strictly decreasing input collapses to the single grand mean
    val dec = Seq((0, 10L, 9L), (1, 10L, 6L), (2, 10L, 3L))
      .toDF("bucket", "n", "pos")
    val d = Classifier.isotonicCalibration(dec, "bucket", "n", "pos")
      .collect().map(r => r.getDouble(4)).distinct
    assert(d.sameElements(Array(0.6)), s"${d.toSeq}")
  }

  test("isotonic output is always non-decreasing and mean-preserving on a random table") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(7)
    val stats = (0 until 12).map(b => (b, 5L + rnd.nextInt(20),
      rnd.nextInt(5).toLong)).map { case (b, n, p) => (b, n, math.min(p, n)) }
      .toDF("bucket", "n", "pos")
    val rows = Classifier.isotonicCalibration(stats, "bucket", "n", "pos")
      .orderBy("bucket").collect()
    val iso = rows.map(_.getDouble(4))
    assert(iso.zip(iso.tail).forall { case (a, b) => a <= b },
      s"must be non-decreasing: ${iso.toSeq}")
    // weighted mean of iso equals the overall positive rate (PAVA is a
    // projection: block means preserve the weighted total)
    val n = rows.map(_.getLong(1)).sum
    val pos = rows.map(_.getLong(2)).sum
    val wmean = rows.map(r => r.getLong(1) * r.getDouble(4)).sum / n
    assert(math.abs(wmean - pos.toDouble / n) < 1e-4,
      s"mean preservation: $wmean vs ${pos.toDouble / n}")
  }
}
