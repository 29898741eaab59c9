package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Classifier-based quality filtering — the FineWeb-Edu / DCLM curation
  * shape: fit a tiny logistic scorer over an embedding column against a
  * binary label, then score (and gate) the corpus with the frozen weights.
  *
  * Reference scope: the reference app has no model-fitting surface
  * (`/root/reference/src/main/scala/com/ayoubom/kafka` is a Kafka Streams
  * DSL topology); this operator belongs to the LLM-pipeline extension
  * surface, alongside [[SimilarityOps.kmeansFit]] whose conventions it
  * follows.
  *
  * Engine-portable by construction, so a SQL oracle can replay the exact
  * fit trajectory (the `kmeansFit`/`pcaPowerProject` discipline):
  *
  *  - the feature vector is the embedding with a constant 1.0f intercept
  *    slot PREPENDED (`list_prepend` on the oracle side), so bias and
  *    weights update through one code path;
  *  - the margin `z` is the codegen'd left-to-right double fold
  *    ([[graft.expressions.DotProductFloat]]) of the float features
  *    against the float-cast weights, rounded to 6 places;
  *  - the probability is `round(1/(1+exp(-z)), 6)` — rounding z before
  *    and p after the sigmoid absorbs last-ulp `exp` differences between
  *    JVM `Math.exp` and the oracle engine's libm;
  *  - each gradient component is `round(avg((p - y) * x_j), 6)` — the
  *    established "sums of ≤1000 doubles round safely at 6" convention;
  *  - the weight step `round(w_j - lr*g_j, 6)` runs on the driver with
  *    the same HALF_UP decimal rounding Spark's `round` uses, and `lr`
  *    must be exactly representable in binary (0.25/0.5/1.0/2.0) so the
  *    multiply is the identical IEEE op on both engines.
  *
  * Scale shape: weight state lives on the driver (d+1 doubles — bounded,
  * the `kmeansFit` small-state contract) and each fit round is exactly
  * ONE Spark job: a map-side sigmoid + residual projection feeding a
  * posexplode gradient aggregation whose shuffle carries at most
  * (d+1) rows per partition (partial avg). The corpus is never exchanged
  * and the plan never deepens — weights enter each round as literals, so
  * round N's plan is the same two-node shape as round 1's. Scoring is a
  * ZERO-SHUFFLE map-side projection (plan-guarded): on a 100 TB corpus,
  * fit on a sample (`vecs.filter(...)` — gradient means don't need the
  * population) and score the full corpus in one embarrassingly-parallel
  * pass.
  */
object Classifier {

  private def round6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  /** Features with the intercept slot prepended: array(1.0f) ++ vec. */
  private def features(vecCol: Column): Column =
    concat(array(lit(1.0f)), vecCol)

  /** Rounded margin of float features against float-cast literal weights:
    * `round(dot(x, wF), 6)` with the strict left-to-right double fold. */
  private def marginExpr(xCol: Column, w: Array[Double]): Column =
    round(SimilarityOps.dot(xCol, typedLit(w.map(_.toFloat))), 6)

  /** Rounded sigmoid of the rounded margin. */
  private def sigmoidExpr(z: Column): Column =
    round(lit(1.0) / (lit(1.0) + exp(-z)), 6)

  /** Full-batch gradient-descent logistic fit. Returns the d+1 weight
    * vector (index 0 = bias) after `iters` rounds from the zero init.
    *
    * `labelExpr` must evaluate to a boolean (the positive class);
    * `lr` must be exactly binary-representable (enforced) so the update
    * arithmetic cannot fork between engines.
    */
  def logisticFit(vecs: DataFrame, vecCol: String, labelExpr: Column,
                  iters: Int, lr: Double): Array[Double] = {
    require(iters >= 0, s"need iters >= 0, got $iters")
    require(Seq(0.125, 0.25, 0.5, 1.0, 2.0, 4.0).contains(lr),
      s"lr=$lr is not one of the exactly-representable step sizes " +
        "(0.125/0.25/0.5/1.0/2.0/4.0) the cross-engine contract allows")
    // One projection, checkpointed once: every fit round re-scans it
    val v = vecs
      .select(features(col(vecCol)).as("xv"),
        labelExpr.cast("double").as("y"))
      .localCheckpoint(true)
    val d = v.select(size(col("xv"))).head().getInt(0)
    var w = Array.fill(d)(0.0)
    var i = 0
    while (i < iters) {
      // ONE job per round: residual is map-side, gradient is a bounded
      // (d+1)-group partial-aggregating avg, collect is d+1 rows
      val g = v
        .select((sigmoidExpr(marginExpr(col("xv"), w)) - col("y")).as("r"),
          posexplode(col("xv")))
        .groupBy("pos")
        .agg(round(avg(col("r") * col("col").cast("double")), 6).as("g"))
        .collect()
        .map(r => r.getInt(0) -> r.getDouble(1)).toMap
      w = w.zipWithIndex.map { case (wj, j) =>
        round6(wj - lr * g.getOrElse(j, 0.0))
      }
      i += 1
    }
    org.apache.spark.sql.GraftShims.unpersistLocalCheckpoint(v)
    w
  }

  /** Score a corpus with frozen weights: (id, score, keep). Pure
    * map-side projection — zero shuffles (plan-guarded), the shape that
    * makes classifier gating free at 100 TB. */
  def logisticScore(vecs: DataFrame, idCol: String, vecCol: String,
                    w: Array[Double], threshold: Double): DataFrame =
    vecs.select(
        col(idCol),
        sigmoidExpr(marginExpr(features(col(vecCol)), w)).as("score"))
      .withColumn("keep", col("score") >= threshold)

  /** Fit + score in one call — the s13 composition. */
  def fitScore(vecs: DataFrame, idCol: String, vecCol: String,
               labelExpr: Column, iters: Int, lr: Double,
               threshold: Double): DataFrame =
    logisticScore(vecs, idCol, vecCol,
      logisticFit(vecs, vecCol, labelExpr, iters, lr), threshold)

  /** Exact ROC AUC via the rank-sum identity AUC = U / (n₁·n₀) — the
    * probability a random positive outscores a random negative, with
    * ties at half credit. Computed on the micro-unit score HISTOGRAM
    * with DOUBLED average ranks (the mannWhitney discipline): every
    * quantity is an exact integer until the single final division, so
    * the number cannot fork on float order. The window runs over
    * |distinct scores| rows, never raw rows. */
  def aucFromScores(scored: DataFrame, scoreCol: String,
                    labelCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val h = scored
      .select(round(col(scoreCol) * 1e6).cast("long").as("su"),
        col(labelCol).cast("int").as("y"))
      .groupBy("su").agg(
        sum("y").cast("long").as("c1"),
        sum(lit(1) - col("y")).cast("long").as("c0"))
    val w = Window.orderBy(col("su").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // doubled average rank of a tie block = 2·(ranks before) + cnt + 1
    val ranked = h
      .withColumn("cumall", sum(col("c1") + col("c0")).over(w))
      .select(col("c1"), col("c0"),
        (lit(2L) * (col("cumall") - col("c1") - col("c0")) +
          (col("c1") + col("c0")) + lit(1L)).as("dr"))
    ranked.agg(
        sum("c1").as("n1"), sum("c0").as("n0"),
        sum(col("c1").cast("decimal(38,0)") * col("dr")).as("r1d"))
      .select(col("n1"), col("n0"),
        round((col("r1d").cast("double") -
            col("n1").cast("double") * (col("n1") + 1L).cast("double")) /
          (lit(2.0) * col("n1").cast("double") * col("n0").cast("double")), 6)
          .as("auc"))
  }

  /** Isotonic (PAVA) calibration over score buckets, via the minimax
    * identity instead of the sequential pool-adjacent-violators stack:
    *
    *   iso(k) = max_{i ≤ k} min_{j ≥ k} (Σ pos[i..j]) / (Σ n[i..j])
    *
    * — the closed form of the weighted isotonic fit (Robertson, Wright
    * & Dykstra 1988, §1.2), which is pure relational algebra: interval
    * means from prefix sums, then a min and a max over bucket-keyed
    * joins. The input is the CALIBRATION TABLE (one row per score
    * bucket, e.g. c7's), so every frame here is |buckets|-sized —
    * the O(B³) pair lattice is 1000 rows at B = 10 and never touches
    * the raw corpus; exact integer prefix sums mean both engines
    * compare identical doubles. Output adds `iso_rate`, the
    * non-decreasing calibrated rate per bucket. */
  def isotonicCalibration(stats: DataFrame, bucketCol: String,
                          nCol: String, posCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.orderBy(col("b").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val pre = stats.select(col(bucketCol).as("b"),
        col(nCol).as("n"), col(posCol).as("pos"))
      .withColumn("cp", sum("pos").over(w))
      .withColumn("cn", sum("n").over(w))
    val i = pre.select(col("b").as("bi"), col("pos").as("pi"),
      col("n").as("ni"), col("cp").as("cpi"), col("cn").as("cni"))
    val j = pre.select(col("b").as("bj"), col("cp").as("cpj"),
      col("cn").as("cnj"))
    val iv = i.join(j, col("bi") <= col("bj"))
      .select(col("bi"), col("bj"),
        ((col("cpj") - col("cpi") + col("pi")).cast("double") /
          (col("cnj") - col("cni") + col("ni")).cast("double")).as("mean_ij"))
    val inner = iv
      .join(pre.select(col("b").as("bk")),
        col("bi") <= col("bk") && col("bj") >= col("bk"))
      .groupBy("bi", "bk").agg(min("mean_ij").as("mn"))
    val iso = inner.groupBy(col("bk").as("b"))
      .agg(max("mn").as("iso"))
    pre.select(col("b").as(bucketCol), col("n").as(nCol),
        col("pos").as(posCol))
      .join(iso.select(col("b").as(bucketCol), col("iso")), bucketCol)
      .select(col(bucketCol), col(nCol), col(posCol),
        round(col(posCol).cast("double") / col(nCol).cast("double"), 6)
          .as("pos_rate"),
        round(col("iso"), 6).as("iso_rate"))
  }
}
