package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Zipf OLS fit, quality tiers, and MinHash calibration invariants. */
class CorpusStatsSpec extends SparkSpec {

  import spark.implicits._

  test("t16 zipf OLS matches an independent least-squares fit") {
    val got = graft.SparkEntry.queries("t16_zipf")(spark, "/root/testdata/sf0.001")
      .collect().head
    val (n, slope, intercept) = (got.getLong(0), got.getDouble(1), got.getDouble(2))
    // independent fit in plain Scala over the same corpus
    val toks = graft.Tables.documents(spark, "/root/testdata/sf0.001")
      .select(explode(TextAnalysis.tokens(col("text"))).as("w"))
      .groupBy("w").count().collect().map(r => (r.getString(0), r.getLong(1)))
    val ranked = toks.sortBy { case (w, c) => (-c, w) }.take(1000).zipWithIndex
    val pts = ranked.map { case ((_, c), i) => (math.log(i + 1.0), math.log(c.toDouble)) }
    val m = pts.length.toDouble
    val (sx, sy) = (pts.map(_._1).sum, pts.map(_._2).sum)
    val sxy = pts.map(p => p._1 * p._2).sum
    val sxx = pts.map(p => p._1 * p._1).sum
    val expSlope = (m * sxy - sx * sy) / (m * sxx - sx * sx)
    assert(n == pts.length)
    assert(math.abs(slope - expSlope) < 1e-4, s"$slope vs $expSlope")
    assert(math.abs(intercept - (sy - expSlope * sx) / m) < 1e-4)
  }

  test("x33 tiers: monotone in quality, equal scores share a tier, 1..4 only") {
    val rows = graft.SparkEntry.queries("x33_quality_tiers")(spark, "/root/testdata/sf0.001")
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2)))
    assert(rows.nonEmpty && rows.forall(r => r._3 >= 1 && r._3 <= 4))
    val byScore = rows.groupBy(_._2).map { case (q, rs) => q -> rs.map(_._3).toSet }
    assert(byScore.values.forall(_.size == 1), "equal scores split across tiers")
    val ordered = byScore.toSeq.sortBy(_._1).map(_._2.head)
    assert(ordered.zip(ordered.tail).forall { case (a, b) => a <= b }, "tiers not monotone")
  }

  test("s8 cluster quality: cells partition the corpus, margins non-negative") {
    val rows = SimilarityOps.clusterQuality(
        graft.Tables.embeddings(spark, "/root/testdata/sf0.001"),
        "vec_id", "embedding", k = 4, iters = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    val total = graft.Tables.embeddings(spark, "/root/testdata/sf0.001").count()
    assert(rows.map(_._2).sum == total, "cells must partition the corpus")
    assert(rows.forall(_._3 <= 1.000001), "cohesion is a cosine mean")
    // assigned cell is the argmax ⇒ own-sim ≥ best-other up to the
    // 1e-6 rounding the encoded score quantizes at
    assert(rows.forall(_._4 >= -1e-6), s"negative margin: ${rows.mkString(",")}")
  }

  test("d16 calibration: identical docs estimate 1.0 with zero error") {
    val docs = Seq(
      (0L, "a1 a2 a3 a4 a5 a6 a7 a8"),
      (1L, "a1 a2 a3 a4 a5 a6 a7 a8"), // exact copy — LSH must pair, est = exact = 1
      (2L, "z1 z2 z3 z4 z5 z6 z7 z8")
    ).toDF("doc_id", "text")
    val sigs = DedupOps.minhashSignatures(docs, "doc_id", "text", 12)
    val pairs = DedupOps.lshCandidatePairs(DedupOps.lshBands(sigs, 12, 3))
    val la = sigs.toDF(sigs.columns.map(c => if (c == "doc_id") "a" else s"a_$c"): _*)
    val lb = sigs.toDF(sigs.columns.map(c => if (c == "doc_id") "b" else s"b_$c"): _*)
    val agree = (0 until 12)
      .map(i => when(col(s"a_mh$i") === col(s"b_mh$i"), 1).otherwise(0))
      .reduce(_ + _)
    val est = pairs.join(la, "a").join(lb, "b")
      .select(col("a"), col("b"), (agree.cast("double") / 12.0).as("est"))
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    assert(est.contains((0L, 1L)) && est((0L, 1L)) == 1.0)
    assert(!est.contains((0L, 2L)) && !est.contains((1L, 2L)))
  }
}
