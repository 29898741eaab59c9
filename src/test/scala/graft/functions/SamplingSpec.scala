package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Guards for [[Sampling.mixtureSample]]'s exact-ppm rate arithmetic —
  * the batch oracle queries (x19/x20) cover the happy paths; this spec
  * pins the overflow boundary of `__w · targetRows · ppm`. */
class SamplingSpec extends SparkSpec {

  private def corpus = {
    val s = spark
    import s.implicits._
    (1 to 100).map(i => (i.toLong, if (i % 2 == 0) "web" else "code"))
      .toDF("id", "src")
  }

  test("a weight that would overflow the Long rate product fails loudly") {
    // maxW = Long.MaxValue / (targetRows * ppm) = 9.22e18 / 1e12 ≈ 9.2e6
    val e = intercept[Throwable] {
      Sampling.mixtureSample(corpus, col("id"), col("src"),
          when(col("src") === "web", 10000000L).otherwise(1L),
          targetRows = 1000000L, ppm = 1000000L)
        .count()
    }
    assert(e.getMessage != null && e.getMessage.contains("overflow"),
      s"expected the overflow guard's message, got: ${e.getMessage}")
  }

  test("weighted reservoir: exact size, weight-biased, deterministic, w<=0 excluded") {
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.functions._
    // 100 heavy rows (w=200) among 900 light (w=1), plus ineligible rows
    val df = ((0L until 100L).map(i => (i, 200.0)) ++
      (100L until 1000L).map(i => (i, 1.0)) ++
      Seq((2000L, 0.0), (2001L, -5.0))).toDF("id", "w")
    val pick = Sampling.weightedReservoir(df, col("id"), col("w"), k = 50)
      .as[Long].collect().toSet
    assert(pick.size === 50)
    assert(!pick.contains(2000L) && !pick.contains(2001L))
    // inclusion ∝ weight: the 10% heavy rows must dominate the sample
    val heavy = pick.count(_ < 100L)
    assert(heavy > 35, s"only $heavy/50 heavy rows sampled")
    // content-hash keys: a second run is identical
    val again = Sampling.weightedReservoir(df.repartition(7), col("id"),
      col("w"), k = 50).as[Long].collect().toSet
    assert(again === pick)
  }

  test("grouped reservoir: exact k per group, consistent with the global order") {
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.functions._
    val df = ((0L until 200L).map(i => ("a", i, 1.0 + (i % 3))) ++
      (200L until 230L).map(i => ("b", i, 5.0)) ++
      Seq(("c", 300L, 2.0))).toDF("g", "id", "w")
    val got = Sampling.weightedReservoirByGroup(df, Seq("g"), col("id"),
        col("w"), k = 10)
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2)))
    val byG = got.groupBy(_._1)
    assert(byG("a").length === 10 && byG("b").length === 10)
    assert(byG("c").map(_._3).toSeq === Seq(300L)) // undersized group: all rows
    // within each group, ranks are 1..n and ids are distinct
    byG.foreach { case (_, rows) =>
      assert(rows.map(_._2).sorted.toSeq === (1 to rows.length).toSeq)
      assert(rows.map(_._3).distinct.length === rows.length)
    }
    // group-local selection equals a global reservoir over that group alone
    val aOnly = Sampling.weightedReservoir(df.filter(col("g") === "a"),
      col("id"), col("w"), k = 10).as[Long].collect().toSet
    assert(byG("a").map(_._3).toSet === aOnly)
  }

  test("weighted reservoir with k beyond the eligible rows returns them all") {
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.functions._
    val df = Seq((1L, 2.0), (2L, 3.0), (3L, 0.0)).toDF("id", "w")
    val got = Sampling.weightedReservoir(df, col("id"), col("w"), k = 10)
      .as[Long].collect().toSet
    assert(got === Set(1L, 2L))
  }

  test("the largest admissible weight still yields non-negative exact rates") {
    val maxW = Long.MaxValue / (1000000L * 1000000L) // 9223372
    val out = Sampling.mixtureSample(corpus, col("id"), col("src"),
      when(col("src") === "web", maxW).otherwise(1L),
      targetRows = 1000000L, ppm = 1000000L)
    // the heavy source's product sits just under Long.MaxValue: its rate
    // must saturate at ppm (keep ALL 50 web rows), not wrap negative and
    // silently drop the source ("code" is legitimately downweighted to
    // ~0 by the extreme ratio — that part is the mixture working)
    assert(out.filter(col("src") === "web").count() == 50)
  }
}
