package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Kaplan-Meier pinned three ways: a hand-computed textbook curve
  * (exact fractions), the censoring semantics of lifetimes(), and a
  * randomized plain-Scala replay of the product-limit fold (same
  * rounded-log discipline, independent code path over plain Maps). */
class SurvivalSpec extends SparkSpec {

  private def km(rows: Seq[(Long, Int)]): Map[Long, (Long, Long, Long, Double)] = {
    val s = spark
    import s.implicits._
    Survival.kaplanMeier(rows.toDF("duration", "churn"))
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
      .toMap
  }

  test("hand-computed textbook curve with interleaved censoring") {
    // 6 users: churn at 1 (x2), censor at 2, churn at 3, churn+censor at 5
    val got = km(Seq((1L, 1), (1L, 1), (2L, 0), (3L, 1), (5L, 1), (5L, 0)))
    // S(1) = 1 - 2/6 = 2/3; S(2) unchanged (censor only);
    // S(3) = 2/3 * 2/3 = 4/9; S(5) = 4/9 * 1/2 = 2/9
    assert(got(1L) == ((6L, 2L, 0L, 0.666667)))
    assert(got(2L) == ((4L, 0L, 1L, 0.666667)))
    assert(got(3L) == ((3L, 1L, 0L, 0.444444)))
    assert(got(5L) == ((2L, 1L, 1L, 0.222222)))
  }

  test("all-remaining-churn last step pins S to exact 0") {
    val got = km(Seq((1L, 1), (2L, 1)))
    assert(got(1L) == ((2L, 1L, 0L, 0.5)))
    assert(got(2L) == ((1L, 1L, 0L, 0.0)))
  }

  test("lifetimes: censoring is horizon-relative to the corpus max day") {
    val s = spark
    import s.implicits._
    // user 1: days 0..10 (dur 10, last day = max day -> censored)
    // user 2: days 0..2  (dur 2, last day 8 before max -> churned)
    // user 3: day 10 only (dur 0, censored)
    val ev = Seq(
      (1L, 0L * 86400), (1L, 10L * 86400),
      (2L, 0L * 86400), (2L, 2L * 86400 + 7200),
      (3L, 10L * 86400 + 3600)).toDF("user_id", "ts_sec")
    val got = Survival.lifetimes(ev, "user_id", "ts_sec", horizonDays = 7)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getInt(2))).toMap
    assert(got(1L) == ((10L, 0)))
    assert(got(2L) == ((2L, 1)))
    assert(got(3L) == ((0L, 0)))
  }

  test("randomized agreement with a plain-Scala product-limit replay") {
    val rnd = new scala.util.Random(1958)
    for (round <- 1 to 5) {
      val rows = Vector.fill(40 + rnd.nextInt(60))(
        (rnd.nextInt(12).toLong, if (rnd.nextInt(3) == 0) 0 else 1))
      val got = km(rows)
      // independent replay: sorted duration scan over count maps
      val byDur = rows.groupBy(_._1).map { case (t, g) =>
        t -> (g.count(_._2 == 1).toLong, g.count(_._2 == 0).toLong)
      }
      var atRisk = rows.size.toLong
      var lnSum = 0.0
      var dead = false
      for (t <- byDur.keys.toSeq.sorted) {
        val (d, c) = byDur(t)
        val want =
          if (dead || d == atRisk) { dead = true; 0.0 }
          else {
            lnSum += BigDecimal(math.log((atRisk - d).toDouble / atRisk))
              .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
            BigDecimal(math.exp(lnSum))
              .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
          }
        val (gotRisk, gotD, gotC, gotS) = got(t)
        assert(gotRisk == atRisk && gotD == d && gotC == c, s"counts at t=$t")
        assert(gotS == want, s"S at t=$t round $round: got $gotS want $want")
        atRisk -= d + c
      }
    }
  }
}
