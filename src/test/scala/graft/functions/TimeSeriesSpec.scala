package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.Row

/** ACF against known physics: a period-2 alternating series has
  * acf1 ≈ −1 / acf2 ≈ +1, a period-3 cycle peaks at lag 3, constant
  * series (zero variance) drop out, gaps in the grid are real zeros,
  * and the estimator equals a plain-Scala replay in exact milli-unit
  * arithmetic. */
class TimeSeriesSpec extends SparkSpec {

  import spark.implicits._

  private def run(rows: Seq[(String, Long, Double)]) =
    TimeSeries.bucketAcf(rows.toDF("g", "ts", "v"), "g", "ts", "v")
      .collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))).toMap

  test("alternating and period-3 series produce their textbook ACF signs") {
    // all groups span hours 0..19 (the grid uses GLOBAL bounds — the
    // x47 convention — so unequal spans would zero-pad the short ones)
    // g=alt: alternate 10, 0, 10, 0 ... (period 2): acf1 = −19/20,
    // acf2 = +18/20, acf3 = −17/20 EXACTLY (mean 5000 is exact)
    val alt = (0 until 20).map(h => ("alt", h * 3600L, if (h % 2 == 0) 10.0 else 0.0))
    // g=p3: value 9 every 3rd hour (period 3) — lag-3 pairs all match
    // residue class, lags 1/2 are cross-residue and negative-dominated
    val p3 = (0 until 20).map(h => ("p3", h * 3600L, if (h % 3 == 0) 9.0 else 0.0))
    // g=flat: constant over the whole span -> zero variance -> dropped
    val flat = (0 until 20).map(h => ("flat", h * 3600L, 5.0))
    val got = run(alt ++ p3 ++ flat)
    val (nA, a1, a2, a3) = got("alt")
    assert(nA == 20L)
    assert(a1 == -0.95 && a2 == 0.9 && a3 == -0.85, got("alt"))
    val (_, b1, b2, b3) = got("p3")
    assert(b3 > 0.8 && b1 < 0 && b2 < 0, got("p3"))
    assert(!got.contains("flat"), got)
  }

  test("grid gaps are zeros, not skipped rows") {
    // events only at even hours; odd hours must read as 0 for the lag
    // structure to see period 2 (a sparse series would pair hour 0 with
    // hour 2 at lag 1 and report positive correlation instead)
    val g = (0 until 10).map(h => ("s", 2 * h * 3600L, 8.0))
    val got = run(g)
    val (n, a1, a2, _) = got("s")
    assert(n == 19L, got) // hours 0..18 inclusive
    assert(a1 < -0.9 && a2 > 0.85, got)
  }

  test("equals a plain-Scala replay in exact milli-unit arithmetic") {
    // deterministic pseudo-random series over two groups
    var s = 7L
    def next(): Double = { s = s * 6364136223846793005L + 1442695040888963407L
      ((s >>> 33) % 1000L).toDouble / 10.0 }
    val rows = for (g <- Seq("u", "w"); h <- 0 until 30; _ <- 0 until 2)
      yield (g, h * 3600L + (if (g == "u") 7L else 13L), next())
    def replay(vals: Seq[(Long, Double)]): (Double, Double, Double) = {
      val byHr = vals.groupBy(_._1 / 3600L).view
        .mapValues(xs => BigDecimal(xs.map(_._2).sum)
          .setScale(3, BigDecimal.RoundingMode.HALF_UP).toDouble).toMap
      val hrs = byHr.keys.min to byHr.keys.max
      val m = hrs.map(h => math.round(byHr.getOrElse(h, 0.0) * 1000))
      val mu = math.round(m.sum.toDouble / m.size)
      val c = m.map(_ - mu)
      def acf(k: Int) = {
        val num = (k until c.size).map(i => BigInt(c(i)) * BigInt(c(i - k))).sum
        val den = c.map(x => BigInt(x) * BigInt(x)).sum
        BigDecimal(num.toDouble / den.toDouble)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      }
      (acf(1), acf(2), acf(3))
    }
    val got = run(rows)
    Seq("u", "w").foreach { g =>
      val vals = rows.collect { case (`g`, ts, v) => (ts, v) }
      val (e1, e2, e3) = replay(vals)
      val (_, a1, a2, a3) = got(g)
      assert(a1 == e1 && a2 == e2 && a3 == e3,
        s"$g: got ($a1,$a2,$a3) want ($e1,$e2,$e3)")
    }
  }

  test("PACF follows Durbin-Levinson exactly from the rounded ACF values") {
    // the alternating series: r1 = -0.95, r2 = 0.9, r3 = -0.85 exactly
    // (see the ACF test) — hand-run the recursion on those values
    val alt = (0 until 20).map(h => ("alt", h * 3600L, if (h % 2 == 0) 10.0 else 0.0))
    val r = TimeSeries.bucketPacf(alt.toDF("g", "ts", "v"), "g", "ts", "v")
      .collect().head
    val (r1, r2, r3) = (-0.95, 0.9, -0.85)
    val p22 = (r2 - r1 * r1) / (1 - r1 * r1)
    val p21 = r1 * (1 - p22)
    val p33 = (r3 - p21 * r2 - p22 * r1) / (1 - p21 * r1 - p22 * r2)
    assert(r.getDouble(2) == r1, s"pacf1: $r")
    assert(math.abs(r.getDouble(3) - p22) < 1e-6, s"pacf2: $r")
    assert(math.abs(r.getDouble(4) - p33) < 1e-6, s"pacf3: $r")
  }

  test("cross-correlation peaks at the true shift with r = 1") {
    // B is exactly A delayed by 2 hours (same shape, same span):
    // ccf(+2) = 1 up to the edge truncation; every other lag is lower
    val base = Seq(0.0, 10.0, 0.0, 0.0, 8.0, 0.0, 0.0, 0.0, 12.0, 0.0,
      0.0, 6.0, 0.0, 0.0, 0.0, 9.0, 0.0, 0.0, 0.0, 0.0)
    val a = base.zipWithIndex.map { case (v, h) => ("A", h * 3600L, v) }
    val bshift = base.zipWithIndex.map { case (v, h) => ("B", (h + 2) * 3600L, v) }
    val out = TimeSeries.crossCorrelation(
        (a ++ bshift).toDF("g", "ts", "v"), "g", "ts", "v", "A", "B")
      .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
    assert(out.size == 7, s"$out")
    val best = out.maxBy(_._2)
    assert(best._1 == 2, s"peak must sit at lag +2: $out")
    assert(best._2 > 0.8, s"shifted copy must correlate strongly: $out")
  }

  test("changepoint lands on a clean step and reads both means exactly") {
    // 10 days at 2.0/day, then 10 days at 8.0/day — the gain statistic
    // peaks exactly at the boundary (t = 10, i.e. the last day of the
    // low regime; cp_day is that day's index)
    val rows = (0 until 20).map { d =>
      ("step", d * 86400L, if (d < 10) 2.0 else 8.0)
    }
    val r = TimeSeries.changepoint(rows.toDF("g", "ts", "v"), "g", "ts", "v")
      .collect().head
    assert(r.getLong(1) == 20L, s"n_days: $r")
    assert(r.getLong(2) == 9L, s"cp must be the last low day: $r")
    assert(r.getDouble(3) == 2.0 && r.getDouble(4) == 8.0, s"means: $r")
  }

  test("changepoint ties break to the EARLIEST split") {
    // symmetric single-peak series: gains are symmetric around the
    // middle, so the argmax has a mirror twin — t asc must win
    val rows = (0 until 9).map { d =>
      ("sym", d * 86400L, if (d == 4) 10.0 else 0.0)
    }
    val r = TimeSeries.changepoint(rows.toDF("g", "ts", "v"), "g", "ts", "v")
      .collect().head
    assert(r.getLong(2) == 3L, s"mirror tie must resolve to the earlier day: $r")
  }

  test("SAX maps a low→high ramp to a sorted symbol string; flat series drop") {
    // 16 days linear ramp → 8 PAA frames strictly increasing around
    // the mean: first quarter deep-low (a..), last deep-high (..d),
    // and the string is monotone in the alphabet
    val ramp = (0 until 16).map(d => ("ramp", d * 86400L, d.toDouble))
    val flat = (0 until 16).map(d => ("flat", d * 86400L, 5.0))
    val out = TimeSeries.saxSymbols((ramp ++ flat).toDF("g", "ts", "v"),
        "g", "ts", "v")
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getString(2))).toMap
    assert(!out.contains("flat"), "zero-variance series must drop")
    val (n, sax) = out("ramp")
    assert(n == 16L && sax.length == 8, s"$out")
    assert(sax == sax.sorted, s"a ramp's SAX must be alphabet-monotone: $sax")
    assert(sax.startsWith("a") && sax.endsWith("d"), s"tails must hit a/d: $sax")
  }

  test("Haar top details equal a plain-Scala pyramid replay, and a step lands where physics says") {
    // step series: 2.0 for days 0..15, 9.0 for days 16..31 — the ONLY
    // nonzero detail in exact arithmetic is the level-5 root difference
    // (all within-half pairs are equal), so rank 1 must be
    // (level 5, pos 0, 16·2000 − 16·9000 = −112000)
    val step = (0 until 32).map(d => ("step", d * 86400L, if (d < 16) 2.0 else 9.0))
    // a second group with irregular values exercises the generic replay
    val rng = new scala.util.Random(7)
    val wob = (0 until 32).map(d => ("wob", d * 86400L, rng.nextInt(1000) / 10.0))
    val out = TimeSeries.haarTopDetails(
        (step ++ wob).toDF("g", "ts", "v"), "g", "ts", "v")
      .collect()
      .map(r => (r.getString(0), r.getInt(1), r.getInt(2), r.getInt(3), r.getLong(4)))
    val stepTop = out.filter(_._1 == "step").minBy(_._2)
    assert(stepTop == (("step", 1, 5, 0, -112000L)), stepTop)
    // plain-Scala pyramid for the irregular group
    var m = (0 until 32).map(d => math.round(wob(d)._3 * 1000)).toVector
    val all = Seq.newBuilder[(Int, Int, Long)]
    for (l <- 1 to 5) {
      val pairs = m.grouped(2).toVector
      pairs.zipWithIndex.foreach { case (Vector(a, b), p) => all += ((l, p, a - b)) }
      m = pairs.map { case Vector(a, b) => a + b }
    }
    val want = all.result()
      .sortBy { case (l, p, d) => (-math.abs(d), l, p) }.take(5)
      .zipWithIndex.map { case ((l, p, d), i) => ("wob", i + 1, l, p, d) }.toSet
    assert(out.filter(_._1 == "wob").toSet == want,
      s"got ${out.filter(_._1 == "wob").toSet}\nwant $want")
  }
}
