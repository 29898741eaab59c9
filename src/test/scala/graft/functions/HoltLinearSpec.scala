package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** [[TimeSeries.holtLinear]] — the distributed fold must equal a plain
  * Scala replay of the recursion on the real events table, short series
  * are dropped, and known level/trend physics hold. */
class HoltLinearSpec extends SparkSpec {

  import spark.implicits._

  // init (l₁ = y₁, b₁ = y₂ − y₁), then the recursion consumes y₂..y_n
  // (folding y₂ from this init is the fixed point (y₂, y₂ − y₁) — same
  // convention as the operator and the recursive-CTE oracle)
  private def replay(ys: Seq[Double], alpha: Double, beta: Double): (Double, Double) =
    ys.drop(1).foldLeft((ys.head, ys(1) - ys.head)) { case ((l, b), y) =>
      val nl = alpha * y + (1.0 - alpha) * (l + b)
      (nl, beta * (nl - l) + (1.0 - beta) * b)
    }

  test("fold ≡ plain-Scala recursion replay over the real events table") {
    val ev = graft.Tables.events(spark, "/root/testdata/sf0.001")
    val got = TimeSeries.holtLinear(ev, "event_type", "ts", "value")
      .collect().map(r => r.getString(0) ->
        (r.getInt(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))).toMap
    // independent daily series: floor'd centi-units, day-truncated
    val series = ev
      .select(col("event_type"), date_trunc("day", col("ts")).as("d"),
        floor(col("value") * 100).cast("long").as("cu"))
      .groupBy("event_type", "d").agg(sum("cu").as("mu"))
      .collect()
      .map(r => (r.getString(0), r.getTimestamp(1).getTime, r.getLong(2)))
      .groupBy(_._1)
      .map { case (k, rows) => k -> rows.sortBy(_._2).map(_._3.toDouble).toSeq }
    val want = series.filter(_._2.size >= 2).map { case (k, ys) =>
      val (l, b) = replay(ys, 0.5, 0.25)
      k -> (ys.size, math.rint(l / 100.0 * 1e6) / 1e6,
        math.rint(b / 100.0 * 1e6) / 1e6, math.rint((l + b) / 100.0 * 1e6) / 1e6)
    }
    assert(got.keySet === want.keySet)
    want.foreach { case (k, (n, l, b, f)) =>
      val (gn, gl, gb, gf) = got(k)
      assert(gn === n, s"$k n_days")
      assert(math.abs(gl - l) < 1e-9, s"$k level $gl vs $l")
      assert(math.abs(gb - b) < 1e-9, s"$k trend $gb vs $b")
      assert(math.abs(gf - f) < 1e-9, s"$k forecast $gf vs $f")
    }
  }

  test("groups with fewer than two observed days are dropped") {
    val one = Seq(("a", java.sql.Timestamp.valueOf("2024-01-01 10:00:00"), 5.0),
      ("b", java.sql.Timestamp.valueOf("2024-01-01 10:00:00"), 1.0),
      ("b", java.sql.Timestamp.valueOf("2024-01-02 10:00:00"), 2.0))
      .toDF("g", "ts", "v")
    val got = TimeSeries.holtLinear(one, "g", "ts", "v")
      .select("g").as[String].collect().toSet
    assert(got === Set("b"))
  }

  test("constant series: level = the constant, trend = 0, forecast = level") {
    val flat = (1 to 10).map(d =>
      ("c", java.sql.Timestamp.valueOf(f"2024-01-$d%02d 00:00:00"), 7.0))
      .toDF("g", "ts", "v")
    val r = TimeSeries.holtLinear(flat, "g", "ts", "v").collect().head
    assert(r.getDouble(2) === 7.0)
    assert(r.getDouble(3) === 0.0)
    assert(r.getDouble(4) === 7.0)
  }

  test("perfect linear ramp: trend converges to the slope, forecast extrapolates") {
    // y_d = 10 + 3d: Holt with ANY weights tracks an exact linear
    // series perfectly once initialized on it (l_t = y_t, b_t = slope
    // is a fixed point of the recursion)
    val ramp = (1 to 12).map(d =>
      ("r", java.sql.Timestamp.valueOf(f"2024-02-$d%02d 00:00:00"), 10.0 + 3.0 * d))
      .toDF("g", "ts", "v")
    val r = TimeSeries.holtLinear(ramp, "g", "ts", "v").collect().head
    assert(r.getDouble(2) === 10.0 + 3.0 * 12, "level = last observation")
    assert(r.getDouble(3) === 3.0, "trend = slope")
    assert(r.getDouble(4) === 10.0 + 3.0 * 13, "forecast = next point")
  }

  test("weight validation") {
    val df = Seq(("a", java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), 1.0))
      .toDF("g", "ts", "v")
    intercept[IllegalArgumentException] {
      TimeSeries.holtLinear(df, "g", "ts", "v", alpha = 0.0)
    }
    intercept[IllegalArgumentException] {
      TimeSeries.holtLinear(df, "g", "ts", "v", beta = 1.5)
    }
  }
}
