package graft.functions

import graft.SparkSpec

/** [[AbTest.lift]] — degenerate arms must read as NULL, never NaN/Inf,
  * and the happy path must match a hand-computed two-sample readout. */
class AbTestSpec extends SparkSpec {
  import spark.implicits._

  test("zero-variance arms yield NULL z, zero-mean control yields NULL lift") {
    // metric "flat": both arms constant → pooled variance 0 → z NULL
    // metric "zero": control mean 0 → lift NULL (z defined: B varies)
    val events = Seq(
      ("flat", 5.0, "A"), ("flat", 5.0, "A"), ("flat", 7.0, "B"), ("flat", 7.0, "B"),
      ("zero", 0.0, "A"), ("zero", 0.0, "A"), ("zero", 1.0, "B"), ("zero", 3.0, "B")
    ).toDF("metric", "value", "arm")
    val out = AbTest.lift(events, "metric", "value", "arm")
      .collect().map(r => r.getString(0) ->
        (r.isNullAt(5), r.isNullAt(6), r)).toMap

    val (flatLiftNull, flatZNull, flat) = out("flat")
    assert(!flatLiftNull && flatZNull, s"flat: $flat")
    assert(flat.getDouble(4) == 7.0) // mean_b intact

    val (zeroLiftNull, zeroZNull, zero) = out("zero")
    assert(zeroLiftNull && !zeroZNull, s"zero: $zero")
  }

  test("happy path matches the hand-computed z and lift") {
    // A = {1, 3}: mean 2, var 1; B = {4, 8}: mean 6, var 4
    // lift = (6-2)/2 = 2; z = 4 / sqrt(1/2 + 4/2) = 4 / sqrt(2.5)
    val events = Seq(
      ("m", 1.0, "A"), ("m", 3.0, "A"), ("m", 4.0, "B"), ("m", 8.0, "B")
    ).toDF("metric", "value", "arm")
    val r = AbTest.lift(events, "metric", "value", "arm").collect().head
    assert(r.getLong(1) == 2L && r.getLong(2) == 2L)
    assert(r.getDouble(3) == 2.0 && r.getDouble(4) == 6.0)
    assert(r.getDouble(5) == 2.0)
    assert(math.abs(r.getDouble(6) - 4.0 / math.sqrt(2.5)) < 1e-3)
  }

  test("Welch t matches the hand computation, including the Satterthwaite df") {
    // A = {1, 3, 5}: mean 3, s² 4, ra = 4/3
    // B = {10, 14}:  mean 12, s² 8, rb = 8/2 = 4
    // t = 9 / sqrt(16/3); df = (16/3)² / ((4/3)²/2 + 4²/1)
    val events = Seq(
      ("m", 1.0, "A"), ("m", 3.0, "A"), ("m", 5.0, "A"),
      ("m", 10.0, "B"), ("m", 14.0, "B")
    ).toDF("metric", "value", "arm")
    val r = AbTest.welchT(events, "metric", "value", "arm").collect().head
    assert(r.getLong(1) == 3L && r.getLong(2) == 2L)
    val t = 9.0 / math.sqrt(16.0 / 3)
    val df = math.pow(16.0 / 3, 2) /
      (math.pow(4.0 / 3, 2) / 2 + 16.0 / 1)
    assert(math.abs(r.getDouble(5) - t) < 1e-3, s"t: $r")
    assert(math.abs(r.getDouble(6) - df) < 1e-2, s"df: $r")
  }

  test("Welch t: single-element arm reads as NULL t and df, never NaN") {
    val events = Seq(("m", 1.0, "A"), ("m", 4.0, "B"), ("m", 8.0, "B"))
      .toDF("metric", "value", "arm")
    val r = AbTest.welchT(events, "metric", "value", "arm").collect().head
    assert(r.isNullAt(5) && r.isNullAt(6), s"$r")
  }

  test("ANOVA F matches the hand computation; two equal groups give F = 0") {
    // groups {1,3}, {5,7}, {9,11}: k=3, n=6, group means 2/6/10,
    // grand 6; SSB = 2·(16+0+16) = 64, MSB = 32; SSW = 6·2/… each
    // group s²·(n−1) = 2 ⇒ SSW = 6, MSW = 2; F = 16
    val events = Seq(
      ("a", 1.0), ("a", 3.0), ("b", 5.0), ("b", 7.0), ("c", 9.0), ("c", 11.0)
    ).toDF("grp", "value")
    val r = AbTest.anovaF(events, "value", "grp").collect().head
    assert(r.getLong(0) == 3L && r.getLong(1) == 6L)
    assert(math.abs(r.getDouble(2) - 32.0) < 1e-6, s"ms_between: $r")
    assert(math.abs(r.getDouble(3) - 2.0) < 1e-6, s"ms_within: $r")
    assert(math.abs(r.getDouble(4) - 16.0) < 1e-6, s"F: $r")
    assert(r.getLong(5) == 2L && r.getLong(6) == 3L)

    val same = Seq(("a", 1.0), ("a", 5.0), ("b", 1.0), ("b", 5.0))
      .toDF("grp", "value")
    val r2 = AbTest.anovaF(same, "value", "grp").collect().head
    assert(math.abs(r2.getDouble(4)) < 1e-9, s"identical groups must F=0: $r2")
  }
}
