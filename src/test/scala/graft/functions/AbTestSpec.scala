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
}
