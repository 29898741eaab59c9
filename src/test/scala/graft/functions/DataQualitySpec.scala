package graft.functions

import graft.SparkSpec
import graft.functions.DataQuality.{Check, report}
import org.apache.spark.sql.functions._

/** [[DataQuality.report]] — constraint semantics on crafted rows and
  * the one-pass plan claim. */
class DataQualitySpec extends SparkSpec {

  private lazy val df = {
    import spark.implicits._
    Seq((1L, Some(2.0), "ok"), (2L, None, "ok"), (2L, Some(-1.0), "bad"))
      .toDF("id", "v", "tag")
  }

  test("metrics and verdicts: completeness, uniqueness, domain, bounds") {
    val out = report(df, Seq(
      Check("v_complete", avg(when(col("v").isNotNull, 1.0d).otherwise(0.0d)),
        _ === 1.0d),
      Check("id_unique", count(lit(1)) - countDistinct(col("id")), _ === 0.0d),
      Check("tag_in_domain",
        sum(when(col("tag") =!= "ok", 1L).otherwise(0L)), _ === 0.0d),
      Check("v_nonneg", min(col("v")), _ >= 0.0d)))
      .collect().map(r => r.getString(0) -> ((r.getDouble(1), r.getBoolean(2))))
      .toMap
    assert(out("v_complete") === ((0.666667, false))) // rounded to 6
    assert(out("id_unique") === ((1.0, false))) // one duplicated id
    assert(out("tag_in_domain") === ((1.0, false)))
    assert(out("v_nonneg") === ((-1.0, false)))
  }

  test("all-green report on clean data") {
    val out = report(df.filter(col("id") === 1L), Seq(
      Check("v_complete", avg(when(col("v").isNotNull, 1.0d).otherwise(0.0d)),
        _ === 1.0d),
      Check("v_nonneg", min(col("v")), _ >= 0.0d)))
      .collect()
    assert(out.forall(_.getBoolean(2)))
  }

  test("plan is one aggregation pass: a single pair of HashAggregates") {
    // no countDistinct here — the plain-metric report must plan as one
    // partial+final aggregate over the input, then the tiny explode
    val plan = report(df, Seq(
      Check("v_nonneg", min(col("v")), _ >= 0.0d),
      Check("n_rows", count(lit(1)), _ > 0.0d)))
      .queryExecution.executedPlan.toString
    assert(plan.sliding("HashAggregate".length).count(_ == "HashAggregate") == 2,
      plan)
  }
}
