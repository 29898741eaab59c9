package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality constraint checks over a table — the
  * pre-training audit gate (completeness, uniqueness, domain, bounds)
  * a 100 TB ingest runs before a corpus is admitted.
  *
  * Shape follows the public Deequ/soda pattern: each check is a named
  * aggregate METRIC plus a predicate on the computed value; the report
  * is one row per check `(check_name, metric, passed)`.
  *
  * Scale: every metric is an algebraic aggregate, so the whole report
  * is ONE aggregation pass with map-side partial combine — 100 TB
  * reduces to a single metrics row before the (singleton) exchange;
  * the per-check explode runs on that one row. Exact `countDistinct`
  * checks add Catalyst's Expand two-phase plan (still one pass over
  * the input); swap in [[Sketches.kmvDistinct]] when an estimated
  * uniqueness check is acceptable at full scale. */
object DataQuality {

  /** One named constraint: `metric` is an aggregate expression over the
    * table; `pass` judges the computed metric value. */
  final case class Check(name: String, metric: Column, pass: Column => Column)

  /** Evaluate all checks in one aggregation pass over `df`. Output is
    * one row per check: (check_name, metric rounded to 6 for
    * cross-engine stability, passed). */
  def report(df: DataFrame, checks: Seq[Check]): DataFrame = {
    require(checks.nonEmpty, "at least one check")
    val agged = df.agg(
      checks.head.metric.cast("double").as("m0"),
      checks.tail.zipWithIndex.map { case (c, i) =>
        c.metric.cast("double").as(s"m${i + 1}") }: _*)
    val rows = checks.zipWithIndex.map { case (c, i) =>
      struct(lit(c.name).as("check_name"),
        round(col(s"m$i"), 6).as("metric"),
        c.pass(col(s"m$i")).as("passed"))
    }
    agged.select(explode(array(rows: _*)).as("r")).select("r.*")
  }
}
