package graft.functions

import graft.{SparkEntry, SparkSpec}
import org.apache.spark.sql.functions._

/** [[TimeSeries.rollingZScoreBucketed]] — the x53 scale rewrite must be
  * row-for-row, bit-for-bit the single-window form when the bucket
  * sizing precondition holds, its window must actually run at
  * (group, bucket) parallelism, and a violated precondition drops
  * exactly the double-boundary frames (the documented honest bound). */
class BucketedZScoreSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("≡ the x53 single-window form on real events (precondition asserted, then bit-equality)") {
    val e = graft.Tables.events(spark, dir)
    // precondition: every non-first biweekly bucket holds ≥ 20 rows
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("event_type").orderBy("bkt")
    val buckets = e.select(col("event_type"), expr("ts_sec div 1209600").as("bkt"))
      .groupBy("event_type", "bkt").agg(count(lit(1)).as("c"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") > 1)
    assert(buckets.filter(col("c") < 20).count() === 0,
      "fixture violates the sizing precondition — pick a wider bucket")
    val got = SparkEntry.queries("x89_zscore_bucketed")(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4))).toSet
    val want = SparkEntry.queries("x53_rolling_zscore")(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4))).toSet
    assert(got === want, s"missing=${(want -- got).take(3)} extra=${(got -- want).take(3)}")
    assert(want.nonEmpty, "vacuous fixture")
  }

  test("the window partitions by (group, bucket), not group alone") {
    val p = SparkEntry.queries("x89_zscore_bucketed")(spark, dir)
      .queryExecution.executedPlan.toString
    assert(p.contains("windowspecdefinition(g#") || p.contains("windowspecdefinition(g,"),
      s"expected a (g, bkt)-partitioned window:\n$p")
    assert(p.contains("bkt"), s"bucket column missing from the window partition:\n$p")
  }

  test("honest bound: a sub-depth NON-FIRST bucket drops its successor's double-boundary frames") {
    val s = spark
    import s.implicits._
    // one group, depth 4, buckets of width 100: bucket 0 holds 6 rows,
    // bucket 1 only 2 (< depth), bucket 2 holds 6 — bucket 2's early
    // rows have frames spanning back into bucket 0, which the one-hop
    // carry cannot reach
    val rows = ((0 until 6).map(i => (10L + i, i)) ++        // bucket 0
      (0 until 2).map(i => (110L + i, 10 + i)) ++            // bucket 1 (sparse)
      (0 until 6).map(i => (210L + i, 20 + i)))              // bucket 2
      .map { case (ts, id) => ("g", ts, id.toLong, if (id == 24) 100.0 else (id % 3).toDouble) }
      .toDF("g", "ts", "id", "v")
    val full = TimeSeries.rollingZScoreBucketed(rows, "g", "ts", "id", "v",
      bucketSec = 100000L, depth = 4, zThresh = 1.0) // one giant bucket = ground truth
      .collect().map(_.getLong(1)).toSet
    val bucketed = TimeSeries.rollingZScoreBucketed(rows, "g", "ts", "id", "v",
      bucketSec = 100L, depth = 4, zThresh = 1.0)
      .collect().map(_.getLong(1)).toSet
    assert(bucketed.subsetOf(full), "a violated precondition may only DROP rows, never invent")
    assert(bucketed != full,
      "fixture should actually demonstrate the drop (tighten it if this fails)")
  }
}
