package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** A/B experiment readout: per-metric arm means, relative lift, and a
  * two-sample z statistic, computed from ONE keyed aggregation over the
  * fact table (count/sum/sum-of-squares per (metric, arm) — the classic
  * sufficient-statistics shape, so the fact table is touched once and the
  * readout join runs over |metrics| rows).
  *
  * Degenerate arms are defined, not NaN: a zero mean in the control arm
  * reads as a NULL lift and a zero pooled variance reads as a NULL z
  * (`nullif` guards both denominators), so the readout never forks into
  * engine-specific Inf/NaN encodings.
  */
object AbTest {

  /** `events` needs (metricCol, valueCol, armCol) where armCol ∈
    * {"A", "B"}; A is control. Output: one row per metric with
    * (na, nb, mean_a, mean_b, lift, z). */
  def lift(events: DataFrame, metricCol: String, valueCol: String,
           armCol: String): DataFrame = {
    val v: Column = col(valueCol)
    val sums = events.groupBy(metricCol, armCol).agg(
      count(lit(1)).as("n"), sum(v).as("sv"), sum(v * v).as("sv2"))
    val a = sums.filter(col(armCol) === "A").select(col(metricCol),
      col("n").as("na"), col("sv").as("sva"), col("sv2").as("sv2a"))
    val b = sums.filter(col(armCol) === "B").select(col(metricCol).as("__m2"),
      col("n").as("nb"), col("sv").as("svb"), col("sv2").as("sv2b"))
    val ma = col("sva") / col("na")
    val mb = col("svb") / col("nb")
    a.join(b, col(metricCol) === col("__m2"))
      .select(col(metricCol), col("na"), col("nb"),
        round(ma, 6).as("mean_a"), round(mb, 6).as("mean_b"),
        // nullif guards: a zero-mean or zero-variance arm reads as a
        // NULL lift/z on BOTH engines, never an engine-specific Inf/NaN
        round((mb - ma) / nullif(ma, lit(0.0)), 6).as("lift"),
        round((mb - ma) /
          nullif(sqrt((col("sv2a") / col("na") - pow(ma, 2)) / col("na") +
            (col("sv2b") / col("nb") - pow(mb, 2)) / col("nb")), lit(0.0)),
          4).as("z"))
  }
}
