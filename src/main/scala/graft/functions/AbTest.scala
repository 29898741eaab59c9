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

  /** Shared two-sample VALUE HISTOGRAM: one (micro-unit value) row with
    * per-group counts and the preceding cumulative total — the x51
    * discipline (windows run on the histogram, never raw rows), which
    * is what makes rank/ECDF tests scale: the window length is
    * |distinct values|, not |events|. `flagA` selects group A's rows;
    * rows match the frame iff `flagA` or `flagB`. */
  private def histogram(events: DataFrame, valueCol: String,
                        flagA: Column, flagB: Column): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    events.filter(flagA || flagB)
      .select(round(col(valueCol) * 10000).cast("long").as("micro"),
        flagA.cast("long").as("ia"))
      .groupBy("micro").agg(sum("ia").as("c1"),
        (count(lit(1)) - sum("ia")).as("c2"))
      .withColumn("p", coalesce(sum(col("c1") + col("c2"))
        .over(Window.orderBy("micro")
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
  }

  /** Mann-Whitney U test between the value distributions of two groups
    * (the nonparametric companion to [[lift]]'s z — no normality
    * assumption on values, only on U itself). Rank sums use DOUBLED
    * average ranks computed from the histogram (each element at a value
    * has doubled rank 2·preceding + ties + 1 — exact integers, the x104
    * trick), the tie-corrected variance is exact-integer until one
    * division, and the readout is a single row (n1, n2, u1, z). */
  def mannWhitney(events: DataFrame, valueCol: String,
                  flagA: Column, flagB: Column): DataFrame = {
    histogram(events, valueCol, flagA, flagB)
      .select(col("c1"), col("c2"),
        (col("c1") * (lit(2L) * col("p") + col("c1") + col("c2") + 1)).as("r1x2"),
        (pow3(col("c1") + col("c2")) - (col("c1") + col("c2"))).as("tie"))
      .agg(sum("c1").as("n1"), sum("c2").as("n2"),
        sum("r1x2").as("r1x2"), sum("tie").as("tie"))
      .select(col("n1"), col("n2"),
        ((col("r1x2") - col("n1") * (col("n1") + 1)).cast("double") / lit(2.0))
          .as("u1"),
        col("tie"), (col("n1") + col("n2")).as("n"))
      .select(col("n1"), col("n2"), round(col("u1"), 1).as("u1"),
        // nullif guards: an empty/single-value frame has zero variance
        // (and n ≤ 1 zeroes the tie divisor) — NULL z on BOTH engines,
        // never the engine-specific Inf/NaN fork (DuckDB's IEEE default
        // would yield Inf where Spark yields NULL)
        round((col("u1") - (col("n1") * col("n2")).cast("double") / lit(2.0)) /
          nullif(sqrt((col("n1") * col("n2")).cast("double") / lit(12.0) *
            ((col("n") + 1).cast("double") - col("tie").cast("double") /
              nullif((col("n") * (col("n") - 1)).cast("double"), lit(0.0)))),
            lit(0.0)), 4).as("z"))
  }

  /** Two-sample Kolmogorov-Smirnov statistic between the value
    * distributions of two groups: D = max |ECDF₁ − ECDF₂| computed as an
    * exact integer maximum (|n₂·cum₁ − n₁·cum₂| over the shared
    * histogram support, ONE division at the end), with the α = 0.05
    * asymptotic threshold 1.358·√((n₁+n₂)/(n₁·n₂)) and the reject
    * verdict in the same row. */
  def ksTest(events: DataFrame, valueCol: String,
             flagA: Column, flagB: Column): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val cum = Window.orderBy("micro")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // totals via a second frame over the SAME histogram sort (no join,
    // no second scan — the whole-frame max reuses the cum sort)
    val whole = Window.orderBy("micro")
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    histogram(events, valueCol, flagA, flagB)
      .select(col("micro"),
        sum("c1").over(cum).as("cum1"), sum("c2").over(cum).as("cum2"))
      .select(col("cum1"), col("cum2"),
        max("cum1").over(whole).as("n1"), max("cum2").over(whole).as("n2"))
      .agg(max(abs(col("n2") * col("cum1") - col("n1") * col("cum2"))).as("num"),
        max("n1").as("n1"), max("n2").as("n2"))
      .select(col("n1"), col("n2"),
        // nullif: an empty group zeroes n1·n2 — NULL d/crit on BOTH
        // engines, not DuckDB's IEEE Inf vs Spark's NULL
        round(col("num").cast("double") /
          nullif((col("n1") * col("n2")).cast("double"), lit(0.0)), 6).as("d"),
        round(lit(1.358) * sqrt((col("n1") + col("n2")).cast("double") /
          nullif((col("n1") * col("n2")).cast("double"), lit(0.0))), 6)
          .as("crit_05"))
      .withColumn("reject_05", col("d") > col("crit_05"))
  }

  /** Welch's unequal-variance t-test per metric, A vs B, from the SAME
    * one-pass sufficient statistics as [[lift]] (count/sum/sum-of-squares
    * per (metric, arm)). Sample (n−1) variances; the Welch–Satterthwaite
    * df comes from the same two variance ratios, so the whole readout is
    * |metrics| rows of arithmetic after one fact-table aggregation.
    * Arms with n < 2 read as NULL t and df (zero-division guards), never
    * an engine-specific Inf/NaN. */
  def welchT(events: DataFrame, metricCol: String, valueCol: String,
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
    // sample variance from sums: (Σv² − n·mean²) / (n−1)
    val s2a = (col("sv2a") - col("na") * ma * ma) / nullif(col("na") - 1L, lit(0L))
    val s2b = (col("sv2b") - col("nb") * mb * mb) / nullif(col("nb") - 1L, lit(0L))
    val ra = s2a / col("na")
    val rb = s2b / col("nb")
    a.join(b, col(metricCol) === col("__m2"))
      .select(col(metricCol), col("na"), col("nb"),
        round(ma, 6).as("mean_a"), round(mb, 6).as("mean_b"),
        round((mb - ma) / nullif(sqrt(ra + rb), lit(0.0)), 4).as("t"),
        round((ra + rb) * (ra + rb) /
          nullif(ra * ra / nullif(col("na") - 1L, lit(0L)) +
            rb * rb / nullif(col("nb") - 1L, lit(0L)), lit(0.0)), 2).as("df"))
  }

  /** One-way ANOVA F over all groups of `groupCol`: between/within sum
    * of squares from per-group (n, Σv, Σv²) — ONE keyed aggregation over
    * the fact table, then |groups| rows reduce to a single readout row
    * (k, n, f, df1, df2). SSB = Σ nᵢ(mᵢ−m)² re-expressed sum-form
    * (Σ svᵢ²/nᵢ − (Σsv)²/n) so no second pass needs the grand mean. */
  def anovaF(events: DataFrame, valueCol: String, groupCol: String): DataFrame = {
    val v: Column = col(valueCol)
    events.groupBy(groupCol).agg(
        count(lit(1)).as("n"), sum(v).as("sv"), sum(v * v).as("sv2"))
      .agg(count(lit(1)).as("k"), sum("n").as("n"),
        sum(col("sv") * col("sv") / col("n")).as("sbn"),
        sum("sv").as("svt"), sum("sv2").as("svt2"))
      .select(col("k"), col("n"),
        round((col("sbn") - col("svt") * col("svt") / col("n")) /
          nullif(col("k") - 1L, lit(0L)), 4).as("ms_between"),
        round((col("svt2") - col("sbn")) /
          nullif(col("n") - col("k"), lit(0L)), 4).as("ms_within"),
        round(((col("sbn") - col("svt") * col("svt") / col("n")) /
            nullif(col("k") - 1L, lit(0L))) /
          nullif((col("svt2") - col("sbn")) /
            nullif(col("n") - col("k"), lit(0L)), lit(0.0)), 4).as("f"),
        (col("k") - 1L).as("df1"), (col("n") - col("k")).as("df2"))
  }

  /** c³ as a Column (kept explicit so both engines fold identical
    * integer arithmetic — no pow() on integers). */
  private def pow3(c: Column): Column = c * c * c
}
