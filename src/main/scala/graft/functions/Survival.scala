package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Survival analysis over user lifetimes — the churn/retention readout
  * (Kaplan & Meier 1958): how long does a user stay active, with
  * still-active users CENSORED rather than counted as churned (the
  * mistake naive retention curves make: treating "hasn't left yet" as
  * "left", which biases lifetimes down).
  *
  * Scale shape: lifetimes reduce events to ONE row per user (keyed
  * aggregation, map-side partials); the curve itself then lives on
  * |distinct durations| rows — bounded by the observation window in
  * DAYS, never by user or event count — so the ordered windows run on a
  * driver-scale table no matter the corpus. The one scalar (global max
  * day) rides a broadcast.
  *
  * Determinism: at-risk counts, event counts and censor counts are
  * exact integers; each hazard factor is one division of exact
  * integers; factor logs are ROUNDED (9 digits) before the
  * duration-ordered cumulative sum, so both engines fold identical
  * values in identical order (the x65/s20 ordered-accumulation
  * discipline) and the final exp/round-6 cannot fork.
  */
object Survival {

  /** (user_id, duration, churn) lifetimes from an event log: duration =
    * last-active day − first-active day; a user is CHURNED only when
    * their last activity is at least `horizonDays` before the corpus's
    * last observed day — later last-activity is censored (still alive
    * as far as the data can tell). */
  def lifetimes(events: DataFrame, userCol: String, tsSecCol: String,
                horizonDays: Int = 7): DataFrame = {
    val u = events.groupBy(col(userCol).as("user_id"))
      .agg(min(expr(s"$tsSecCol div 86400")).as("fd"),
        max(expr(s"$tsSecCol div 86400")).as("ld"))
    val mx = u.agg(max("ld").as("md"))
    u.crossJoin(broadcast(mx))
      .select(col("user_id"), (col("ld") - col("fd")).as("duration"),
        (col("ld") <= col("md") - horizonDays).cast("int").as("churn"))
  }

  /** Kaplan-Meier product-limit estimator over (duration, churn)
    * lifetimes: one row per distinct duration with the at-risk count,
    * churn events `d`, censored exits `c`, and the survival probability
    * S(t) = Π_{t' ≤ t} (1 − d/n). Censor-only durations carry factor 1
    * and leave S unchanged — emitted anyway so the curve shows where
    * censoring happens. */
  def kaplanMeier(lifetimes: DataFrame): DataFrame = {
    val gr = lifetimes.groupBy("duration")
      .agg(sum("churn").cast("long").as("d"),
        sum(lit(1) - col("churn")).cast("long").as("c"))
    val tot = gr.agg(sum(col("d") + col("c")).cast("long").as("n"))
    val prior = Window.orderBy("duration")
      .rowsBetween(Window.unboundedPreceding, -1)
    val cum = Window.orderBy("duration")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    gr.crossJoin(broadcast(tot))
      .select(col("duration"), col("d"), col("c"),
        (col("n") - coalesce(sum(col("d") + col("c")).over(prior), lit(0L)))
          .cast("long").as("at_risk"))
      .select(col("duration"), col("at_risk"), col("d"), col("c"),
        // d = at_risk (everyone remaining churns, the curve's last
        // step) would be ln(0): flag it and pin S to exact 0 from that
        // duration on instead of folding a -Inf through round/exp
        when(sum(when(col("d") === col("at_risk"), lit(1)).otherwise(lit(0)))
            .over(cum) > 0, lit(0.0))
          .otherwise(round(exp(sum(when(col("d") < col("at_risk"),
            round(log((col("at_risk") - col("d")).cast("double") / col("at_risk")), 9))
            .otherwise(lit(0.0))).over(cum)), 6)).as("surv"))
  }
}
