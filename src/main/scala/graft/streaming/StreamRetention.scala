package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}

/** Streaming retention-cohort triangle — the incremental-view twin of
  * the batch `x45_retention_cohorts`: per (cohort_week, week_offset)
  * cell, the live count of users whose FIRST active week is the cohort
  * and who were active at the offset.
  *
  * The hard part is that a user's cohort is a MIN over their weeks, and
  * a late event can lower it retroactively — every cell the user
  * previously contributed moves. [[IncrementalView]]'s adder/subtractor
  * discipline handles exactly this: the processor emits signed CELL
  * DELTAS (+1/−1), retracting the old cohort's cells and re-adding
  * them under the new cohort when a min-lowering event arrives, so a
  * downstream `groupBy(cell).sum(delta)` equals the batch x45 triangle
  * after EVERY batch under ANY arrival order — an exact equivalence
  * with no watermark assumption (the spec fuzzes random interleavings).
  *
  * Scale: state per live user is their cohort plus the DISTINCT weeks
  * seen — bounded by the observation span in weeks, never by event
  * volume (duplicate (user, week) arrivals are absorbed without
  * emission or write). The retract/re-add path costs O(weeks seen) and
  * fires only on a min-lowering arrival, which happens at most once
  * per week of retroactivity per user. */
object StreamRetention {

  /** One (user, active-week) observation (project events upstream:
    * week = ts_sec div 604800). */
  case class UserWeek(user_id: Long, week: Long)

  /** Signed contribution of one user to one triangle cell. */
  case class CellDelta(cohort_week: Long, week_offset: Long, delta: Long)

  private[streaming] case class Seen(cohort: Long, weeks: List[Long])

  private[streaming] class Maintainer
      extends StatefulProcessor[Long, UserWeek, CellDelta] {
    @transient private var st: ValueState[Seen] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getValueState[Seen]("seen",
        Encoders.product[Seen], TTLConfig.NONE)

    override def handleInputRows(key: Long, rows: Iterator[UserWeek],
                                 timers: TimerValues): Iterator[CellDelta] = {
      var cur: Option[Seen] = if (st.exists()) Some(st.get()) else None
      val entry = cur
      val out = Seq.newBuilder[CellDelta]
      // intra-batch rows fold in week order (any order yields the same
      // final cells; ordering just avoids a retract of a cell added in
      // the same batch)
      rows.toSeq.sortBy(_.week).foreach { r =>
        cur match {
          case None =>
            cur = Some(Seen(r.week, List(r.week)))
            out += CellDelta(r.week, 0L, 1L)
          case Some(s) if !s.weeks.contains(r.week) =>
            if (r.week < s.cohort) {
              // retroactive cohort move: retract every old cell,
              // re-add the full week set under the new cohort
              s.weeks.foreach(w => out += CellDelta(s.cohort, w - s.cohort, -1L))
              val nw = (r.week :: s.weeks).sorted
              nw.foreach(w => out += CellDelta(r.week, w - r.week, 1L))
              cur = Some(Seen(r.week, nw))
            } else {
              out += CellDelta(s.cohort, r.week - s.cohort, 1L)
              cur = Some(Seen(s.cohort, (r.week :: s.weeks).sorted))
            }
          case _ => // duplicate (user, week): no emission, no write
        }
      }
      if (cur != entry) cur.foreach(st.update)
      out.result().iterator
    }

    override def handleExpiredTimer(key: Long, timers: TimerValues,
                                    info: ExpiredTimerInfo): Iterator[CellDelta] =
      Iterator.empty
  }

  /** Signed cell deltas; `groupBy(cohort_week, week_offset).sum(delta)`
    * downstream is the live x45 triangle. */
  def cellDeltas(input: Dataset[UserWeek]): Dataset[CellDelta] = {
    val spark = input.sparkSession
    import spark.implicits._
    input.groupByKey(_.user_id)
      .transformWithState(new Maintainer, TimeMode.None(), OutputMode.Append())
  }
}
